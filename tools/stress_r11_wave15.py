#!/usr/bin/env python
"""Round-11 waves 12-19 stress: every operator the round added, at the
standing 100x scales — 10M events, 500k documents, 500k x 64d vectors
(orders/lineitem readers run at sf0.1 fixture scale, labeled so).
Self-provisioning (the stress_r11 convention); timings are
hash-sum-forced.

    python tools/stress_r11_wave15.py
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from merl_etl_spark.registry import QUERIES, load_all  # noqa: E402
from merl_etl_spark.session import get_spark  # noqa: E402
from merl_etl_spark.sources.tables import load_table as orig_load  # noqa: E402
from tools.stress_r11 import (  # noqa: E402
    STRESS_EMB,
    STRESS_EV,
    ensure_corpus,
    ensure_events,
)

SF = "/root/testdata/sf0.1"
# multi-lang / multi-source 500k-doc corpus: the wave-8 doc generator is
# single-language, which degenerates the upsample plan (one class -> all
# factors 1), so this wave provisions its own with a skewed 5-language
# mix and 20 sources
STRESS_DOCS = "/tmp/stress100/docs500k_ml.parquet"
N_DOCS = 500_000


def ensure_docs(spark):
    if os.path.isdir(STRESS_DOCS):
        return
    words = (
        "array('data', 'spark', 'shuffle', 'vector', 'token', 'model', "
        "'quality', 'filterable', 'aggregate', 'distributed', 'exactly', "
        "'pipeline', 'partition', 'training', 'corpus', 'evaluation')"
    )
    langs = "array('en','en','en','de','de','es','fr','pt','pt','pt')"
    docs = spark.range(0, N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"""array_join(transform(sequence(0, 39), w ->
              concat(element_at({words},
                     CAST(pmod(xxhash64(id * 40 + w), 16) AS INT) + 1),
                     CASE WHEN w % 8 = 7 THEN '.' ELSE '' END)), ' ')"""
        ).alias("text"),
        F.expr(
            f"element_at({langs}, CAST(pmod(xxhash64(id + 7), 10) AS INT) + 1)"
        ).alias("lang"),
        F.expr(
            "concat('src_', CAST(pmod(xxhash64(id + 3), 20) AS STRING))"
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(STRESS_DOCS)


def patched(spark_, sf_dir, name):
    if name == "events":
        return spark_.read.parquet(STRESS_EV)
    if name == "embeddings":
        return spark_.read.parquet(STRESS_EMB)
    if name == "documents":
        return spark_.read.parquet(STRESS_DOCS)
    return orig_load(spark_, sf_dir, name)


def forced(label, df):
    t0 = time.perf_counter()
    row = df.agg(
        F.sum(F.xxhash64(F.struct(*df.columns))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    print(
        f"{label}: rows={row['n']} hash={row['h']} "
        f"cold={time.perf_counter() - t0:.1f}s",
        flush=True,
    )


def main():
    spark = get_spark("stress_r11w15", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    ensure_corpus(spark)
    ensure_events(spark)
    ensure_docs(spark)

    import merl_etl_spark.functions.scalar_queries as scalar_queries
    import merl_etl_spark.operators.aggregates as aggregates
    import merl_etl_spark.operators.analytics as analytics
    import merl_etl_spark.operators.curation as curation
    import merl_etl_spark.operators.curation_ext as curation_ext
    import merl_etl_spark.operators.graph as graph
    import merl_etl_spark.operators.profiling as profiling
    import merl_etl_spark.operators.intervals as intervals
    import merl_etl_spark.operators.quality as quality
    import merl_etl_spark.operators.similarity as similarity
    import merl_etl_spark.operators.text_analysis as text_analysis
    import merl_etl_spark.operators.timeseries as timeseries

    mods = (
        scalar_queries,
        aggregates,
        analytics,
        curation,
        curation_ext,
        graph,
        intervals,
        profiling,
        quality,
        similarity,
        text_analysis,
        timeseries,
    )
    saved = [m.load_table for m in mods]
    for m in mods:
        m.load_table = patched
    try:
        forced("analytics-ab-test 10M events", QUERIES["analytics-ab-test"](spark, SF))
        forced("agg-argmax-suite 10M events", QUERIES["agg-argmax-suite"](spark, SF))
        forced("fn-map-suite 10M events", QUERIES["fn-map-suite"](spark, SF))
        forced("ts-decompose 10M events", QUERIES["ts-decompose"](spark, SF))
        forced(
            "layout-shard-skew 500k docs", QUERIES["layout-shard-skew"](spark, SF)
        )
        forced(
            "layout-compaction-plan 500k docs",
            QUERIES["layout-compaction-plan"](spark, SF),
        )
        forced(
            "analytics-powerlaw-fit 500k docs",
            QUERIES["analytics-powerlaw-fit"](spark, SF),
        )
        forced(
            "curate-upsample-plan 500k docs",
            QUERIES["curate-upsample-plan"](spark, SF),
        )
        forced(
            "text-ngram-novelty 500k docs (19M shingles)",
            QUERIES["text-ngram-novelty"](spark, SF),
        )
        forced(
            "dq-split-leakage-near 500k docs",
            QUERIES["dq-split-leakage-near"](spark, SF),
        )
        forced(
            "sim-kmeans-update 500k x 64d",
            QUERIES["sim-kmeans-update"](spark, SF),
        )
        forced(
            "graph-label-propagation 500k-vector kNN graph",
            QUERIES["graph-label-propagation"](spark, SF),
        )
        forced(
            "curate-truncation-plan 500k docs",
            QUERIES["curate-truncation-plan"](spark, SF),
        )
        forced(
            "dq-embedding-norms 500k x 64d",
            QUERIES["dq-embedding-norms"](spark, SF),
        )
        forced("fn-bit-suite 10M events", QUERIES["fn-bit-suite"](spark, SF))
        forced(
            "agg-variance-exact 500k docs",
            QUERIES["agg-variance-exact"](spark, SF),
        )
        forced(
            "sample-poisson-bootstrap 500k docs x 16 reps",
            QUERIES["sample-poisson-bootstrap"](spark, SF),
        )
        forced(
            "text-vocab-growth 500k docs",
            QUERIES["text-vocab-growth"](spark, SF),
        )
        forced(
            "graph-kcore 500k-vector kNN graph",
            QUERIES["graph-kcore"](spark, SF),
        )
        # dq-benford-digits / analytics-shipping-delay read orders+lineitem:
        # sf0.1 fixture scale (the per-row work is a projection; the 100x
        # behavior is the same one keyed rollup)
        forced("dq-benford-digits sf0.1", QUERIES["dq-benford-digits"](spark, SF))
        forced(
            "analytics-shipping-delay sf0.1",
            QUERIES["analytics-shipping-delay"](spark, SF),
        )
        forced(
            "intervals-coalesce sf0.1",
            QUERIES["intervals-coalesce"](spark, SF),
        )
        forced(
            "curate-filter-funnel 500k docs",
            QUERIES["curate-filter-funnel"](spark, SF),
        )
        forced(
            "agg-corr-exact 500k docs",
            QUERIES["agg-corr-exact"](spark, SF),
        )
        forced(
            "graph-assortativity 500k-vector kNN graph",
            QUERIES["graph-assortativity"](spark, SF),
        )
        forced(
            "dedup-source-overlap 500k docs (19M shingles, 20 sources)",
            QUERIES["dedup-source-overlap"](spark, SF),
        )
        forced(
            "agg-skewness-exact 500k docs",
            QUERIES["agg-skewness-exact"](spark, SF),
        )
        forced(
            "analytics-seasonality-strength 10M events",
            QUERIES["analytics-seasonality-strength"](spark, SF),
        )
    finally:
        for m, fn in zip(mods, saved):
            m.load_table = fn


if __name__ == "__main__":
    main()
