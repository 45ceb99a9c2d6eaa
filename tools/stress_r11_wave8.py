#!/usr/bin/env python
"""Round-11 waves 6-8 stress: the new operators at the standing 100x
scales — 10M events, 15M orders (entity-scaled 100x customers), 500k
documents, 500k x 64d vectors.  Self-provisioning (the stress_r11
convention); timings are hash-sum-forced.

    python tools/stress_r11_wave8.py
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
STRESS_DOCS = "/tmp/stress100/docs500k.parquet"
N_DOCS = 500_000


def ensure_docs(spark):
    """500k synthetic documents: ~40 hash-derived words with sentence
    punctuation every ~8 words — enough lexical structure for the
    readability/word-stat tier without copying fixture text."""
    if os.path.isdir(STRESS_DOCS):
        return
    words = (
        "array('data', 'spark', 'shuffle', 'vector', 'token', 'model', "
        "'quality', 'filterable', 'aggregate', 'distributed', 'exactly', "
        "'pipeline', 'partition', 'training', 'corpus', 'evaluation')"
    )
    docs = spark.range(0, N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"""array_join(transform(sequence(0, 39), w ->
              concat(element_at({words},
                     CAST(pmod(xxhash64(id * 40 + w), 16) AS INT) + 1),
                     CASE WHEN w % 8 = 7 THEN '.' ELSE '' END)), ' ')"""
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.expr("concat('src_', CAST(pmod(xxhash64(id + 3), 5) AS STRING))").alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(STRESS_DOCS)


def patched(spark_, sf_dir, name):
    if name == "events":
        return spark_.read.parquet(STRESS_EV)
    if name == "embeddings":
        return spark_.read.parquet(STRESS_EMB)
    if name == "documents":
        return spark_.read.parquet(STRESS_DOCS)
    if name == "orders":
        # entity-scaled 100x (15M orders, 100x customers), keeping the
        # columns the wave-6/7 analytics ops read
        rep = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
        o = orig_load(spark_, sf_dir, "orders")
        return o.select("*", rep).select(
            (F.col("o_orderkey") + F.col("rep") * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * 10_000_000).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
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
    spark = get_spark("stress_r11w8", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    ensure_corpus(spark)
    ensure_events(spark)
    ensure_docs(spark)

    import merl_etl_spark.operators.analytics as analytics
    import merl_etl_spark.operators.freq as freq
    import merl_etl_spark.operators.similarity as similarity
    import merl_etl_spark.operators.text_analysis as text_analysis
    import merl_etl_spark.operators.timeseries as timeseries

    mods = (analytics, freq, similarity, text_analysis, timeseries)
    for mod in mods:
        mod.load_table = patched
    try:
        forced("agg-bitmap-intersect 10M events", QUERIES["agg-bitmap-intersect"](spark, SF))
        forced(
            "agg-rolling-distinct-bitmap 10M events / 30d",
            QUERIES["agg-rolling-distinct-bitmap"](spark, SF),
        )
        forced(
            "ts-interarrival-hist 10M events",
            QUERIES["ts-interarrival-hist"](spark, SF),
        )
        forced(
            "analytics-order-percentiles 100x (15M orders)",
            QUERIES["analytics-order-percentiles"](spark, SF),
        )
        forced(
            "analytics-cohort-ltv 100x (15M orders, 1.5M customers)",
            QUERIES["analytics-cohort-ltv"](spark, SF),
        )
        forced(
            "analytics-revenue-concentration 100x (15M orders)",
            QUERIES["analytics-revenue-concentration"](spark, SF),
        )
        forced(
            "text-readability 500k docs",
            QUERIES["text-readability"](spark, SF),
        )
        forced(
            "sim-pq-adc-topk 5 queries x 250k codes",
            QUERIES["sim-pq-adc-topk"](spark, SF),
        )
        forced(
            "sim-ann-recall-eval 5 probes x 500k corpus",
            QUERIES["sim-ann-recall-eval"](spark, SF),
        )
    finally:
        for mod in mods:
            mod.load_table = orig_load


# waves 9-10 additions ride the same corpora: call via
#   python tools/stress_r11_wave8.py --wave9
# (kept in this file so the corpus provisioning is shared)
def wave9():
    spark = get_spark("stress_r11w9", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    ensure_docs(spark)
    import merl_etl_spark.operators.curation as curation
    import merl_etl_spark.operators.curation_ext as curation_ext
    import merl_etl_spark.operators.dedup as dedup
    import merl_etl_spark.operators.quality as quality
    import merl_etl_spark.functions.scalar_queries as scalar_queries

    mods = (curation, curation_ext, dedup, quality, scalar_queries)
    for mod in mods:
        mod.load_table = patched
    try:
        forced("dq-split-leakage 500k docs", QUERIES["dq-split-leakage"](spark, SF))
        forced(
            "curate-dedup-impact 500k docs",
            QUERIES["curate-dedup-impact"](spark, SF),
        )
        forced("fn-array-suite 500k docs", QUERIES["fn-array-suite"](spark, SF))
    finally:
        for mod in mods:
            mod.load_table = orig_load


if __name__ == "__main__":
    wave9() if "--wave9" in sys.argv else main()
