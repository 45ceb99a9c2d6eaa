#!/usr/bin/env python
"""Round-12 stress: every operator the round added (plus the widened
exact-moment family the ADVICE fix touched), at the standing 100x
scales — 10M events, 500k multi-source documents, 500k x 64d vectors;
orders/lineitem readers run at sf0.1 fixture scale, labeled so.
Self-provisioning (the stress_r11 convention); timings are
hash-sum-forced.

    python tools/stress_r12.py
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
from tools.stress_r11_wave15 import STRESS_DOCS, ensure_docs  # noqa: E402

SF = "/root/testdata/sf0.1"


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
    spark = get_spark("stress_r12", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
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
    import merl_etl_spark.operators.quality as quality
    import merl_etl_spark.operators.similarity as similarity
    import merl_etl_spark.operators.text_analysis as text_analysis
    import merl_etl_spark.operators.timeseries as timeseries

    # NOTE (memory: stress harness trap): every module whose query is
    # driven below MUST appear here, or that query silently runs at
    # fixture scale under a 100x label.
    mods = (
        scalar_queries,
        aggregates,
        analytics,
        curation,
        curation_ext,
        graph,
        quality,
        similarity,
        text_analysis,
        timeseries,
    )
    saved = [m.load_table for m in mods]
    for m in mods:
        m.load_table = patched
    try:
        # widened exact-moment family (the r11 ADVICE fix) — 500k docs
        forced("agg-variance-exact 500k docs", QUERIES["agg-variance-exact"](spark, SF))
        forced("agg-corr-exact 500k docs", QUERIES["agg-corr-exact"](spark, SF))
        forced("agg-skewness-exact 500k docs", QUERIES["agg-skewness-exact"](spark, SF))
        forced("agg-kurtosis-exact 500k docs", QUERIES["agg-kurtosis-exact"](spark, SF))
        # wave 1
        forced("sample-reservoir 500k docs", QUERIES["sample-reservoir"](spark, SF))
        forced(
            "graph-clustering-coefficient 500k vecs",
            QUERIES["graph-clustering-coefficient"](spark, SF),
        )
        # wave 2
        forced(
            "text-source-divergence 500k docs",
            QUERIES["text-source-divergence"](spark, SF),
        )
        forced(
            "dq-reconciliation sf0.1 orders (fixture scale)",
            QUERIES["dq-reconciliation"](spark, SF),
        )
        # wave 3
        forced(
            "sim-matryoshka-eval 500k vecs", QUERIES["sim-matryoshka-eval"](spark, SF)
        )
        forced(
            "curate-anneal-schedule 500k docs",
            QUERIES["curate-anneal-schedule"](spark, SF),
        )
        # wave 4
        forced("ts-anomaly-mad 10M events", QUERIES["ts-anomaly-mad"](spark, SF))
        forced(
            "analytics-revenue-bridge sf0.1 lineitem (fixture scale)",
            QUERIES["analytics-revenue-bridge"](spark, SF),
        )
        # wave 5
        forced(
            "curate-budget-select 500k docs",
            QUERIES["curate-budget-select"](spark, SF),
        )
        forced("fn-struct-suite sf0.1 orders (fixture scale)",
               QUERIES["fn-struct-suite"](spark, SF))
        # wave 6
        forced(
            "sim-pq-recall-eval 500k vecs", QUERIES["sim-pq-recall-eval"](spark, SF)
        )
        forced(
            "text-distinctive-terms 500k docs",
            QUERIES["text-distinctive-terms"](spark, SF),
        )
        # wave 7
        forced(
            "sim-cluster-nmi 500k vecs", QUERIES["sim-cluster-nmi"](spark, SF)
        )
        forced(
            "analytics-returned-revenue sf0.1 lineitem (fixture scale)",
            QUERIES["analytics-returned-revenue"](spark, SF),
        )
        # wave 8
        forced(
            "analytics-promo-share sf0.1 lineitem (fixture scale)",
            QUERIES["analytics-promo-share"](spark, SF),
        )
        forced(
            "dq-primary-keys (events/docs/vecs 100x; TPC-H at sf0.1)",
            QUERIES["dq-primary-keys"](spark, SF),
        )
        # wave 10
        forced(
            "analytics-monthly-growth sf0.1 orders (fixture scale)",
            QUERIES["analytics-monthly-growth"](spark, SF),
        )
        # seasonality (widened moment products)
        forced(
            "analytics-seasonality-strength 10M events",
            QUERIES["analytics-seasonality-strength"](spark, SF),
        )
    finally:
        for m, fn in zip(mods, saved):
            m.load_table = fn


if __name__ == "__main__":
    main()
