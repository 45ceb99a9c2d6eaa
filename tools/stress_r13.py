#!/usr/bin/env python
"""Round-13 stress: every operator the round added (plus the churned
text-lm-score scorer), at the standing 100x scales — 10M events, 500k
multi-source documents; orders/lineitem readers run at sf0.1 fixture
scale, labeled so.  Self-provisioning (the stress_r11 convention);
timings are hash-sum-forced.

    python tools/stress_r13.py
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
        ev = spark_.read.parquet(STRESS_EV)
        # mirror load_table's dtype normalization: the stress generator
        # writes ts as TIMESTAMP_NTZ, production readers see TIMESTAMP —
        # unix_micros() (peak-concurrency's sweep) rejects ntz
        return ev.withColumn("ts", F.col("ts").cast("timestamp"))
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
    spark = get_spark("stress_r13", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    ensure_corpus(spark)
    ensure_events(spark)
    ensure_docs(spark)

    import merl_etl_spark.functions.scalar_queries as scalar_queries
    import merl_etl_spark.operators.aggregates as aggregates
    import merl_etl_spark.operators.analytics as analytics
    import merl_etl_spark.operators.curation_ext as curation_ext
    import merl_etl_spark.operators.intervals as intervals
    import merl_etl_spark.operators.lm as lm
    import merl_etl_spark.operators.multimodal as multimodal
    import merl_etl_spark.operators.profiling as profiling
    import merl_etl_spark.operators.quality as quality
    import merl_etl_spark.operators.text_analysis as text_analysis

    # NOTE (memory: stress harness trap): every module whose query is
    # driven below MUST appear here, or that query silently runs at
    # fixture scale under a 100x label.
    mods = (
        scalar_queries,
        aggregates,
        analytics,
        curation_ext,
        intervals,
        lm,
        multimodal,
        profiling,
        quality,
        text_analysis,
    )
    saved = [m.load_table for m in mods]
    for m in mods:
        m.load_table = patched
    try:
        # wave 1
        forced("text-zipf-fit 500k docs", QUERIES["text-zipf-fit"](spark, SF))
        forced(
            "analytics-important-stock sf0.1 lineitem (fixture scale)",
            QUERIES["analytics-important-stock"](spark, SF),
        )
        # wave 2 (+ the churned scorer both ops share)
        forced("text-lm-score 500k docs", QUERIES["text-lm-score"](spark, SF))
        forced(
            "curate-ccnet-buckets 500k docs",
            QUERIES["curate-ccnet-buckets"](spark, SF),
        )
        forced(
            "dq-temporal-coverage 10M events",
            QUERIES["dq-temporal-coverage"](spark, SF),
        )
        # wave 3
        forced(
            "mm-pcm-window-energy 500k docs",
            QUERIES["mm-pcm-window-energy"](spark, SF),
        )
        forced(
            "curate-pareto-frontier 500k docs",
            QUERIES["curate-pareto-frontier"](spark, SF),
        )
        # wave 4
        forced(
            "analytics-gini-concentration sf0.1 orders (fixture scale)",
            QUERIES["analytics-gini-concentration"](spark, SF),
        )
        forced("agg-group-mode 10M events", QUERIES["agg-group-mode"](spark, SF))
        # wave 5
        forced(
            "layout-partition-advisor 500k docs + 10M events",
            QUERIES["layout-partition-advisor"](spark, SF),
        )
        forced("fn-window-suite (literal grid)", QUERIES["fn-window-suite"](spark, SF))
        # wave 6
        forced(
            "analytics-peak-concurrency 10M events",
            QUERIES["analytics-peak-concurrency"](spark, SF),
        )
        # wave 7
        forced(
            "curate-dataset-card 500k docs",
            QUERIES["curate-dataset-card"](spark, SF),
        )
        # wave 8
        forced(
            "analytics-pareto-8020 sf0.1 orders (fixture scale)",
            QUERIES["analytics-pareto-8020"](spark, SF),
        )
        # wave 9
        forced("fn-agg-suite (literal grid)", QUERIES["fn-agg-suite"](spark, SF))
        forced(
            "dq-iqr-outliers 10M events",
            QUERIES["dq-iqr-outliers"](spark, SF),
        )
        # wave 10
        forced(
            "analytics-lorenz-deciles sf0.1 orders (fixture scale)",
            QUERIES["analytics-lorenz-deciles"](spark, SF),
        )
    finally:
        for m, fn in zip(mods, saved):
            m.load_table = fn


if __name__ == "__main__":
    main()
