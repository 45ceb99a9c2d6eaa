#!/usr/bin/env python
"""Round-14 stress: the round's TPC-H-shaped analytics at a GENUINE 100x
(the tools/stress_tpch.py fixture — 15M orders / ~60M lineitem), plus the
r13 order-statistic trio that previously could only run at fixture scale,
plus the 10M-event dq re-pin.  Timings are hash-sum-forced.

Two hardening changes over stress_r13 (VERDICT r13 task #5):

* LOUD patch assertion — every driven query's defining module must have
  had its ``load_table`` rebound to the stress reader; a query whose
  module is missing from ``mods`` FAILS instead of silently running at
  fixture scale under a 100x label.
* fixture-scale labels are gone for the TPC-H ops: orders/lineitem/
  customer/supplier/part now route to the 100x stress star.

    python tools/stress_r14.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from merl_etl_spark.registry import QUERIES, load_all  # noqa: E402
from merl_etl_spark.session import get_spark  # noqa: E402
from merl_etl_spark.sources.tables import load_table as orig_load  # noqa: E402
from tools.stress_r11 import STRESS_EV, ensure_events  # noqa: E402
from tools.stress_r11_wave15 import STRESS_DOCS, ensure_docs  # noqa: E402
from tools.stress_tpch import STRESS_TPCH, ensure_tpch  # noqa: E402

SF = "/root/testdata/sf0.1"
_TPCH = ("orders", "lineitem", "customer", "supplier", "part")


def patched(spark_, sf_dir, name):
    if name in _TPCH:
        return spark_.read.parquet(f"{STRESS_TPCH}/{name}.parquet")
    if name == "documents":
        return spark_.read.parquet(STRESS_DOCS)
    if name == "events":
        # mirror load_table's dtype normalization (stress generator
        # writes TIMESTAMP_NTZ; unix_micros rejects ntz)
        ev = spark_.read.parquet(STRESS_EV)
        return ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return orig_load(spark_, sf_dir, name)


def main():
    spark = get_spark("stress_r14", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    ensure_events(spark)
    ensure_docs(spark)
    ensure_tpch(spark)

    import merl_etl_spark.operators.analytics as analytics
    import merl_etl_spark.operators.multimodal as multimodal
    import merl_etl_spark.operators.profiling as profiling
    import merl_etl_spark.operators.quality as quality
    import merl_etl_spark.operators.text_analysis as text_analysis

    mods = (analytics, multimodal, profiling, quality, text_analysis)
    saved = [m.load_table for m in mods]
    for m in mods:
        m.load_table = patched

    def drive(name: str, label: str, tableless: bool = False) -> None:
        # STRICT guard: the defining module must carry the PATCHED
        # load_table.  A missing binding fails too (a module aliasing the
        # import or routing reads through an unpatched helper would
        # otherwise run at fixture scale under a 100x label — the exact
        # silent failure this assertion exists to kill).  Queries that
        # read no tables at all must say so explicitly via tableless=True.
        fn = QUERIES[name]
        mod = sys.modules[fn.__module__]
        lt = getattr(mod, "load_table", None)
        if not tableless and lt is not patched:
            raise AssertionError(
                f"{name}: defining module {fn.__module__} does not carry the "
                "patched load_table — it would read fixture-scale data under "
                "a 100x label. Add the module to `mods` (or mark the drive "
                "tableless=True if it genuinely reads no tables)."
            )
        t0 = time.perf_counter()
        df = fn(spark, SF)
        row = df.agg(
            F.sum(F.xxhash64(F.struct(*df.columns))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        print(
            f"{label}: rows={row['n']} hash={row['h']} "
            f"cold={time.perf_counter() - t0:.1f}s",
            flush=True,
        )

    try:
        # r14 wave 1 (literal in-repo PNG fixture — scale-independent by
        # design; driven for the hash pin, labeled honestly)
        drive("mm-png-decode", "mm-png-decode (literal PNG fixtures)")
        # r14 wave 2: Q4 / Q12 shapes
        drive("analytics-order-priority", "analytics-order-priority 15M orders/60M li")
        drive(
            "analytics-ship-delay-priority",
            "analytics-ship-delay-priority 60M li join 15M orders",
        )
        # r14 wave 3: Q7 / Q9 stars
        drive("analytics-nation-traffic", "analytics-nation-traffic 60M li 5-way star")
        drive("analytics-product-profit", "analytics-product-profit 60M li profit star")
        # r14 wave 4: Q21 / Q22 exists+anti
        drive(
            "analytics-supplier-waiting",
            "analytics-supplier-waiting 60M li x3 semi/anti",
        )
        drive("analytics-idle-customers", "analytics-idle-customers 1.5M cust anti 15M orders")
        # r14 wave 5: Q16 / Q18
        drive(
            "analytics-parts-supplier-breadth",
            "analytics-parts-supplier-breadth 60M li distinct grid",
        )
        drive("analytics-large-orders", "analytics-large-orders 60M li having-semi")
        # r14 wave 6: Q15 / Q2 / Q20 join-back shapes
        drive("analytics-top-supplier", "analytics-top-supplier 60M li max join-back")
        drive(
            "analytics-min-cost-supplier",
            "analytics-min-cost-supplier 60M li min tie-keep",
        )
        drive(
            "analytics-excess-suppliers",
            "analytics-excess-suppliers 60M li agg-threshold",
        )
        # r14 wave 7: layout pruning score (10M events) + pitch tracker
        drive("layout-skipping-eval", "layout-skipping-eval 10M events")
        drive("mm-pcm-autocorr-pitch", "mm-pcm-autocorr-pitch 500k docs")
        # r14 wave 8
        drive("text-textrank-keywords", "text-textrank-keywords 500k docs")
        # r13 order-statistic trio, first time at true 100x orders
        drive("analytics-gini-concentration", "analytics-gini-concentration 15M orders")
        drive("analytics-pareto-8020", "analytics-pareto-8020 15M orders")
        drive("analytics-lorenz-deciles", "analytics-lorenz-deciles 15M orders")
        # 10M-event re-pin (quality module is patched for events)
        drive("dq-iqr-outliers", "dq-iqr-outliers 10M events")
    finally:
        for m, fn in zip(mods, saved):
            m.load_table = fn


if __name__ == "__main__":
    main()
