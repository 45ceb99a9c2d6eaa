#!/usr/bin/env python
"""Closest local replica of the external driver's CORRECTNESS gate.

Runs every registered query on a VANILLA SparkSession (the driver does
not use merl_etl_spark.session.get_spark — queries must self-configure)
and value-hash-compares it against its DuckDB oracle at sf0.01 with the
same canonicalization family as the driver (tests/oracle_check.compare).

    python tools/driver_replica.py            # the 50 sweep-head queries
    python tools/driver_replica.py --all      # the full registry
    python tools/driver_replica.py q1 q2 ...  # named queries

The 50-query default mirrors the driver's per-round sweep budget: the
registry orders SWEEP_PRIORITY first, so the head IS next round's
CORRECTNESS candidate set.  Run this after any change to a query's
numeric surface, in addition to tools/sweep_oracles.py (which uses the
engine session at three scale factors).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver_replica")
        .getOrCreate()
    )
    from merl_etl_spark import registry
    from tests.oracle_check import compare, duck_run

    registry.load_all()
    args = sys.argv[1:]
    if args == ["--all"]:
        names = [q for q in registry.QUERIES if q in registry.ORACLES]
    elif args:
        names = args
    else:
        names = list(registry.QUERIES)[:50]

    sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR_ORACLE",
        os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.01"),
    )
    fails: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            compare(
                registry.QUERIES[name](spark, sf),
                duck_run(sf, registry.ORACLES[name]),
                name,
            )
            print(f"PASS {name} ({time.perf_counter() - t0:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — report-and-continue
            print(f"FAIL {name}: {str(exc)[:300]}", flush=True)
            fails.append(name)
    print(f"\ndriver replica: {len(names) - len(fails)}/{len(names)} PASS; "
          f"fails: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
