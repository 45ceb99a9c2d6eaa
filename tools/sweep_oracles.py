#!/usr/bin/env python
"""Hash-compare EVERY oracled query against DuckDB at an arbitrary scale
factor — the validation tier beyond the driver's sf0.01 gate.

    python tools/sweep_oracles.py [sf_dir ...]

Defaults to sf0.001 + sf0.01 + sf0.1.  The sf0.1 tier is what exposed
the shortest-repr rounding-tie and double-sum-order bugs documented in
PERF.md ("sf0.1 oracle sweep") — sf0.01 data never hit those boundaries,
so re-run this after touching any float/decimal output path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merl_etl_spark import registry  # noqa: E402
from merl_etl_spark.session import get_spark  # noqa: E402
from tests.oracle_check import compare, duck_run  # noqa: E402


def main() -> int:
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    sf_dirs = sys.argv[1:] or [
        os.path.join(base, d) for d in ("sf0.001", "sf0.01", "sf0.1")
    ]
    missing = [d for d in sf_dirs if not os.path.isdir(d)]
    if missing:
        print(f"fixture dirs not found: {missing} "
              f"(set SPARK_GRAFT_TESTDATA or pass dirs as args)")
        return 2
    registry.load_all()
    # MERL_SWEEP_ONLY=a,b,c restricts the sweep to the named queries —
    # for targeted re-validation after touching one operator.
    only = {q for q in os.environ.get("MERL_SWEEP_ONLY", "").split(",") if q}
    spark = get_spark("oracle_sweep")
    fails: list[tuple[str, str]] = []
    for sf in sf_dirs:
        for name in registry.QUERIES:
            if name not in registry.ORACLES:
                continue
            if only and name not in only:
                continue
            t0 = time.perf_counter()
            try:
                compare(
                    registry.QUERIES[name](spark, sf),
                    duck_run(sf, registry.ORACLES[name]),
                    name,
                )
                print(f"PASS {sf} {name} ({time.perf_counter() - t0:.0f}s)", flush=True)
            except Exception as exc:  # noqa: BLE001 — report-and-continue sweep
                print(f"FAIL {sf} {name}: {str(exc)[:300]}", flush=True)
                fails.append((sf, name))
    print(f"\nswept {len(sf_dirs)} scales; failures: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
