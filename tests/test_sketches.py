"""The approx-sketch query self-certifies: each engine emits booleans
asserting its sketch landed inside the error contract (the raw estimates
can never hash-match across engines).  This test pins the Spark side —
exact values agree with an independently computed exact aggregate, and
every error-bound boolean is True."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def test_approx_sketches_within_bounds(spark, sf_dir):
    rows = {r.event_type: r for r in QUERIES["agg-approx-sketches"](spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for t, a in rows.items():
        e = exact[t]
        assert a.exact_users == e.users
        assert a.n == e.n
        assert a.hll_ok, f"{t}: HLL estimate outside 5% of exact"
        assert a.q50_ok, f"{t}: q50 estimate outside exact band"
        assert a.q95_ok, f"{t}: q95 estimate outside exact band"
        assert a.q99_ok, f"{t}: q99 estimate outside exact band"


def test_hll_merge_rollup_properties(spark, sf_dir):
    """agg-hll-merge: per-scope exacts agree with ground truth, every
    contract boolean holds, and the merged-scope row respects the
    set-union bounds (global distinct ≥ any type's distinct, ≤ the sum)."""
    rows = {r.scope: r for r in QUERIES["agg-hll-merge"](spark, sf_dir).collect()}
    assert "ALL" in rows and len(rows) == 6
    per = {s: r for s, r in rows.items() if s != "ALL"}
    glob = rows["ALL"]
    for r in rows.values():
        assert r.hll_ok, f"{r.scope}: merged/typed HLL estimate outside 10%"
    assert glob.n_rows == sum(r.n_rows for r in per.values())
    assert glob.exact_users >= max(r.exact_users for r in per.values())
    assert glob.exact_users <= sum(r.exact_users for r in per.values())
