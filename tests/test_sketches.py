"""Bound the rows-only approximate sketches against exact answers —
the check DuckDB hash-comparison can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def test_approx_sketches_within_bounds(spark, sf_dir):
    approx = {r.event_type: r for r in QUERIES["agg-approx-sketches"](spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for t, a in approx.items():
        e = exact[t]
        assert abs(a.approx_users - e.users) <= max(3, 0.1 * e.users)
        assert abs(a.q50 - e.p50) <= 0.1 * max(1.0, abs(e.p50))
        assert a.q50 <= a.q95 <= a.q99
