"""Quality-gate tier: beyond the oracle match (test_queries_vs_oracle),
pin the properties the operators' determinism and scale arguments rest
on — the z-score threshold margin, the one-scan expectation plan, the
salted join's invisibility, and cross-engine disc-quantile agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.operators.quality import _Z_EXPR
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def test_zscore_margin_to_threshold(spark, sf_dir):
    """agg-anomaly-zscore's membership is decided by |z| > 3 computed from
    order-sensitive double sums (~1e-12 relative noise across engines) —
    safe only while no fixture z sits near the threshold.  Pin a 1e-5
    floor on the gap so a fixture regeneration that lands a value near
    the boundary fails HERE with a clear message instead of flaking the
    driver hash."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("value").cast("double").alias("sv"),
        F.sum(F.expr("value * value")).cast("double").alias("svv"),
    )
    margin = (
        events.join(stats, "event_type")
        .selectExpr(f"abs(abs({_Z_EXPR}) - 3.0) AS gap")
        .agg(F.min("gap").alias("m"))
        .collect()[0]
        .m
    )
    assert margin > 1e-5, f"fixture z-score too close to threshold: {margin}"


def test_dq_expectations_single_scan(spark, sf_dir):
    """Eight rules, ONE scan: the plan must contain exactly one events
    parquet scan — a per-rule-scan regression would be rule-count× the
    IO at 100 TB."""
    df = QUERIES["dq-expectations"](spark, sf_dir)
    # simple mode: each scan appears exactly once (formatted mode repeats
    # the node in its details section and double-counts)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("FileScan parquet") == 1, plan


def test_dq_expectations_rules_and_verdicts(spark, sf_dir):
    rows = {r.rule: r for r in QUERIES["dq-expectations"](spark, sf_dir).collect()}
    assert len(rows) == 8
    n = load_table(spark, sf_dir, "events").count()
    for r in rows.values():
        assert r.n_checked == n
        assert r.passed == (r.n_violations == 0)
    # fixture contract: clean keys, repeated users (the failing-rule path)
    assert rows["unique:event_id"].passed
    assert not rows["unique:user_id"].passed
    assert rows["unique:user_id"].n_violations > 0


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be invisible: same rows as the unsalted equi-join."""
    salted = QUERIES["join-salted-skew"](spark, sf_dir)
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("type_n"))
    )
    plain = events.join(dim, "event_type").select("event_id", "event_type", "type_n")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_exact_quantiles_are_data_elements(spark, sf_dir):
    """percentile_disc must return actual data values (no interpolation):
    every emitted quantile exists in its group's value set."""
    rows = QUERIES["agg-exact-quantiles"](spark, sf_dir).collect()
    events = load_table(spark, sf_dir, "events")
    by_type = {
        r.event_type: set(
            x.value for x in events.filter(F.col("event_type") == r.event_type)
            .select("value").collect()
        )
        for r in rows
    }
    for r in rows:
        for q in ("q25", "q50", "q75", "q90", "q99"):
            assert getattr(r, q) in by_type[r.event_type], (r.event_type, q)
