"""Semantic tests for the round-11 wave-11 operators: the exact bitmap
distinct rollup and the trailing exact rolling median."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def test_bitmap_rollup_equals_per_level_sets(spark, sf_dir):
    """Every rollup level's count must equal the plain per-level set
    computation, and the level structure must be exactly leaf / per-feed
    / grand-total (NULL-marked)."""
    rows = QUERIES["agg-bitmap-rollup"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .where(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("user_id") >= 0)
            & F.col("event_type").isNotNull()
        )
        .select("event_type", F.to_date("ts").alias("day"), "user_id")
        .collect()
    )
    leaf: dict = defaultdict(set)
    mid: dict = defaultdict(set)
    top: set = set()
    for r in ev:
        d = r["day"].strftime("%Y-%m-%d")
        leaf[(r["event_type"], d)].add(r["user_id"])
        mid[r["event_type"]].add(r["user_id"])
        top.add(r["user_id"])
    got_leaf = {
        (r["event_type"], r["day"]): r["n_users"]
        for r in rows
        if r["event_type"] is not None and r["day"] is not None
    }
    got_mid = {
        r["event_type"]: r["n_users"]
        for r in rows
        if r["event_type"] is not None and r["day"] is None
    }
    got_top = [r["n_users"] for r in rows if r["event_type"] is None]
    assert got_leaf == {k: len(v) for k, v in leaf.items()}
    assert got_mid == {k: len(v) for k, v in mid.items()}
    assert got_top == [len(top)]
    # the mergeability property the op exists for: per-feed counts are
    # NOT the sum of leaf counts (users repeat across days), yet the
    # mask rollup still got them exact
    repeats = any(
        sum(len(leaf[(f, d)]) for (ff, d) in leaf if ff == f) > len(mid[f])
        for f in mid
    )
    assert repeats, "fixture has no cross-day repeat users; rollup untested"


def test_rolling_median_matches_python_reference(spark, sf_dir):
    """Recompute the trailing calendar-window median in Python (sorted
    middle-sum, RANGE semantics — gaps shrink the window) and compare
    every row exactly."""
    from merl_etl_spark.operators.timeseries import RMED_DAYS

    rows = {r["day"]: r for r in QUERIES["ts-rolling-median"](spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(F.to_date("ts").alias("day"))
        .collect()
    )
    daily: dict = defaultdict(int)
    for r in ev:
        daily[r["day"]] += 1
    assert set(rows) == {d.strftime("%Y-%m-%d") for d in daily}
    for d, n in daily.items():
        win = sorted(
            daily[d - timedelta(days=o)]
            for o in range(RMED_DAYS)
            if d - timedelta(days=o) in daily
        )
        m = len(win)
        med2 = win[(m + 1) // 2 - 1] + win[(m + 2) // 2 - 1]
        r = rows[d.strftime("%Y-%m-%d")]
        assert (r["n"], r["n_obs"], r["med2"]) == (n, m, med2)
        assert r["trailing_median"] == med2 / 2
        assert r["vol_ratio_milli"] == n * 2000 // med2
