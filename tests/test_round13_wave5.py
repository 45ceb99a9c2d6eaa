"""Semantic tests for the round-13 wave-5 operators: the partition-key
advisor and the window-function surface suite."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from merl_etl_spark.operators.profiling import ADVISOR_SMALL_ROWS
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# layout-partition-advisor
# ---------------------------------------------------------------------------


def test_partition_advisor_matches_python_replay(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "lang").collect()
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    cands = {
        "documents.source": Counter(r.source for r in docs if r.source is not None),
        "documents.lang": Counter(r.lang for r in docs if r.lang is not None),
        "events.event_type": Counter(
            r.event_type for r in ev if r.event_type is not None
        ),
        "events.day": Counter(
            r.ts.strftime("%Y-%m-%d") for r in ev if r.ts is not None
        ),
    }
    exp = {}
    for cand, ctr in cands.items():
        n_rows = sum(ctr.values())
        exp[cand] = (
            len(ctr),
            n_rows,
            max(ctr.values()),
            min(ctr.values()),
            math.floor(max(ctr.values()) * len(ctr) * 1_000_000 / n_rows),
            sum(1 for v in ctr.values() if v < ADVISOR_SMALL_ROWS),
        )
    got = {
        r.candidate: (
            r.n_values, r.n_rows, r.max_rows, r.min_rows,
            r.skew_ppm, r.n_small_values,
        )
        for r in QUERIES["layout-partition-advisor"](spark, sf_dir).collect()
    }
    assert got == exp


def test_partition_advisor_semantics(spark, sf_dir):
    """A perfectly balanced candidate reads skew_ppm == 1e6; every
    candidate's skew is >= 1e6 by construction (max >= avg); the row
    totals must agree across candidates of the same table."""
    rows = {r.candidate: r for r in
            QUERIES["layout-partition-advisor"](spark, sf_dir).collect()}
    assert set(rows) == {
        "documents.source", "documents.lang", "events.event_type", "events.day",
    }
    for r in rows.values():
        assert r.skew_ppm >= 1_000_000 - 1  # floor() of exactly-balanced can hit 999999
        assert r.min_rows <= r.max_rows
        assert r.n_values >= 1
    assert rows["documents.source"].n_rows == rows["documents.lang"].n_rows
    assert rows["events.event_type"].n_rows == rows["events.day"].n_rows


# ---------------------------------------------------------------------------
# fn-window-suite
# ---------------------------------------------------------------------------


def test_window_suite_pinned_values(spark, sf_dir):
    """Analytic pins over the literal grid (grp 1: x = 10,10,20,30,30,30):
    rank gaps, dense packing, percent_rank/cume_dist rationals, ntile
    splits, navigation defaults and nth_value."""
    rows = {
        (r.grp, r.id): r
        for r in QUERIES["fn-window-suite"](spark, sf_dir).collect()
    }
    assert len(rows) == 10
    g1 = [rows[(1, i)] for i in range(1, 7)]
    # ranks over x=10,10,20,30,30,30
    assert [r.rnk for r in g1] == [1, 1, 3, 4, 4, 4]
    assert [r.drnk for r in g1] == [1, 1, 2, 3, 3, 3]
    assert [r.rn for r in g1] == [1, 2, 3, 4, 5, 6]
    assert [r.pct_rank for r in g1] == [0.0, 0.0, 2 / 5, 3 / 5, 3 / 5, 3 / 5]
    assert [r.cume for r in g1] == [2 / 6, 2 / 6, 3 / 6, 1.0, 1.0, 1.0]
    assert [r.tile3 for r in g1] == [1, 1, 2, 2, 3, 3]
    assert [r.lag_x for r in g1] == [-1, 10, 10, 20, 30, 30]
    assert [r.lead_x for r in g1] == [10, 20, 30, 30, 30, -1]
    assert all(r.first_x == 10 and r.last_x == 30 and r.nth2_x == 10 for r in g1)
    g2 = [rows[(2, i)] for i in range(1, 5)]
    assert [r.rnk for r in g2] == [1, 2, 2, 4]
    assert [r.drnk for r in g2] == [1, 2, 2, 3]
    assert [r.cume for r in g2] == [1 / 4, 3 / 4, 3 / 4, 1.0]
    assert all(r.first_x == 5 and r.last_x == 9 and r.nth2_x == 7 for r in g2)
