"""Semantic tests for the late-round-6 operators (time-series, graph,
linkage, LM scoring) — the oracle-parity suite pins cross-engine
equality; these pin the *semantics* on hand-built frames where the
expected answer is known by construction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from merl_etl_spark.operators.graph import SCALE, pagerank
from merl_etl_spark.operators.linkage import blocked_fuzzy_pairs
from merl_etl_spark.registry import QUERIES, load_all

load_all()


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def test_pagerank_mass_and_ordering(spark):
    """On a hand graph, rank mass stays ~1 (floor-division loss only) and
    the hub out-ranks the spokes."""
    # star: hub h connected to 3 spokes (symmetric) + one isolated pair
    edges = [("h", s, 1) for s in "abc"] + [(s, "h", 1) for s in "abc"]
    edges += [("x", "y", 1), ("y", "x", 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    out = {r["node"]: r["pagerank"] for r in pagerank(df).collect()}
    assert set(out) == {"h", "a", "b", "c", "x", "y"}
    # total mass ≈ 1: each of 3 iterations × 6 nodes can lose < 2/SCALE
    assert abs(sum(out.values()) - 1.0) < 50 / SCALE
    assert out["h"] > out["a"] == out["b"] == out["c"]
    # the isolated pair exchanges rank symmetrically
    assert out["x"] == out["y"]


def test_pagerank_uniform_on_regular_graph(spark):
    """On a regular graph (cycle), PageRank is uniform — every node gets
    exactly the same fixed-point value."""
    n = 5
    cyc = [(f"n{i}", f"n{(i + 1) % n}", 1) for i in range(n)]
    cyc += [(f"n{(i + 1) % n}", f"n{i}", 1) for i in range(n)]
    out = {r["node"]: r["pagerank"] for r in pagerank(spark.createDataFrame(cyc, ["src", "dst", "w"])).collect()}
    assert len(set(out.values())) == 1


# ---------------------------------------------------------------------------
# fuzzy linkage
# ---------------------------------------------------------------------------

def test_blocked_fuzzy_pairs_blocks_and_threshold(spark):
    rows = [
        (1, "widget", "B1"),
        (2, "widgit", "B1"),   # dist 1 — match
        (3, "sprocket", "B1"),  # dist 6 from widget — no match
        (4, "widget", "B2"),   # identical name, different block — never compared
    ]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    got = blocked_fuzzy_pairs(df, "id", "name", "blk", threshold=2).collect()
    assert [(r["key_a"], r["key_b"], r["edit_dist"]) for r in got] == [(1, 2, 1)]


# ---------------------------------------------------------------------------
# ts-gap-fill semantics on a constructed series
# ---------------------------------------------------------------------------

def test_gap_fill_dense_spine_and_fill(spark, tmp_path, sf_dir):
    out = QUERIES["ts-gap-fill"](spark, sf_dir)
    # spine is dense: per type, row count == span hours + 1, no duplicate hours
    spans = (
        out.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("hour").alias("nd"),
            F.min("hour").alias("lo"),
            F.max("hour").alias("hi"),
        )
        .collect()
    )
    fmt = "%Y-%m-%d %H:%M:%S.%f"
    for r in spans:
        lo = dt.datetime.strptime(r["lo"], fmt)
        hi = dt.datetime.strptime(r["hi"], fmt)
        assert r["n"] == r["nd"] == int((hi - lo).total_seconds()) // 3600 + 1
    # gaps carry a filled value (first spine row per type is never a gap
    # because the span starts at an observed hour) and zero events
    gaps = out.filter("is_gap")
    assert gaps.filter("n_events != 0").count() == 0
    assert gaps.filter("filled_avg IS NULL").count() == 0


def test_twap_differs_from_naive_under_irregular_sampling(spark, sf_dir):
    rows = QUERIES["ts-twap"](spark, sf_dir).collect()
    assert rows  # every series produced a row
    for r in rows:
        assert r["twap"] is not None and r["n_segments"] > 0


# ---------------------------------------------------------------------------
# text-lm-score
# ---------------------------------------------------------------------------

def test_lm_score_bounds(spark, sf_dir):
    """Smoothed log-probs are strictly negative and hapax counts are
    bounded by the bigram count."""
    out = QUERIES["text-lm-score"](spark, sf_dir)
    assert out.filter("avg_logprob >= 0").count() == 0
    assert out.filter("n_hapax > n_bigrams").count() == 0
