"""Semantic tests for the round-11 wave-13 operators: the additive
series decomposition, label-propagation communities, and the
small-file compaction plan."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from merl_etl_spark.operators.graph import LPA_ROUNDS
from merl_etl_spark.operators.profiling import COMPACT_TARGET_CHARS, SHARD_COUNT
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# ts-decompose
# ---------------------------------------------------------------------------


def test_decompose_components_are_additive(spark, sf_dir):
    """trend + seasonal + residual must reconstruct the observed count
    to the per-column rounding tolerance on EVERY interior day."""
    rows = QUERIES["ts-decompose"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs((r.trend + r.seasonal + r.residual) - r.n) < 3e-6, r


def test_decompose_trend_is_the_7day_mean(spark, sf_dir):
    """Recompute the centered 7-day mean from the raw (type, day) counts
    (with zero fill) and compare — pins the gap-fill + window frame."""
    rows = QUERIES["ts-decompose"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts: dict = defaultdict(dict)
    for r in ev:
        counts[r.event_type][r.day] = r.n
    import datetime

    for row in rows:
        day = datetime.date.fromisoformat(row.day)
        c = counts[row.event_type]
        window = [
            c.get(day + datetime.timedelta(days=o), 0) for o in range(-3, 4)
        ]
        assert row.n == c.get(day, 0)
        assert row.trend == round(float(sum(window)) / 7.0, 6), row


def test_decompose_seasonal_is_dow_mean_of_detrended(spark, sf_dir):
    """The seasonal component of every interior day must equal the mean
    of (n − trend) across that (type, day-of-week) group — the defining
    property of the additive dow seasonal (and within each group the
    residuals then average to ~0)."""
    import datetime

    rows = QUERIES["ts-decompose"](spark, sf_dir).collect()
    det: dict = defaultdict(list)
    for r in rows:
        day_num = (
            datetime.date.fromisoformat(r.day) - datetime.date(1970, 1, 1)
        ).days
        det[(r.event_type, day_num % 7)].append(r.n - r.trend)
    for r in rows:
        day_num = (
            datetime.date.fromisoformat(r.day) - datetime.date(1970, 1, 1)
        ).days
        grp = det[(r.event_type, day_num % 7)]
        assert abs(r.seasonal - sum(grp) / len(grp)) < 1e-5, r


# ---------------------------------------------------------------------------
# graph-label-propagation
# ---------------------------------------------------------------------------


def test_lpa_matches_python_reference(spark, sf_dir):
    """Replay the synchronous vote rounds in Python over the query's own
    kNN edges (sim-knn-graph, the pinned substrate) and compare the
    community census exactly."""
    knn = QUERIES["sim-knn-graph"](spark, sf_dir).collect()
    und = set()
    for e in knn:
        und.add((e.src, e.dst))
        und.add((e.dst, e.src))
    nodes = sorted({u for u, _ in und})
    nbrs: dict = defaultdict(list)
    for u, v in und:
        nbrs[u].append(v)
    for u in nodes:
        nbrs[u].append(u)  # self-vote
    lab = {u: u for u in nodes}
    for _ in range(LPA_ROUNDS):
        new = {}
        for u in nodes:
            votes: dict = defaultdict(int)
            for v in nbrs[u]:
                votes[lab[v]] += 1
            new[u] = min(votes, key=lambda l: (-votes[l], l))
        lab = new
    census: dict = defaultdict(list)
    for u, l in lab.items():
        census[l].append(u)
    expected = sorted(
        (l, len(m), min(m), max(m)) for l, m in census.items()
    )
    rows = sorted(
        (r.community, r.n_nodes, r.min_node, r.max_node)
        for r in QUERIES["graph-label-propagation"](spark, sf_dir).collect()
    )
    assert rows == expected


def test_lpa_communities_conserve_nodes(spark, sf_dir):
    rows = QUERIES["graph-label-propagation"](spark, sf_dir).collect()
    knn = QUERIES["sim-knn-graph"](spark, sf_dir)
    n_nodes = (
        knn.select(F.col("src").alias("x"))
        .unionAll(knn.select(F.col("dst").alias("x")))
        .distinct()
        .count()
    )
    assert sum(r.n_nodes for r in rows) == n_nodes
    assert len(rows) > 1  # the kNN substrate must not collapse to one blob


# ---------------------------------------------------------------------------
# layout-compaction-plan
# ---------------------------------------------------------------------------


def test_compaction_plan_conserves_and_bounds_groups(spark, sf_dir):
    """Every input file lands in exactly one merge group; group byte
    mass obeys the first-fit bound (≤ target + the largest single
    file); groups are shard-contiguous within a source."""
    rows = QUERIES["layout-compaction-plan"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
    ).collect()[0]
    assert sum(r.n_docs for r in rows) == tot.n
    assert sum(r.bytes for r in rows) == tot.c
    from merl_etl_spark.operators.profiling import doc_shard_col

    max_file = (
        docs.groupBy("source", doc_shard_col().alias("shard_id"))
        .agg(F.sum("n_chars").alias("b"))
        .agg(F.max("b"))
        .collect()[0][0]
    )
    by_source: dict = defaultdict(list)
    for r in rows:
        assert 0 <= r.first_shard <= r.last_shard < SHARD_COUNT
        assert r.bytes <= COMPACT_TARGET_CHARS + max_file
        by_source[r.source].append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.merged_file)
        for a, b in zip(rs, rs[1:]):
            assert a.last_shard < b.first_shard, (src, a, b)
