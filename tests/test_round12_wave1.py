"""Semantic tests for the round-12 wave-1 operators: clustering-
coefficient census, exact kurtosis, deterministic reservoir sampling.
Each op is replayed in plain Python/numpy from the raw fixture rows and
compared value-for-value — the parity tier beyond the DuckDB hash sweep
(two SQL engines can share a wrong formula; a from-scratch replay can't).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# graph-clustering-coefficient
# ---------------------------------------------------------------------------


def _knn_und_edges(spark, sf_dir):
    """The pinned undirected kNN edge set, via the production builder."""
    from merl_etl_spark.operators.similarity import knn_edges

    knn = knn_edges(load_table(spark, sf_dir, "embeddings")).select("src", "dst")
    edges = set()
    for r in knn.collect():
        edges.add((r.src, r.dst))
        edges.add((r.dst, r.src))
    return edges


def test_clustering_coefficient_matches_python_replay(spark, sf_dir):
    edges = _knn_und_edges(spark, sf_dir)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    tri = {}
    for u, nbrs in adj.items():
        ns = sorted(nbrs)
        t = 0
        for i, p in enumerate(ns):
            for q in ns[i + 1 :]:
                if (p, q) in edges:
                    t += 1
        tri[u] = t
    by_deg = defaultdict(lambda: [0, 0])  # deg -> [n_nodes, sum_tri]
    for u, nbrs in adj.items():
        d = len(nbrs)
        by_deg[d][0] += 1
        by_deg[d][1] += tri[u]
    rows = QUERIES["graph-clustering-coefficient"](spark, sf_dir).collect()
    assert {r.deg for r in rows} == set(by_deg)
    for r in rows:
        n_nodes, sum_tri = by_deg[r.deg]
        assert r.n_nodes == n_nodes
        assert r.n_closed == sum_tri
        assert r.n_wedges == n_nodes * r.deg * (r.deg - 1) // 2
        if r.deg >= 2:
            expect = round(2.0 * sum_tri / (n_nodes * r.deg * (r.deg - 1)), 6)
            assert r.mean_cc == expect
        else:
            assert r.mean_cc is None


def test_clustering_coefficient_bounds(spark, sf_dir):
    rows = QUERIES["graph-clustering-coefficient"](spark, sf_dir).collect()
    assert rows, "kNN graph must be non-empty"
    for r in rows:
        if r.mean_cc is not None:
            assert 0.0 <= r.mean_cc <= 1.0
        assert 0 <= r.n_closed <= r.n_wedges


def test_clustering_triangle_regression(spark):
    """A hand-built graph — triangle {a,b,c} plus pendant d on a —
    driven through the PRODUCTION oriented-wedge census
    (clustering_census; review r12: the regression must exercise the
    struct(deg,id) orientation and closure chain, not a Python replica).
    Textbook answer: one triangle through each of a, b, c; none at d;
    so deg-3 node a has cc 1/3, the deg-2 nodes b,c have cc 1, and the
    pendant's degree class reports NULL."""
    from merl_etl_spark.operators.graph import clustering_census

    edges = {("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")}
    sym = sorted(edges | {(v, u) for u, v in edges})
    und = spark.createDataFrame(sym, "u string, v string")
    rows = {r.deg: r for r in clustering_census(und).collect()}
    # deg 3: node a alone — 1 closed of 3 wedges
    assert rows[3].n_nodes == 1
    assert rows[3].n_closed == 1
    assert rows[3].n_wedges == 3
    assert rows[3].mean_cc == round(1 / 3, 6)
    # deg 2: b and c — each fully closed
    assert rows[2].n_nodes == 2
    assert rows[2].n_closed == 2
    assert rows[2].n_wedges == 2
    assert rows[2].mean_cc == 1.0
    # deg 1: the pendant — no wedges, NULL cc
    assert rows[1].n_nodes == 1
    assert rows[1].n_closed == 0
    assert rows[1].n_wedges == 0
    assert rows[1].mean_cc is None
    # an inverted orientation comparison would double- or zero-count:
    # total corner credits must be 3 × (number of triangles)
    assert sum(r.n_closed for r in rows.values()) == 3


# ---------------------------------------------------------------------------
# agg-kurtosis-exact
# ---------------------------------------------------------------------------


def test_kurtosis_matches_python_moments(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select("source", "n_chars")
        .collect()
    )
    xs = defaultdict(list)
    for r in docs:
        xs[r.source].append(int(r.n_chars))
    rows = {r.source: r for r in QUERIES["agg-kurtosis-exact"](spark, sf_dir).collect()}
    assert set(rows) == set(xs)
    for src, vals in xs.items():
        n = len(vals)
        sx = sum(vals)
        sxx = sum(v * v for v in vals)
        sxxx = sum(v**3 for v in vals)
        sxxxx = sum(v**4 for v in vals)
        mean = sx / n
        m2 = sxx / n - mean * mean
        m4 = sxxxx / n - 4 * mean * (sxxx / n) + 6 * mean * mean * (sxx / n) - 3 * mean**4
        r = rows[src]
        assert r.n_docs == n
        assert r.m2 == round(m2, 6)
        if m2 > 0:
            assert r.kurtosis == round(m4 / (m2 * m2) - 3.0, 6)
        else:
            assert r.kurtosis is None


def test_kurtosis_known_distribution(spark):
    """Pure-python sanity anchor: a symmetric two-point distribution
    {-1, +1} has g2 = -2 (the minimum possible excess kurtosis)."""
    vals = [0, 2] * 50  # mean 1, deviations ±1
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum(v * v for v in vals) / n - mean * mean
    m4 = (
        sum(v**4 for v in vals) / n
        - 4 * mean * sum(v**3 for v in vals) / n
        + 6 * mean * mean * sum(v * v for v in vals) / n
        - 3 * mean**4
    )
    assert math.isclose(m4 / (m2 * m2) - 3.0, -2.0)


# ---------------------------------------------------------------------------
# sample-reservoir
# ---------------------------------------------------------------------------


def _rkey(doc_id) -> int:
    h = hashlib.md5((str(doc_id) + "|resv-seed").encode()).hexdigest()
    return int(h[:15], 16)


def test_reservoir_matches_python_replay(spark, sf_dir):
    from merl_etl_spark.operators.curation import RESERVOIR_K

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("source").isNotNull())
        .select("source", "doc_id", "n_chars")
        .collect()
    )
    per_src = defaultdict(list)
    for r in docs:
        per_src[r.source].append((_rkey(r.doc_id), r.doc_id, r.n_chars))
    expect = {}
    for src, items in per_src.items():
        items.sort()
        for slot, (_, doc_id, n_chars) in enumerate(items[:RESERVOIR_K], start=1):
            expect[(src, slot)] = (doc_id, n_chars)
    rows = QUERIES["sample-reservoir"](spark, sf_dir).collect()
    got = {(r.source, r.slot): (r.doc_id, r.n_chars) for r in rows}
    assert got == expect


def test_reservoir_is_exact_k_and_stable(spark, sf_dir):
    from merl_etl_spark.operators.curation import RESERVOIR_K

    df = QUERIES["sample-reservoir"](spark, sf_dir)
    sizes = {r.source: r.n for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_src = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select("source")
        .distinct()
        .count()
    )
    assert len(sizes) == n_src
    for src, n in sizes.items():
        assert n <= RESERVOIR_K
    # replay determinism: a second run picks the identical sample
    a = sorted((r.source, r.slot, r.doc_id) for r in df.collect())
    b = sorted(
        (r.source, r.slot, r.doc_id)
        for r in QUERIES["sample-reservoir"](spark, sf_dir).collect()
    )
    assert a == b


def test_reservoir_incremental_displacement_property(spark, sf_dir):
    """Adding documents can only displace picks by hashing LOWER: going
    from a half-corpus to the full corpus, every pick that leaves the
    reservoir must sit at or past the full reservoir's key threshold —
    survivors were beaten, never reshuffled arbitrarily."""
    from merl_etl_spark.operators.curation import RESERVOIR_K

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("source").isNotNull())
        .select("source", "doc_id")
        .collect()
    )
    per_src = defaultdict(list)
    for r in docs:
        per_src[r.source].append((_rkey(r.doc_id), str(r.doc_id)))
    src, items = max(per_src.items(), key=lambda kv: len(kv[1]))
    # the property is generic in k — scale it to the fixture stratum so
    # it bites at sf0.001 (25-doc strata) and sf0.1 alike
    k = min(RESERVOIR_K, max(2, len(items) // 4))
    assert len(items) > 2 * k, "fixture stratum too small for the property"
    # "old corpus" = an arbitrary deterministic half (by doc_id order,
    # NOT by key order — the half must be key-agnostic)
    by_id = sorted(items, key=lambda kv: kv[1])
    half = sorted(by_id[::2])
    full = sorted(items)
    old_pick = half[:k]
    new_pick = full[:k]
    new_set = {d for _, d in new_pick}
    threshold = new_pick[-1][0]
    displaced = [(rk, d) for rk, d in old_pick if d not in new_set]
    for rk, d in displaced:
        assert rk >= threshold
    assert len(new_set) == k
