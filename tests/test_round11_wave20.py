"""Semantic tests for the round-11 wave-20 operators: exact-moment
Pearson correlation and kNN degree assortativity."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _pearson_from_moments(pairs):
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    vx = sxx / n - (sx / n) * (sx / n)
    vy = syy / n - (sy / n) * (sy / n)
    if vx <= 0 or vy <= 0:
        return None
    return (sxy / n - (sx / n) * (sy / n)) / math.sqrt(vx * vy)


# ---------------------------------------------------------------------------
# agg-corr-exact
# ---------------------------------------------------------------------------


def test_corr_exact_matches_python_moments(spark, sf_dir):
    rows = QUERIES["agg-corr-exact"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", F.size(F.split("text", " ")).alias("y")
    ).collect()
    per: dict = defaultdict(list)
    for d in docs:
        if d.source is not None:
            per[d.source].append((d.n_chars, d.y))
    for r in rows:
        expected = _pearson_from_moments(per[r.source])
        assert r.n_docs == len(per[r.source])
        assert r.corr_chars_tokens == round(expected, 6), r.source
        # chars and whitespace tokens are near-linearly related in prose
        assert r.corr_chars_tokens > 0.9


def test_corr_exact_constant_column_yields_null(spark):
    """A constant metric has zero variance — the shared formula's guard
    must emit NULL, not NaN (Spark) or an error (DuckDB)."""
    df = spark.createDataFrame(
        [("s", 5, 1), ("s", 5, 2), ("s", 5, 3)], "source string, x long, y long"
    )
    from merl_etl_spark.operators.aggregates import corr_from_moments

    m = df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    corr = corr_from_moments("n_docs", "sx", "sy", "sxx", "syy", "sxy")
    out = m.selectExpr(f"{corr} AS c").collect()
    assert out[0].c is None


# ---------------------------------------------------------------------------
# graph-assortativity
# ---------------------------------------------------------------------------


def test_assortativity_matches_python_replay(spark, sf_dir):
    knn = QUERIES["sim-knn-graph"](spark, sf_dir).collect()
    und = set()
    for e in knn:
        und.add((e.src, e.dst))
        und.add((e.dst, e.src))
    deg: dict = defaultdict(int)
    for u, _ in und:
        deg[u] += 1
    pairs = [(deg[u], deg[v]) for u, v in und]
    expected = _pearson_from_moments(pairs)
    row = QUERIES["graph-assortativity"](spark, sf_dir).collect()[0]
    assert row.n_edges == len(und)
    assert row.n_nodes == len(deg)
    assert (row.min_deg, row.max_deg) == (min(deg.values()), max(deg.values()))
    assert row.assortativity == round(expected, 6)
    assert -1.0 <= row.assortativity <= 1.0
