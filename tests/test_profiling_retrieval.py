"""Profiling / layout / retrieval tier: beyond the oracle match (covered
by test_queries_vs_oracle), pin the properties that make these operators
worth running — the Z-order bounding boxes must actually be tight (the
pruning payoff), the profiler must see every row, and the ranking plans
must compile to their bounded physical forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _plan(spark, name, sf_dir) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_zorder_buckets_are_tight_in_both_dims(spark, sf_dir):
    """The whole point of Z-ordering: every prefix bucket's bounding box
    spans ~1/8 of EACH dimension's global range (top 3 bits per dim), so
    a filter on either dimension prunes most buckets.  A time-ordered or
    hash layout would give full-range user spans in every bucket."""
    rows = QUERIES["layout-zorder"](spark, sf_dir).collect()
    assert len(rows) == 64
    user_span = max(r.user_hi for r in rows) - min(r.user_lo for r in rows)
    hour_span = max(r.hour_hi for r in rows) - min(r.hour_lo for r in rows)
    # 1/8 of the range + one bin of slack (range-binning floor rounding)
    for r in rows:
        assert (r.user_hi - r.user_lo) <= user_span / 8 + user_span / 64 + 1, r
        assert (r.hour_hi - r.hour_lo) <= hour_span / 8 + hour_span / 64 + 1, r


def test_zorder_covers_every_row(spark, sf_dir):
    rows = QUERIES["layout-zorder"](spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == n_events


def test_profile_columns_sees_every_row_and_null_free_keys(spark, sf_dir):
    prof = {r.col_name: r for r in QUERIES["profile-columns"](spark, sf_dir).collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert set(prof) == {"doc_id", "text", "lang", "source", "n_chars"}
    for r in prof.values():
        assert r.n_rows == n_docs
    assert prof["doc_id"].n_null == 0
    assert prof["doc_id"].n_distinct == n_docs


def test_histogram_partitions_all_values(spark, sf_dir):
    rows = QUERIES["profile-histogram"](spark, sf_dir).collect()
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    assert sum(r.n_events for r in rows) == events.count()
    assert all(0 <= r.bucket < 20 for r in rows)
    # observed per-bucket extrema must sit inside the computed bounds —
    # with float slack on BOTH edges: bucket assignment
    # (floor((v-mn)/(mx-mn)*20)) and the bound (mn + b*(mx-mn)/20) take
    # different floating-point paths, so a value at a boundary can land
    # one ulp across it; without the epsilon this test is a latent flake
    # on any fixture regeneration (review r6 finding)
    span = max(r.bucket_hi for r in rows) - min(r.bucket_lo for r in rows)
    eps = 1e-9 * max(span, 1.0)
    for r in sorted(rows, key=lambda r: r.bucket):
        assert r.bucket_lo - eps <= r.val_min <= r.val_max
        assert r.val_max <= r.bucket_hi + eps or r.bucket == 19


def test_tfidf_rank_compiles_to_window_group_limit(spark, sf_dir):
    plan = _plan(spark, "text-tfidf", sf_dir)
    assert "WindowGroupLimit" in plan


def test_bm25_topk_compiles_to_take_ordered(spark, sf_dir):
    """The final top-10 must be the distributed bounded heap, not a
    global-sort or single-partition window."""
    plan = _plan(spark, "text-bm25", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_bm25_rare_term_dominates(spark, sf_dir):
    """Sanity of the scoring itself: documents containing the rare probe
    term ('dup', df≈25/500) must outrank common-term-only documents —
    i.e. the top hit's s_dup component is positive."""
    top = QUERIES["text-bm25"](spark, sf_dir).collect()
    assert len(top) == 10
    assert top[0].s_dup > 0
    assert top[0].bm25 >= top[-1].bm25


def test_hybrid_rrf_fusion_arithmetic(spark, sf_dir):
    """RRF output must honor the fusion formula exactly: rrf equals the
    sum of 1/(60+rank) for the arms where the doc appears, and every
    output doc carries at least one rank."""
    rows = QUERIES["text-hybrid-rrf"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.r_bm25 is not None or r.r_tf is not None
        expect = (1.0 / (60 + r.r_bm25) if r.r_bm25 is not None else 0.0) + (
            1.0 / (60 + r.r_tf) if r.r_tf is not None else 0.0
        )
        assert r.rrf == expect, (r, expect)
    # descending fused order with doc_id tiebreak
    fused = [(r.rrf, r.doc_id) for r in rows]
    assert fused == sorted(fused, key=lambda p: (-p[0], p[1]))


def test_morton_expression_roundtrips():
    """The generated Morton-interleave SQL must be a true bijection:
    de-interleaving the even/odd bits of z recovers (x, y) exactly, and
    every (top-3-bits-x, top-3-bits-y) block maps to exactly one zbucket
    — executed in DuckDB (the oracle dialect) without a Spark session."""
    import random

    import duckdb

    from merl_etl_spark.operators.profiling import Z_BITS, Z_PREFIX_SHIFT, _morton

    con = duckdb.connect()
    random.seed(7)
    pts = [
        (random.randrange(1 << Z_BITS), random.randrange(1 << Z_BITS))
        for _ in range(500)
    ]
    con.execute("CREATE TABLE pts (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    rows = con.execute(
        f"SELECT x, y, ({_morton('x', 'y', 'duck')}) AS z FROM pts"
    ).fetchall()

    def deinterleave(z):
        x = y = 0
        for i in range(Z_BITS):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for x, y, z in rows:
        assert deinterleave(z) == (x, y)
        assert (z >> Z_PREFIX_SHIFT) == (
            ((_spread3(x >> (Z_BITS - 3), 0)) | (_spread3(y >> (Z_BITS - 3), 1)))
        )


def _spread3(v: int, offset: int) -> int:
    """Interleave the 3 bits of v into even (offset 0) or odd (offset 1)
    positions — the reference model for the zbucket prefix."""
    out = 0
    for i in range(3):
        out |= ((v >> i) & 1) << (2 * i + offset)
    return out
