"""Semantic tests for the round-13 wave-1 operators: the Zipf
rank-frequency fit and the Q11-style value-concentration table.

Both replays recompute the full result in plain Python (Decimal money /
float OLS), not just row counts — the wave-gate rule since r11."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from merl_etl_spark.operators.text_analysis import ZIPF_RANKS
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _rq(x: float, places: str = "0.000001") -> Decimal:
    """Half-away-from-zero quantize (engine round(); Python round() is
    banker's)."""
    return Decimal(repr(float(x))).quantize(Decimal(places), rounding=ROUND_HALF_UP)


# ---------------------------------------------------------------------------
# text-zipf-fit
# ---------------------------------------------------------------------------


def _zipf_replay(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", "text")
        .collect()
    )
    counts: dict[str, Counter] = defaultdict(Counter)
    for r in docs:
        counts[r.source].update(w for w in r.text.split(" ") if w != "")
    out = {}
    for source, ctr in counts.items():
        ranked = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_RANKS]
        n = len(ranked)
        if n < 10:
            continue
        sx = sy = sxy = sxx = syy = Decimal(0)
        for i, (_, c) in enumerate(ranked):
            x = _rq(math.log(i + 1))
            y = _rq(math.log(c))
            sx += x
            sy += y
            sxy += _rq(float(x) * float(y))
            sxx += _rq(float(x) * float(x))
            syy += _rq(float(y) * float(y))
        fn, fsx, fsy = float(n), float(sx), float(sy)
        fsxy, fsxx, fsyy = float(sxy), float(sxx), float(syy)
        den = fn * fsxx - fsx * fsx
        slope = (fn * fsxy - fsx * fsy) / den
        y_var = fn * fsyy - fsy * fsy  # exactly 0 when all counts tie
        out[source] = {
            "n_ranks": n,
            "zipf_exponent": float(_rq(slope * -1)),
            "log_scale": float(_rq((fsy * fsxx - fsx * fsxy) / den)),
            "r2": (
                None
                if y_var <= 0
                else float(
                    _rq(
                        ((fn * fsxy - fsx * fsy) * (fn * fsxy - fsx * fsy))
                        / (den * y_var)
                    )
                )
            ),
        }
    return out


def test_zipf_fit_matches_python_replay(spark, sf_dir):
    exp = _zipf_replay(spark, sf_dir)
    got = {r.source: r for r in QUERIES["text-zipf-fit"](spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for source, e in exp.items():
        r = got[source]
        assert r.n_ranks == e["n_ranks"], source
        assert r.zipf_exponent == e["zipf_exponent"], source
        assert r.log_scale == e["log_scale"], source
        assert r.r2 == e["r2"], source


def test_zipf_fit_shape_on_fixture(spark, sf_dir):
    """Semantics on the fixture: counts fall with rank (positive
    exponent), r² is a valid fraction, and the intercept is positive
    (counts at rank 1 are > 1).  The fixture corpus is a ~31-word
    synthetic near-uniform vocabulary, so its r² is legitimately LOW —
    exactly the template-spam signature this diagnostic exists to flag;
    the analytic power-law pin below is where the fit quality itself is
    asserted."""
    rows = QUERIES["text-zipf-fit"](spark, sf_dir).collect()
    assert rows, "no sources fitted"
    for r in rows:
        assert r.n_ranks >= 10
        assert 0.0 < r.zipf_exponent < 3.0, r
        assert 0.0 < r.r2 <= 1.0, r
        assert r.log_scale > 0.0, r


def test_zipf_fit_exact_on_synthetic_power_law(spark):
    """A constructed corpus with counts EXACTLY proportional to 1/rank
    must recover slope -1 (exponent 1) with r² = 1 — the analytic pin
    that survives any fixture change.  Uses counts c_r = K/r with K
    divisible by every rank so all counts are integers."""
    from merl_etl_spark.operators.text_analysis import text_zipf_fit

    K = 27720  # lcm(1..12) -> exact integer counts for ranks 1..12
    words = []
    for rank in range(1, 13):
        words.extend([f"w{rank:02d}"] * (K // rank))
    # one giant doc; the operator tokenizes on single spaces
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(1, " ".join(words), "synthetic", "en")],
            "doc_id long, text string, source string, lang string",
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        rows = text_zipf_fit(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_ranks == 12
    # ln(K/r) = ln K - 1·ln r exactly; the 6-dp freezes keep the OLS
    # within a few 1e-6 of the analytic line
    assert abs(r.zipf_exponent - 1.0) < 1e-4, r
    assert r.r2 > 0.999999, r


# ---------------------------------------------------------------------------
# analytics-important-stock
# ---------------------------------------------------------------------------


def _stock_replay(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey", "l_extendedprice", "l_discount")
        .collect()
    )
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    val: dict[tuple, list] = defaultdict(lambda: [0, Decimal(0)])
    for r in li:
        nation = nat[sup[r.l_suppkey]]
        v = val[(nation, r.l_partkey)]
        v[0] += 1
        v[1] += Decimal(f"{r.l_extendedprice:.6f}") * (
            1 - Decimal(f"{r.l_discount:.6f}")
        )
    tot: dict[str, list] = defaultdict(lambda: [Decimal(0), 0])
    for (nation, _), (_, v) in val.items():
        tot[nation][0] += v
        tot[nation][1] += 1
    out = {}
    for (nation, partkey), (n_lines, v) in val.items():
        nation_val, n_parts = tot[nation]
        share = math.floor(float(v) * 1_000_000 / float(nation_val))
        cutoff = 2 * (1_000_000 // n_parts)
        if share >= cutoff:
            # decimal-grain 2-dp round (the operator rounds IN decimal)
            v2 = float(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
            out[(nation, partkey)] = (n_lines, v2, share, cutoff)
    return out


def test_important_stock_matches_decimal_replay(spark, sf_dir):
    exp = _stock_replay(spark, sf_dir)
    got = {
        (r.nation, r.partkey): r
        for r in QUERIES["analytics-important-stock"](spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for key, (n_lines, value, share, cutoff) in exp.items():
        r = got[key]
        assert r.n_lines == n_lines, key
        assert r.part_value == value, key
        assert r.share_ppm == share, key
        assert r.cutoff_ppm == cutoff, key


def test_important_stock_threshold_semantics(spark, sf_dir):
    """Every kept part's share clears twice the uniform share for its
    nation, and at least one nation filters something out (the HAVING
    actually bites on fixture data)."""
    rows = QUERIES["analytics-important-stock"](spark, sf_dir).collect()
    assert rows
    by_nation = defaultdict(list)
    for r in rows:
        assert r.share_ppm >= r.cutoff_ppm
        by_nation[r.nation].append(r)
    # kept parts per nation must be a strict subset: shares of kept
    # parts sum to < 1e6 ppm when anything was dropped
    assert any(
        sum(r.share_ppm for r in parts) < 1_000_000
        for parts in by_nation.values()
    ), "threshold never filtered anything — cutoff too low for fixture"


def test_zipf_fit_degenerate_all_tied_counts_reports_null_r2(spark):
    """A source whose top terms ALL have equal counts has zero y-variance
    — the r2 guard must emit NULL identically in both engines (Spark's
    non-ANSI 0/0 is NULL, DuckDB's is NaN — the shared CASE removes the
    divergence).  Twelve distinct words, one occurrence each."""
    import tempfile

    from merl_etl_spark.operators.text_analysis import text_zipf_fit

    text = " ".join(f"w{i:02d}" for i in range(12))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(1, text, "flat", "en")],
            "doc_id long, text string, source string, lang string",
        ).write.parquet(f"{tmp}/documents.parquet")
        rows = text_zipf_fit(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_ranks == 12
    assert r.r2 is None
    assert r.zipf_exponent == 0.0  # flat counts: slope exactly 0
