"""Semantic tests for the round-12 wave-9 operators: the LSH banding
S-curve table and tokenizer fertility."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()

BPE_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")


# ---------------------------------------------------------------------------
# dedup-lsh-curve
# ---------------------------------------------------------------------------


def test_lsh_curve_matches_closed_form(spark, sf_dir):
    from merl_etl_spark.operators.dedup import LSH_CURVE_CONFIGS, LSH_CURVE_GRID

    rows = {
        (r.rows_per_band, r.n_bands, r.jaccard_pct): r
        for r in QUERIES["dedup-lsh-curve"](spark, sf_dir).collect()
    }
    assert set(rows) == {
        (r, b, s) for r, b in LSH_CURVE_CONFIGS for s in LSH_CURVE_GRID
    }
    for (r, b, s), row in rows.items():
        inner = round((s / 100.0) ** r, 9)
        expect = round(1 - (1 - inner) ** b, 6)
        assert row.p_candidate == expect
        assert row.n_hashes == r * b


def test_lsh_curve_is_monotone_and_sharpens(spark, sf_dir):
    """Structural truths of the S-curve: P rises with similarity for a
    fixed config; more rows-per-band pushes the threshold RIGHT (lower
    P at low similarity) for fixed hash budget."""
    rows = QUERIES["dedup-lsh-curve"](spark, sf_dir).collect()
    by_cfg = defaultdict(dict)
    for r in rows:
        by_cfg[(r.rows_per_band, r.n_bands)][r.jaccard_pct] = r.p_candidate
    for cfg, curve in by_cfg.items():
        pts = [curve[s] for s in sorted(curve)]
        assert all(a <= b + 1e-9 for a, b in zip(pts, pts[1:])), cfg
        assert pts[0] < 0.5 < pts[-1] or pts[0] < pts[-1]  # it really moves
    # same 16-hash budget: r=2,b=8 catches 30%-similar pairs far more
    # often than r=4,b=4 (threshold moved right)
    assert by_cfg[(2, 8)][30] > by_cfg[(4, 4)][30]


def test_deployed_config_is_tabulated(spark, sf_dir):
    from merl_etl_spark.operators.dedup import N_BANDS

    rows = QUERIES["dedup-lsh-curve"](spark, sf_dir).collect()
    assert any(r.rows_per_band == 2 and r.n_bands == N_BANDS for r in rows)


# ---------------------------------------------------------------------------
# text-tokenizer-fertility
# ---------------------------------------------------------------------------


def test_fertility_matches_python_replay(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(
            F.col("text").isNotNull()
            & F.col("lang").isNotNull()
            & F.col("source").isNotNull()
        )
        .select("lang", "source", "text")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        a = agg[(r.lang, r.source)]
        a[0] += 1
        a[1] += len(r.text.split(" "))
        a[2] += len(BPE_RE.findall(r.text))
        a[3] += len(r.text)
    rows = {
        (r.lang, r.source): r
        for r in QUERIES["text-tokenizer-fertility"](spark, sf_dir).collect()
    }
    assert set(rows) == set(agg)
    for k, (n, ws, re_n, ch) in agg.items():
        r = rows[k]
        assert r.n_docs == n
        assert r.n_ws_tokens == ws
        assert r.n_re_tokens == re_n
        assert r.fertility_milli == re_n * 1000 // ws
        assert r.chars_per_token_milli == ch * 1000 // re_n


def test_fertility_consistent_with_text_tokens(spark, sf_dir):
    """Cross-query pin: the rollup's global token masses must equal the
    per-doc text-tokens surface summed over the same population."""
    per_doc = QUERIES["text-tokens"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    joined = per_doc.join(docs, "doc_id").where(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("source").isNotNull()
    )
    tot = joined.agg(
        F.sum("n_ws_tokens").alias("ws"), F.sum("n_re_tokens").alias("re")
    ).collect()[0]
    rows = QUERIES["text-tokenizer-fertility"](spark, sf_dir).collect()
    assert sum(r.n_ws_tokens for r in rows) == tot.ws
    assert sum(r.n_re_tokens for r in rows) == tot.re
