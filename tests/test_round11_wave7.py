"""Semantic tests for the round-11 wave-7 operators: the generalized
exact ntile(k) (revenue concentration), the MinHash-precision evaluation
harness, and integer-exact Flesch readability."""

from __future__ import annotations

import re
from collections import defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# analytics-revenue-concentration: deciles == plain-Python ntile(10)
# ---------------------------------------------------------------------------

def ntile_ref(n: int, rank: int, k: int) -> int:
    """ntile positional formula, 1-indexed rank."""
    q, r = divmod(n, k)
    if rank <= r * (q + 1):
        return -(-rank // (q + 1))
    return r + -(-(rank - r * (q + 1)) // q)


def test_revenue_concentration_matches_python_ntile(spark, sf_dir):
    """Per-decile counts and exact-cent revenue must equal a plain
    sorted-list ntile(10) recomputation; shares must divide the exact
    doubles; the Lorenz curve must be monotone and end at 1.0."""
    rows = sorted(
        QUERIES["analytics-revenue-concentration"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    spend: dict[int, Decimal] = defaultdict(Decimal)
    for r in orders:
        spend[r["o_custkey"]] += Decimal(str(r["o_totalprice"]))
    ordered = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ordered)
    by_decile: dict[int, list[Decimal]] = defaultdict(list)
    for i, (_, s) in enumerate(ordered):
        by_decile[ntile_ref(n, i + 1, 10)].append(s)
    total = sum(spend.values())
    assert [r["decile"] for r in rows] == sorted(by_decile)
    cum = Decimal(0)
    for r in rows:
        vals = by_decile[r["decile"]]
        cum += sum(vals)
        assert r["n_customers"] == len(vals)
        assert Decimal(str(r["revenue"])) == sum(vals).quantize(Decimal("0.01"))
        assert r["share"] == float(sum(vals).quantize(Decimal("0.01"))) / float(
            total.quantize(Decimal("0.01"))
        )
        assert r["cum_share"] == float(cum.quantize(Decimal("0.01"))) / float(
            total.quantize(Decimal("0.01"))
        )
    assert sum(r["n_customers"] for r in rows) == n
    assert rows[-1]["cum_share"] == 1.0
    assert all(a["cum_share"] < b["cum_share"] for a, b in zip(rows, rows[1:]))
    # concentration: the top decile must out-earn the bottom decile
    assert rows[0]["revenue"] > rows[-1]["revenue"]


def test_generalized_ntile_matches_window_ntile(spark, sf_dir):
    """_exact_ntile_scalable(k) must be bit-identical to the ntile(k)
    window for a k the RFM parity test does not cover (k=10), including
    tie-heavy metrics (frequency)."""
    from pyspark.sql.window import Window

    from merl_etl_spark.operators.analytics import _exact_ntile_scalable

    orders = load_table(spark, sf_dir, "orders")
    freq = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("frequency")
    )
    got = {
        r["custkey"]: r["ntile_frequency"]
        for r in _exact_ntile_scalable(freq, "frequency", 10).collect()
    }
    w = Window.orderBy(F.desc("frequency"), F.asc("custkey"))
    ref = {
        r["custkey"]: r["nt"]
        for r in freq.withColumn("nt", F.ntile(10).over(w)).collect()
    }
    assert got == ref and got


# ---------------------------------------------------------------------------
# dedup-lsh-precision-eval: consistency with the registered dedup tier
# ---------------------------------------------------------------------------

def test_lsh_precision_eval_consistent_with_dedup_tier(spark, sf_dir):
    """The evaluation row must agree with the engine's own registered
    candidate and verify queries: n_candidates == |dedup-minhash-lsh|,
    n_scored == |dedup-ngram-jaccard| (pairs with >=1 shared shingle),
    n_true == those with jaccard >= 0.5, and the ppm fields are the
    integer floor ratios."""
    row = QUERIES["dedup-lsh-precision-eval"](spark, sf_dir).collect()[0]
    n_cand = QUERIES["dedup-minhash-lsh"](spark, sf_dir).count()
    jac = QUERIES["dedup-ngram-jaccard"](spark, sf_dir).collect()
    assert row["n_candidates"] == n_cand > 0
    assert row["n_scored"] == len(jac)
    # c/(2c) and every other borderline division is exact in IEEE, so a
    # float >= 0.5 compare is safe for the cross-check
    assert row["n_true"] == sum(1 for r in jac if r["jaccard"] >= 0.5)
    assert row["precision_ppm"] == row["n_true"] * 1_000_000 // n_cand
    assert row["noise_ppm"] == (n_cand - row["n_scored"]) * 1_000_000 // n_cand


# ---------------------------------------------------------------------------
# text-readability: Python re-based reference
# ---------------------------------------------------------------------------

def test_readability_matches_python_reference(spark, sf_dir):
    """Recompute words/sentences/vowel-cluster syllables and the
    milli-point Flesch formula with Python re and integer floor
    divisions; every row and band must match exactly."""
    rows = QUERIES["text-readability"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .collect()
    }
    assert {r["doc_id"] for r in rows} == set(docs)
    for r in rows:
        t = docs[r["doc_id"]]
        words = len(t.split(" "))
        sents = max(len(re.findall(r"[.!?]+", t)), 1)
        syll = max(len(re.findall(r"[aeiouy]+", t.lower())), 1)
        wps = words * 1000 // sents
        spw = syll * 1000 // words
        score = 206835 - (1015 * wps) // 1000 - (84600 * spw) // 1000
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            words,
            sents,
            syll,
        )
        assert (r["wps_milli"], r["spw_milli"], r["score_milli"]) == (
            wps,
            spw,
            score,
        )
        band = (
            "very-easy"
            if score >= 90000
            else "standard"
            if score >= 60000
            else "difficult"
            if score >= 30000
            else "very-difficult"
        )
        assert r["band"] == band
