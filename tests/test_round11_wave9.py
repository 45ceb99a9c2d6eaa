"""Semantic tests for the round-11 wave-9 operators: the split-leakage
contamination audit and the per-source dedup-impact report — each
cross-checked against the registered queries they compose plus an
independent Python recomputation."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# dq-split-leakage: Python set reference + consistency with the split op
# ---------------------------------------------------------------------------

def test_split_leakage_matches_python_reference(spark, sf_dir):
    """Recompute split assignment (md5 bucket) and normalized-content
    keys in Python; the leakage row must match the set computation
    exactly, and the per-split doc totals must agree with the
    registered sample-hash-split rollup."""
    import hashlib
    import re

    row = QUERIES["dq-split-leakage"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    train_keys: dict[str, int] = defaultdict(int)
    test_keys: dict[str, int] = defaultdict(int)
    for r in docs:
        t = r["text"]
        bucket = int(hashlib.md5((t + "|split-seed").encode()).hexdigest()[:8], 16) % 100
        # the explicit NORM_HASH whitespace class (not \s — engine \s
        # definitions differ; dedup.py NORM_HASH_DUCK)
        norm = re.sub(r"[ \t\n\r\f\x0b]+", " ", t.lower()).strip()
        key = hashlib.md5(norm.encode()).hexdigest()
        (train_keys if bucket < 90 else test_keys)[key] += 1
    n_train = sum(train_keys.values())
    n_test = sum(test_keys.values())
    leaked_keys = set(train_keys) & set(test_keys)
    leaked_test_docs = sum(test_keys[k] for k in leaked_keys)
    assert (row["n_train_docs"], row["n_test_docs"]) == (n_train, n_test)
    assert (row["n_train_keys"], row["n_test_keys"]) == (
        len(train_keys),
        len(test_keys),
    )
    assert row["n_leaked_keys"] == len(leaked_keys)
    assert row["n_leaked_test_docs"] == leaked_test_docs
    assert row["leak_ppm"] == leaked_test_docs * 1_000_000 // n_test
    # consistency with the registered split op: same doc totals
    split_rows = QUERIES["sample-hash-split"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in split_rows if r["split"] == "train") == n_train
    assert sum(r["n_docs"] for r in split_rows if r["split"] == "test") == n_test


# ---------------------------------------------------------------------------
# curate-dedup-impact: consistency with the canonical-keep ledger
# ---------------------------------------------------------------------------

def test_dedup_impact_consistent_with_canonical_ledger(spark, sf_dir):
    """Every per-source count must equal the direct rollup of the
    registered curate-canonical-keep ledger joined with per-doc token
    counts — kept docs here ARE the ledger's 'keep' rows."""
    rows = {r["source"]: r for r in QUERIES["curate-dedup-impact"](spark, sf_dir).collect()}
    ledger = QUERIES["curate-canonical-keep"](spark, sf_dir).collect()
    tokens = {
        r["doc_id"]: r["n_tokens"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .collect()
    }
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for r in ledger:
        a = agg[r["source"]]
        a[0] += 1
        a[2] += tokens[r["doc_id"]]
        if r["action"] == "keep":
            a[1] += 1
            a[3] += tokens[r["doc_id"]]
    assert set(rows) == set(agg)
    for src, (n_docs, n_kept, tok, tok_kept) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["n_kept"]) == (n_docs, n_kept)
        assert (r["tokens_total"], r["tokens_kept"]) == (tok, tok_kept)
        assert r["doc_retention_ppm"] == n_kept * 1_000_000 // n_docs
        assert r["token_retention_ppm"] == tok_kept * 1_000_000 // tok
        assert r["n_kept"] <= r["n_docs"] and r["tokens_kept"] <= r["tokens_total"]
