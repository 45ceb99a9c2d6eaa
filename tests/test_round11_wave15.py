"""Semantic tests for the round-11 wave-15 operators: near-dup split
leakage, the upsample plan, and per-source n-gram novelty."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# dq-split-leakage-near
# ---------------------------------------------------------------------------


def test_near_leakage_dominates_exact_leakage(spark, sf_dir):
    """Every exact-leaked test doc (same raw text as a train doc) is by
    construction also NEAR-leaked (identical texts share every band),
    so the near count must be >= the exact normalized-content count's
    lower bound of 0 and the near rate >= the exact rate cannot be
    asserted directly (different key grains) — but the band audit must
    at least flag every test doc whose raw text equals a train doc's."""
    near = QUERIES["dq-split-leakage-near"](spark, sf_dir).collect()[0]
    from merl_etl_spark.operators.curation import split_assign_spark

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", split_assign_spark().alias("split")
    )
    texts = docs.groupBy("text").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("tr"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("te"),
    )
    exact_leaked = texts.where(
        (F.col("tr") > 0) & (F.col("te") > 0)
    ).agg(F.sum("te")).collect()[0][0] or 0
    assert near.n_near_leaked_test_docs >= exact_leaked
    assert near.n_train_docs + near.n_test_docs == docs.count()
    assert 0 <= near.near_leak_ppm <= 1_000_000


def test_near_leakage_matches_band_replay(spark, sf_dir):
    """Replay the audit from the query's own band machinery: a test doc
    is leaked iff it shares a (band_id, h) key with a train doc."""
    from merl_etl_spark.operators.curation import split_assign_spark
    from merl_etl_spark.operators.dedup import minhash_bands

    docs = load_table(spark, sf_dir, "documents")
    split = {
        r.doc_id: r.split
        for r in docs.select(
            "doc_id", split_assign_spark().alias("split")
        ).collect()
    }
    bands = minhash_bands(docs).collect()
    train_keys = {
        (b.band_id, b.h) for b in bands if split[b.doc_id] == "train"
    }
    leaked = {
        b.doc_id
        for b in bands
        if split[b.doc_id] == "test" and (b.band_id, b.h) in train_keys
    }
    row = QUERIES["dq-split-leakage-near"](spark, sf_dir).collect()[0]
    assert row.n_near_leaked_test_docs == len(leaked)


# ---------------------------------------------------------------------------
# curate-upsample-plan
# ---------------------------------------------------------------------------


def test_upsample_plan_reaches_target_within_one_doc_per_million(spark, sf_dir):
    rows = QUERIES["curate-upsample-plan"](spark, sf_dir).collect()
    target = max(r.n_docs for r in rows)
    for r in rows:
        assert r.target == target
        assert r.up_factor_ppm == target * 1_000_000 // r.n_docs
        # floor-quotient plan lands within one source pass of the target
        assert target - r.n_docs < r.planned_docs <= target
        assert r.full_epochs == r.up_factor_ppm // 1_000_000
        assert r.partial_epoch_ppm == r.up_factor_ppm % 1_000_000
    majority = [r for r in rows if r.n_docs == target]
    assert all(r.up_factor_ppm == 1_000_000 for r in majority)


# ---------------------------------------------------------------------------
# text-ngram-novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_set_replay(spark, sf_dir):
    """Replay with Python sets over the raw shingles: per-source distinct
    shingle counts and single-source uniqueness must match exactly."""
    rows = QUERIES["text-ngram-novelty"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_source: dict = defaultdict(set)
    for d in docs:
        if d.source is None:
            continue
        w = d.text.split(" ")
        for i in range(max(len(w) - 2, 0)):
            per_source[d.source].add(" ".join(w[i : i + 3]))
    owners: dict = defaultdict(int)
    for src, shs in per_source.items():
        for s in shs:
            owners[s] += 1
    assert {r.source for r in rows} == set(per_source)
    for r in rows:
        shs = per_source[r.source]
        uniq = sum(1 for s in shs if owners[s] == 1)
        assert r.n_shingles == len(shs)
        assert r.n_unique == uniq
        assert r.novelty_ppm == uniq * 1_000_000 // len(shs)
