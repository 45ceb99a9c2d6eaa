"""Embedding-tier LSH bucket cap (VERDICT r5 "What's wrong" #1): a corpus
whose vectors collapse into one sign-bucket (all-positive embeddings —
the ReLU-encoder worst case) must emit O(n) star edges, not |bucket|²/2
pairs; and on corpora whose buckets fit under the cap the capped operator
must be pair-for-pair identical to unbounded expansion."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.operators.similarity import (
    embedding_cosine_pairs,
    lsh_bucketed_pairs,
)
from merl_etl_spark.sources.tables import load_table

N_DEGEN = 2000
DIM = 32


def _degenerate_corpus(spark):
    """N_DEGEN near-identical all-positive vectors: every sign bit is 1 in
    every table, so the whole corpus lands in ONE bucket per table and
    every pair has cosine ≈ 1."""
    base = ", ".join(f"{0.5 + 0.001 * (i % 7):.4f}D" for i in range(DIM))
    return spark.range(N_DEGEN).selectExpr(
        "id AS vec_id", f"array({base}) AS embedding"
    )


def test_single_table_degenerate_bucket_is_capped(spark):
    emb = _degenerate_corpus(spark)
    rows = lsh_bucketed_pairs(emb, max_bucket=256).collect()
    # uncapped expansion would be N_DEGEN·(N_DEGEN−1)/2 ≈ 2M pairs
    assert len(rows) == N_DEGEN - 1
    assert all(r.vec_a == 0 and r.vec_b > 0 for r in rows)
    assert {r.vec_b for r in rows} == set(range(1, N_DEGEN))
    assert all(r.cos_sim >= 0.99 for r in rows)


def test_multi_table_degenerate_bucket_is_capped(spark):
    emb = _degenerate_corpus(spark)
    rows = embedding_cosine_pairs(emb, max_bucket=256).collect()
    # all 4 tables emit the SAME star (bucket-min = global min vec_id);
    # the cross-table distinct collapses them to n−1 pairs total
    assert len(rows) == N_DEGEN - 1
    assert all(r.vec_a == 0 and r.vec_b > 0 for r in rows)
    assert {r.vec_b for r in rows} == set(range(1, N_DEGEN))


def test_capped_matches_uncapped_on_fixture(spark, sf_dir):
    """No fixture bucket approaches LSH_MAX_BUCKET (max 8 per table at
    sf0.01), so the capped operators must equal unbounded expansion —
    this is what keeps the DuckDB oracles (which expand unconditionally)
    valid evidence for the capped production path."""
    emb = load_table(spark, sf_dir, "embeddings")

    def canon(df):
        return sorted(
            (r.vec_a, r.vec_b, round(r.cos_sim, 9)) for r in df.collect()
        )

    assert canon(lsh_bucketed_pairs(emb)) == canon(
        lsh_bucketed_pairs(emb, max_bucket=10**9)
    )
    assert canon(embedding_cosine_pairs(emb)) == canon(
        embedding_cosine_pairs(emb, max_bucket=10**9)
    )


def test_star_edges_preserve_components(spark):
    """Star edges must span the same connected component as full expansion:
    one cluster, keeper = min vec_id (the property downstream
    dedup-clusters relies on)."""
    from merl_etl_spark.operators.dedup import connected_components

    emb = _degenerate_corpus(spark)
    pairs = lsh_bucketed_pairs(emb, max_bucket=256).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = connected_components(pairs)
    assert comp.select("cluster_id").distinct().collect()[0].cluster_id == 0
    assert comp.count() == N_DEGEN
