"""dedup-clusters must equal a driver-side union-find over the same pair
list: identical components, cluster ids = component minimum, exactly one
keeper per cluster."""

from __future__ import annotations

from merl_etl_spark.registry import QUERIES, load_all

load_all()


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


def test_lsh_degenerate_bucket_is_capped(spark):
    """5k identical docs land in ONE bucket per band; uncapped pair
    expansion would build 5000·4999/2 ≈ 12.5M pairs.  The capped path must
    emit exactly the 4999 star edges (min doc → every other doc) — linear
    output that still spans one connected component."""
    from merl_etl_spark.operators.dedup import connected_components, minhash_lsh_pairs

    n = 5000
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        "'the same boilerplate sentence repeated across the whole corpus' AS text",
    )
    pairs = minhash_lsh_pairs(docs, max_bucket=1024).cache()
    rows = pairs.collect()
    assert len(rows) == n - 1
    assert all(r.doc_a == 0 and r.doc_b > 0 for r in rows)
    assert {r.doc_b for r in rows} == set(range(1, n))
    # the star spans one component with keeper 0, same as full expansion
    comp = connected_components(pairs)
    assert comp.select("cluster_id").distinct().collect()[0].cluster_id == 0
    assert comp.count() == n
    pairs.unpersist()


def test_lsh_capped_matches_uncapped_on_mixed_corpus(spark):
    """On a corpus whose buckets all fit under the cap, the capped operator
    must be pair-for-pair identical to the uncapped expansion."""
    from merl_etl_spark.operators.dedup import minhash_lsh_pairs

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "completely different words appear in this one document here",
        "alpha beta gamma delta epsilon zeta eta theta",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    capped = sorted(map(tuple, minhash_lsh_pairs(docs, max_bucket=1024).collect()))
    uncapped = sorted(map(tuple, minhash_lsh_pairs(docs, max_bucket=10**9).collect()))
    assert capped == uncapped and len(capped) >= 2


def test_clusters_match_union_find(spark, sf_dir):
    pair_rows = QUERIES["dedup-minhash-lsh"](spark, sf_dir).collect()
    pairs = [(r.doc_a, r.doc_b) for r in pair_rows]
    expected = _union_find(pairs)

    got = {r.doc_id: r.cluster_id for r in QUERIES["dedup-clusters"](spark, sf_dir).collect()}
    assert got == expected

    # exactly one keeper per cluster, and it's the minimum member
    rows = QUERIES["dedup-clusters"](spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) == 1 and keepers[0].doc_id == cid == min(m.doc_id for m in members)


def test_fixture_component_sizes_stay_oracle_tractable(spark, sf_dir):
    """The DuckDB dedup-clusters oracle materializes a (node, root) row
    per connected node pair — O(sum of component size squared) (ADVICE
    r4).  That is fine while fixture components stay small; this guard
    makes a future degenerate fixture (one giant near-identical cluster)
    fail HERE with a named cause instead of hanging the oracle."""
    from pyspark.sql import functions as F

    from merl_etl_spark.registry import QUERIES

    comp = QUERIES["dedup-clusters"](spark, sf_dir)
    biggest = (
        comp.groupBy("cluster_id").count().agg(F.max("count")).first()[0]
    )
    assert biggest is not None and biggest <= 64, (
        f"largest near-dup component is {biggest} docs — the recursive "
        f"DuckDB oracle is quadratic in this; regenerate fixtures or "
        f"switch the oracle strategy before it grows further"
    )


def test_paragraph_dedup_first_occurrence_wins(spark, sf_dir):
    """dedup-paragraph: every document keeps at most its own segment
    count, at least one fixture document actually loses a duplicated
    segment (the operator is non-trivial on this corpus), and the
    lowest-doc_id occurrence of any shared segment is never the one
    dropped — doc 0's segments are all firsts in (doc_id, seg_idx)
    order unless an earlier segment of doc 0 itself duplicates them."""
    from merl_etl_spark.registry import QUERIES

    rows = {r.doc_id: r for r in QUERIES["dedup-paragraph"](spark, sf_dir).collect()}
    assert all(0 <= r.n_kept <= r.n_segs for r in rows.values())
    assert any(r.n_kept < r.n_segs for r in rows.values())
    assert sum(r.n_kept for r in rows.values()) < sum(r.n_segs for r in rows.values())
