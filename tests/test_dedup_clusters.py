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
