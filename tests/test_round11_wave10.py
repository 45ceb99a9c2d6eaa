"""Semantic tests for the round-11 wave-10 operators: BFS hop census
and the higher-order array-function suite."""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def test_bfs_hops_match_python_bfs(spark, sf_dir):
    """Rebuild the censused edge list and run a plain deque BFS from the
    min node; the per-level census must match exactly and every level
    must be within the fixed round budget."""
    from merl_etl_spark.operators.graph import BFS_ROUNDS, TRI_EDGE_TOP

    rows = {r["hops"]: r for r in QUERIES["graph-bfs-hops"](spark, sf_dir).collect()}
    su = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_part: dict[int, list[int]] = defaultdict(list)
    for r in su:
        by_part[r["l_partkey"]].append(r["l_suppkey"])
    shared: dict[tuple[int, int], int] = defaultdict(int)
    for supps in by_part.values():
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                shared[(a, b)] += 1
    edges = [
        p for p, _ in sorted(shared.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:TRI_EDGE_TOP]
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    src = min(nbrs)
    dist = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        if dist[n] >= BFS_ROUNDS:
            continue
        for m in nbrs[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    levels: dict[int, list[int]] = defaultdict(list)
    for n, d in dist.items():
        levels[d].append(n)
    assert set(rows) == set(levels)
    for d, nodes in levels.items():
        r = rows[d]
        assert d <= BFS_ROUNDS
        assert r["n_nodes"] == len(nodes)
        assert (r["min_node"], r["max_node"]) == (min(nodes), max(nodes))


def test_array_suite_matches_python_reference(spark, sf_dir):
    """Recompute every suite column with plain-Python list operations —
    identical sort/slice/filter/fold semantics — and compare exactly."""
    rows = QUERIES["fn-array-suite"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        words = docs[r["doc_id"]].split(" ")
        srt = sorted(words)
        assert r["n_words"] == len(words)
        assert r["first_sorted"] == srt[0]
        assert r["head3"] == "-".join(srt[:3])
        assert r["n_long"] == sum(1 for x in words if len(x) > 3)
        assert r["sum_len"] == sum(len(x) for x in words)
        assert r["max_len"] == max(len(x) for x in words)
        assert r["has_dup"] == (len(words) != len(set(words)))
