"""Semantic tests for the round-11 wave-21 operator: the exact pairwise
source-overlap matrix."""

from __future__ import annotations

from collections import defaultdict

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _shingle_sets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per: dict = defaultdict(set)
    for d in docs:
        if d.source is None:
            continue
        w = d.text.split(" ")
        for i in range(max(len(w) - 2, 0)):
            per[d.source].add(" ".join(w[i : i + 3]))
    return per


def test_source_overlap_matches_python_sets(spark, sf_dir):
    per = _shingle_sets(spark, sf_dir)
    rows = QUERIES["dedup-source-overlap"](spark, sf_dir).collect()
    srcs = sorted(per)
    expected_pairs = {(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
                      if per[a] & per[b]}
    assert {(r.source_a, r.source_b) for r in rows} == expected_pairs
    for r in rows:
        A, B = per[r.source_a], per[r.source_b]
        inter = len(A & B)
        assert (r.n_a, r.n_b, r.n_inter) == (len(A), len(B), inter)
        assert r.jaccard_ppm == inter * 1_000_000 // len(A | B)
        assert r.containment_ppm == inter * 1_000_000 // min(len(A), len(B))


def test_source_overlap_is_consistent_with_novelty(spark, sf_dir):
    """Cross-query pin: a source's unique-shingle count from
    text-ngram-novelty must equal its total minus every shingle shared
    with ANY other source — the two views describe the same sets."""
    per = _shingle_sets(spark, sf_dir)
    novelty = {
        r.source: r for r in QUERIES["text-ngram-novelty"](spark, sf_dir).collect()
    }
    for src, shs in per.items():
        shared = set()
        for other, oshs in per.items():
            if other != src:
                shared |= shs & oshs
        assert novelty[src].n_shingles == len(shs)
        assert novelty[src].n_unique == len(shs) - len(shared)
