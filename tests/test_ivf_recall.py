"""IVF ANN quality gate: probing 4 of 16 cells must recover most of the
brute-force top-10 (recall@10), and every returned neighbor's similarity
must be exact (IVF approximates the candidate set, never the scores)."""

from __future__ import annotations

from merl_etl_spark.operators.similarity import ivf_ann_neighbors
from merl_etl_spark.registry import QUERIES, load_all

load_all()


def test_ivf_recall_against_brute_force(spark, sf_dir):
    brute = QUERIES["sim-topk-cosine"](spark, sf_dir).collect()
    ivf = ivf_ann_neighbors(spark, sf_dir).collect()

    brute_sets = {}
    brute_sims = {}
    for r in brute:
        brute_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        brute_sims[(r.query_id, r.neighbor_id)] = r.cos_sim
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        # scores for overlapping neighbors are exact, not approximated
        if (r.query_id, r.neighbor_id) in brute_sims:
            assert abs(r.cos_sim - brute_sims[(r.query_id, r.neighbor_id)]) < 1e-12

    assert set(ivf_sets) == set(brute_sets)
    recalls = [
        len(ivf_sets[q] & brute_sets[q]) / len(brute_sets[q]) for q in brute_sets
    ]
    avg_recall = sum(recalls) / len(recalls)
    # fixture embeddings are unclustered random vectors — the worst case
    # for IVF; 0.4 @ nprobe 4/16 documents the dial rather than the index
    assert avg_recall >= 0.4, f"IVF recall@10 too low: {avg_recall} ({recalls})"


def test_ivf_driver_contract_all_true(spark, sf_dir):
    """The registered sim-ivf-ann query is the contract-boolean form the
    driver oracles (VERDICT r7 task #2): one row per query, every boolean
    TRUE, exactly top-k results."""
    rows = QUERIES["sim-ivf-ann"](spark, sf_dir).collect()
    assert sorted(r.query_id for r in rows) == [0, 1, 2, 3, 4]
    for r in rows:
        assert r.n_results == 10, r
        assert r.recall_ok, r
        assert r.dominated_ok, r
