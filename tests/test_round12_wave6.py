"""Semantic tests for the round-12 wave-6 operators: PQ recall eval and
per-source distinctive terms.  Cross-query consistency pins (both ops
compose pinned substrates) plus Python replays."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# sim-pq-recall-eval
# ---------------------------------------------------------------------------


def test_pq_recall_matches_its_substrates(spark, sf_dir):
    """The eval must equal |adc_topk ∩ exact_topk-over-CODED-corpus|: the
    ADC arm from sim-pq-adc-topk's OWN output, the ground truth replayed
    in numpy over the held-out half only (vec_id > cap — the review-r12
    coverage restriction: ADC cannot return uncoded vectors)."""
    import numpy as np

    from merl_etl_spark.operators.similarity import SIM_NQUERY, SIM_TOPK

    adc = defaultdict(set)
    for r in QUERIES["sim-pq-adc-topk"](spark, sf_dir).collect():
        adc[r.query_id].add(r.vec_id)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    cap = max(vecs) // 2
    exact = {}
    for qid in range(SIM_NQUERY):
        q = vecs[qid]
        scored = []
        for nid, v in vecs.items():
            if nid == qid or nid <= cap:
                continue
            cos = float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            scored.append((-cos, nid))
        scored.sort()
        exact[qid] = {nid for _, nid in scored[:SIM_TOPK]}
    rows = {r.query_id: r for r in QUERIES["sim-pq-recall-eval"](spark, sf_dir).collect()}
    assert set(rows) == set(range(SIM_NQUERY))
    for qid, r in rows.items():
        hits = len(adc[qid] & exact[qid])
        assert r.hits == hits
        assert r.recall_ppm == hits * 1_000_000 // SIM_TOPK
        assert 0 <= r.hits <= SIM_TOPK


def test_recall_triple_covers_three_axes(spark, sf_dir):
    """The three lossy-lever evals exist side by side and share the
    query contract — each reports one row per query, hits ≤ top-k."""
    from merl_etl_spark.operators.similarity import SIM_NQUERY

    for q in ("sim-ann-recall-eval", "sim-matryoshka-eval", "sim-pq-recall-eval"):
        rows = QUERIES[q](spark, sf_dir).collect()
        assert len(rows) == SIM_NQUERY, q


# ---------------------------------------------------------------------------
# text-distinctive-terms
# ---------------------------------------------------------------------------


def _grid_replay(spark, sf_dir):
    from merl_etl_spark.operators.text_analysis import JSD_VOCAB

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", "text")
        .collect()
    )
    per_src: dict = defaultdict(Counter)
    glob: Counter = Counter()
    for r in docs:
        ws = [w for w in r.text.split(" ") if w != ""]
        per_src[r.source].update(ws)
        glob.update(ws)
    vocab = [
        w for w, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:JSD_VOCAB]
    ]
    return per_src, vocab


def test_distinctive_terms_matches_python_replay(spark, sf_dir):
    from merl_etl_spark.operators.text_analysis import DISTINCT_TOPK, JSD_VOCAB

    per_src, vocab = _grid_replay(spark, sf_dir)
    V = JSD_VOCAB
    t = {s: sum(c[w] for w in vocab) for s, c in per_src.items()}
    t_all = sum(t.values())
    c_all = {w: sum(per_src[s][w] for s in per_src) for w in vocab}

    def ln6(x: int) -> Decimal:
        return Decimal(str(round(math.log(x), 6)))

    expect = {}
    for s in per_src:
        scored = []
        for w in vocab:
            c = per_src[s][w]
            lo = ln6(c + 1) - ln6(t[s] + V) - ln6(c_all[w] - c + 1) + ln6(
                t_all - t[s] + V
            )
            scored.append((-lo, w, c, c_all[w] - c, float(lo)))
        scored.sort()
        for rnk, (_, w, c, cr, lo) in enumerate(scored[:DISTINCT_TOPK], start=1):
            expect[(s, rnk)] = (w, c, cr, lo)
    rows = QUERIES["text-distinctive-terms"](spark, sf_dir).collect()
    got = {(r.source, r.rnk): (r.term, r.c_in, r.c_rest, r.log_odds) for r in rows}
    assert got == expect


def test_distinctive_terms_shares_the_jsd_grid(spark, sf_dir):
    """Cross-query pin: the c_in/c_rest counts must be consistent —
    summing a term's in-source counts across all sources equals
    c_in + c_rest for every reporting source."""
    rows = QUERIES["text-distinctive-terms"](spark, sf_dir).collect()
    assert rows
    from merl_etl_spark.operators.text_analysis import source_word_grid

    grid = {
        (r.source, r.w): r.c for r in source_word_grid(spark, sf_dir).collect()
    }
    tot_by_word = defaultdict(int)
    for (s, w), c in grid.items():
        tot_by_word[w] += c
    for r in rows:
        assert grid[(r.source, r.term)] == r.c_in
        assert r.c_in + r.c_rest == tot_by_word[r.term]
