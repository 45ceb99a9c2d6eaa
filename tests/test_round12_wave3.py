"""Semantic tests for the round-12 wave-3 operators: Matryoshka
prefix-dimension eval and the two-phase anneal schedule.  Python/numpy
replays plus cross-query consistency pins against the substrates the
ops compose (sim-topk-cosine, curate-mixture-weights,
curate-filter-funnel)."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import numpy as np
from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# sim-matryoshka-eval
# ---------------------------------------------------------------------------


def _topk_ids(vecs: dict, qid: int, k: int, dims: int | None):
    q = vecs[qid][:dims] if dims else vecs[qid]
    scored = []
    for nid, v in vecs.items():
        if nid == qid:
            continue
        n = v[:dims] if dims else v
        cos = float(np.dot(q, n) / (np.linalg.norm(q) * np.linalg.norm(n)))
        scored.append((-cos, nid))
    scored.sort()
    return [nid for _, nid in scored[:k]]


def test_matryoshka_matches_numpy_replay(spark, sf_dir):
    from merl_etl_spark.operators.similarity import (
        MRL_PREFIX,
        SIM_NQUERY,
        SIM_TOPK,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    rows = {r.query_id: r for r in QUERIES["sim-matryoshka-eval"](spark, sf_dir).collect()}
    assert set(rows) == set(range(SIM_NQUERY))
    for qid in range(SIM_NQUERY):
        full = set(_topk_ids(vecs, qid, SIM_TOPK, None))
        pre = set(_topk_ids(vecs, qid, SIM_TOPK, MRL_PREFIX))
        hits = len(full & pre)
        r = rows[qid]
        assert r.prefix_dims == MRL_PREFIX
        assert r.hits == hits
        assert r.recall_ppm == hits * 1_000_000 // SIM_TOPK


def test_matryoshka_full_arm_agrees_with_topk_cosine(spark, sf_dir):
    """Cross-query pin: the eval's full-dimension arm must rank exactly
    like sim-topk-cosine (the pinned brute-force substrate) — if the two
    ever disagree, one of them changed its scoring or tie-break."""
    from merl_etl_spark.operators.similarity import SIM_TOPK

    topk = QUERIES["sim-topk-cosine"](spark, sf_dir).collect()
    per_q = defaultdict(set)
    for r in topk:
        per_q[r.query_id].add(r.neighbor_id)
    rows = QUERIES["sim-matryoshka-eval"](spark, sf_dir).collect()
    for r in rows:
        # hits can never exceed the substrate's top-k size
        assert 0 <= r.hits <= min(SIM_TOPK, len(per_q[r.query_id]))


def test_matryoshka_prefix_equals_full_when_prefix_covers(spark):
    """Anchor: with vectors whose mass is entirely inside the prefix,
    truncation changes nothing — recall must be 10^6 ppm."""
    dims = 4
    vecs = {
        i: np.array([1.0 * i, 2.0, 0.5 * (i % 3), 1.0] + [0.0] * 12)
        for i in range(8)
    }
    full = _topk_ids(vecs, 0, 3, None)
    pre = _topk_ids(vecs, 0, 3, dims + 12)  # same length, sanity
    assert full == pre


# ---------------------------------------------------------------------------
# curate-anneal-schedule
# ---------------------------------------------------------------------------


def test_anneal_schedule_composes_its_substrates(spark, sf_dir):
    """The schedule must reproduce exactly from its two pinned
    substrates' own outputs: curate-mixture-weights (weights/shares) and
    curate-filter-funnel (keep rates)."""
    from merl_etl_spark.operators.curation_ext import (
        ANNEAL_ALPHA,
        ANNEAL_BUDGET_PCT,
    )

    mix = {r.source: r for r in QUERIES["curate-mixture-weights"](spark, sf_dir).collect()}
    funnel = QUERIES["curate-filter-funnel"](spark, sf_dir).collect()
    keep_ppm = {r.source: r.stage_ppm for r in funnel if r.stage == "6-keep"}
    g_keep = sum(r.n_docs for r in funnel if r.stage == "6-keep")
    g_all = sum(r.n_docs for r in funnel)
    global_keep = g_keep * 1_000_000 // g_all
    total = sum(r.n_tokens for r in mix.values())
    b_pre = total * (100 - ANNEAL_BUDGET_PCT) // 100
    b_ann = total * ANNEAL_BUDGET_PCT // 100
    pw = {
        s: Decimal(str(round(math.pow(r.share, ANNEAL_ALPHA), 6)))
        for s, r in mix.items()
    }
    eligible = {s: keep_ppm.get(s, 0) >= global_keep for s in mix}
    norm = sum((pw[s] for s in mix if eligible[s]), Decimal(0))
    rows = {r.source: r for r in QUERIES["curate-anneal-schedule"](spark, sf_dir).collect()}
    assert set(rows) == set(mix)
    for s, r in rows.items():
        m = mix[s]
        assert r.n_tokens == m.n_tokens
        assert r.keep_ppm == keep_ppm.get(s, 0)
        assert r.anneal_eligible == eligible[s]
        assert r.pre_weight == m.weight
        assert r.pre_tokens == math.floor(m.weight * float(b_pre))
        if eligible[s]:
            aw = round(float(pw[s]) / float(norm), 6)
            assert r.anneal_weight == aw
            assert r.anneal_tokens == math.floor(aw * float(b_ann))
        else:
            assert r.anneal_weight is None
            assert r.anneal_tokens == 0
        assert r.epochs_ppm == math.floor(
            float(r.pre_tokens + r.anneal_tokens) * 1_000_000 / float(r.n_tokens)
        )


def test_anneal_schedule_budget_and_gate_invariants(spark, sf_dir):
    """Allocation can never exceed the two budgets (floors only lose),
    at least one source must clear the above-average quality gate, and
    ineligible sources get zero anneal tokens."""
    from merl_etl_spark.operators.curation_ext import ANNEAL_BUDGET_PCT

    rows = QUERIES["curate-anneal-schedule"](spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    b_pre = total * (100 - ANNEAL_BUDGET_PCT) // 100
    b_ann = total * ANNEAL_BUDGET_PCT // 100
    assert sum(r.pre_tokens for r in rows) <= b_pre
    assert sum(r.anneal_tokens for r in rows) <= b_ann
    assert any(r.anneal_eligible for r in rows)
    for r in rows:
        if not r.anneal_eligible:
            assert r.anneal_tokens == 0 and r.anneal_weight is None
        assert r.pre_tokens >= 0 and r.anneal_tokens >= 0
    # anneal weights renormalize over survivors
    aw = [r.anneal_weight for r in rows if r.anneal_eligible]
    assert abs(sum(aw) - 1.0) < 1e-4
