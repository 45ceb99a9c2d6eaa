"""Semantic tests for the round-11 wave-16 operators: the truncation
budget audit, the embedding norm census, and the bitwise suite."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.operators.curation_ext import TRUNC_MAX_TOKENS
from merl_etl_spark.operators.similarity import ASSIGN_FP_SCALE
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# curate-truncation-plan
# ---------------------------------------------------------------------------


def test_truncation_plan_matches_python_replay(spark, sf_dir):
    rows = QUERIES["curate-truncation-plan"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, tok, trunc, kept, lost
    for d in docs:
        if d.source is None:
            continue
        n = len(d.text.split(" "))
        a = agg[d.source]
        a[0] += 1
        a[1] += n
        a[2] += 1 if n > TRUNC_MAX_TOKENS else 0
        a[3] += min(n, TRUNC_MAX_TOKENS)
        a[4] += max(n - TRUNC_MAX_TOKENS, 0)
    assert {r.source for r in rows} == set(agg)
    for r in rows:
        a = agg[r.source]
        assert (r.n_docs, r.n_tokens, r.n_truncated_docs) == (a[0], a[1], a[2])
        assert (r.n_kept_tokens, r.n_lost_tokens) == (a[3], a[4])
        assert r.n_kept_tokens + r.n_lost_tokens == r.n_tokens
        assert r.loss_ppm == a[4] * 1_000_000 // a[1]
    # the budget must actually bite somewhere, or the audit is vacuous
    assert any(r.n_truncated_docs > 0 for r in rows)


# ---------------------------------------------------------------------------
# dq-embedding-norms
# ---------------------------------------------------------------------------


def test_embedding_norms_match_python_fixed_point(spark, sf_dir):
    rows = QUERIES["dq-embedding-norms"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    bands: dict = defaultdict(lambda: [0, set(), None, None])
    for e in emb:
        n2 = sum(
            math.floor(float(x) * ASSIGN_FP_SCALE) ** 2 for x in e.embedding
        )
        b = n2.bit_length() if n2 > 0 else 1  # bin(0) = '0', width 1
        s = bands[b]
        s[0] += 1
        s[1].add(e.label)
        s[2] = n2 if s[2] is None else min(s[2], n2)
        s[3] = n2 if s[3] is None else max(s[3], n2)
    assert {r.band for r in rows} == set(bands)
    for r in rows:
        s = bands[r.band]
        assert (r.n_vecs, r.n_labels) == (s[0], len(s[1]))
        assert (r.min_norm2_fp, r.max_norm2_fp) == (s[2], s[3])
    assert sum(r.n_vecs for r in rows) == len(emb)


def test_embedding_norms_flag_zero_and_scaled_vectors(spark):
    """Synthetic intake batch: unit-ish vectors in one band, a zero
    vector in band 1, a 10x-scaled vector ~7 bands higher — the census
    must separate all three (the failure mode the docstring claims it
    catches)."""
    rows_df = spark.createDataFrame(
        [
            (1, [0.5] * 4, 0),
            (2, [0.5] * 4, 0),
            (3, [0.0] * 4, 1),
            (4, [5.0] * 4, 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    import merl_etl_spark.operators.quality as quality

    orig = quality.load_table
    quality.load_table = lambda s, d, n: rows_df
    try:
        out = {r.band: r for r in QUERIES["dq-embedding-norms"](spark, "x").collect()}
    finally:
        quality.load_table = orig
    assert len(out) == 3
    zero_band = min(out)
    assert out[zero_band].n_vecs == 1 and out[zero_band].min_norm2_fp == 0
    top_band = max(out)
    assert out[top_band].n_vecs == 1  # the 10x vector sits alone on top


# ---------------------------------------------------------------------------
# fn-bit-suite
# ---------------------------------------------------------------------------


def test_bit_suite_matches_python_replay(spark, sf_dir):
    rows = QUERIES["fn-bit-suite"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") >= 0)
        .select("event_id", "user_id")
        .collect()
    )
    groups: dict = defaultdict(list)
    for e in ev:
        groups[bin(e.event_id).count("1")].append(e)
    assert {r.popcnt for r in rows} == set(groups)
    for r in rows:
        g = groups[r.popcnt]
        assert r.n == len(g)
        assert r.n_odd == sum(1 for e in g if e.event_id & 1)
        assert r.min_low_byte == min(e.event_id & 255 for e in g)
        assert r.max_low_byte == max(e.event_id & 255 for e in g)
        assert r.min_xor == min(e.event_id ^ (e.user_id or 0) for e in g)
        assert r.max_shl3 == max(e.event_id << 3 for e in g)
        assert r.max_shr4 == max(e.event_id >> 4 for e in g)
