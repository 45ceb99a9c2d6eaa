"""Semantic tests for the round-11 wave-12 operators: the A/B experiment
readout, the Lloyd M-step centroid update, and the write-shard balance
audit."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from merl_etl_spark.operators.similarity import ASSIGN_FP_SCALE
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# analytics-ab-test
# ---------------------------------------------------------------------------


def test_ab_test_python_reference_parity(spark, sf_dir):
    """The z statistic must equal the same IEEE formula evaluated in
    Python from the query's own exact-integer counts (identical operand
    order — any divergence means the Spark expression drifted from the
    documented formula)."""
    row = QUERIES["analytics-ab-test"](spark, sf_dir).collect()[0]
    n_a, conv_a, n_b, conv_b = row.n_a, row.conv_a, row.n_b, row.conv_b
    rate_a = float(conv_a) / float(n_a)
    rate_b = float(conv_b) / float(n_b)
    pool = float(conv_a + conv_b) / float(n_a + n_b)
    z = (rate_a - rate_b) / math.sqrt(
        pool * (1.0 - pool) * (1.0 / float(n_a) + 1.0 / float(n_b))
    )
    assert row.rate_a == rate_a and row.rate_b == rate_b
    assert row.z_score == round(z, 6)
    assert row.significant == (abs(round(z, 6)) >= 1.96)


def test_ab_test_arms_partition_the_user_base(spark, sf_dir):
    """Exposures must conserve: every user with events lands in exactly
    one arm, and both arms are non-degenerate (interior conversion
    rates) so the test statistic is informative at fixture scale."""
    row = QUERIES["analytics-ab-test"](spark, sf_dir).collect()[0]
    n_users = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.n_a + row.n_b == n_users
    assert 0 < row.conv_a < row.n_a
    assert 0 < row.conv_b < row.n_b


# ---------------------------------------------------------------------------
# sim-kmeans-update
# ---------------------------------------------------------------------------


def test_kmeans_update_numpy_reference_parity(spark, sf_dir):
    """Full M-step parity against a numpy reference: quantize, assign by
    the exact-integer metric (ties on centroid id), re-estimate means —
    every output row must match to the query's own 9-dp rounding."""
    rows = QUERIES["sim-kmeans-update"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    cap = max(r.vec_id for r in emb) // 2
    ref = [r for r in emb if r.vec_id <= cap]
    held = [r for r in emb if r.vec_id > cap]
    # codebook: per-(label, dim) count and fixed-point sum
    n_ref: dict = defaultdict(int)
    sum_fp: dict = defaultdict(int)
    for r in ref:
        for d, x in enumerate(r.embedding, start=1):
            n_ref[(r.label, d)] += 1
            sum_fp[(r.label, d)] += math.floor(float(x) * ASSIGN_FP_SCALE)
    labels = sorted({r.label for r in ref})
    # assignment: exact-integer argmin, ties on label id
    assigned: dict = {}
    for r in held:
        best = None
        for lab in labels:
            d2 = 0
            for d, x in enumerate(r.embedding, start=1):
                vfp = math.floor(float(x) * ASSIGN_FP_SCALE)
                n = n_ref[(lab, d)]
                d2 += (abs(vfp * n - sum_fp[(lab, d)]) // n) ** 2
            if best is None or (d2, lab) < best:
                best = (d2, lab)
        assigned[r.vec_id] = best[1]
    # M-step grain
    n_new: dict = defaultdict(int)
    sum_new: dict = defaultdict(int)
    for r in held:
        lab = assigned[r.vec_id]
        for d, x in enumerate(r.embedding, start=1):
            n_new[(lab, d)] += 1
            sum_new[(lab, d)] += math.floor(float(x) * ASSIGN_FP_SCALE)
    assert len(rows) == len(n_new)
    for row in rows:
        k = (row.c_label, row.dim)
        assert row.n_members == n_new[k]
        nm = float(sum_new[k]) / float(n_new[k]) / float(ASSIGN_FP_SCALE)
        om = float(sum_fp[k]) / float(n_ref[k]) / float(ASSIGN_FP_SCALE)
        assert row.new_mean == round(nm, 9), k
        assert row.old_mean == round(om, 9), k
        assert row.shift == round(abs(nm - om), 9), k


def test_kmeans_update_membership_constant_across_dims(spark, sf_dir):
    """Vectors are dense, so within one centroid every dim must report
    the SAME member count, and the dim set must be complete (1..64) —
    a partial dim range would mean the explode/join dropped components."""
    rows = QUERIES["sim-kmeans-update"](spark, sf_dir).collect()
    by_label: dict = defaultdict(list)
    for r in rows:
        by_label[r.c_label].append(r)
    for lab, rs in by_label.items():
        assert sorted(r.dim for r in rs) == list(range(1, 65)), lab
        assert len({r.n_members for r in rs}) == 1, lab


def test_kmeans_update_means_bounded_by_unit_ball(spark, sf_dir):
    """Embedding components live in [-1, 1] (unit-normalized fixture), so
    every re-estimated mean must too — a quantization-scale mismatch
    between the sum and the divisor would blow straight past this."""
    rows = QUERIES["sim-kmeans-update"](spark, sf_dir).collect()
    eps = 1.0 / ASSIGN_FP_SCALE
    for r in rows:
        assert -1.0 - eps <= r.new_mean <= 1.0 + eps
        assert -1.0 - eps <= r.old_mean <= 1.0 + eps
        assert r.shift >= 0.0


# ---------------------------------------------------------------------------
# layout-shard-skew
# ---------------------------------------------------------------------------


def test_shard_skew_conserves_mass(spark, sf_dir):
    """Shards must partition the corpus exactly: doc and byte totals
    equal the table's, shard ids stay inside [0, SHARD_COUNT)."""
    from merl_etl_spark.operators.profiling import SHARD_COUNT

    rows = QUERIES["layout-shard-skew"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
    ).collect()[0]
    assert sum(r.n_docs for r in rows) == tot.n
    assert sum(r.n_chars for r in rows) == tot.c
    assert all(0 <= r.shard_id < SHARD_COUNT for r in rows)


def test_shard_skew_ppm_columns_are_consistent(spark, sf_dir):
    """dev_ppm is share_ppm re-expressed against the uniform ideal:
    dev = share·K − 10⁶ must hold to rounding tolerance, and shares must
    sum to ~10⁶."""
    from merl_etl_spark.operators.profiling import SHARD_COUNT

    rows = QUERIES["layout-shard-skew"](spark, sf_dir).collect()
    assert np.isclose(sum(r.share_ppm for r in rows), 1_000_000, atol=0.1)
    for r in rows:
        assert np.isclose(
            r.dev_ppm, r.share_ppm * SHARD_COUNT - 1_000_000, atol=0.1
        ), r
