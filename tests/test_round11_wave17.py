"""Semantic tests for the round-11 wave-17 operators: the Benford
screen, exact variance, and the Poisson bootstrap."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.operators.curation import BOOT_REPLICATES, _BOOT_CUTS
from merl_etl_spark.operators.quality import BENFORD_PPM
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# dq-benford-digits
# ---------------------------------------------------------------------------


def test_benford_ppm_literals_are_log10_and_sum_to_one(spark):
    assert sum(BENFORD_PPM) == 1_000_000
    for d, ppm in enumerate(BENFORD_PPM, start=1):
        assert ppm == round(math.log10(1 + 1 / d) * 1_000_000)


def test_benford_digits_match_python_replay(spark, sf_dir):
    rows = QUERIES["dq-benford-digits"](spark, sf_dir).collect()
    prices = [
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
        if r.o_totalprice >= 1
    ]
    counts: dict = defaultdict(int)
    for p in prices:
        counts[int(str(math.floor(p))[0])] += 1
    total = sum(counts.values())
    assert {r.digit for r in rows} == set(counts)
    for r in rows:
        assert r.n == counts[r.digit]
        assert r.share_ppm == counts[r.digit] * 1_000_000 // total
        assert r.benford_ppm == BENFORD_PPM[r.digit - 1]
        assert r.dev_ppm == r.share_ppm - r.benford_ppm


# ---------------------------------------------------------------------------
# agg-variance-exact
# ---------------------------------------------------------------------------


def test_variance_matches_python_population_variance(spark, sf_dir):
    rows = QUERIES["agg-variance-exact"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    per: dict = defaultdict(list)
    for d in docs:
        if d.source is not None:
            per[d.source].append(d.n_chars)
    for r in rows:
        xs = per[r.source]
        assert r.n_docs == len(xs)
        assert r.sum_chars == sum(xs)
        assert (r.min_chars, r.max_chars) == (min(xs), max(xs))
        # the query's exact-moment formula, replayed in Python IEEE
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        var = sxx / n - (sx / n) * (sx / n)
        assert r.mean_chars == sx / n
        assert r.var_chars == round(var, 6)
        assert r.std_chars == round(math.sqrt(var), 6)
        # and it agrees with the statistics module to float tolerance
        assert abs(r.var_chars - statistics.pvariance(xs)) < 1e-4


# ---------------------------------------------------------------------------
# sample-poisson-bootstrap
# ---------------------------------------------------------------------------


def test_bootstrap_weights_follow_the_pmf_and_spread_brackets_mean(spark, sf_dir):
    rows = QUERIES["sample-poisson-bootstrap"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    n_docs = docs.count()
    true_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert len(rows) == BOOT_REPLICATES
    means = [r.mean_chars for r in rows]
    for r in rows:
        # E[w] = 1, so each replicate's effective mass ~ n_docs
        assert 0.75 * n_docs < r.n_eff < 1.25 * n_docs
        assert r.mean_chars == r.sum_chars / r.n_eff
    # the replicate cloud brackets the point estimate
    assert min(means) <= true_mean <= max(means)
    # resamples differ (the coin really varies by replicate)
    assert len(set(means)) > 1


def test_bootstrap_is_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, QUERIES["sample-poisson-bootstrap"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["sample-poisson-bootstrap"](spark, sf_dir).collect()))
    assert a == b
    assert _BOOT_CUTS == (368, 736, 920, 981)  # the documented Poisson(1) pmf
