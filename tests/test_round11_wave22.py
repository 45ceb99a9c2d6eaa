"""Semantic tests for the round-11 wave-22 operators: exact skewness and
the seasonal-strength score."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def test_skewness_matches_python_moments(spark, sf_dir):
    rows = QUERIES["agg-skewness-exact"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    per: dict = defaultdict(list)
    for d in docs:
        if d.source is not None:
            per[d.source].append(d.n_chars)
    for r in rows:
        xs = per[r.source]
        n = len(xs)
        sx, sxx, sxxx = sum(xs), sum(x * x for x in xs), sum(x**3 for x in xs)
        mu = sx / n
        m2 = sxx / n - mu * mu
        m3 = sxxx / n - 3 * mu * (sxx / n) + 2 * mu * mu * mu
        assert r.n_docs == n
        assert r.m2 == round(m2, 6)
        assert r.skewness == round(m3 / (m2 * math.sqrt(m2)), 6)
        # agree with the plain central-moment definition to float noise
        g1 = (sum((x - mu) ** 3 for x in xs) / n) / (
            (sum((x - mu) ** 2 for x in xs) / n) ** 1.5
        )
        assert abs(r.skewness - g1) < 1e-6


def test_seasonality_strength_matches_decompose_components(spark, sf_dir):
    """F_s recomputed from ts-decompose's OWN output (variance of
    detrended = seasonal+residual vs variance of residual) must agree to
    rounding-noise tolerance — pins the two surfaces to one decomposition."""
    comp = QUERIES["ts-decompose"](spark, sf_dir).collect()
    per: dict = defaultdict(lambda: ([], []))
    for r in comp:
        det = r.n - r.trend
        per[r.event_type][0].append(det)
        per[r.event_type][1].append(r.residual)
    rows = QUERIES["analytics-seasonality-strength"](spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(per)
    for r in rows:
        det, res = per[r.event_type]
        n = len(det)
        vd = sum(x * x for x in det) / n - (sum(det) / n) ** 2
        vr = sum(x * x for x in res) / n - (sum(res) / n) ** 2
        assert r.n_days == n
        assert abs(r.var_detrended - vd) < 1e-3
        assert abs(r.var_residual - vr) < 1e-3
        assert abs(r.seasonal_strength - max(0.0, 1 - vr / vd)) < 1e-4
        assert 0.0 <= r.seasonal_strength <= 1.0
