"""Semantic tests for the round-12 wave-4 operators: MAD anomaly census
and the revenue bridge.  Python/Decimal replays plus the algebraic
invariants each op's docstring claims."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal


def _r2(x) -> float:
    """SQL round(x, 2): half away from zero on the shortest decimal
    repr (Python's round() is banker's and would flip exact .xx5 ties)."""
    d = x if isinstance(x, Decimal) else Decimal(repr(float(x)))
    return float(d.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# ts-anomaly-mad
# ---------------------------------------------------------------------------


def _low_high_median2(vals):
    """lower + upper median (the med2 integer-pair convention)."""
    s = sorted(vals)
    n = len(s)
    return s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]


def test_anomaly_mad_matches_python_replay(spark, sf_dir):
    events = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per_type = defaultdict(list)
    for r in events:
        per_type[r.event_type].append((str(r.day), int(r.n)))
    rows = {r.event_type: r for r in QUERIES["ts-anomaly-mad"](spark, sf_dir).collect()}
    assert set(rows) == set(per_type)
    for t, days in per_type.items():
        ns = [n for _, n in days]
        med2 = _low_high_median2(ns)
        devs = [(abs(2 * n - med2), d, n) for d, n in days]
        mad4 = _low_high_median2([dv for dv, _, _ in devs])
        outliers = [x for x in devs if 20000 * x[0] > 44478 * mad4]
        worst = max(dv for dv, _, _ in devs)
        worst_day = min(d for dv, d, _ in devs if dv == worst)
        r = rows[t]
        assert r.n_days == len(days)
        assert r.med2 == med2
        assert r.mad4 == mad4
        assert r.n_outliers == len(outliers)
        assert r.worst_dev2 == worst
        assert r.worst_day == worst_day


def test_anomaly_mad_is_spike_robust():
    """The docstring's claim, as arithmetic: one 100× spike must not
    move the median/MAD threshold the way it moves a mean/σ one."""
    base = [100] * 30
    spiked = base[:-1] + [10000]
    med2 = _low_high_median2(spiked)
    assert med2 == 200  # median unmoved by the spike
    devs = [abs(2 * n - med2) for n in spiked]
    mad4 = _low_high_median2(devs)
    assert mad4 == 0  # deviations all zero except the spike itself
    # the spike IS flagged (dev > 0 while threshold is 0)
    assert 20000 * abs(2 * 10000 - med2) > 44478 * mad4
    # mean/σ contrast: the spike inflates σ so far that a z-score of the
    # spike itself stays under 6 — the detector the docstring warns about
    mean = sum(spiked) / len(spiked)
    var = sum((x - mean) ** 2 for x in spiked) / len(spiked)
    assert abs(10000 - mean) / math.sqrt(var) < 6.0


# ---------------------------------------------------------------------------
# analytics-revenue-bridge
# ---------------------------------------------------------------------------


def test_revenue_bridge_matches_decimal_replay(spark, sf_dir):
    from merl_etl_spark.operators.analytics import BRIDGE_Y1, BRIDGE_Y2

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate").isin(BRIDGE_Y1, BRIDGE_Y2))
        .select("l_partkey", F.year("l_shipdate").alias("yr"),
                "l_quantity", "l_extendedprice", "l_discount")
        .collect()
    )
    brand = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").select("p_partkey", "p_brand").collect()
    }

    def d6(x):
        return Decimal(f"{x:.6f}")

    q = defaultdict(Decimal)
    rv = defaultdict(Decimal)
    for r in li:
        b = brand[r.l_partkey]
        q[(b, r.yr)] += d6(r.l_quantity)
        rev = (d6(r.l_extendedprice) * (1 - d6(r.l_discount))).quantize(
            Decimal("1E-12")
        )
        rv[(b, r.yr)] += rev
    brands = {b for b, _ in q}
    rows = {r.brand: r for r in QUERIES["analytics-revenue-bridge"](spark, sf_dir).collect()}
    assert set(rows) == brands
    for b in brands:
        q1, q2 = q.get((b, BRIDGE_Y1), Decimal(0)), q.get((b, BRIDGE_Y2), Decimal(0))
        r1, r2 = rv.get((b, BRIDGE_Y1), Decimal(0)), rv.get((b, BRIDGE_Y2), Decimal(0))
        row = rows[b]
        assert row.rev_y1 == _r2(r1)
        assert row.rev_y2 == _r2(r2)
        assert row.delta == _r2(r2 - r1)
        assert row.qty_y1 == _r2(q1)
        assert row.qty_y2 == _r2(q2)
        if q1 > 0 and q2 > 0:
            p1 = float(r1) / float(q1)
            p2 = float(r2) / float(q2)
            assert row.volume_effect == _r2((float(q2) - float(q1)) * p1)
            assert row.price_effect == _r2((p2 - p1) * float(q2))
        else:
            assert row.volume_effect is None and row.price_effect is None


def test_revenue_bridge_decomposition_is_exact(spark, sf_dir):
    """The two-term split p1·ΔQ + Q2·Δp must reconstruct ΔR up to the
    per-column output rounding (the bridge's defining identity)."""
    rows = QUERIES["analytics-revenue-bridge"](spark, sf_dir).collect()
    assert rows
    both = [r for r in rows if r.volume_effect is not None]
    assert both, "fixture must have brands trading in both years"
    for r in both:
        assert abs((r.volume_effect + r.price_effect) - r.delta) <= 0.02
