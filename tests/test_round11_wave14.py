"""Semantic tests for the round-11 wave-14 operators: the log-log
power-law fit, the MapType function suite, and the deterministic
argmax aggregate."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# analytics-powerlaw-fit
# ---------------------------------------------------------------------------


def test_powerlaw_fit_matches_numpy_ols(spark, sf_dir):
    """Recompute the OLS line from the query's own (band, n_docs) rows
    with the documented frozen-ln inputs — slope/intercept must match to
    their 9-dp output rounding."""
    rows = QUERIES["analytics-powerlaw-fit"](spark, sf_dir).collect()
    pts = sorted({(r.band, r.n_docs) for r in rows})
    xs = [b for b, _ in pts]
    ys = [round(math.log(n), 6) for _, n in pts]
    m = len(pts)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sy = float(sum(int(round(y * 10**6)) for y in ys)) / 10**6
    sxy = float(sum(x * int(round(y * 10**6)) for x, y in zip(xs, ys))) / 10**6
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    intercept = (sy - slope * sx) / m
    for r in rows:
        assert r.slope == round(slope, 9)
        assert r.intercept == round(intercept, 9)
        assert r.ln_count == round(math.log(r.n_docs), 6)


def test_powerlaw_bands_are_the_bitwidth_histogram(spark, sf_dir):
    """Recompute the (band, count) histogram from raw document lengths
    with Python's bit_length — pins that the band expression really is
    the bit width (a 0-based, digit-count, or byte-count regression
    would diverge here) and that every document is covered."""
    rows = QUERIES["analytics-powerlaw-fit"](spark, sf_dir).collect()
    lengths = [
        r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .select("n_chars")
        .collect()
    ]
    expected: dict = {}
    for L in lengths:
        expected[L.bit_length()] = expected.get(L.bit_length(), 0) + 1
    got = {r.band: r.n_docs for r in rows}
    assert got == expected
    assert sum(got.values()) == len(lengths)


# ---------------------------------------------------------------------------
# fn-map-suite
# ---------------------------------------------------------------------------


def test_map_suite_matches_relational_recompute(spark, sf_dir):
    """Replay the map pipeline relationally in Python from the raw
    (day, type) counts — every surviving row's lookup, doubling, key
    count, and max must agree."""
    rows = QUERIES["fn-map-suite"](spark, sf_dir).collect()
    from merl_etl_spark.functions.scalar_queries import MAP_MIN_N

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_day: dict = defaultdict(dict)
    for r in ev:
        per_day[r.day][r.event_type] = r.n
    expected = sorted(
        (day, len(m), max(m.values()), t, n, 2 * n)
        for day, m in per_day.items()
        for t, n in m.items()
        if n >= MAP_MIN_N
    )
    got = sorted(
        (r.day, r.n_keys, r.max_val, r.etype, r.n, r.doubled) for r in rows
    )
    assert got == expected
    assert len(got) > 0


# ---------------------------------------------------------------------------
# agg-argmax-suite
# ---------------------------------------------------------------------------


def test_argmax_suite_winners_are_true_extremes(spark, sf_dir):
    """The peak row must carry the group's max value, the first row its
    min timestamp — and on exact ties the documented id tie-break."""
    rows = QUERIES["agg-argmax-suite"](spark, sf_dir).collect()
    base = (
        load_table(spark, sf_dir, "events")
        .where(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select("event_type", "event_id", "ts", "value")
        .collect()
    )
    groups: dict = defaultdict(list)
    for r in base:
        groups[r.event_type].append(r)
    assert {r.event_type for r in rows} == set(groups)
    for row in rows:
        g = groups[row.event_type]
        assert row.n == len(g)
        peak = max(g, key=lambda r: (r.value, r.event_id))
        first = min(g, key=lambda r: (r.ts, r.event_id))
        assert row.peak_event_id == peak.event_id
        assert row.peak_value == peak.value
        assert row.first_event_id == first.event_id


def test_argmax_struct_orders_break_ties_deterministically(spark):
    """Synthetic exact-tie frame: two rows share the max value — the
    struct max must pick the larger id (the documented total order),
    not an arbitrary partition-dependent row."""
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 9, 5.0), ("a", 4, 1.0)],
        ["event_type", "event_id", "value"],
    ).repartition(3)
    out = df.groupBy("event_type").agg(
        F.max(F.struct("value", "event_id")).alias("pk")
    ).select(F.col("pk.event_id")).collect()
    assert out[0][0] == 9
