"""Semantic tests for the round-13 wave-9 operators: the aggregate-
function surface suite and the Tukey-fence outlier audit."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# fn-agg-suite
# ---------------------------------------------------------------------------


def test_agg_suite_pinned_values(spark, sf_dir):
    """Analytic pins over the literal grid (grp 1: x = 10,30,20,5,40
    tags a,b,a,b,a; grp 2: x = 7,9,3 tags c,c,d)."""
    rows = {r.grp: r for r in QUERIES["fn-agg-suite"](spark, sf_dir).collect()}
    g1, g2 = rows[1], rows[2]
    assert (g1.n, g1.n_big, g1.n_tags) == (5, 4, 2)  # x >= 10: 10,30,20,40
    assert g1.all_gt2 is True and g1.any_gt25 is True
    assert (g1.id_of_max_x, g1.id_of_min_x) == (5, 4)  # x=40 -> id 5; x=5 -> id 4
    assert g1.med_x == 20.0
    assert g1.sum_tag_a == 10 + 20 + 40
    assert g1.avg_big == (10 + 30 + 20 + 40) / 4
    assert (g2.n, g2.n_big, g2.n_tags) == (3, 0, 2)
    assert g2.all_gt2 is True and g2.any_gt25 is False
    assert (g2.id_of_max_x, g2.id_of_min_x) == (7, 8)  # x=9 -> id 7; x=3 -> id 8
    assert g2.med_x == 7.0
    assert g2.sum_tag_a is None  # FILTER matches nothing -> NULL
    assert g2.avg_big is None


# ---------------------------------------------------------------------------
# dq-iqr-outliers
# ---------------------------------------------------------------------------


def _iqr_replay(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    from decimal import ROUND_HALF_UP, Decimal

    per: dict[str, list] = defaultdict(list)
    for r in ev:
        # engine freeze: round(value*100, 0) half-away on the same double
        cv = int(
            Decimal(repr(r.value * 100)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        per[r.event_type].append(cv)
    exp = {}
    for et, vals in per.items():
        vals.sort()
        n = len(vals)

        def q(k_num, k_den):
            # smallest value whose cumulative count reaches ceil(k*n/den)
            import math

            return vals[math.ceil(k_num * n / k_den) - 1]

        q1, med, q3 = q(1, 4), q(1, 2), q(3, 4)
        iqr = q3 - q1
        n_low = sum(1 for v in vals if 2 * v < 2 * q1 - 3 * iqr)
        n_high = sum(1 for v in vals if 2 * v > 2 * q3 + 3 * iqr)
        exp[et] = (
            n, q1, med, q3, iqr, n_low, n_high,
            (n_low + n_high) * 1_000_000 // n,
        )
    return exp


def test_iqr_outliers_matches_python_replay(spark, sf_dir):
    exp = _iqr_replay(spark, sf_dir)
    got = {
        r.event_type: (
            r.n, r.q1, r.med, r.q3, r.iqr_centi, r.n_low, r.n_high,
            r.outlier_ppm,
        )
        for r in QUERIES["dq-iqr-outliers"](spark, sf_dir).collect()
    }
    assert got == exp


def test_iqr_outliers_planted_spikes(spark):
    """A feed of 20 values around 10.00 plus two spikes at 1000.00 and
    one dip at -500.00 must fence exactly those three."""
    import tempfile

    from merl_etl_spark.operators.quality import dq_iqr_outliers

    vals = [10.0 + (i % 5) * 0.01 for i in range(20)] + [1000.0, 1000.0, -500.0]
    rows = [
        (i, "2024-01-05 10:00:00", 1, "spiky", v, "{}")
        for i, v in enumerate(vals)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            f"{tmp}/events.parquet"
        )
        out = {r.event_type: r for r in dq_iqr_outliers(spark, tmp).collect()}
    r = out["spiky"]
    assert r.n == 23
    assert (r.n_low, r.n_high) == (1, 2)
    assert r.outlier_ppm == 3 * 1_000_000 // 23
    assert 1000 <= r.q1 <= r.med <= r.q3 <= 1004  # centi-units of ~10.0x
