"""Semantic tests for the round-12 wave-8 operators: Q14 promo share
and the primary-key uniqueness audit."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal


def _r2(d: Decimal) -> float:
    return float(d.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# analytics-promo-share
# ---------------------------------------------------------------------------


def test_promo_share_matches_decimal_replay(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate").isNotNull())
        .select(
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            "l_partkey",
            "l_extendedprice",
            "l_discount",
        )
        .collect()
    )
    ptype = {
        r.p_partkey: r.p_type
        for r in load_table(spark, sf_dir, "part").select("p_partkey", "p_type").collect()
    }

    def d6(x):
        return Decimal(f"{x:.6f}")

    agg = defaultdict(lambda: [0, 0, Decimal(0), Decimal(0)])
    for r in li:
        a = agg[r.month]
        rev = (d6(r.l_extendedprice) * (1 - d6(r.l_discount))).quantize(
            Decimal("1E-12")
        )
        a[1] += 1
        a[3] += rev
        if ptype[r.l_partkey] == "PROMO":
            a[0] += 1
            a[2] += rev
    rows = {r.month: r for r in QUERIES["analytics-promo-share"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for month, (np, nl, pr, tr) in agg.items():
        r = rows[month]
        assert r.n_promo_lines == np
        assert r.n_lines == nl
        assert r.promo_ppm == math.floor(float(pr) * 1_000_000 / float(tr))
        assert 0 <= r.promo_ppm <= 1_000_000
        assert r.promo_revenue == _r2(pr)
        assert r.total_revenue == _r2(tr)


def test_promo_share_has_both_classes(spark, sf_dir):
    rows = QUERIES["analytics-promo-share"](spark, sf_dir).collect()
    assert rows
    # PROMO is one of six part types — shares must be interior, and
    # promo revenue strictly below total everywhere
    for r in rows:
        assert 0 < r.n_promo_lines < r.n_lines
        assert r.promo_revenue < r.total_revenue


# ---------------------------------------------------------------------------
# dq-primary-keys
# ---------------------------------------------------------------------------


def test_primary_keys_matches_direct_counts(spark, sf_dir):
    from merl_etl_spark.operators.quality import PK_CONTRACT

    rows = {r.table_name: r for r in QUERIES["dq-primary-keys"](spark, sf_dir).collect()}
    assert set(rows) == {t for t, _ in PK_CONTRACT}
    for table, keys in PK_CONTRACT:
        df = load_table(spark, sf_dir, table)
        n_rows = df.count()
        keyed = df.where(
            F.expr(" AND ".join(f"{k} IS NOT NULL" for k in keys))
        )
        n_keyed = keyed.count()
        n_distinct = keyed.select(*keys).distinct().count()
        r = rows[table]
        assert r.n_rows == n_rows
        assert r.n_keyed_rows == n_keyed
        assert r.n_distinct_keys == n_distinct
        assert r.n_excess_rows == n_keyed - n_distinct
        assert r.key_columns == ", ".join(keys)


def test_primary_keys_flags_injected_duplicates(spark):
    """The audit arithmetic on a hand-built frame with known dupes:
    5 keyed rows over 3 distinct keys -> 2 excess; NULL keys drop out
    of the keyed population but stay in n_rows."""
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (2,), (2,), (None,)], "k long"
    )
    keyed = df.where(F.col("k").isNotNull())
    per_key = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("d"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0)).alias("x"),
        F.sum("c").alias("n"),
    ).collect()[0]
    assert (stats.d, stats.x, stats.n) == (2, 3, 5)
    assert df.count() == 6
