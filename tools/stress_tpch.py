#!/usr/bin/env python
"""100x TPC-H-shaped stress fixture: the sf0.1 star scaled 100-fold
(15M orders / ~60M lineitem / 1.5M customer / 100k supplier / 2M part),
generated deterministically in Spark (xxhash64-derived columns, no RNG
state) and written once to /tmp/stress100/tpch/.

Until this round, orders/lineitem-shaped stress drives ran at sf0.1
fixture scale with an honest "(fixture scale)" label; this generator
closes that gap so the r14 TPC-H-shaped analytics (and the r13
order-statistic trio) are driven at a genuine 100x.

Schemas mirror /root/testdata/sf0.1 exactly (same names, same arrow
dtypes, same value vocabularies — Brand#1..25, NATION_0..24 via the
fixture nation table, priorities 1-URGENT..5-LOW, dates 1995..2001) so
every registered query runs unmodified.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STRESS_TPCH = "/tmp/stress100/tpch"

_ORDERS = 15_000_000
_CUSTOMERS = 1_500_000
_SUPPLIERS = 100_000
_PARTS = 2_000_000
_NATIONS = 25

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_TYPES = ["LARGE", "STANDARD", "SMALL", "PROMO", "MEDIUM", "ECONOMY"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_ADJ = ["large", "hot", "blue", "old", "cold", "red", "dark", "pale"]
_NOUN = ["ring", "bolt", "plate", "wheel", "cog"]


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def _pick(vocab: list[str], h: F.Column) -> F.Column:
    arr = F.array(*[F.lit(v) for v in vocab])
    return F.element_at(arr, (F.pmod(h, F.lit(len(vocab))) + 1).cast("int"))


def _orders(spark: SparkSession) -> DataFrame:
    df = spark.range(_ORDERS).withColumn("h", _h("id", F.lit("o")))
    status_h = F.pmod(_h("id", F.lit("st")), F.lit(100))
    return df.select(
        (F.col("id") + 1).alias("o_orderkey"),
        (F.pmod(_h("id", F.lit("c")), F.lit(_CUSTOMERS)) + 1).alias("o_custkey"),
        F.when(status_h < 49, "O").when(status_h < 73, "F").otherwise("P").alias(
            "o_orderstatus"
        ),
        F.round(
            1000.0 + F.pmod(F.col("h"), F.lit(45_000_000)) / F.lit(100.0), 2
        ).alias("o_totalprice"),
        F.date_add(F.lit("1995-01-01").cast("date"), F.pmod(F.col("h"), F.lit(2404)).cast("int"))
        .cast("timestamp")
        .alias("o_orderdate"),
        _pick(_PRIORITIES, _h("id", F.lit("p"))).alias("o_orderpriority"),
    )


def _lineitem(spark: SparkSession) -> DataFrame:
    # 1..7 lines per order (avg 4 -> ~60M rows); every per-line column is
    # hash-derived from (orderkey, linenumber) so regeneration is stable
    base = spark.range(_ORDERS).select(
        (F.col("id") + 1).alias("l_orderkey"),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            F.pmod(_h("id", F.lit("o")), F.lit(2404)).cast("int"),
        ).alias("odate"),
        F.explode(
            F.sequence(F.lit(1), (F.pmod(_h("id", F.lit("n")), F.lit(7)) + 1).cast("int"))
        ).alias("l_linenumber"),
    )
    h = _h("l_orderkey", "l_linenumber")
    qty = (F.pmod(_h("l_orderkey", "l_linenumber", F.lit("q")), F.lit(50)) + 1).cast(
        "double"
    )
    return base.select(
        "l_orderkey",
        (F.pmod(h, F.lit(_PARTS)) + 1).alias("l_partkey"),
        (F.pmod(_h("l_orderkey", "l_linenumber", F.lit("s")), F.lit(_SUPPLIERS)) + 1).alias(
            "l_suppkey"
        ),
        F.col("l_linenumber").cast("int"),
        qty.alias("l_quantity"),
        F.round(
            qty * (900.0 + F.pmod(_h("l_orderkey", "l_linenumber", F.lit("e")), F.lit(10_000)) / F.lit(100.0)),
            2,
        ).alias("l_extendedprice"),
        (F.pmod(_h("l_orderkey", "l_linenumber", F.lit("d")), F.lit(11)) / F.lit(100.0)).alias(
            "l_discount"
        ),
        (F.pmod(_h("l_orderkey", "l_linenumber", F.lit("t")), F.lit(9)) / F.lit(100.0)).alias(
            "l_tax"
        ),
        _pick(["A", "N", "R"], _h("l_orderkey", "l_linenumber", F.lit("r"))).alias(
            "l_returnflag"
        ),
        _pick(["F", "O"], _h("l_orderkey", "l_linenumber", F.lit("l"))).alias(
            "l_linestatus"
        ),
        F.date_add(
            F.col("odate"),
            (F.pmod(_h("l_orderkey", "l_linenumber", F.lit("sd")), F.lit(122)) + 1).cast("int"),
        )
        .cast("timestamp")
        .alias("l_shipdate"),
    )


def _customer(spark: SparkSession) -> DataFrame:
    df = spark.range(_CUSTOMERS)
    return df.select(
        (F.col("id") + 1).alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id") + 1).alias("c_name"),
        F.pmod(_h("id", F.lit("n")), F.lit(_NATIONS)).cast("int").alias("c_nationkey"),
        F.round(
            (F.pmod(_h("id", F.lit("b")), F.lit(1_100_000)) - 100_000) / F.lit(100.0), 2
        ).alias("c_acctbal"),
        _pick(_SEGMENTS, _h("id", F.lit("m"))).alias("c_mktsegment"),
    )


def _supplier(spark: SparkSession) -> DataFrame:
    df = spark.range(_SUPPLIERS)
    return df.select(
        (F.col("id") + 1).alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id") + 1).alias("s_name"),
        F.pmod(_h("id", F.lit("n")), F.lit(_NATIONS)).cast("int").alias("s_nationkey"),
        F.round(
            (F.pmod(_h("id", F.lit("b")), F.lit(1_100_000)) - 100_000) / F.lit(100.0), 2
        ).alias("s_acctbal"),
    )


def _part(spark: SparkSession) -> DataFrame:
    df = spark.range(_PARTS)
    return df.select(
        (F.col("id") + 1).alias("p_partkey"),
        F.concat_ws(
            " ", _pick(_ADJ, _h("id", F.lit("a"))), _pick(_NOUN, _h("id", F.lit("w")))
        ).alias("p_name"),
        F.concat(
            F.lit("Brand#"), (F.pmod(_h("id", F.lit("b")), F.lit(25)) + 1)
        ).alias("p_brand"),
        _pick(_TYPES, _h("id", F.lit("t"))).alias("p_type"),
        (F.pmod(_h("id", F.lit("s")), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(
            900.0 + F.pmod(_h("id", F.lit("r")), F.lit(110_000)) / F.lit(100.0), 2
        ).alias("p_retailprice"),
    )


_BUILDERS = {
    "orders": _orders,
    "lineitem": _lineitem,
    "customer": _customer,
    "supplier": _supplier,
    "part": _part,
}


def ensure_tpch(spark: SparkSession) -> None:
    """Write any missing stress table (idempotent; ~3 GB total)."""
    os.makedirs(STRESS_TPCH, exist_ok=True)
    for name, build in _BUILDERS.items():
        path = f"{STRESS_TPCH}/{name}.parquet"
        if os.path.exists(f"{path}/_SUCCESS"):
            continue
        print(f"generating {path} ...", flush=True)
        build(spark).write.mode("overwrite").parquet(path)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from merl_etl_spark.session import get_spark

    ensure_tpch(get_spark("stress_tpch", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")))
