"""Join operators (SURVEY.md §2.D).

The reference's joins are all small-side joins: a 1-row "latest bucket"
scalar CTE, a ≤100-row Top-100 list, and an as-of timestamp→block lookup.
Spark-first mapping: broadcast the provably-small side so the fact-table
scan never shuffles for the join; the semi-join stays a broadcast
left-semi (BroadcastHashJoin, no shuffle of the big side).  At 100 TB the
big side streams through executors once; only aggregations shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "join-latest-bucket",
    oracle="""
    WITH latest AS (
      SELECT date_trunc('day', max(ts)) AS latest_day FROM events
    )
    SELECT e.event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e
    JOIN latest l ON date_trunc('day', e.ts) = l.latest_day
    GROUP BY e.event_type
    """,
)
def join_latest_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restrict the fact table to its newest snapshot bucket via a broadcast
    join against a 1-row max-bucket aggregate (sql/top100_compute.sql:4-8,20;
    scripts/ingest_activity_and_report.sh:21-30).  Day buckets stand in for
    the 6h snapshot buckets."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    latest = F.broadcast(
        events.agg(F.date_trunc("day", F.max("ts")).alias("latest_day"))
    )
    # Sum in decimal (order-insensitive, exact), cast ONCE to double at the
    # output boundary: both engines round the same exact decimal to the same
    # float64 bit pattern (safe while unscaled < 2^53), so value hashes match.
    return (
        events.join(latest, events["day"] == latest["latest_day"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@register(
    "join-cross-1row",
    oracle="""
    WITH totals AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS grand_total
      FROM events
    )
    SELECT e.event_type,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS type_total,
           CAST(t.grand_total AS DOUBLE) AS grand_total
    FROM events e, totals t
    GROUP BY e.event_type, t.grand_total
    """,
)
def join_cross_1row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit comma cross-join with a 1-row aggregate CTE
    (scripts/run_holders_and_report.sh:25-28,46-48): per-group totals
    alongside the grand total, via crossJoin(broadcast(oneRow))."""
    events = load_table(spark, sf_dir, "events")
    totals = F.broadcast(
        events.agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").alias("grand_total")
        )
    )
    return (
        events.crossJoin(totals)
        .groupBy("event_type", "grand_total")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("type_total")
        )
        .select(
            "event_type",
            "type_total",
            F.col("grand_total").cast("double").alias("grand_total"),
        )
    )


@register(
    "join-semi-top100",
    oracle="""
    WITH top100 AS (
      SELECT c_custkey
      FROM (
        SELECT c_custkey,
               RANK() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        FROM customer
      ) WHERE rnk <= 100
    )
    SELECT o.o_custkey,
           count(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend
    FROM orders o
    WHERE o.o_custkey IN (SELECT c_custkey FROM top100)
    GROUP BY o.o_custkey
    """,
)
def join_semi_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restrict the event stream to the Top-100 list via left-semi join
    (``wallet_address IN (SELECT holder_address …)``,
    scripts/ingest_activity_and_report.sh:37,83).  The ≤100-row side is
    broadcast, so the orders scan never shuffles for the join."""
    from merl_etl_spark.operators.ranking import rank_top_k

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    top100 = rank_top_k(
        customer,
        partition_by=[],
        order_by=[F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        k=100,
    ).select("c_custkey")
    return (
        orders.join(
            F.broadcast(top100), orders["o_custkey"] == top100["c_custkey"], "left_semi"
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


CAMPAIGNS = [
    ("launch", "1995-01-01", "1996-07-01"),
    ("growth", "1996-07-01", "1999-01-01"),
    ("mature", "1999-01-01", "2002-01-01"),
]


@register(
    "join-range-interval",
    oracle="""
    WITH campaigns(name, start_ts, end_ts) AS (
      VALUES ('launch', TIMESTAMP '1995-01-01', TIMESTAMP '1996-07-01'),
             ('growth', TIMESTAMP '1996-07-01', TIMESTAMP '1999-01-01'),
             ('mature', TIMESTAMP '1999-01-01', TIMESTAMP '2002-01-01')
    )
    SELECT c.name AS campaign,
           count(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM orders o
    JOIN campaigns c ON o.o_orderdate >= c.start_ts AND o.o_orderdate < c.end_ts
    GROUP BY c.name
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: facts against a small table of half-open time
    ranges via a non-equi broadcast join (BroadcastNestedLoop — fine
    because the range side is tiny and broadcast; a large-large interval
    join would bucket both sides first, as operators/asof.py does).
    Generalizes the reference's interval predicates
    (scripts/ingest_activity_and_report.sh:36) to named range dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    campaigns = F.broadcast(
        spark.createDataFrame(CAMPAIGNS, "name string, start_ts string, end_ts string")
        .withColumn("start_ts", F.col("start_ts").cast("timestamp"))
        .withColumn("end_ts", F.col("end_ts").cast("timestamp"))
    )
    return (
        orders.join(
            campaigns,
            (orders["o_orderdate"] >= campaigns["start_ts"])
            & (orders["o_orderdate"] < campaigns["end_ts"]),
        )
        .groupBy(F.col("name").alias("campaign"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("volume"),
        )
    )


@register(
    "join-asof-blocktime",
    oracle=f"""
    WITH x AS (
      SELECT max(ts) - INTERVAL 24 HOUR AS probe_ts FROM events
    )
    SELECT strftime(x.probe_ts, '{TS_FMT_DUCK}') AS probe_ts,
           (SELECT max(e.event_id) FROM events e, x WHERE e.ts <= x.probe_ts) AS block_before,
           (SELECT min(e.event_id) FROM events e, x WHERE e.ts >= x.probe_ts) AS block_after
    FROM x
    """,
)
def join_asof_blocktime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar as-of lookup: timestamp → nearest event id before/after
    (src-block-by-time / join-asof-blocktime, merlin_etl.py:199-236; the
    explorer's getblocknobytime 'closest' semantics, schema.sql:16-18,24).
    The probe instant is frozen to max(ts)-24h for determinism.

    Relies on event_id being monotone with ts (block numbers are monotone
    with block time in the reference)."""
    events = load_table(spark, sf_dir, "events")
    probe = F.broadcast(events.agg((F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("probe_ts")))
    joined = events.crossJoin(probe)
    return (
        joined.agg(
            F.first(F.date_format("probe_ts", TS_FMT_SPARK)).alias("probe_ts"),
            F.max(F.when(F.col("ts") <= F.col("probe_ts"), F.col("event_id"))).alias(
                "block_before"
            ),
            F.min(F.when(F.col("ts") >= F.col("probe_ts"), F.col("event_id"))).alias(
                "block_after"
            ),
        )
    )
