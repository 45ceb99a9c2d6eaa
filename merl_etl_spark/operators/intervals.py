"""Interval-overlap join: activity sessions × campaign windows via
day-bucketed equi-join.

The reference's closest shape is its block-range scoping (merlin_etl.py
start/end block windows), which is a point-in-interval probe; the
general interval×interval OVERLAP join is what an analyst asks next
("which sessions ran during which campaign?") and is notoriously
quadratic if written as the naive theta join.  Spark-first answer: both
interval sets are exploded into the fixed-width time buckets they
cover, the join becomes an equi-join on the bucket key, and the exact
overlap predicate filters the candidates — the standard bucketed range
join (the same decomposition Databricks' range-join optimization
performs when hinted).

Scale notes (100 TB): bucket width trades replication for selectivity —
day buckets here (sessions are minutes long; campaigns days) replicate
each session ~1.02× and each campaign a handful of times.  The
campaign side is tiny and broadcast; the session side streams through
map-side explode → broadcast-hash-join with NO shuffle of the big side
at all, and the post-filter dedup + aggregate shuffles only surviving
(campaign, session) candidates, keyed by campaign.  The naive theta
join is kept solely as the DuckDB oracle (correct at fixture scale,
not run by Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

SESSION_GAP_US = 1800 * 1_000_000  # 30-minute inactivity gap, microseconds

# (campaign_id, start, end) — inclusive bounds, chosen to tile the
# fixtures' fixed January-2024 event span with two deliberately
# overlapping windows (4 and 5) so a session can match multiple
# campaigns.  Single source of truth for BOTH the Spark literal frame
# and the oracle's VALUES list.
CAMPAIGNS: list[tuple[int, str, str]] = [
    (1, "2024-01-02 00:00:00", "2024-01-05 23:59:59"),
    (2, "2024-01-06 00:00:00", "2024-01-09 23:59:59"),
    (3, "2024-01-11 00:00:00", "2024-01-14 23:59:59"),
    (4, "2024-01-16 00:00:00", "2024-01-21 23:59:59"),
    (5, "2024-01-20 00:00:00", "2024-01-24 23:59:59"),
    (6, "2024-01-26 00:00:00", "2024-01-30 23:59:59"),
]

_CAMPAIGN_VALUES = ",\n      ".join(
    f"({cid}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for cid, s, e in CAMPAIGNS
)


@register(
    "join-interval-overlap",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  )) > {SESSION_GAP_US}
                  OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_seq
      FROM gaps
    ),
    sess AS (
      SELECT user_id, sess_seq, min(ts) AS s_start, max(ts) AS s_end
      FROM numbered GROUP BY user_id, sess_seq
    ),
    campaigns(campaign_id, c_start, c_end) AS (VALUES
      {_CAMPAIGN_VALUES}
    )
    SELECT c.campaign_id,
           count(*) AS n_sessions,
           count(DISTINCT s.user_id) AS n_users,
           CAST(sum(epoch_us(least(s.s_end, c.c_end))
                    - epoch_us(greatest(s.s_start, c.c_start))) AS BIGINT)
             AS overlap_us
    FROM sess s JOIN campaigns c
      ON s.s_start <= c.c_end AND c.c_start <= s.s_end
    GROUP BY c.campaign_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which activity sessions overlapped which campaign windows, and for
    how long: gaps-and-islands sessionization of the event stream, then
    a day-bucketed interval-overlap equi-join against the campaign
    calendar, aggregated per campaign.

    The overlap join explodes each interval into the days it covers and
    equi-joins on the day — candidates that share a covered day — then
    applies the exact inclusive-overlap predicate and dedups (a pair
    sharing several days must count once).  Overlap durations are exact
    integer microseconds, so the per-campaign sums are
    partition-order-invariant."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > SESSION_GAP_US)
    ).cast("int")
    numbered = events.select(
        "user_id",
        "ts",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sess_seq"),
    )
    sess = numbered.groupBy("user_id", "sess_seq").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    s_days = sess.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.date_trunc("day", "s_start"),
                F.date_trunc("day", "s_end"),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    campaigns = spark.createDataFrame(
        CAMPAIGNS, "campaign_id int, c_start string, c_end string"
    ).select(
        "campaign_id",
        F.col("c_start").cast("timestamp").alias("c_start"),
        F.col("c_end").cast("timestamp").alias("c_end"),
    )
    c_days = campaigns.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.date_trunc("day", "c_start"),
                F.date_trunc("day", "c_end"),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    cand = (
        s_days.join(F.broadcast(c_days), "day")
        .filter(
            (F.col("s_start") <= F.col("c_end"))
            & (F.col("c_start") <= F.col("s_end"))
        )
        .select(
            "campaign_id", "user_id", "sess_seq",
            "s_start", "s_end", "c_start", "c_end",
        )
        .distinct()
    )
    overlap_us = F.unix_micros(F.least("s_end", "c_end")) - F.unix_micros(
        F.greatest("s_start", "c_start")
    )
    return cand.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(overlap_us).alias("overlap_us"),
    )


# ---------------------------------------------------------------------------
# intervals-coalesce — merge overlapping intervals (gaps and islands)
# ---------------------------------------------------------------------------


def coalesce_islands(iv: DataFrame) -> DataFrame:
    """The island engine behind intervals-coalesce, factored out so tests
    can drive it on synthetic interval sets (r11 ADVICE: the nested-
    interval regression must exercise THIS window chain, not a Python
    replica).  Input: (custkey, s, e) integer intervals with e >= s.
    Output: the per-key rollup (custkey, n_islands, n_orders,
    covered_days, span_days, busy_ppm).

    The island flag compares each start against the RUNNING MAX of all
    prior ends (ROWS frame over (s, e) ordering) — a lag on start times
    alone splits wrongly the moment one interval nests inside another."""
    w_prev = (
        Window.partitionBy("custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "is_start",
        F.when(F.max("e").over(w_prev) >= F.col("s"), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    islands = flagged.withColumn("island", F.sum("is_start").over(w_cum))
    merged = islands.groupBy("custkey", "island").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("s").alias("island_s"),
        F.max("e").alias("island_e"),
    )
    return merged.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_orders").alias("n_orders"),
        F.sum(F.col("island_e") - F.col("island_s") + 1).alias("covered_days"),
        (F.max("island_e") - F.min("island_s") + 1).alias("span_days"),
        F.expr(
            "SUM(island_e - island_s + 1) * 1000000"
            " DIV (max(island_e) - min(island_s) + 1)"
        ).alias("busy_ppm"),
    )



@register(
    "intervals-coalesce",
    oracle="""
    WITH iv AS (
      SELECT o.o_custkey AS custkey,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o.o_orderdate AS DATE)) AS BIGINT) AS s,
             greatest(CAST(date_diff('day', DATE '1970-01-01',
                            CAST(max(l.l_shipdate) AS DATE)) AS BIGINT),
                      CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o.o_orderdate AS DATE)) AS BIGINT)) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
      GROUP BY 1, o.o_orderkey, o.o_orderdate
    ),
    flagged AS (
      SELECT custkey, s, e,
             CASE WHEN max(e) OVER (PARTITION BY custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS is_start
      FROM iv
    ),
    islands AS (
      SELECT custkey, s, e,
             SUM(is_start) OVER (PARTITION BY custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    ),
    merged AS (
      SELECT custkey, island,
             CAST(count(*) AS BIGINT) AS n_orders,
             min(s) AS island_s, max(e) AS island_e
      FROM islands GROUP BY 1, 2
    )
    SELECT custkey,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(island_e - island_s + 1) AS BIGINT) AS covered_days,
           CAST(max(island_e) - min(island_s) + 1 AS BIGINT) AS span_days,
           CAST(SUM(island_e - island_s + 1) * 1000000
                // (max(island_e) - min(island_s) + 1) AS BIGINT)
             AS busy_ppm
    FROM merged GROUP BY 1
    """,
)
def intervals_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals per key — the gaps-and-islands
    primitive proper: each order spans [order date, last line shipped],
    a customer's overlapping orders coalesce into maximal busy periods,
    and the rollup reports islands, covered days, span, and the busy
    ratio.  win-sessionize is the POINT-event special case (gap
    threshold); this is the general interval form (an island stays open
    while ANY interval covers it — the running-max-of-ends trick, not a
    lag on start times, which breaks the moment one interval nests
    inside another).

    Intervals are clamped to e >= s (the fixture contains orders whose
    last ship date precedes the order date — an inverted interval would
    make "span" ill-defined; clamping says an order occupies at least
    its order day).

    Determinism: day ordinals are exact integers; the island flag
    compares the RUNNING MAX of prior ends (ROWS frame, (s, e)
    ordering — complete tie-break at the (custkey, s, e) grain since
    equal-(s, e) rows are interchangeable for coalescing); counts,
    coverage, and the ppm quotient are pure integers.

    Scale (100 TB): the interval build is the standard co-partitioned
    fact join + keyed max; both windows partition by custkey (per-key
    interval counts are customer-bounded); the rollups are map-side
    combinable.  The naive alternative — joining intervals to a
    calendar spine to count covered days — multiplies rows by interval
    length; this never leaves interval grain."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        orders.where(F.col("o_orderdate").isNotNull())
        .join(
            lineitem.where(F.col("l_shipdate").isNotNull()),
            orders["o_orderkey"] == lineitem["l_orderkey"],
        )
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            F.datediff(F.to_date("o_orderdate"), epoch).cast("long").alias("s"),
        )
        .agg(
            F.datediff(F.to_date(F.max("l_shipdate")), epoch)
            .cast("long")
            .alias("e_raw")
        )
        .select("custkey", "s", F.greatest("e_raw", "s").alias("e"))
    )
    return coalesce_islands(iv)


# ---------------------------------------------------------------------------
# analytics-peak-concurrency — sweep-line max of concurrent sessions
# ---------------------------------------------------------------------------

# sweep-line bucket width in microseconds (1 hour): the outer grain of
# the two-level prefix decomposition — exactness holds for any width.
CONC_BUCKET_US = 3_600_000_000

_SESS_CTES = f"""gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  )) > {SESSION_GAP_US}
                  OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_seq
      FROM gaps
    ),
    sess AS (
      SELECT user_id, sess_seq,
             epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
      FROM numbered GROUP BY user_id, sess_seq
    )"""


@register(
    "analytics-peak-concurrency",
    oracle=f"""
    WITH {_SESS_CTES},
    deltas AS (
      SELECT s_us AS tsu, 1 AS d FROM sess
      UNION ALL
      SELECT e_us + 1, -1 FROM sess
    ),
    by_ts AS (
      SELECT tsu, CAST(SUM(d) AS BIGINT) AS nd
      FROM deltas GROUP BY 1
    ),
    run AS (
      -- fixture-scale naive form: ONE global running sum over distinct
      -- change points (the operator uses the two-level decomposition)
      SELECT tsu,
             SUM(nd) OVER (ORDER BY tsu
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM by_ts
    )
    SELECT CAST(tsu // 86400000000 AS BIGINT) AS day_ord,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(count(*) AS BIGINT) AS n_change_points
    FROM run GROUP BY 1
    """,
)
def analytics_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning scalar
    (how many sessions were EVER alive at once?) computed as an exact
    sweep line: sessionize the event stream (the win-sessionize 30-min
    gap rule), emit +1/−1 at each session's [start, end+1µs), collapse
    deltas per distinct instant (tie-order-proof: simultaneous starts
    and ends net out BEFORE the running sum), and take the running-sum
    max per day.

    Exact-at-scale decomposition (the parallel prefix-max): per hour
    bucket, compute the delta NET and the intra-bucket running-sum MAX
    (windows keyed by bucket); the global level then needs only one
    running sum over HOUR-BUCKET NETS — calendar-bounded (8.8k rows per
    data-year), the allowlisted bounded-carry pattern — and each
    bucket's true peak is its carry-in plus its intra max.  Equivalence
    to the naive global sweep is the oracle check itself plus the
    planted-scenario pytest.

    Determinism: all instants are integer microseconds; day_ord is
    integer floor-division of nonneg micros; counts are exact ints.

    Scale (100 TB): sessionization is the keyed win-sessionize shape;
    the sweep works at (distinct change instant) grain keyed by hour
    bucket; only bucket summaries reach the global window."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > SESSION_GAP_US)
    ).cast("int")
    numbered = events.select(
        "user_id",
        "ts",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sess_seq"),
    )
    sess = numbered.groupBy("user_id", "sess_seq").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
    )
    deltas = sess.select(F.col("s_us").alias("tsu"), F.lit(1).alias("d")).unionAll(
        sess.select((F.col("e_us") + 1).alias("tsu"), F.lit(-1).alias("d"))
    )
    by_ts = deltas.groupBy("tsu").agg(F.sum("d").cast("long").alias("nd"))
    # FLOOR division (pmod form), not DIV: Spark DIV truncates toward
    # zero where the oracle's // floors — they disagree on any pre-1970
    # instant, and raw timestamps are not structurally positive
    bucket = F.expr(
        f"(tsu - pmod(tsu, {CONC_BUCKET_US})) DIV {CONC_BUCKET_US}"
    )
    w_intra = (
        Window.partitionBy("bucket")
        .orderBy("tsu")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = by_ts.withColumn("bucket", bucket).select(
        "bucket",
        "tsu",
        "nd",
        F.sum("nd").over(w_intra).alias("intra_run"),
    )
    per_bucket = intra.groupBy("bucket").agg(
        F.max("intra_run").alias("intra_peak"),
        F.sum("nd").alias("net"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )
    w_carry = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carried = per_bucket.select(
        "bucket",
        "n_points",
        (
            F.coalesce(F.sum("net").over(w_carry), F.lit(0))
            + F.col("intra_peak")
        ).alias("bucket_peak"),
    )
    day = F.expr(
        f"CAST((bucket * {CONC_BUCKET_US}"
        f" - pmod(bucket * {CONC_BUCKET_US}, 86400000000))"
        " DIV 86400000000 AS BIGINT)"
    )
    return carried.groupBy(day.alias("day_ord")).agg(
        F.max("bucket_peak").cast("long").alias("peak_concurrency"),
        F.sum("n_points").cast("long").alias("n_change_points"),
    )
