"""Analytic window functions + sessionization (engine extensions — the
reference's only window is the rank (§2.F); these complete the window
surface a migrating user expects: lag/lead/ntile, sliding frames, and
session windows).

Scale shape: all of these shuffle once on the window partition key
(user/stream), then run in-partition sorted passes — the same cost class
as the reference's rank derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from merl_etl_spark.operators.aggregates import DEC, DEC_SUM, dec_sum
from merl_etl_spark.operators.joins import TS_FMT_DUCK, TS_FMT_SPARK
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


@register(
    "win-analytic-suite",
    oracle=f"""
    SELECT event_id, user_id,
           lag(event_id) OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           row_number() OVER w AS rn,
           dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS type_rank,
           ntile(4) OVER w AS quartile,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving_sum3,
           strftime(COALESCE(lag(ts) OVER w, ts), '{TS_FMT_DUCK}') AS prev_ts
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def win_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / row_number / dense_rank / ntile / bounded-frame moving
    sum per stream, ordered by block — the §2.F '(frame specs) none'
    gap filled."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("event_id")
    frame3 = w.rowsBetween(-2, 0)
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.dense_rank()
        .over(Window.partitionBy("user_id").orderBy("event_type"))
        .cast("long")
        .alias("type_rank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.sum(F.col("value").cast(DEC)).over(frame3).cast("double").alias("moving_sum3"),
        F.date_format(F.coalesce(prev_ts, F.col("ts")), TS_FMT_SPARK).alias("prev_ts"),
    )


@register(
    "win-sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts) > 1800 * 1000000
                  THEN 1 ELSE CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                        IS NULL THEN 1 ELSE 0 END END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(max(ts), '{TS_FMT_DUCK}') AS session_last_event,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap via Spark's native
    ``session_window`` (dynamic-length event-time windows — also valid
    under Structured Streaming with a watermark).  The oracle derives the
    identical sessions with the classic gaps-and-islands SQL."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.min("ts").alias("s_min"),
            F.max("ts").alias("s_max"),
            F.count("*").alias("n_events"),
            dec_sum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("s_min", TS_FMT_SPARK).alias("session_start"),
            F.date_format("s_max", TS_FMT_SPARK).alias("session_last_event"),
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# win-cumulative-distinct — running distinct-count per partition
# ---------------------------------------------------------------------------

@register(
    "win-cumulative-distinct",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type ORDER BY ts, event_id
                  ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
           event_type,
           CAST(sum(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_distinct_types
    FROM flagged
    """,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running count of DISTINCT event types seen so far — the
    window-function gap SQL can't express directly (``count(DISTINCT)``
    isn't allowed over a running frame) closed with the standard
    first-occurrence-flag trick: mark each (user, type)'s first event via
    a per-(user, type) row_number, then running-sum the flags per user.

    Both windows are partitioned (user×type, then user) — partition
    cardinality × per-user event runs bound the memory, nothing global.
    Ties are broken by event_id so the flag assignment and the running
    frame are deterministic."""
    events = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        "event_type",
        F.sum("first_seen").over(w_run).alias("cum_distinct_types"),
    )


@register(
    "win-streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, anchor,
             count(*) AS streak_len,
             min(d) AS streak_start,
             max(d) AS streak_end
      FROM grp GROUP BY user_id, anchor
    ),
    ranked AS (
      SELECT user_id, streak_len, streak_start, streak_end,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY streak_len DESC, streak_start ASC) AS rnk
      FROM streaks
    )
    SELECT r.user_id,
           r.streak_len AS longest_streak_days,
           strftime(r.streak_start, '%Y-%m-%d') AS streak_start,
           strftime(r.streak_end, '%Y-%m-%d') AS streak_end,
           s.n_streaks,
           s.n_active_days
    FROM ranked r
    JOIN (
      SELECT user_id, count(*) AS n_streaks,
             CAST(sum(streak_len) AS BIGINT) AS n_active_days
      FROM streaks GROUP BY user_id
    ) s ON s.user_id = r.user_id
    WHERE r.rnk = 1
    """,
)
def win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands window composition (distinct active days →
    ``day - row_number()`` island anchor → per-island length → per-user
    argmax), the engagement metric every activity pipeline derives and a
    shape generic SQL engines express the same way (no recursive CTE, no
    per-user iteration).

    Scale shape: one distinct on (user_id, day) — already tiny vs raw
    events — then every window/agg partitions by user_id; a user's day
    count is bounded by the calendar, so no partition outgrows memory
    regardless of event volume.  All outputs are exact longs / date
    strings; ties for the longest streak break on earliest start."""
    events = load_table(spark, sf_dir, "events")
    days = (
        events.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    per_user = streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("streak_len").alias("n_active_days"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start").asc()
    )
    best = (
        streaks.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") == 1)
        .drop("rnk", "anchor")
    )
    return best.join(per_user, "user_id").select(
        "user_id",
        F.col("streak_len").alias("longest_streak_days"),
        F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
        F.date_format("streak_end", "yyyy-MM-dd").alias("streak_end"),
        "n_streaks",
        "n_active_days",
    )


@register(
    "win-frame-suite",
    oracle=f"""
    SELECT event_id, event_type,
           strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
           first_value(event_id) OVER w3 AS first_in_frame,
           nth_value(event_id, 2) OVER w3 AS second_in_frame,
           last_value(event_id) OVER w3 AS last_in_frame,
           percent_rank() OVER wfull AS pct_rank,
           cume_dist() OVER wfull AS cum_dist
    FROM events
    WHERE event_id < 5000
    WINDOW
      w3 AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      wfull AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
)
def win_frame_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame function suite: first/nth/last value over an explicit
    trailing 3-row frame plus the distribution functions
    (percent_rank, cume_dist) over the full partition — the §2.F frame
    vocabulary win-analytic-suite's lag/lead/ntile rows don't cover.

    All windows partition by series with a total (ts, event_id) order,
    so frame contents are deterministic; the distribution ratios are
    emitted as RAW doubles on both engines — they are small-integer
    ratios ((rank-1)/(n-1)) whose IEEE quotients are bit-identical, and
    a round() would only ADD the shortest-repr rounding-tie risk
    documented in ARCHITECTURE.md (ADVICE r6).  Frames are linear
    two-pointer passes per partition — no re-scan per row."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    w3 = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    wfull = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "event_type",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        F.first("event_id").over(w3).alias("first_in_frame"),
        F.nth_value("event_id", 2).over(w3).alias("second_in_frame"),
        F.last("event_id").over(w3).alias("last_in_frame"),
        F.percent_rank().over(wfull).alias("pct_rank"),
        F.cume_dist().over(wfull).alias("cum_dist"),
    )
