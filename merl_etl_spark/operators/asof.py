"""Scalable backward as-of join (SURVEY.md §2.D join-asof-blocktime,
generalized).

The reference resolves "timestamp → closest block before" via an explorer
API call (merlin_etl.py:199-236).  In-engine, that is a backward as-of
join: for every left row, the right row with the greatest right_ts <=
left_ts.  Spark has no built-in as-of join; a naive range join is O(n·m)
and a single global window is a 1-partition sort.  This implementation is
the scalable composition:

1. bucket both sides by a coarse tumbling time bucket (shuffle key);
2. within each bucket, union left+right and run one window pass
   (partitioned by bucket — parallel, bounded memory) where each left row
   picks up the last right row at-or-before it;
3. rows whose match is in an earlier bucket are resolved from a tiny
   per-bucket "closing value" summary (one row per bucket) — computed with
   a window over the summary (thousands of rows, not the fact table) and
   broadcast back.

Wall-clock scales with fact-table partitions; no global sort, no driver
loop.  Bucket width trades shuffle skew vs summary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from merl_etl_spark.lineage import cut_lineage
from merl_etl_spark.operators.joins import TS_FMT_DUCK, TS_FMT_SPARK
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Backward as-of join: left + the right row with max(right_ts) <= left_ts.

    ``right`` must be deduplicated to one row per ``right_ts`` by the caller
    (ties would make the match nondeterministic).  Returns all left columns
    plus ``right_cols`` (null when no earlier right row exists).
    """
    bucket = lambda c: (F.unix_timestamp(F.col(c)) / bucket_seconds).cast("bigint")  # noqa: E731

    l_tag = left.withColumn("__bucket", bucket(left_ts)).withColumn("__is_left", F.lit(1))
    r_tag = (
        right.withColumn("__bucket", bucket(right_ts)).withColumn("__is_left", F.lit(0))
    )

    l_cols = left.columns
    # The matched right row travels as ONE struct so the window carry and
    # the cross-bucket coalesce stay row-atomic: per-column
    # last(ignorenulls) would tear rows whenever a right column is
    # legitimately NULL (mixing values from different right rows).
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r_struct_type = r_tag.select(r_struct.alias("s")).schema["s"].dataType
    unioned = l_tag.select(
        F.col(left_ts).alias("__ts"),
        "__bucket",
        "__is_left",
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    ).unionByName(
        r_tag.select(
            F.col(right_ts).alias("__ts"),
            "__bucket",
            "__is_left",
            *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols],
            r_struct.alias("__r"),
        )
    )

    # In-bucket pass: right rows sort before left rows at equal ts, so a
    # left row at t matches a right row at exactly t (<= semantics).
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    in_bucket = unioned.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w_in).alias("__in")
    ).filter(F.col("__is_left") == 1)

    # Per-bucket closing values (one row per bucket → tiny), carried forward
    # across buckets with a summary-level window, then lagged one bucket so a
    # left row only sees strictly-earlier buckets.
    w_ts = Window.partitionBy("__bucket").orderBy(F.col(right_ts).desc())
    closing = (
        r_tag.withColumn("__rn", F.row_number().over(w_ts))
        .filter(F.col("__rn") == 1)
        .select("__bucket", r_struct.alias("__close"))
    )
    # r14 optimization (guide §2.4): ``closing`` has two consumers (the
    # all-buckets union and the prev join) — uncut, the right side's
    # bucket-window pipeline executed twice per query; the frame is one
    # row per bucket, so the cut is bounded.  Left buckets come from the
    # cheap pre-window ``l_tag`` (a map-side-combinable distinct), not
    # from ``in_bucket``, so the fact-scale union+window subtree is never
    # re-entered just to enumerate buckets.
    closing = cut_lineage(closing, eager=False)
    all_buckets = l_tag.select("__bucket").distinct().unionByName(
        closing.select("__bucket")
    ).distinct()
    w_carry = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    prev = all_buckets.join(closing, "__bucket", "left").select(
        "__bucket",
        F.last(F.col("__close"), ignorenulls=True).over(w_carry).alias("__prev"),
    )

    joined = in_bucket.join(F.broadcast(prev), "__bucket", "left").withColumn(
        "__match", F.coalesce(F.col("__in"), F.col("__prev"))
    )
    return joined.select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        *[F.col("__match").getField(c).alias(c) for c in right_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Forward as-of join: left + the right row with min(right_ts) >=
    left_ts — the explorer's ``closest=after`` lookup (merlin_etl.py:199-213,
    schema.sql:24) as a full join operator.  Implemented by time-negating
    both sides and running the backward join: negation reverses order, so
    'latest at-or-before' becomes 'earliest at-or-after'.  Same scale shape."""
    # negate at microsecond precision — unix_timestamp() would truncate to
    # seconds and scramble sub-second ordering; the cast tolerates
    # TIMESTAMP_NTZ inputs (unix_micros only accepts TIMESTAMP, and the
    # session tz is UTC so the cast is value-preserving)
    neg = lambda c: F.timestamp_micros(  # noqa: E731
        -F.unix_micros(F.col(c).cast("timestamp"))
    )
    l_neg = left.withColumn("__negts", neg(left_ts))
    r_neg = right.withColumn("__negts_r", neg(right_ts))
    out = asof_join_backward(
        l_neg, r_neg, "__negts", "__negts_r", right_cols, bucket_seconds=bucket_seconds
    )
    return out.drop("__negts")


@register(
    "join-asof-forward",
    oracle=f"""
    WITH l AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT ts AS c_ts, min(event_id) AS signup_id
      FROM events WHERE event_type = 'signup' GROUP BY ts
    )
    SELECT l.purchase_id, l.user_id,
           strftime(l.p_ts, '{TS_FMT_DUCK}') AS purchase_ts,
           r.signup_id,
           strftime(r.c_ts, '{TS_FMT_DUCK}') AS signup_ts
    FROM l ASOF LEFT JOIN r ON r.c_ts >= l.p_ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase matched to the earliest signup event
    at-or-after it (the 'closest after' block lookup generalized)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy(F.col("ts").alias("c_ts"))
        .agg(F.min("event_id").alias("signup_id"))
    )
    matched = asof_join_forward(
        purchases, signups, left_ts="p_ts", right_ts="c_ts", right_cols=["signup_id", "c_ts"]
    )
    return matched.select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
        "signup_id",
        F.date_format("c_ts", TS_FMT_SPARK).alias("signup_ts"),
    )


def _purchase_click_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared source prep + backward as-of for the purchase→click family
    (join-asof and join-asof-tolerance): purchases matched to the latest
    click at-or-before, clicks deduped to one row per ts (max event_id).
    One definition so the attribution source rules can never diverge
    between the plain and tolerance variants."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.col("ts").alias("c_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join_backward(
        purchases, clicks, left_ts="p_ts", right_ts="c_ts", right_cols=["click_id", "c_ts"]
    )


@register(
    "join-asof",
    oracle=f"""
    WITH l AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT ts AS c_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY ts
    )
    SELECT l.purchase_id, l.user_id,
           strftime(l.p_ts, '{TS_FMT_DUCK}') AS purchase_ts,
           r.click_id,
           strftime(r.c_ts, '{TS_FMT_DUCK}') AS click_ts
    FROM l ASOF LEFT JOIN r ON r.c_ts <= l.p_ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase event matched to the latest click
    event at-or-before it (the generalized timestamp→block 'closest before'
    lookup, merlin_etl.py:199-236).  Oracle uses DuckDB's native ASOF JOIN."""
    matched = _purchase_click_backward(spark, sf_dir)
    return matched.select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
        "click_id",
        F.date_format("c_ts", TS_FMT_SPARK).alias("click_ts"),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    left_key: str | None = None,
    bucket_seconds: int = 3600,
    check_unique_key: bool = False,
) -> DataFrame:
    """Nearest as-of join: left + the right row minimizing
    ``abs(right_ts - left_ts)``, ties broken toward the at-or-before
    match (the deterministic convention).

    FUSED single-pass composition (round 6; previously two full as-of
    passes re-joined on a left key): both directions ride ONE bucketed
    left∪right union and one shuffle on the bucket key — the backward
    match is a running ``last(right)`` over (ts asc, right-first) and the
    forward match a running ``first(right)`` over (ts asc, left-first),
    two window sorts over the same exchange.  Cross-bucket resolution
    broadcasts one summary row per bucket carrying the previous buckets'
    closing right row and the following buckets' opening right row.
    Versus the two-pass form this removes a second union shuffle and two
    key re-joins, and — because each left row resolves independently —
    removes the unique-left-key CONTRACT entirely: duplicate left rows
    are fine (ADVICE r5 flagged the silent fan-out; the fused shape makes
    the failure mode unrepresentable).

    ``left_key``/``check_unique_key`` are retained for callers that still
    want to assert their OWN key contract eagerly (one aggregate over the
    left frame); the join itself no longer uses the key.

    ``right_ts`` need not be listed in ``right_cols``; it participates
    in the distance pick either way and is only emitted if requested.

    ``right`` must be deduplicated to one row per ``right_ts`` by the
    caller — the same precondition as :func:`asof_join_backward` (ties at
    one timestamp would make the matched row partition-order-dependent in
    the running last() and the closing/opening row_number picks).  The
    LEFT side has no such contract.

    Adds a ``direction`` column: 'before' / 'after' / NULL (no match on
    either side)."""
    if check_unique_key and left_key is not None:
        dup = (
            left.groupBy(left_key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"asof_join_nearest requires a unique left_key; "
                f"{left_key!r} has duplicate value {dup[0][0]!r}"
            )
    # the pass needs right_ts to compute distances even when the caller
    # didn't ask for it in the output
    pass_cols = list(right_cols) if right_ts in right_cols else [*right_cols, right_ts]
    bucket = lambda c: (F.unix_timestamp(F.col(c)) / bucket_seconds).cast("bigint")  # noqa: E731

    l_tag = left.withColumn("__bucket", bucket(left_ts)).withColumn("__is_left", F.lit(1))
    r_tag = right.withColumn("__bucket", bucket(right_ts)).withColumn("__is_left", F.lit(0))
    l_cols = left.columns
    r_struct = F.struct(*[F.col(c).alias(c) for c in pass_cols])
    r_struct_type = r_tag.select(r_struct.alias("s")).schema["s"].dataType
    unioned = l_tag.select(
        F.col(left_ts).alias("__ts"),
        "__bucket",
        "__is_left",
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    ).unionByName(
        r_tag.select(
            F.col(right_ts).alias("__ts"),
            "__bucket",
            "__is_left",
            *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols],
            r_struct.alias("__r"),
        )
    )
    # backward: running last(right) scanning ts ASC, right before left at
    # equal ts (<= includes ties).  forward: running last(right) scanning
    # ts DESC, right before left at equal ts (>= includes ties) — the
    # descending scan makes the forward match a RUNNING
    # unboundedPreceding frame too.  Both frames must be running
    # (unboundedPreceding → current): Spark evaluates an
    # unboundedFollowing frame by re-aggregating the partition remainder
    # PER ROW — O(n²) per bucket, measured 2× slower than the two-pass
    # form at the 2M-event stress before this flip.  Same partition key —
    # one exchange, two in-partition sorts, both linear.
    w_b = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    in_bucket = unioned.select(
        "*",
        F.last("__r", ignorenulls=True).over(w_b).alias("__in_b"),
        F.last("__r", ignorenulls=True).over(w_f).alias("__in_f"),
    ).filter(F.col("__is_left") == 1)

    # per-bucket closing (max right_ts) and opening (min right_ts) rows —
    # ONE summary row per bucket; prev/next resolution is a window over
    # this bounded summary, broadcast back to the fact rows
    edges = r_tag.select(
        "__bucket", r_struct.alias("__s"), F.col(right_ts).alias("__rts")
    ).select(
        "__bucket",
        "__s",
        F.row_number()
        .over(Window.partitionBy("__bucket").orderBy(F.col("__rts").desc()))
        .alias("__rn_c"),
        F.row_number()
        .over(Window.partitionBy("__bucket").orderBy(F.col("__rts").asc()))
        .alias("__rn_o"),
    )
    closing = edges.filter(F.col("__rn_c") == 1).select("__bucket", F.col("__s").alias("__close"))
    opening = edges.filter(F.col("__rn_o") == 1).select("__bucket", F.col("__s").alias("__open"))
    # r14 optimization (guide §2.4), same shape as asof_join_backward:
    # closing/opening are 1-row-per-bucket summaries with two consumers
    # each — cut once; bucket enumeration reads the cheap l_tag distinct
    # instead of re-entering the fact-scale in_bucket window subtree.
    closing = cut_lineage(closing, eager=False)
    opening = cut_lineage(opening, eager=False)
    all_buckets = (
        l_tag.select("__bucket")
        .distinct()
        .unionByName(closing.select("__bucket"))
        .distinct()
    )
    # both carries as RUNNING frames (the descending scan turns "first
    # opening among later buckets" into a running last) — an
    # unboundedFollowing frame is O(n²) even over this bounded summary
    w_carry = Window.orderBy(F.col("__bucket").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_next = Window.orderBy(F.col("__bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    summary = (
        all_buckets.join(closing, "__bucket", "left")
        .join(opening, "__bucket", "left")
        .select(
            "__bucket",
            F.last("__close", ignorenulls=True).over(w_carry).alias("__prev"),
            F.last("__open", ignorenulls=True).over(w_next).alias("__next"),
        )
    )
    j = in_bucket.join(F.broadcast(summary), "__bucket", "left")
    b = F.coalesce(F.col("__in_b"), F.col("__prev"))
    f = F.coalesce(F.col("__in_f"), F.col("__next"))
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    b_ts, f_ts = b.getField(right_ts), f.getField(right_ts)
    diff_b = us(F.col("__ts")) - us(b_ts)
    diff_f = us(f_ts) - us(F.col("__ts"))
    pick_b = f_ts.isNull() | (b_ts.isNotNull() & (diff_b <= diff_f))
    picked = [
        F.when(pick_b, b.getField(c)).otherwise(f.getField(c)).alias(c)
        for c in right_cols
    ]
    direction = F.when(
        b_ts.isNull() & f_ts.isNull(), F.lit(None).cast("string")
    ).otherwise(F.when(pick_b, "before").otherwise("after"))
    return j.select(
        *[F.col(f"__l_{c}").alias(c) for c in l_cols],
        *picked,
        direction.alias("direction"),
    )


@register(
    "join-asof-nearest",
    oracle=f"""
    WITH l AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT ts AS c_ts, min(event_id) AS signup_id
      FROM events WHERE event_type = 'signup' GROUP BY ts
    ),
    b AS (
      SELECT l.purchase_id, l.user_id, l.p_ts, r.c_ts AS b_ts, r.signup_id AS b_id
      FROM l ASOF LEFT JOIN r ON r.c_ts <= l.p_ts
    ),
    f AS (
      SELECT l.purchase_id, r.c_ts AS f_ts, r.signup_id AS f_id
      FROM l ASOF LEFT JOIN r ON r.c_ts >= l.p_ts
    ),
    j AS (
      SELECT b.*, f.f_ts, f.f_id,
             (f.f_ts IS NULL OR (b.b_ts IS NOT NULL AND
              epoch_us(b.p_ts) - epoch_us(b.b_ts)
                <= epoch_us(f.f_ts) - epoch_us(b.p_ts))) AS pick_b
      FROM b JOIN f ON b.purchase_id = f.purchase_id
    )
    SELECT purchase_id, user_id,
           strftime(p_ts, '{TS_FMT_DUCK}') AS purchase_ts,
           CASE WHEN pick_b THEN b_id ELSE f_id END AS signup_id,
           strftime(CASE WHEN pick_b THEN b_ts ELSE f_ts END,
                    '{TS_FMT_DUCK}') AS signup_ts,
           CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                WHEN pick_b THEN 'before' ELSE 'after' END AS direction
    FROM j
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each purchase matched to the CLOSEST signup event in
    either time direction (ties → the at-or-before match) — the explorer's
    two 'closest=before'/'closest=after' probes (merlin_etl.py:199-213)
    fused into the single lookup most callers actually want."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy(F.col("ts").alias("c_ts"))
        .agg(F.min("event_id").alias("signup_id"))
    )
    matched = asof_join_nearest(
        purchases, signups, left_ts="p_ts", right_ts="c_ts",
        right_cols=["signup_id", "c_ts"], left_key="purchase_id",
    )
    return matched.select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
        "signup_id",
        F.date_format("c_ts", TS_FMT_SPARK).alias("signup_ts"),
        "direction",
    )


TOLERANCE_SECONDS = 600  # 10-minute matching window for join-asof-tolerance


@register(
    "join-asof-tolerance",
    oracle=f"""
    WITH l AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT ts AS c_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY ts
    ),
    m AS (
      SELECT l.purchase_id, l.user_id, l.p_ts, r.c_ts, r.click_id,
             (r.c_ts IS NOT NULL AND
              epoch_us(l.p_ts) - epoch_us(r.c_ts) <= {TOLERANCE_SECONDS} * 1000000)
               AS in_tol
      FROM l ASOF LEFT JOIN r ON r.c_ts <= l.p_ts
    )
    SELECT purchase_id, user_id,
           strftime(p_ts, '{{TS_FMT_DUCK}}') AS purchase_ts,
           CASE WHEN in_tol THEN click_id END AS click_id,
           strftime(CASE WHEN in_tol THEN c_ts END, '{{TS_FMT_DUCK}}') AS click_ts
    FROM m
    """.format(TS_FMT_DUCK=TS_FMT_DUCK),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback as-of join (pandas ``merge_asof(tolerance=...)``
    semantics): each purchase matched to the latest click at-or-before it,
    but only if that click is within TOLERANCE_SECONDS — staler matches
    degrade to NULL exactly as an unmatched row would.  The standard guard
    against joining a quote/price/click that is too old to be meaningful.

    Composes the existing bucketed backward as-of (no new shuffle: the
    tolerance is a post-match projection, so the plan is identical to
    join-asof plus one WholeStageCodegen CASE).  A tolerance no larger
    than the as-of bucket width would also allow skipping the cross-bucket
    carry entirely (matches can only come from the same or previous
    bucket); not exploited here because the generic carry is already one
    broadcast row per bucket."""
    matched = _purchase_click_backward(spark, sf_dir)
    in_tol = F.col("c_ts").isNotNull() & (
        F.unix_micros(F.col("p_ts").cast("timestamp"))
        - F.unix_micros(F.col("c_ts").cast("timestamp"))
        <= TOLERANCE_SECONDS * 1_000_000
    )
    return matched.select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.when(in_tol, F.col("click_id")).alias("click_id"),
        F.when(in_tol, F.date_format("c_ts", TS_FMT_SPARK)).alias("click_ts"),
    )


@register(
    "join-asof-keyed",
    oracle=f"""
    WITH l AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts AS c_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT l.purchase_id, l.user_id,
           strftime(l.p_ts, '{TS_FMT_DUCK}') AS purchase_ts,
           r.click_id,
           strftime(r.c_ts, '{TS_FMT_DUCK}') AS click_ts
    FROM l ASOF LEFT JOIN r
      ON r.user_id = l.user_id AND r.c_ts <= l.p_ts
    """,
)
def join_asof_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED backward as-of join: each purchase matched to the SAME
    USER's latest click at-or-before it — the per-entity form (per
    symbol, per device, per wallet) that most real as-of workloads
    want, and the batch twin of the watermarked stream-stream
    attribution join.

    The partition key makes this STRUCTURALLY SIMPLER than the global
    as-of: no bucketed union-window with cross-bucket carry — both
    sides union into one frame, and a ``last(click, ignorenulls)``
    running window PARTITIONED BY user_id ORDER BY (ts, is_left,
    event_id) carries each user's latest click forward linearly.  The
    tie order puts right rows before left at equal ts (at-or-before
    includes same-instant matches).  One shuffle on user_id; a user's
    own history is the only per-partition state, so the shape holds at
    any corpus scale with user-count parallelism (a pathologically hot
    key would ride the standard salt-by-time-range split).  Oracle:
    DuckDB's native keyed ASOF JOIN."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("t"),
    ).withColumn("is_left", F.lit(1))
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("t"))
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("is_left", F.lit(0))
        .withColumn("purchase_id", F.lit(None).cast("long"))
    )
    unioned = purchases.withColumn("click_id", F.lit(None).cast("long")).select(
        "user_id", "t", "is_left", "purchase_id", "click_id"
    ).unionByName(clicks.select("user_id", "t", "is_left", "purchase_id", "click_id"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_left", F.coalesce("click_id", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_click_id", F.last("click_id", ignorenulls=True).over(w)
    ).withColumn(
        "last_click_t",
        F.last(F.when(F.col("is_left") == 0, F.col("t")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("is_left") == 1).select(
        "purchase_id",
        "user_id",
        F.date_format("t", TS_FMT_SPARK).alias("purchase_ts"),
        F.col("last_click_id").alias("click_id"),
        F.date_format("last_click_t", TS_FMT_SPARK).alias("click_ts"),
    )
