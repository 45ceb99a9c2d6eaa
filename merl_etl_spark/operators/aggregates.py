"""Aggregation operators (SURVEY.md §2.E).

The centerpiece is the reference's hourly whale-activity aggregation
(scripts/ingest_activity_and_report.sh:20-101): sliding 60-minute
event-time window → per-wallet conditional inflow/outflow sums → scalar
rollup (active wallets, tx rows, in, out, net).

Scale notes: groupBy aggregations are partial-aggregated map-side by Spark
(HashAggregate → Exchange → HashAggregate), so the shuffle carries one row
per (group, partition) not per event.  All money sums are DecimalType —
exact, and therefore order-insensitive across partitions, which both keeps
results deterministic at any parallelism and lets the oracle hash match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

from merl_etl_spark.operators.joins import TS_FMT_DUCK, TS_FMT_SPARK

DEC = "decimal(18,6)"
DEC_SUM = "decimal(38,6)"


def dec_sum(col: Column) -> Column:
    """Exact decimal sum of a double column (deterministic at any DOP)."""
    return F.sum(col.cast(DEC)).cast(DEC_SUM)


def net_revenue_spark() -> Column:
    """The discounted line revenue extendedprice·(1−discount) as an
    exact decimal with PINNED intermediate scales — (12,6)×(7,6) held at
    (19,12) — because the engines' decimal width-growth rules differ and
    an unpinned chain either overflows DuckDB's 38-digit multiply or
    trips Spark's precision-loss truncation.  ONE definition (with
    net_revenue_duck as its oracle twin) shared by dq-reconciliation,
    analytics-revenue-bridge, analytics-returned-revenue, and
    analytics-promo-share (review r12: the expression pair was
    hand-rolled in all four, the exact drift class corr_from_moments /
    knn_edges / md5_bucket_* exist to prevent)."""
    return (
        F.col("l_extendedprice").cast("decimal(12,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(7,6)"))
    ).cast("decimal(19,12)")


def net_revenue_duck(prefix: str = "") -> str:
    """DuckDB twin of net_revenue_spark; ``prefix`` qualifies the
    lineitem columns (e.g. ``"l."``)."""
    return (
        f"CAST(CAST({prefix}l_extendedprice AS DECIMAL(12,6))"
        f" * (1 - CAST({prefix}l_discount AS DECIMAL(7,6)))"
        f" AS DECIMAL(19,12))"
    )


@register(
    "agg-max-scalar",
    oracle=f"""
    SELECT strftime(max(ts), '{TS_FMT_DUCK}') AS max_ts,
           max(event_id) AS max_event_id
    FROM events
    """,
)
def agg_max_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar max aggregate — the latest-bucket discovery
    (sql/top100_compute.sql:5; scripts/run_holders_and_report.sh:19,43)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.date_format(F.max("ts"), TS_FMT_SPARK).alias("max_ts"),
        F.max("event_id").alias("max_event_id"),
    )


@register(
    "agg-count-rows",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types
    FROM events
    """,
)
def agg_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) rowcounts (scripts/run_holders_and_report.sh:25-28) plus
    distinct counts (engine extension beyond the reference, §2.E absent)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


def last_hour_window(events: DataFrame) -> DataFrame:
    """The shared 60-minute frozen-asof lookback prologue: asof = max(ts)
    broadcast, filter ts >= asof - 60m — used by BOTH conditional-flow
    encodings so their window definition cannot drift apart."""
    asof = F.broadcast(events.agg(F.max("ts").alias("asof")))
    return events.crossJoin(asof).filter(
        F.col("ts") >= F.col("asof") - F.expr("INTERVAL 60 MINUTES")
    )


def conditional_flow(events: DataFrame) -> DataFrame:
    """Per-wallet conditional in/out sums over the last-60-minutes window.

    Mirrors scripts/ingest_activity_and_report.sh:39-46: ``SUM(CASE WHEN
    wallet = to_address THEN value ELSE 0 END) AS in_amt`` etc., with
    'purchase' events playing inflow and 'error' events playing outflow,
    and the frozen asof = max(ts) playing now().
    """
    w = last_hour_window(events)
    return w.groupBy("user_id").agg(
        dec_sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)).alias(
            "in_amt"
        ),
        dec_sum(F.when(F.col("event_type") == "error", F.col("value")).otherwise(0)).alias(
            "out_amt"
        ),
        F.count("*").alias("txs"),
    )


FLOW_ORACLE_CTE = """
    WITH asf AS (SELECT max(ts) AS asof_ts FROM events),
    w AS (
      SELECT e.* FROM events e, asf a
      WHERE e.ts >= a.asof_ts - INTERVAL 60 MINUTE
    ),
    agg_per_wallet AS (
      SELECT user_id,
             CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
                      AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS in_amt,
             CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0 END
                      AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS out_amt,
             count(*) AS txs
      FROM w GROUP BY user_id
    )
"""


@register(
    "agg-conditional-flow",
    oracle=FLOW_ORACLE_CTE
    + """
    SELECT user_id,
           CAST(in_amt AS DOUBLE) AS in_amt,
           CAST(out_amt AS DOUBLE) AS out_amt,
           txs
    FROM agg_per_wallet
    """,
)
def agg_conditional_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Internal sums stay decimal (order-insensitive); the single terminal
    # decimal->double cast is bit-identical across engines (unscaled < 2^53).
    events = load_table(spark, sf_dir, "events")
    return conditional_flow(events).select(
        "user_id",
        F.col("in_amt").cast("double").alias("in_amt"),
        F.col("out_amt").cast("double").alias("out_amt"),
        "txs",
    )


@register(
    "agg-conditional-flow-coalesce",
    oracle="""
    WITH asf AS (SELECT max(ts) AS asof_ts FROM events),
    w AS (
      SELECT e.* FROM events e, asf a
      WHERE e.ts >= a.asof_ts - INTERVAL 60 MINUTE
    )
    SELECT user_id,
           CAST(COALESCE(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END
                        AS DECIMAL(18,6))), 0) AS DOUBLE) AS in_amt,
           CAST(COALESCE(SUM(CAST(CASE WHEN event_type = 'error' THEN value END
                        AS DECIMAL(18,6))), 0) AS DOUBLE) AS out_amt,
           count(*) AS txs
    FROM w GROUP BY user_id
    """,
)
def agg_conditional_flow_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SECOND conditional-agg form: CASE with no ELSE (sum
    over NULLs) wrapped in COALESCE(...,0) — scripts/ingest_activity_and_
    report.sh:84-91, vs the ELSE-0 form at :39-46 (agg-conditional-flow).
    Same totals on this data; the NULL-vs-0 distinction matters for wallets
    with zero qualifying rows inside a group (SUM→NULL→0 vs SUM of 0s),
    and SURVEY §7.3 requires both encodings pinned."""
    events = load_table(spark, sf_dir, "events")
    w = last_hour_window(events)
    return w.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(DEC)),
            F.lit(0),
        )
        .cast("double")
        .alias("in_amt"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "error", F.col("value")).cast(DEC)),
            F.lit(0),
        )
        .cast("double")
        .alias("out_amt"),
        F.count("*").alias("txs"),
    )


@register(
    "agg-scalar-rollup",
    oracle=FLOW_ORACLE_CTE
    + """
    SELECT count(*) AS active_wallets,
           CAST(COALESCE(SUM(txs), 0) AS BIGINT) AS tx_rows,
           CAST(COALESCE(SUM(in_amt), 0) AS DOUBLE) AS total_in,
           CAST(COALESCE(SUM(out_amt), 0) AS DOUBLE) AS total_out,
           CAST(COALESCE(SUM(in_amt), 0) - COALESCE(SUM(out_amt), 0)
                AS DOUBLE) AS net
    FROM agg_per_wallet
    """,
)
def agg_scalar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand totals over the per-wallet aggregate — active wallets, tx rows,
    total in/out, net (scripts/ingest_activity_and_report.sh:47-54),
    including the COALESCE(...,0) null-defaulting nuance."""
    events = load_table(spark, sf_dir, "events")
    per_wallet = conditional_flow(events)
    return per_wallet.agg(
        F.count("*").alias("active_wallets"),
        F.coalesce(F.sum("txs"), F.lit(0)).cast("bigint").alias("tx_rows"),
        F.coalesce(F.sum("in_amt"), F.lit(0)).cast("double").alias("total_in"),
        F.coalesce(F.sum("out_amt"), F.lit(0)).cast("double").alias("total_out"),
        (F.coalesce(F.sum("in_amt"), F.lit(0)) - F.coalesce(F.sum("out_amt"), F.lit(0)))
        .cast("double")
        .alias("net"),
    )


@register(
    "agg-greatest-rowwise",
    oracle=FLOW_ORACLE_CTE
    + """
    SELECT user_id,
           CAST(in_amt AS DOUBLE) AS in_amt,
           CAST(out_amt AS DOUBLE) AS out_amt,
           txs,
           CAST(GREATEST(in_amt, out_amt) AS DOUBLE) AS max_flow
    FROM agg_per_wallet
    """,
)
def agg_greatest_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise GREATEST(in, out) AS max_flow — the movers ranking key
    (scripts/ingest_activity_and_report.sh:92-96).  GREATEST is evaluated
    on the exact decimals; only the output columns are cast to double."""
    events = load_table(spark, sf_dir, "events")
    return (
        conditional_flow(events)
        .withColumn("max_flow", F.greatest(F.col("in_amt"), F.col("out_amt")))
        .select(
            "user_id",
            F.col("in_amt").cast("double").alias("in_amt"),
            F.col("out_amt").cast("double").alias("out_amt"),
            "txs",
            F.col("max_flow").cast("double").alias("max_flow"),
        )
    )


@register(
    "agg-running-max",
    oracle="""
    SELECT user_id AS stream,
           max(event_id) AS last_scanned_block,
           count(*) AS pages
    FROM events
    GROUP BY user_id
    """,
)
def agg_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running max of block number per stream → the resume-cursor value
    (merlin_etl.py:435,463); count plays the page counter
    (agg-running-count, merlin_etl.py:249-250)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.col("user_id").alias("stream")).agg(
        F.max("event_id").alias("last_scanned_block"),
        F.count("*").alias("pages"),
    )


# ---------------------------------------------------------------------------
# agg-weighted-median — exact weighted quantile via cumulative weights
# ---------------------------------------------------------------------------

# target bucket count for the two-level cumulative decomposition — a
# parallelism dial, not a correctness knob (see agg_weighted_median
# docstring).  r15 (VERDICT r14 #8): the width is now derived in-plan
# from the value domain's min/max (one 1-row aggregate over the same
# per-price exchange, broadcast back — no driver collect), so the r14
# WMED_BUCKET_WIDTH=2000 constant that encoded TPC-H's price range is
# gone and the decomposition generalizes to any numeric domain.
WMED_TARGET_BUCKETS = 64

@register(
    "agg-weighted-median",
    oracle="""
    WITH per_price AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT flag, price, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY price
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM per_price
    )
    SELECT flag AS l_returnflag,
           CAST(min(tw) AS BIGINT) AS w_total,
           CAST(min(CASE WHEN 2 * cw >= tw THEN price END) AS DOUBLE)
             AS w_median,
           CAST(count(*) AS BIGINT) AS n_prices
    FROM cum
    GROUP BY flag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted (lower) median of extended price per return flag,
    weighted by quantity — the weighted-quantile primitive an
    importance-weighted corpus needs (e.g. picking the median document
    under DSIR weights) computed without sampling or sketches.

    Shape: aggregate to DISTINCT (group, value) first — ties then have
    one deterministic cumulative position regardless of row order — and
    run the cumulative window over value-level rows, which are bounded
    by distinct-value count, not row count.

    r14 optimization (guide §2.5): the cumulative window used to be
    partitioned by flag alone — |flags| is 3-4, so the whole value-level
    sort landed on 3-4 tasks (a built-in straggler once distinct prices
    reach the millions).  It now range-buckets prices by a fixed-width
    VALUE bucket (floor((price − mn) / width) — monotone in price, so
    bucket order is price order and equal prices always share a bucket),
    runs the cumulative sum within (flag, bucket) — parallel across
    flags × buckets — and reconstructs the exact global cumulative
    weight from broadcast per-bucket offsets (the curate-shuffle-index
    bounded-carry pattern).  Bucket-width accuracy only balances
    partitions, never affects correctness.

    r15 (VERDICT r14 #8): the width derives in-plan from the domain's
    min/max — a 1-row single-column aggregate over the price column
    (column-pruned scan, partial min/max, no shuffle beyond the 1-row
    collapse), broadcast back as a 1-row nested-loop join — replacing
    the r14 WMED_BUCKET_WIDTH=2000 constant that encoded TPC-H's price
    range.  (Deriving the bounds from per_price instead was measured
    and rejected: column pruning drops the weight sum from the bounds
    arm, so the two groupBy exchanges are not identical and runtime
    exchange reuse cannot dedup them — the bounds arm then pays the
    full value-grain aggregate instead of a 1-column scan.)  All width
    arithmetic is exact decimal and the width is one global constant
    per run, so bucketing stays deterministic and weakly monotone
    (decimal division rounding is monotone; floor of monotone is
    monotone; equal prices share a bucket by construction).
    A driver-side percentile_approx-cutpoint variant was measured in
    r14 (+1.1 s: one collect job + a lineage cut) and rejected; this
    form adds no driver action.  Per-price rows are unique on (flag,
    price), so every ordering below is total.  At 100 TB the per-price
    pre-aggregation remains the map-side-combinable shuffle that does
    the heavy lifting.  All weights are exact integers and prices exact
    decimals — the median is selected, not computed, so no float
    arithmetic precedes the output cast."""
    li = load_table(spark, sf_dir, "lineitem")
    per_price = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    bounds = li.agg(
        F.min("l_extendedprice").alias("__mn"),
        F.max("l_extendedprice").alias("__mx"),
    )
    width = F.greatest(
        F.ceil((F.col("__mx") - F.col("__mn")) / F.lit(WMED_TARGET_BUCKETS)),
        F.lit(1),
    )
    bucketed = (
        per_price.crossJoin(F.broadcast(bounds))
        .withColumn(
            "rb", F.floor((F.col("price") - F.col("__mn")) / width).cast("long")
        )
        .drop("__mn", "__mx")
    )
    w_local = (
        Window.partitionBy("flag", "rb")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-(flag, bucket) weight mass → exclusive running offset within
    # each flag + the flag total; |flags|×|buckets| rows, broadcast back
    counts = bucketed.groupBy("flag", "rb").agg(F.sum("w").alias("bw"))
    w_off = (
        Window.partitionBy("flag")
        .orderBy("rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("flag")
    offs = counts.select(
        "flag",
        "rb",
        F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("off"),
        F.sum("bw").over(w_tot).alias("tw"),
    )
    cum = bucketed.join(F.broadcast(offs), ["flag", "rb"]).select(
        "flag",
        "price",
        (F.col("off") + F.sum("w").over(w_local)).alias("cw"),
        "tw",
    )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.min("tw").cast("bigint").alias("w_total"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price")))
        .cast("double")
        .alias("w_median"),
        F.count(F.lit(1)).cast("bigint").alias("n_prices"),
    )


# ---------------------------------------------------------------------------
# agg-grouping-sets — explicit GROUPING SETS with grouping_id
# ---------------------------------------------------------------------------

@register(
    "agg-grouping-sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form behind agg-rollup /
    agg-cube: three grouping levels in ONE pass (Spark expands the sets
    map-side into a single Expand + partial-agg plan, so the fact table
    is scanned and shuffled once, not once per level).  grouping_id
    disambiguates a grouped-out NULL from a data NULL — both engines
    emit the same bitmask (first column = most significant bit)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# agg-argmax-suite — deterministic max_by/min_by via struct total order
# ---------------------------------------------------------------------------


@register(
    "agg-argmax-suite",
    oracle=f"""
    WITH base AS (
      SELECT event_id, ts, event_type, value FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ),
    r AS (
      SELECT event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rpk,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts ASC, event_id ASC) AS rfs
      FROM base
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           max(CASE WHEN rpk = 1 THEN event_id END) AS peak_event_id,
           max(CASE WHEN rpk = 1 THEN value END) AS peak_value,
           max(CASE WHEN rfs = 1 THEN event_id END) AS first_event_id,
           max(CASE WHEN rfs = 1 THEN strftime(ts, '{TS_FMT_DUCK}') END)
             AS first_ts
    FROM r GROUP BY 1
    """,
)
def agg_argmax_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax/argmin per group — which EVENT carried the
    peak value, which arrived first — via struct total ordering:
    max(struct(value, event_id)) / min(struct(ts, event_id)).  Spark
    (and most engines) ship max_by/min_by, but their tie behavior is
    expressly unspecified — on equal values ANY row may win, which
    breaks reruns, backfill diffs, and this engine's oracle contract;
    the struct carries the unique id INSIDE the comparison so ties
    resolve by a total order.  The oracle computes the same winners via
    explicitly-ordered rank windows, pinning the equivalence.

    Scale (100 TB): one map-side-combinable keyed aggregate over one
    scan — the struct max/min partials combine associatively, so this
    is strictly cheaper than the window form the oracle uses (which
    would sort each group) and is the shape to reach for in production;
    no shuffle beyond the |groups|-row exchange."""
    events = load_table(spark, sf_dir, "events")
    base = events.where(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.struct(F.col("value"), F.col("event_id"))).alias("pk"),
        F.min(F.struct(F.col("ts"), F.col("event_id"))).alias("fs"),
    )
    return agg.select(
        "event_type",
        "n",
        F.col("pk.event_id").alias("peak_event_id"),
        F.col("pk.value").alias("peak_value"),
        F.col("fs.event_id").alias("first_event_id"),
        F.date_format("fs.ts", TS_FMT_SPARK).alias("first_ts"),
    )


# ---------------------------------------------------------------------------
# agg-variance-exact — deterministic per-group variance from integer moments
# ---------------------------------------------------------------------------

# the variance/stddev formulas over the three exact integer moments,
# shared verbatim between the Spark plan and the oracle.  Divisions come
# FIRST (sxx/n − (sx/n)²) so magnitudes never grow past the inputs —
# the cross-multiplied form n·sxx − sx² is prettier but sx² overflows
# int64 near ~3·10⁹ rows × 10³ mean, exactly the 100 TB regime.
_VAR_EXPR = (
    "CAST(sxx AS DOUBLE) / CAST(n_docs AS DOUBLE)"
    " - (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    " * (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
)


@register(
    "agg-variance-exact",
    oracle=f"""
    WITH m AS (
      -- moment sums and the per-row square widened past int64 (HUGEINT
      -- here, DECIMAL in Spark — r11 ADVICE: non-ANSI Spark wraps int64
      -- silently where DuckDB raises; widened, both are exact to 10^38)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx,
             CAST(min(n_chars) AS BIGINT) AS min_chars,
             CAST(max(n_chars) AS BIGINT) AS max_chars
      FROM documents WHERE source IS NOT NULL GROUP BY 1
    )
    SELECT source, n_docs, CAST(sx AS BIGINT) AS sum_chars, min_chars, max_chars,
           CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_chars,
           round({_VAR_EXPR}, 6) AS var_chars,
           round(sqrt(greatest({_VAR_EXPR}, CAST(0 AS DOUBLE))), 6) AS std_chars
    FROM m
    """,
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length variance/stddev with bit-deterministic results:
    the three moments (count, Σx, Σx²) are exact integer aggregates —
    order-insensitive, map-side combinable — and variance is ONE shared
    IEEE formula over them, rounded once at the boundary.  The
    alternative everyone writes first, var_samp()/stddev() builtins,
    accumulates FLOATS in partition order and is unreproducible across
    shuffles, engines, and reruns — the same class of bug the decimal
    money sums exist to prevent, pinned here for second moments.  The
    moment sums and the per-row square run WIDENED — DECIMAL here,
    HUGEINT in the oracle (r11 ADVICE: Σx² passes int64 near 2·10⁶
    average-length docs per 10⁹-doc source, and non-ANSI Spark wraps
    silently where DuckDB raises; widened, both engines are exact to
    10³⁸ and Spark nulls loudly past that).  sqrt is clamped at 0
    because the textbook form can round to a tiny negative once the
    moments pass 2^53 — Spark would return NaN and DuckDB would RAISE.

    Scale (100 TB): one scan, one keyed aggregate at source
    cardinality.  Nothing else."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    x19 = F.col("n_chars").cast("decimal(19,0)")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(x19).alias("sx"),
        F.sum(x19 * x19).alias("sxx"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    return m.selectExpr(
        "source",
        "n_docs",
        "CAST(sx AS BIGINT) AS sum_chars",
        "min_chars",
        "max_chars",
        "CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_chars",
        f"round({_VAR_EXPR}, 6) AS var_chars",
        f"round(sqrt(greatest({_VAR_EXPR}, CAST(0 AS DOUBLE))), 6) AS std_chars",
    )


# ---------------------------------------------------------------------------
# agg-corr-exact — deterministic Pearson correlation from integer moments
# ---------------------------------------------------------------------------


def corr_from_moments(n: str, sx: str, sy: str, sxx: str, syy: str, sxy: str) -> str:
    """Pearson r over six exact integer moment columns — ONE formula
    string shared by agg-corr-exact and graph-assortativity (and any
    future bivariate op) so the divisions-first shape (magnitudes never
    exceed the inputs; see _VAR_EXPR) and the degenerate-variance guard
    can never drift between consumers.  NULL when either variance is 0
    (constant column) — both engines agree on the CASE, where a bare
    0/0 would be NaN in Spark and an error in DuckDB."""
    nd = f"CAST({n} AS DOUBLE)"
    mx = f"(CAST({sx} AS DOUBLE) / {nd})"
    my = f"(CAST({sy} AS DOUBLE) / {nd})"
    vx = f"(CAST({sxx} AS DOUBLE) / {nd} - {mx} * {mx})"
    vy = f"(CAST({syy} AS DOUBLE) / {nd} - {my} * {my})"
    cov = f"(CAST({sxy} AS DOUBLE) / {nd} - {mx} * {my})"
    return (
        f"CASE WHEN {vx} > CAST(0 AS DOUBLE) AND {vy} > CAST(0 AS DOUBLE)"
        f" THEN {cov} / sqrt({vx} * {vy}) ELSE NULL END"
    )


_CORR_DOC = corr_from_moments("n_docs", "sx", "sy", "sxx", "syy", "sxy")


@register(
    "agg-corr-exact",
    oracle=f"""
    WITH b AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS y
      FROM documents WHERE source IS NOT NULL
    ),
    m AS (
      -- moment sums and per-row products widened past int64 (HUGEINT
      -- here, DECIMAL in Spark — see agg-variance-exact)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM b GROUP BY 1
    )
    SELECT source, n_docs, round({_CORR_DOC}, 6) AS corr_chars_tokens
    FROM m
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pearson correlation between document length in chars
    and in whitespace tokens, computed from six exact integer moments
    with ONE shared IEEE formula (corr_from_moments) rounded once — the
    bivariate sibling of agg-variance-exact, and the same argument:
    corr() builtins accumulate floats in partition order and change
    answers across shuffles; moment sums are exact and order-free.

    Scale (100 TB): one scan, one keyed aggregate at source
    cardinality.  Moment sums and per-row products run widened —
    DECIMAL here, HUGEINT in the oracle (r11 ADVICE; see
    agg-variance-exact) — with the shared formula unchanged."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    b = docs.select(
        "source",
        F.col("n_chars").cast("decimal(19,0)").alias("x"),
        F.size(F.split("text", " ")).cast("decimal(19,0)").alias("y"),
    )
    m = b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return m.selectExpr(
        "source", "n_docs", f"round({_CORR_DOC}, 6) AS corr_chars_tokens"
    )


# ---------------------------------------------------------------------------
# agg-skewness-exact — third-moment asymmetry from exact integer moments
# ---------------------------------------------------------------------------

# population skewness g1 = m3 / m2^(3/2) over the four exact integer
# moments — the _VAR_EXPR family extended one moment up.  Divisions
# first; m2^(3/2) spelled m2·sqrt(m2) (sqrt is the driver-green libm
# class; pow(x, 1.5) is a second transcendental with its own rounding).
_M2_EXPR = (
    "(CAST(sxx AS DOUBLE) / CAST(n_docs AS DOUBLE)"
    " - (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    " * (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
)
_M3_EXPR = (
    "(CAST(sxxx AS DOUBLE) / CAST(n_docs AS DOUBLE)"
    " - CAST(3 AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    "   * (CAST(sxx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    " + CAST(2 AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    "   * (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    "   * (CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
)
_SKEW_EXPR = (
    f"CASE WHEN {_M2_EXPR} > CAST(0 AS DOUBLE)"
    f" THEN {_M3_EXPR} / ({_M2_EXPR} * sqrt({_M2_EXPR})) ELSE NULL END"
)


@register(
    "agg-skewness-exact",
    oracle=f"""
    WITH m AS (
      -- the cube is the first thing to pass int64 (a 2·10⁶-char doc
      -- cubes to 8·10¹⁸ in ONE row) — per-row products and the moment
      -- sums run HUGEINT here, DECIMAL in Spark (r11 ADVICE; see
      -- agg-variance-exact)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars * n_chars)
                  AS HUGEINT) AS sxxx
      FROM documents WHERE source IS NOT NULL GROUP BY 1
    )
    SELECT source, n_docs,
           round({_M2_EXPR}, 6) AS m2,
           round({_SKEW_EXPR}, 6) AS skewness
    FROM m
    """,
)
def agg_skewness_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source skewness of the document-length distribution from FOUR
    exact integer moments — the third-moment sibling of
    agg-variance-exact, and the shape diagnostic that separates a
    symmetric length distribution from the long-right-tail one the
    power-law fit hypothesizes (positive g1 = heavy long-document tail
    → truncation budgets bite; see curate-truncation-plan).

    Determinism: moment sums are exact integers, and both the per-row
    cube and the sums run WIDENED — DECIMAL here, HUGEINT in the oracle
    (r11 ADVICE: a single 2·10⁶-char doc cubes past int64, and non-ANSI
    Spark wraps silently where DuckDB raises; widened, both engines are
    exact to 10³⁸, formula unchanged); g1 is ONE shared IEEE expression
    with the zero-variance NULL guard, m2^1.5 spelled m2·sqrt(m2) so
    only the driver-green sqrt class is touched.

    Scale (100 TB): one scan, one keyed aggregate at source
    cardinality."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    x19 = F.col("n_chars").cast("decimal(19,0)")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(x19).alias("sx"),
        F.sum(x19 * x19).alias("sxx"),
        F.sum(x19 * x19 * x19).alias("sxxx"),
    )
    return m.selectExpr(
        "source",
        "n_docs",
        f"round({_M2_EXPR}, 6) AS m2",
        f"round({_SKEW_EXPR}, 6) AS skewness",
    )


# ---------------------------------------------------------------------------
# agg-kurtosis-exact — fourth-moment tail weight from exact integer moments
# ---------------------------------------------------------------------------

# excess kurtosis g2 = m4 / m2² − 3 over five exact integer moments —
# the _VAR_EXPR family extended to the fourth moment.  Divisions first
# (every factor is ≤ max |x|⁴ / n, never a cross-multiplied square of a
# sum); the mean appears as the single shared subexpression sx/n.
_MEAN_EXPR = "(CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
_M4_EXPR = (
    f"(CAST(sxxxx AS DOUBLE) / CAST(n_docs AS DOUBLE)"
    f" - CAST(4 AS DOUBLE) * {_MEAN_EXPR}"
    f"   * (CAST(sxxx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    f" + CAST(6 AS DOUBLE) * {_MEAN_EXPR} * {_MEAN_EXPR}"
    f"   * (CAST(sxx AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    f" - CAST(3 AS DOUBLE) * {_MEAN_EXPR} * {_MEAN_EXPR}"
    f"   * {_MEAN_EXPR} * {_MEAN_EXPR})"
)
_KURT_EXPR = (
    f"CASE WHEN {_M2_EXPR} > CAST(0 AS DOUBLE)"
    f" THEN {_M4_EXPR} / ({_M2_EXPR} * {_M2_EXPR}) - CAST(3 AS DOUBLE)"
    f" ELSE NULL END"
)


@register(
    "agg-kurtosis-exact",
    oracle=f"""
    WITH m AS (
      -- per-row x⁴ passes int64 at ~56k chars in ONE row — every power
      -- and every moment sum runs HUGEINT here, DECIMAL in Spark (the
      -- agg-variance-exact widening discipline)
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars * n_chars)
                  AS HUGEINT) AS sxxx,
             CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars * n_chars * n_chars)
                  AS HUGEINT) AS sxxxx
      FROM documents WHERE source IS NOT NULL GROUP BY 1
    )
    SELECT source, n_docs,
           round({_M2_EXPR}, 6) AS m2,
           round({_KURT_EXPR}, 6) AS kurtosis
    FROM m
    """,
)
def agg_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source excess kurtosis of the document-length distribution
    from FIVE exact integer moments — the fourth-moment closure of the
    exact-moments family (variance → skewness → this), and the tail-
    weight diagnostic curation actually acts on: g2 ≈ 0 means Gaussian-
    ish lengths (length filters cut noise), large positive g2 means the
    mass sits in a narrow band with extreme outliers (length filters cut
    a TINY doc count but a huge token share — budget with
    curate-truncation-plan instead).

    Determinism: per-row powers AND the moment sums run widened —
    DECIMAL(38,0) here, HUGEINT in the oracle — because x⁴ passes int64
    at ~56k chars in one row (the lowest overflow ceiling in the family;
    non-ANSI Spark would wrap silently where DuckDB raises); g2 is ONE
    shared IEEE expression, divisions first, with the zero-variance NULL
    guard, rounded once at the boundary.

    Scale (100 TB): one scan, one map-side-combinable keyed aggregate at
    source cardinality.  Nothing else."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    x19 = F.col("n_chars").cast("decimal(19,0)")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(x19).alias("sx"),
        F.sum(x19 * x19).alias("sxx"),
        F.sum(x19 * x19 * x19).alias("sxxx"),
        F.sum(x19 * x19 * x19 * x19).alias("sxxxx"),
    )
    return m.selectExpr(
        "source",
        "n_docs",
        f"round({_M2_EXPR}, 6) AS m2",
        f"round({_KURT_EXPR}, 6) AS kurtosis",
    )


# ---------------------------------------------------------------------------
# agg-group-mode — exact per-key modal value with total-order tie-break
# ---------------------------------------------------------------------------


@register(
    "agg-group-mode",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn,
             CAST(SUM(n) OVER (PARTITION BY user_id) AS BIGINT) AS n_total,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_types
      FROM c
    )
    SELECT user_id, event_type AS mode_event, n AS n_mode, n_total, n_types,
           CAST(n * 1000000 // n_total AS BIGINT) AS mode_ppm
    FROM r WHERE rn = 1
    """,
)
def agg_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-user modal event type — the MODE aggregate SQL engines
    bolt on as a nondeterministic extension, pinned here with a total
    (count DESC, value ASC) tie-break so both engines always elect the
    same mode.  Emits the winner, its count, the user's event total and
    type count, and the mode's ppm share (how dominant the habit is).

    Determinism: the tie-break is total at (user, count, type); all
    outputs are integers; the ppm is positive-integer floor division
    (Spark DIV == DuckDB //).

    Scale (100 TB): one map-side-combinable count to (user × type)
    grain; the election window is keyed by user over at most
    |event-type| rows (value-range bounded) and Spark caps it with
    WindowGroupLimit via the rn = 1 filter."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    w_all = Window.partitionBy("user_id")
    r = c.select(
        "user_id",
        "event_type",
        "n",
        F.row_number().over(w_rank).alias("rn"),
        F.sum("n").over(w_all).cast("long").alias("n_total"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_types"),
    )
    return r.where(F.col("rn") == 1).selectExpr(
        "user_id",
        "event_type AS mode_event",
        "n AS n_mode",
        "n_total",
        "n_types",
        "CAST(n * 1000000 DIV n_total AS BIGINT) AS mode_ppm",
    )
