"""Dataset quality gates over the events stream: declarative
expectation checks (the Deequ/Great-Expectations shape), exact
distributional summaries, and robust outlier flagging — the checks a
production pipeline runs between ingestion and publication, at dataset
granularity (the row-level cousin is the reference's field-drift
normalization, merlin_etl.py:76-80).

Scale shapes:

- dq-expectations    ONE full scan computes every rule's violation
                     counter as a conditional aggregate (map-side
                     partials; the two exact-distinct rules add one
                     high-cardinality pre-aggregate each); the per-rule
                     rows are a constant-size melt of that single
                     result row.  Adding a rule never adds a scan.
- agg-anomaly-zscore two keyed shuffles (per-type moment aggregate,
                     then the stats broadcast back over the fact scan);
                     flagging is a map.
- agg-exact-quantiles per-type percentile_disc — exact order statistics;
                     the group's values buffer in the aggregate, so this
                     is the small-group / final-mile twin of
                     agg-approx-sketches (constant-memory estimates) —
                     at 100 TB run the sketch first and reserve exact
                     quantiles for bounded groups.
- join-salted-skew   the operators/skew.py salted join registered as a
                     driver-oracled query: output equals the plain
                     equi-join bit-for-bit while the hot key's rows
                     spread over n_salts shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merl_etl_spark.operators.aggregates import net_revenue_duck, net_revenue_spark
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

# (rule name, violation predicate — same SQL text in both engines)
_PREDICATE_RULES = (
    ("not_null:user_id", "user_id IS NULL"),
    ("not_null:value", "value IS NULL"),
    ("range:value>=0", "value < 0"),
    ("range:value<=300", "value > 300"),
    (
        "domain:event_type",
        "event_type NOT IN ({})".format(", ".join(f"'{t}'" for t in EVENT_TYPES)),
    ),
    ("pattern:props_json", "props IS NULL OR props NOT LIKE '{%}'"),
)


def _dq_oracle() -> str:
    counters = ",\n             ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS v{i}"
        for i, (_, pred) in enumerate(_PREDICATE_RULES)
    )
    rule_rows = "\n    UNION ALL\n    ".join(
        f"SELECT '{name}' AS rule, n AS n_checked, v{i} AS n_violations,"
        f" v{i} = 0 AS passed FROM a"
        for i, (name, _) in enumerate(_PREDICATE_RULES)
    )
    return f"""
    WITH a AS (
      SELECT count(*) AS n,
             {counters},
             count(*) - count(DISTINCT event_id) AS dup_eid,
             count(*) - count(DISTINCT user_id) AS dup_uid
      FROM events
    )
    {rule_rows}
    UNION ALL
    SELECT 'unique:event_id' AS rule, n AS n_checked, dup_eid AS n_violations,
           dup_eid = 0 AS passed FROM a
    UNION ALL
    SELECT 'unique:user_id' AS rule, n AS n_checked, dup_uid AS n_violations,
           dup_uid = 0 AS passed FROM a
    """


@register("dq-expectations", oracle=_dq_oracle())
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite: 8 rules (completeness,
    range, domain membership, pattern, uniqueness) checked in ONE scan,
    emitted as one (rule, n_checked, n_violations, passed) row each —
    the contract a pipeline gate evaluates before publishing a dataset
    version.

    Every predicate rule is a conditional sum over the same aggregate
    (map-side partials, one scan regardless of rule count); the two
    uniqueness rules are exact count-distinct deltas (each plans the
    standard two-phase distinct pre-aggregate).  The per-rule output is
    a melt of the single aggregated row via explode — constant size.
    The unique:user_id rule is deliberately one that FAILS on fixture
    data (events repeat users), pinning the violated-rule path in the
    driver hash, not just the all-green path."""
    events = load_table(spark, sf_dir, "events")
    agged = events.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(f"v{i}")
            for i, (_, pred) in enumerate(_PREDICATE_RULES)
        ],
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("dup_eid"),
        (F.count(F.lit(1)) - F.countDistinct("user_id")).alias("dup_uid"),
    )
    rule_structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("n").alias("n_checked"),
            F.col(f"v{i}").alias("n_violations"),
            (F.col(f"v{i}") == 0).alias("passed"),
        )
        for i, (name, _) in enumerate(_PREDICATE_RULES)
    ] + [
        F.struct(
            F.lit("unique:event_id").alias("rule"),
            F.col("n").alias("n_checked"),
            F.col("dup_eid").alias("n_violations"),
            (F.col("dup_eid") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("unique:user_id").alias("rule"),
            F.col("n").alias("n_checked"),
            F.col("dup_uid").alias("n_violations"),
            (F.col("dup_uid") == 0).alias("passed"),
        ),
    ]
    return agged.select(F.explode(F.array(*rule_structs)).alias("r")).select(
        "r.rule", "r.n_checked", "r.n_violations", "r.passed"
    )


# ---------------------------------------------------------------------------
# agg-anomaly-zscore
# ---------------------------------------------------------------------------

# identical arithmetic text in both engines; population variance with a
# tiny floor so a constant group yields z = huge-but-finite, not NaN
_Z_EXPR = (
    "(value - sv / n) / sqrt(greatest(svv / n - (sv / n) * (sv / n), 1e-300))"
)


@register(
    "agg-anomaly-zscore",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(value) AS DOUBLE) AS sv,
             CAST(sum(value * value) AS DOUBLE) AS svv
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN s ON s.event_type = e.event_type
    WHERE abs({_Z_EXPR}) > 3
    """,
)
def agg_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier flagging: events whose value sits
    more than 3 population standard deviations from their type's mean —
    the first-pass anomaly screen over a metric stream.

    Determinism stance: the moment sums are double adds whose partition
    order differs across engines, so z carries ~1e-12 relative noise —
    therefore the OUTPUT carries only scanned columns (event_id, type,
    value: bit-identical by construction) and z decides membership only.
    A flip would need |z| within ~1e-9 of the 3.0 threshold; the margin
    on the fixed fixtures is checked by tests/test_quality_suite.py
    (min observed gap ≫ 1e-6), and fixtures are frozen, so the driver
    comparison is stable.  Scale: one per-type moment aggregate
    (map-side partials), stats broadcast back over the fact scan, flag
    is a map — the same two-exchange shape as conditional-flow."""
    events = load_table(spark, sf_dir, "events")
    stats = F.broadcast(
        events.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("value").cast("double").alias("sv"),
            F.sum(F.expr("value * value")).cast("double").alias("svv"),
        )
    )
    return (
        events.join(stats, "event_type")
        .filter(F.expr(f"abs({_Z_EXPR}) > 3"))
        .select("event_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# agg-exact-quantiles
# ---------------------------------------------------------------------------

QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


@register(
    "agg-exact-quantiles",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           {", ".join(f"quantile_disc(value, {q}) AS q{int(q * 100)}" for q in QUANTILES)}
    FROM events
    GROUP BY event_type
    """,
)
def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p25/p50/p75/p90/p99) of value per event
    type: percentile_disc picks an ACTUAL data element (the smallest
    value whose cumulative rank reaches q), so there is no interpolation
    arithmetic to drift across engines — Spark's percentile_disc and
    DuckDB's quantile_disc return the same bits (verified on all
    fixture groups; the continuous twin would need 6-dp rounding).

    The group's value set buffers inside the aggregate — exact order
    statistics fundamentally need the data — so this is the bounded-
    group complement to agg-approx-sketches' constant-memory estimates:
    at 100 TB, sketch first, then run exact quantiles on the groups
    that matter (or after a per-type sample)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"q{int(q * 100)}")
            for q in QUANTILES
        ],
    )


# ---------------------------------------------------------------------------
# join-salted-skew
# ---------------------------------------------------------------------------


@register(
    "join-salted-skew",
    oracle="""
    WITH dim AS (
      SELECT event_type, count(*) AS type_n
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, d.type_n
    FROM events e JOIN dim d ON d.event_type = e.event_type
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join (operators/skew.py) as a driver-oracled
    query: enrich every event with its type's total count through
    ``salted_join`` — a 5-key join where every key is hot (each holds
    ~20% of the table), the worst case for per-key shuffle placement.

    The salt spreads each hot key's rows over 8 sub-keys (small side
    replicated ×8), so no single task owns a key's full mass; the
    oracle is the PLAIN join — salting must be invisible in the result.
    Complements the pytest skew-experiment evidence (PERF.md) with a
    value-hash guarantee of equivalence."""
    from merl_etl_spark.operators.skew import salted_join

    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("type_n"))
    )
    return salted_join(events, dim, "event_type", n_salts=8).select(
        "event_id", "event_type", "type_n"
    )


# ---------------------------------------------------------------------------
# analytics-funnel
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "analytics-funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 2 AS step, 'click' AS step_name, count(*) AS n_users FROM s2
    UNION ALL
    SELECT 3 AS step, 'purchase' AS step_name, count(*) AS n_users FROM s3
    """,
)
def analytics_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch conversion funnel over the event stream: users who
    viewed → whose first click came AFTER that first view → whose first
    purchase came after that click — the event-sequence analytic every
    product pipeline runs (strict event-time ordering, not mere
    co-occurrence).

    Each step is a keyed min-aggregate joined back to the fact scan on
    user_id (equi-join; the step frames shrink monotonically), so the
    whole funnel is N_steps keyed shuffles with map-side partials — no
    per-user event buffering, no window over a user's full history,
    which is what makes it survive users with millions of events.
    Output is step counts only (exact longs) — hash-stable by
    construction."""
    events = load_table(spark, sf_dir, "events")
    s1 = (
        events.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step"), F.lit(name).alias("step_name"), "n_users"
        )
        for i, (name, s) in enumerate(zip(FUNNEL_STEPS, (s1, s2, s3)))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# agg-k-anonymity — privacy audit over quasi-identifier combinations
# ---------------------------------------------------------------------------

K_ANON = 5


@register(
    "agg-k-anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS group_size
      FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment, c_nationkey, group_size,
           group_size < {K_ANON} AS below_k,
           CASE WHEN group_size < {K_ANON} THEN 'suppress_or_generalize'
                ELSE 'releasable' END AS recommendation
    FROM g
    """,
)
def agg_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: group the table by its quasi-identifier
    combination (here market segment × nation — the attributes an
    adversary could link externally) and flag every equivalence class
    smaller than k={K_ANON}, whose members are re-identifiable and must
    be suppressed or generalized before release — the standard privacy
    gate run over training data and analytics extracts before sharing.

    One partial-agg shuffle on the quasi-identifier key; the audit
    output is equivalence-class-sized (bounded by the QI domain, not the
    row count), so the report stays tiny at any corpus scale.
    Generalization ladders (nation → region, segment → 'ANY') re-run
    the identical plan on coarser keys until every class clears k."""
    customer = load_table(spark, sf_dir, "customer")
    g = customer.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    below = F.col("group_size") < K_ANON
    return g.select(
        "c_mktsegment",
        "c_nationkey",
        "group_size",
        below.alias("below_k"),
        F.when(below, F.lit("suppress_or_generalize"))
        .otherwise("releasable")
        .alias("recommendation"),
    )


# ---------------------------------------------------------------------------
# dq-sequence-gaps — dropped-record detection over a monotone id stream
# ---------------------------------------------------------------------------


@register(
    "dq-sequence-gaps",
    oracle="""
    WITH kept AS (
      SELECT event_id FROM events WHERE event_type <> 'error'
    ),
    gaps AS (
      SELECT lag(event_id) OVER (ORDER BY event_id) AS prev_id, event_id
      FROM kept
    )
    SELECT prev_id + 1 AS gap_start,
           event_id - 1 AS gap_end,
           event_id - prev_id - 1 AS gap_len
    FROM gaps
    WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    """,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection: contiguous missing-id ranges in a monotone
    stream (here: event_ids surviving an error filter) — the standard
    completeness audit for ingestion pipelines keyed by block height /
    offset / auto-increment id, answering "which records did we drop and
    how many" as exact ranges rather than a lone count.

    Scale shape: NOT a global-order lag (a single-partition sort of the
    whole id domain).  Ids are range-bucketed; the in-bucket lag window
    partitions by bucket (parallel, bounded), and the seams between
    non-empty buckets are checked on the per-bucket min/max SUMMARY —
    one row per bucket, the bounded-carry pattern the as-of join and
    curate-shuffle-index already pin; only that summary sees a global
    window.  The oracle states the spec as the simple global lag —
    results are identical because every gap lies either inside one
    bucket or between two adjacent non-empty buckets."""
    from pyspark.sql.window import Window

    RANGE = 1024
    kept = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") != "error"
    ).select("event_id", (F.col("event_id") - F.pmod("event_id", RANGE)).alias("bucket"))

    w_in = Window.partitionBy("bucket").orderBy("event_id")
    in_gaps = (
        kept.withColumn("prev_id", F.lag("event_id").over(w_in))
        .filter(F.col("prev_id").isNotNull() & (F.col("event_id") - F.col("prev_id") > 1))
        .select(
            (F.col("prev_id") + 1).alias("gap_start"),
            (F.col("event_id") - 1).alias("gap_end"),
            (F.col("event_id") - F.col("prev_id") - 1).alias("gap_len"),
        )
    )
    summary = kept.groupBy("bucket").agg(
        F.min("event_id").alias("min_id"), F.max("event_id").alias("max_id")
    )
    w_seam = Window.orderBy("bucket")  # bounded: one row per non-empty bucket
    seam_gaps = (
        summary.withColumn("prev_max", F.lag("max_id").over(w_seam))
        .filter(F.col("prev_max").isNotNull() & (F.col("min_id") - F.col("prev_max") > 1))
        .select(
            (F.col("prev_max") + 1).alias("gap_start"),
            (F.col("min_id") - 1).alias("gap_end"),
            (F.col("min_id") - F.col("prev_max") - 1).alias("gap_len"),
        )
    )
    return in_gaps.unionByName(seam_gaps)


# ---------------------------------------------------------------------------
# dq-referential — cross-table foreign-key orphan detection
# ---------------------------------------------------------------------------

# (relation label, child table, child key, parent table, parent key,
#  parent filter SQL or None).  The last relation is DELIBERATELY
# violated (parent restricted to even customer keys) so the non-zero
# orphan path is exercised on the referentially-consistent fixture —
# the same convention as dq-expectations' failing uniqueness rule.
_FK_RELATIONS = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", None),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", None),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", None),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", None),
    ("events.user_id->customer[even]", "events", "user_id", "customer", "c_custkey",
     "c_custkey % 2 = 0"),
)


def _dq_referential_oracle() -> str:
    blocks = []
    for rel, child, ckey, parent, pkey, pfilter in _FK_RELATIONS:
        pwhere = f" WHERE {pfilter}" if pfilter else ""
        # COALESCE every SUM: over an empty child table SUM() is NULL
        # while count(*) is 0 — both engines must agree on the total
        # (0, 0, 0, true) row (latent-divergence review finding)
        blocks.append(f"""
    SELECT '{rel}' AS relation,
           count(*) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN c.{ckey} IS NULL THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_null_keys,
           CAST(COALESCE(SUM(CASE WHEN c.{ckey} IS NOT NULL AND p.{pkey} IS NULL
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphan_rows,
           (COALESCE(SUM(CASE WHEN c.{ckey} IS NOT NULL AND p.{pkey} IS NULL
                     THEN 1 ELSE 0 END), 0) = 0) AS ok
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pkey} FROM {parent}{pwhere}) p
      ON c.{ckey} = p.{pkey}""")
    return "\nUNION ALL\n".join(blocks)


@register("dq-referential", oracle=_dq_referential_oracle())
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each
    declared foreign-key relation, count child rows whose key has no
    parent (orphans) and NULL keys (a separate completeness issue, never
    counted as an orphan) — the cross-table tier dq-expectations'
    single-scan predicate rules cannot express.

    Scale (100 TB): the child side pre-aggregates to (key, row_count)
    before any join — the parent probe sees DISTINCT child keys, not
    child rows, so a 100 B-row fact table joins as its key cardinality;
    parents reduce to distinct-key sets.  Each relation is an
    independent keyed-shuffle pipeline (no cross-relation barrier), and
    orphan totals are exact BIGINT sums of the per-key row counts.

    r15 optimization (guide §2.4): the anti-join + separate-totals form
    was rewritten as ONE left join + conditional sums (the oracle's own
    shape).  The old form looked like it shared the child rollup
    between its two arms, but Catalyst pushes a left-anti join BELOW an
    aggregate (PushDownLeftSemiAntiJoin) and the isnotnull filter into
    the scan, so the two arms' exchanges were NOT identical and
    exchange reuse could never fire: every child table was scanned and
    key-rolled TWICE per relation (verified in the r15 plan pair — the
    r14 ledger's "identical exchange, runtime reuse dedups" analysis
    was wrong for this query).  One arm now does scan -> key rollup ->
    broadcast-left-join parent keys -> 1-row conditional collapse:
    10 -> 5 child scans, 25 -> 15 exchanges, BNLJ gone
    (plans/r15/dq-referential_*; the plan gate pins one-scan-per-table).
    """
    out = None
    for rel, child, ckey, parent, pkey, pfilter in _FK_RELATIONS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        if pfilter:
            p = p.filter(F.expr(pfilter))
        pkeys = p.select(F.col(pkey).alias("pk")).distinct()
        ck = c.groupBy(F.col(ckey).alias("k")).agg(F.count(F.lit(1)).alias("cnt"))
        # left join against the distinct parent keys (never duplicating:
        # pk is unique) and collapse with conditional sums — coalesce
        # like the oracle: an empty child table must yield the
        # (0, 0, 0, true) row in BOTH engines
        row = (
            ck.join(pkeys, F.col("k") == F.col("pk"), "left")
            .agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("k").isNull(), F.col("cnt"))), F.lit(0)
                ).cast("long").alias("n_null_keys"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("k").isNotNull() & F.col("pk").isNull(),
                            F.col("cnt"),
                        )
                    ),
                    F.lit(0),
                ).cast("long").alias("n_orphan_rows"),
            )
            .select(
                F.lit(rel).alias("relation"),
                "n_rows",
                "n_null_keys",
                "n_orphan_rows",
                (F.col("n_orphan_rows") == 0).alias("ok"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# dq-volume-anomaly — robust daily-volume outlier days (median/MAD, integer)
# ---------------------------------------------------------------------------

# |n - median| > VOL_K * MAD flags a day.  All arithmetic stays integer:
# with med2 = the sum of the two middle daily counts (= 2*median; the
# middles coincide for odd day counts) and mad2 = the middle-sum of the
# per-day deviations d2 = |2n - med2| (= 4*MAD), the test
# |n - med| > K*MAD is exactly  2*d2 > K*mad2.
VOL_K = 3


@register(
    "dq-volume-anomaly",
    oracle=f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    r AS (
      SELECT day, n,
             row_number() OVER (ORDER BY n, day) AS rn,
             count(*) OVER () AS nd
      FROM d
    ),
    m AS (
      SELECT sum(CASE WHEN rn = (nd + 1) // 2 THEN n ELSE 0 END)
             + sum(CASE WHEN rn = (nd + 2) // 2 THEN n ELSE 0 END) AS med2
      FROM r
    ),
    dev AS (
      SELECT r.day, r.n, abs(2 * r.n - (SELECT med2 FROM m)) AS d2
      FROM r
    ),
    dr AS (
      SELECT day, n, d2,
             row_number() OVER (ORDER BY d2, day) AS rn,
             count(*) OVER () AS nd
      FROM dev
    ),
    q AS (
      SELECT sum(CASE WHEN rn = (nd + 1) // 2 THEN d2 ELSE 0 END)
             + sum(CASE WHEN rn = (nd + 2) // 2 THEN d2 ELSE 0 END) AS mad2
      FROM dr
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n,
           CAST((SELECT med2 FROM m) AS BIGINT) AS med_x2,
           CAST((SELECT mad2 FROM q) AS BIGINT) AS mad_x4,
           2 * d2 > {VOL_K} * (SELECT mad2 FROM q) AS is_anomaly
    FROM dr
    """,
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly flags: a day is anomalous when its
    event count deviates from the median daily count by more than
    VOL_K median-absolute-deviations — the day-over-day freshness/
    volume check a production pipeline alarms on (z-scores break on the
    very outliers they hunt; median/MAD does not).

    Determinism: counts are integers and median/MAD are ORDER
    STATISTICS, kept exact by carrying 2*median and 4*MAD as integer
    middle-sums — the flag comparison is pure integer arithmetic, no
    division anywhere.  MAD = 0 (over half the days identical) degrades
    to flagging any deviation, identically in both engines.

    Scale (100 TB): the day rollup is one map-side-combinable keyed
    shuffle; everything after runs on ONE ROW PER DAY (~365/year), so
    the two rank windows over it are bounded-input by construction
    (allowlisted as such in the plan-property gate)."""
    from merl_etl_spark.lineage import cut_lineage

    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # everything below runs on ONE ROW PER DAY but references this frame
    # through four branches (median, deviations, MAD, final) — cut it so
    # the full-table day rollup executes once, not once per branch
    d = cut_lineage(d, eager=False)
    w_n = Window.orderBy("n", "day")
    r = d.select(
        "day", "n",
        F.row_number().over(w_n).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("nd"),
    )
    lo = F.expr("(nd + 1) DIV 2")
    hi = F.expr("(nd + 2) DIV 2")
    m = r.agg(
        (
            F.sum(F.when(F.col("rn") == lo, F.col("n")).otherwise(0))
            + F.sum(F.when(F.col("rn") == hi, F.col("n")).otherwise(0))
        ).alias("med_x2")
    )
    dev = r.select("day", "n").crossJoin(F.broadcast(m)).select(
        "day", "n", "med_x2",
        F.abs(2 * F.col("n") - F.col("med_x2")).alias("d2"),
    )
    w_d = Window.orderBy("d2", "day")
    dr = dev.select(
        "*",
        F.row_number().over(w_d).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nd"),
    )
    q = dr.agg(
        (
            F.sum(F.when(F.col("rn") == lo, F.col("d2")).otherwise(0))
            + F.sum(F.when(F.col("rn") == hi, F.col("d2")).otherwise(0))
        ).alias("mad_x4")
    )
    return dr.crossJoin(F.broadcast(q)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "med_x2",
        "mad_x4",
        (2 * F.col("d2") > VOL_K * F.col("mad_x4")).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# dq-distribution-drift — population drift between a reference and a
# current window of the stream
# ---------------------------------------------------------------------------

# minimum share movement (in share points) that flags a category
DRIFT_PP = 0.01


@register(
    "dq-distribution-drift",
    oracle=f"""
    WITH cap AS (SELECT max(event_id) // 2 AS cap FROM events),
    j AS (
      -- CAST: DuckDB SUM over integers widens to HUGEINT; Spark's is BIGINT
      SELECT event_type,
             CAST(SUM(CASE WHEN event_id <= cap THEN 1 ELSE 0 END) AS BIGINT)
               AS ref_count,
             CAST(SUM(CASE WHEN event_id > cap THEN 1 ELSE 0 END) AS BIGINT)
               AS cur_count
      FROM events, cap GROUP BY 1
    ),
    tot AS (SELECT sum(ref_count) AS rt, sum(cur_count) AS ct FROM j),
    s AS (
      SELECT event_type, ref_count, cur_count,
             CAST(ref_count AS DOUBLE) / CAST(rt AS DOUBLE) AS ref_share,
             CAST(cur_count AS DOUBLE) / CAST(ct AS DOUBLE) AS cur_share
      FROM j, tot
    )
    SELECT event_type, ref_count, cur_count, ref_share, cur_share,
           cur_share - ref_share AS drift,
           (abs(cur_share - ref_share) > {DRIFT_PP}) AS drifted,
           row_number() OVER (
             ORDER BY abs(cur_share - ref_share) DESC, event_type NULLS LAST)
             AS rnk
    FROM s
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: split the event stream into a reference
    window (first half by event_id, cap from the UNFILTERED stream — the
    cdc-merge-apply convention) and a current window, compare per-type
    shares, and rank categories by absolute share movement — the data
    monitor that catches a source silently changing its mix (schema
    stays valid, DISTRIBUTION drifts) before it poisons training data.

    Determinism: counts are exact integers; shares are single IEEE
    divisions of exact integers and drift is one subtraction of those
    doubles — bit-identical across engines (the proven raw-double
    class; no ln-based PSI precisely to keep the surface
    libm-free).  The rank carries an (abs(drift) DESC, event_type)
    total order.  Scale (100 TB): BOTH window counts come from ONE
    conditional aggregation over ONE scan of the fact table (map-side
    partials, one shuffle at category cardinality — review r10 replaced
    the original two-scan full-outer-join shape); the category summary
    is lineage-cut because the totals and the share projection both
    consume it, and every window runs over that |event_type|-row
    frame."""
    from merl_etl_spark.lineage import cut_lineage

    all_events = load_table(spark, sf_dir, "events")
    cap = all_events.agg(F.expr("max(event_id) DIV 2").alias("cap"))
    ev = all_events.crossJoin(F.broadcast(cap))
    j = ev.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("event_id") <= F.col("cap"), 1).otherwise(0)
        ).alias("ref_count"),
        F.sum(
            F.when(F.col("event_id") > F.col("cap"), 1).otherwise(0)
        ).alias("cur_count"),
    )
    # two consumers of the category summary (totals + share projection) —
    # the cut must precede BOTH, or the totals branch re-scans the facts
    j = cut_lineage(j, eager=False)
    tot = j.agg(
        F.sum("ref_count").alias("rt"), F.sum("cur_count").alias("ct")
    )
    shares = j.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "ref_count",
        "cur_count",
        (F.col("ref_count").cast("double") / F.col("rt").cast("double")).alias(
            "ref_share"
        ),
        (F.col("cur_count").cast("double") / F.col("ct").cast("double")).alias(
            "cur_share"
        ),
    )
    drift = F.col("cur_share") - F.col("ref_share")
    # tie-break null ordering pinned explicitly (ADVICE r10 low): Spark's
    # default ASC is NULLS FIRST, DuckDB's is NULLS LAST — an exact-zero
    # drift tie against a NULL event_type would rank engine-divergently
    w = Window.orderBy(F.abs(drift).desc(), F.asc_nulls_last("event_type"))
    return shares.select(
        "*",
        drift.alias("drift"),
        (F.abs(drift) > DRIFT_PP).alias("drifted"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# dq-freshness — per-feed staleness against the stream head
# ---------------------------------------------------------------------------

# staleness SLA: a feed whose newest event lags the stream head by more
# than this many minutes is flagged
FRESH_SLA_MIN = 360


@register(
    "dq-freshness",
    oracle=f"""
    WITH g AS (SELECT max(ts) AS gmax FROM events WHERE ts IS NOT NULL),
    per AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             max(ts) AS last_ts,
             CAST(SUM(CASE WHEN ts >= gmax - INTERVAL 24 HOUR
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h
      FROM events, g WHERE ts IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n_events, n_last_24h,
           strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           -- whole-second epoch floors subtracted, then integer-divided:
           -- engine date_diff semantics differ (boundary crossings vs
           -- truncated duration), integer epoch floors do not.  epoch_us
           -- // 1e6, NOT floor(epoch()): epoch() returns a rounded
           -- double (the ARCHITECTURE.md trap)
           (epoch_us(last_ts) // 1000000) AS last_epoch_s,
           ((SELECT epoch_us(gmax) // 1000000 FROM g)
             - epoch_us(last_ts) // 1000000) // 60 AS lag_minutes,
           (((SELECT epoch_us(gmax) // 1000000 FROM g)
             - epoch_us(last_ts) // 1000000) // 60
             > {FRESH_SLA_MIN}) AS is_stale
    FROM per
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness audit: for every event feed (event_type), the
    newest event, its lag behind the stream head (the global max ts),
    the last-24-hours volume, and an SLA flag — the monitor that
    catches one upstream producer silently stalling while the table as
    a whole keeps growing.

    Determinism: lag is computed on whole-second epoch FLOORS
    (timestampdiff-from-epoch in Spark, floor(epoch(ts)) in DuckDB)
    subtracted as exact integers and integer-divided — engine
    date-diff builtins disagree on sub-second semantics (boundary
    crossings vs truncated durations), epoch floors cannot.  last_ts
    is emitted at second precision as a formatted string (the registry
    timestamp convention); the 24 h window predicate is exact
    microsecond interval arithmetic in both engines.

    Scale (100 TB): ONE conditional aggregation over ONE scan at feed
    cardinality (map-side partials) after a broadcast of the 1-row
    stream head; nothing else touches the fact table."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    epoch_s = (
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {})"
    )
    # gmax's epoch seconds computed ONCE on the 1-row head frame (review
    # r11: folding it through F.max inside the aggregate re-evaluated the
    # same constant conversion per input row)
    g = ev.agg(F.max("ts").alias("gmax")).withColumn(
        "gmax_s", F.expr(epoch_s.format("gmax"))
    )
    per = (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts_raw"),
            F.sum(
                F.when(
                    F.col("ts") >= F.expr("gmax - INTERVAL 24 HOUR"), 1
                ).otherwise(0)
            ).alias("n_last_24h"),
            F.max("gmax_s").alias("gmax_s"),
        )
    )
    lag_min = F.expr(
        f"(gmax_s - {epoch_s.format('last_ts_raw')}) DIV 60"
    )
    return per.select(
        "event_type",
        "n_events",
        "n_last_24h",
        F.date_format("last_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.expr(epoch_s.format("last_ts_raw")).alias("last_epoch_s"),
        lag_min.alias("lag_minutes"),
        (lag_min > FRESH_SLA_MIN).alias("is_stale"),
    )


# ---------------------------------------------------------------------------
# dq-distribution-psi — population-stability index over the same windows
# ---------------------------------------------------------------------------


@register(
    "dq-distribution-psi",
    oracle="""
    WITH cap AS (SELECT max(event_id) // 2 AS cap FROM events),
    j AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN event_id <= cap THEN 1 ELSE 0 END) AS BIGINT)
               AS ref_count,
             CAST(SUM(CASE WHEN event_id > cap THEN 1 ELSE 0 END) AS BIGINT)
               AS cur_count
      FROM events, cap GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(ref_count) AS BIGINT) AS rt,
                   CAST(SUM(cur_count) AS BIGINT) AS ct,
                   CAST(count(*) AS BIGINT) AS k FROM j),
    s AS (
      -- add-1 smoothed shares (no ln(0)); the log-ratio is four
      -- INTEGER-argument ln()s, each rounded once to 6 dp and frozen as
      -- decimal before the exact combination (the curate-dsir pattern)
      SELECT event_type, ref_count, cur_count,
             CAST(ref_count + 1 AS DOUBLE) / CAST(rt + k AS DOUBLE)
               AS ref_share,
             CAST(cur_count + 1 AS DOUBLE) / CAST(ct + k AS DOUBLE)
               AS cur_share,
             CAST(CAST(round(ln(cur_count + 1), 6) AS DECIMAL(18,6))
                  - CAST(round(ln(ref_count + 1), 6) AS DECIMAL(18,6))
                  + CAST(round(ln(rt + k), 6) AS DECIMAL(18,6))
                  - CAST(round(ln(ct + k), 6) AS DECIMAL(18,6))
                  AS DOUBLE) AS lr
      FROM j, tot
    ),
    t AS (
      -- per-category PSI term, frozen once to 6 dp decimal so the total
      -- is an exact order-independent decimal sum
      SELECT event_type, ref_count, cur_count, ref_share, cur_share,
             CAST(round((cur_share - ref_share) * lr, 6) AS DECIMAL(18,6))
               AS term_dec
      FROM s
    )
    SELECT event_type, ref_count, cur_count, ref_share, cur_share,
           CAST(term_dec AS DOUBLE) AS psi_term,
           CAST(SUM(term_dec) OVER () AS DOUBLE) AS psi_total,
           CAST(row_number() OVER (
             ORDER BY term_dec DESC, event_type NULLS LAST) AS BIGINT) AS rnk
    FROM t
    """,
)
def dq_distribution_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index between the reference and current
    windows of the event stream (same one-scan conditional-agg split as
    dq-distribution-drift): PSI = Σ_b (cur_share_b − ref_share_b) ·
    ln(cur_share_b / ref_share_b), the standard model-monitoring drift
    score (PSI > 0.2 ⇒ action), with add-1 smoothing so empty buckets
    never produce ln(0).  Emitted per category (term + rank) plus the
    total, so the monitor sees WHICH categories move the index.

    Determinism (the proven curate-dsir ln class — added only after the
    r10 canary split confirmed integer-argument ln is driver-green):
    counts are exact integers; the log-ratio ln(cur_share/ref_share) =
    ln(cur+1) − ln(ref+1) + ln(rt+k) − ln(ct+k) is four
    integer-argument ln()s, each rounded ONCE to 6 dp and frozen as
    DECIMAL(18,6) before the exact decimal combination; the per-category
    term — one IEEE multiply of that frozen ratio by a share delta of
    two exact-integer divisions — is itself frozen once to 6 dp, so the
    TOTAL is an exact order-independent decimal sum.  DECIMALs stay
    internal: both boundaries are DOUBLE (tiny unscaled values — far
    below the 2^53 VARCHAR-routing threshold).  Every term is a
    positive quantity mathematically ((a−b) and ln(a/b) share sign), so
    the rank orders by the term itself with the event_type NULLS LAST
    tie-break (the dq-distribution-drift pin).

    Scale (100 TB): identical to dq-distribution-drift — BOTH window
    counts come from ONE conditional aggregation over ONE scan of the
    fact table (map-side partials, one shuffle at category cardinality);
    the totals, the PSI windows, and the rank all run on the
    |event_type|-row summary (bounded — allowlisted in
    test_plan_properties with the drift query's argument)."""
    from merl_etl_spark.lineage import cut_lineage

    all_events = load_table(spark, sf_dir, "events")
    cap = all_events.agg(F.expr("max(event_id) DIV 2").alias("cap"))
    ev = all_events.crossJoin(F.broadcast(cap))
    j = ev.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("event_id") <= F.col("cap"), 1).otherwise(0)
        ).alias("ref_count"),
        F.sum(
            F.when(F.col("event_id") > F.col("cap"), 1).otherwise(0)
        ).alias("cur_count"),
    )
    j = cut_lineage(j, eager=False)
    tot = j.agg(
        F.sum("ref_count").alias("rt"),
        F.sum("cur_count").alias("ct"),
        F.count(F.lit(1)).alias("k"),
    )

    def _ln6(col):
        return F.round(F.log(col.cast("double")), 6).cast("decimal(18,6)")

    s = j.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "ref_count",
        "cur_count",
        (
            (F.col("ref_count") + 1).cast("double")
            / (F.col("rt") + F.col("k")).cast("double")
        ).alias("ref_share"),
        (
            (F.col("cur_count") + 1).cast("double")
            / (F.col("ct") + F.col("k")).cast("double")
        ).alias("cur_share"),
        (
            _ln6(F.col("cur_count") + 1)
            - _ln6(F.col("ref_count") + 1)
            + _ln6(F.col("rt") + F.col("k"))
            - _ln6(F.col("ct") + F.col("k"))
        )
        .cast("double")
        .alias("lr"),
    )
    t = s.select(
        "event_type",
        "ref_count",
        "cur_count",
        "ref_share",
        "cur_share",
        F.round((F.col("cur_share") - F.col("ref_share")) * F.col("lr"), 6)
        .cast("decimal(18,6)")
        .alias("term_dec"),
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_rank = Window.orderBy(F.col("term_dec").desc(), F.asc_nulls_last("event_type"))
    return t.select(
        "event_type",
        "ref_count",
        "cur_count",
        "ref_share",
        "cur_share",
        F.col("term_dec").cast("double").alias("psi_term"),
        F.sum("term_dec").over(w_all).cast("double").alias("psi_total"),
        F.row_number().over(w_rank).cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# dq-embedding-drift — per-dimension centroid shift of the vector corpus
# ---------------------------------------------------------------------------

# fixed-point scale for exact float aggregation: 2^30.  A float32's
# value times a power of two is EXACT in double arithmetic, so
# floor(val * 2^30) is a deterministic integer in both engines and the
# per-dimension sums become order-independent BIGINT math — no
# double-sum partition-order drift, no float→decimal cast divergence.
#
# Overflow bound (review r10): a per-dimension sum holds up to
# N·max|val|·EMB_FP_SCALE, and Spark's non-ANSI long SUM WRAPS silently
# past int64 while DuckDB sums in HUGEINT — so the scale caps corpus
# size.  At 2^30 and unit-normalized vectors (|val| ≤ 1) the safe bound
# is 2^63/2^30 ≈ 8.6e9 vectors per corpus; a 100 TB vector corpus
# (~4e11 rows) must drop the scale to 2^20 (bound ~8.8e12, mean
# precision ~1e-6 — still far below any actionable drift threshold).
# The statistic is DEFINED as floor(val·SCALE), so any power-of-two
# scale is equally deterministic; pick it by corpus size.
EMB_FP_SCALE = 1 << 30


def fixed_point_components(df: DataFrame, scale: int, carry: tuple = ()) -> DataFrame:
    """Explode an ``embedding`` array<float> column into one row per
    component: the carried columns, ``dim`` (1-based, matching DuckDB's
    generate_subscripts), and ``vfp`` = floor(val × scale) as BIGINT —
    the shared fixed-point quantization block (float32 × a power of two
    is exact in double arithmetic, so vfp is deterministic in both
    engines).  Used by dq-embedding-drift (scale 2^30) and
    sim-centroid-assign (scale 2^16); keep the floor/cast shape in ONE
    place so a future cast-trap fix cannot drift between them."""
    return df.select(
        *carry,
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        *carry,
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("val").cast("double") * scale).cast("long").alias("vfp"),
    )


@register(
    "dq-embedding-drift",
    oracle=f"""
    WITH cap AS (SELECT max(vec_id) // 2 AS cap FROM embeddings),
    comp AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             unnest(embedding) AS val
      FROM embeddings
    ),
    s AS (
      SELECT dim,
             CAST(SUM(CASE WHEN vec_id <= cap THEN 1 ELSE 0 END) AS BIGINT)
               AS ref_n,
             CAST(SUM(CASE WHEN vec_id > cap THEN 1 ELSE 0 END) AS BIGINT)
               AS cur_n,
             CAST(SUM(CASE WHEN vec_id <= cap
                           THEN CAST(floor(CAST(val AS DOUBLE) * {EMB_FP_SCALE})
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS ref_sum_fp,
             CAST(SUM(CASE WHEN vec_id > cap
                           THEN CAST(floor(CAST(val AS DOUBLE) * {EMB_FP_SCALE})
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS cur_sum_fp
      FROM comp, cap GROUP BY 1
    ),
    m AS (
      SELECT dim, ref_n, cur_n, ref_sum_fp, cur_sum_fp,
             CAST(ref_sum_fp AS DOUBLE)
               / (CAST(ref_n AS DOUBLE) * {EMB_FP_SCALE}) AS mean_ref,
             CAST(cur_sum_fp AS DOUBLE)
               / (CAST(cur_n AS DOUBLE) * {EMB_FP_SCALE}) AS mean_cur
      FROM s
    )
    SELECT CAST(dim AS BIGINT) AS dim, ref_n, cur_n, ref_sum_fp, cur_sum_fp,
           mean_ref, mean_cur,
           mean_cur - mean_ref AS shift,
           row_number() OVER (
             ORDER BY abs(mean_cur - mean_ref) DESC, dim) AS rnk
    FROM m
    """,
)
def dq_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift: per-dimension centroid shift between
    the first and second half of the vector corpus (vec_id cap from the
    unfiltered stream — the cdc/drift convention).  This is the monitor
    an ANN/retrieval tier runs to decide when an IVF index or LSH bucket
    layout needs rebuilding: the bucketing was trained on the REFERENCE
    distribution, and a drifting centroid silently degrades recall long
    before any query errors.

    Determinism — the fixed-point pattern: float32 × 2^30 is EXACT in
    double arithmetic (power-of-two scaling), so floor() of it is a
    deterministic integer in both engines and every per-dimension sum is
    exact order-independent BIGINT math; means and shift are IEEE
    divisions/subtractions of those exact integers (the proven
    raw-double class).  floor() is explicit because DuckDB's
    double→BIGINT cast rounds where Spark's truncates (the documented
    trap).  Scale (100 TB): one posexplode scan (components shuffle only
    their dim key, with map-side partials), everything downstream on the
    |dims|-row summary.  The rank window is bounded by the embedding
    dimensionality, and EMB_FP_SCALE's comment states the corpus-size
    bound the int64 sums impose (drop the scale a few powers of two for
    >8.6e9-vector corpora)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cap = emb.agg(F.expr("max(vec_id) DIV 2").alias("cap"))
    comp = fixed_point_components(
        emb.crossJoin(F.broadcast(cap)), EMB_FP_SCALE, carry=("vec_id", "cap")
    )
    is_ref = F.col("vec_id") <= F.col("cap")
    s = comp.groupBy("dim").agg(
        F.sum(F.when(is_ref, 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(~is_ref, 1).otherwise(0)).alias("cur_n"),
        F.sum(F.when(is_ref, F.col("vfp")).otherwise(0)).alias("ref_sum_fp"),
        F.sum(F.when(~is_ref, F.col("vfp")).otherwise(0)).alias("cur_sum_fp"),
    )
    mean_ref = F.col("ref_sum_fp").cast("double") / (
        F.col("ref_n").cast("double") * EMB_FP_SCALE
    )
    mean_cur = F.col("cur_sum_fp").cast("double") / (
        F.col("cur_n").cast("double") * EMB_FP_SCALE
    )
    m = s.select(
        "dim", "ref_n", "cur_n", "ref_sum_fp", "cur_sum_fp",
        mean_ref.alias("mean_ref"), mean_cur.alias("mean_cur"),
    )
    shift = F.col("mean_cur") - F.col("mean_ref")
    w = Window.orderBy(F.abs(shift).desc(), F.asc("dim"))
    return m.select(
        "*",
        shift.alias("shift"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# dq-profile-drift — per-COLUMN profile drift between the stream halves
# ---------------------------------------------------------------------------

# the profiled event columns (event_id is the split key itself)
PROFILE_DRIFT_COLS = ["ts", "user_id", "event_type", "value", "props"]


@register(
    "dq-profile-drift",
    oracle=f"""
    WITH cap AS (SELECT max(event_id) // 2 AS cap FROM events),
    u AS (
      {" UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val, "
        f"(event_id <= cap) AS is_ref FROM events, cap"
        for c in ["ts", "user_id", "event_type", "value", "props"]
      )}
    ),
    g AS (
      SELECT col, is_ref,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct
      FROM u GROUP BY 1, 2
    )
    SELECT col,
           CAST(SUM(CASE WHEN is_ref THEN n ELSE 0 END) AS BIGINT) AS ref_n,
           CAST(SUM(CASE WHEN NOT is_ref THEN n ELSE 0 END) AS BIGINT) AS cur_n,
           CAST(SUM(CASE WHEN is_ref THEN n_null ELSE 0 END) AS BIGINT)
             AS ref_nulls,
           CAST(SUM(CASE WHEN NOT is_ref THEN n_null ELSE 0 END) AS BIGINT)
             AS cur_nulls,
           CAST(SUM(CASE WHEN is_ref THEN n_distinct ELSE 0 END) AS BIGINT)
             AS ref_distinct,
           CAST(SUM(CASE WHEN NOT is_ref THEN n_distinct ELSE 0 END) AS BIGINT)
             AS cur_distinct,
           CAST(SUM(CASE WHEN NOT is_ref THEN n_null ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN NOT is_ref THEN n ELSE 0 END) AS DOUBLE)
           - CAST(SUM(CASE WHEN is_ref THEN n_null ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN is_ref THEN n ELSE 0 END) AS DOUBLE)
             AS null_rate_drift,
           CAST(SUM(CASE WHEN NOT is_ref THEN n_distinct ELSE 0 END)
                - SUM(CASE WHEN is_ref THEN n_distinct ELSE 0 END) AS BIGINT)
             AS distinct_drift
    FROM g GROUP BY 1
    """,
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-level profile drift between the reference and current
    halves of the event stream: per COLUMN — row count, null count,
    exact distinct count, null-rate delta, distinct-count delta.  The
    companion to dq-distribution-drift/-psi one level up: those watch
    one categorical's VALUE mix, this watches every column's SHAPE
    (nulls exploding, cardinality collapsing — the classic symptoms of
    an upstream producer dropping a field or freezing an enum).

    Determinism: counts are exact integers (distinctness is counted on
    each engine's own string rendering — injective per engine, so the
    COUNTS agree even where renderings differ); the null-rate drift is
    IEEE arithmetic over exact integers.

    Scale (100 TB): the unpivot multiplies rows by |cols| but feeds a
    two-level aggregate — groupBy (col, half, val) partial-dedups
    MAP-SIDE, so the shuffle carries one row per distinct value per
    column per task (cardinality-bounded, not row-bounded), and the
    final rollup runs at |cols|×2 grain.  This is the same physics as
    profile-columns, split by the stream half."""
    all_events = load_table(spark, sf_dir, "events")
    cap = all_events.agg(F.expr("max(event_id) DIV 2").alias("cap"))
    stack_expr = "stack({n}, {args}) AS (col, val)".format(
        n=len(PROFILE_DRIFT_COLS),
        args=", ".join(
            f"'{c}', CAST({c} AS STRING)" for c in PROFILE_DRIFT_COLS
        ),
    )
    u = all_events.crossJoin(F.broadcast(cap)).select(
        (F.col("event_id") <= F.col("cap")).alias("is_ref"),
        F.expr(stack_expr),
    )
    # two-level distinct: (col, half, val) partial-dedups map-side, so
    # the shuffle is cardinality-bounded
    lv1 = u.groupBy("col", "is_ref", "val").agg(F.count(F.lit(1)).alias("cnt"))
    g = lv1.groupBy("col", "is_ref").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.when(F.col("val").isNull(), F.col("cnt")).otherwise(0)).alias(
            "n_null"
        ),
        F.count(F.when(F.col("val").isNotNull(), 1)).alias("n_distinct"),
    )
    ref = F.when(F.col("is_ref"), F.col("n")).otherwise(0)
    cur = F.when(~F.col("is_ref"), F.col("n")).otherwise(0)
    refnull = F.when(F.col("is_ref"), F.col("n_null")).otherwise(0)
    curnull = F.when(~F.col("is_ref"), F.col("n_null")).otherwise(0)
    refd = F.when(F.col("is_ref"), F.col("n_distinct")).otherwise(0)
    curd = F.when(~F.col("is_ref"), F.col("n_distinct")).otherwise(0)
    return g.groupBy("col").agg(
        F.sum(ref).alias("ref_n"),
        F.sum(cur).alias("cur_n"),
        F.sum(refnull).alias("ref_nulls"),
        F.sum(curnull).alias("cur_nulls"),
        F.sum(refd).alias("ref_distinct"),
        F.sum(curd).alias("cur_distinct"),
        (
            F.sum(curnull).cast("double") / F.sum(cur).cast("double")
            - F.sum(refnull).cast("double") / F.sum(ref).cast("double")
        ).alias("null_rate_drift"),
        (F.sum(curd) - F.sum(refd)).cast("long").alias("distinct_drift"),
    )


# ---------------------------------------------------------------------------
# dq-split-leakage — content-level contamination audit of the hash split
# ---------------------------------------------------------------------------


def _split_leakage_oracle() -> str:
    from merl_etl_spark.operators.curation import SPLIT_CASE_DUCK
    from merl_etl_spark.operators.dedup import NORM_HASH_DUCK

    return f"""
    WITH a AS (
      SELECT {NORM_HASH_DUCK} AS content_key,
             {SPLIT_CASE_DUCK} AS split
      FROM documents
    ),
    keys AS (
      SELECT content_key,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
             SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
      FROM a GROUP BY 1
    )
    SELECT CAST(SUM(in_train) AS BIGINT) AS n_train_docs,
           CAST(SUM(in_test) AS BIGINT) AS n_test_docs,
           CAST(SUM(CASE WHEN in_train > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train_keys,
           CAST(SUM(CASE WHEN in_test > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_test_keys,
           CAST(SUM(CASE WHEN in_train > 0 AND in_test > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_leaked_keys,
           CAST(SUM(CASE WHEN in_train > 0 THEN in_test ELSE 0 END) AS BIGINT)
             AS n_leaked_test_docs,
           CASE WHEN SUM(in_test) = 0 THEN 0
                ELSE CAST(SUM(CASE WHEN in_train > 0 THEN in_test ELSE 0 END)
                          * 1000000 // SUM(in_test) AS BIGINT)
           END AS leak_ppm
    FROM keys
    """


@register("dq-split-leakage", oracle=_split_leakage_oracle())
def dq_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-level contamination audit of the train/test hash split:
    how many TEST documents share a normalized-content key (casefold +
    whitespace collapse — the dedup-normalized digest) with any TRAIN
    document.  sample-hash-split routes EXACT copies identically by
    construction (the bucket hashes raw text), but near-copies that
    differ only in case/whitespace can land on opposite sides of the
    boundary — precisely the contamination class benchmark audits care
    about.  This op MEASURES that instead of assuming it away: the
    split assignment is the single-sourced sample-hash-split expression
    (split_assign_spark / SPLIT_CASE_DUCK) so the boundary audited is
    provably the boundary produced.

    Output (one row): per-split doc and distinct-content counts, the
    number of content keys straddling the boundary, the number of
    leaked test docs, and the leak rate as integer ppm of the test
    split (zero-guarded floor division).

    Scale (100 TB): one scan computing digest + split per doc, ONE
    shuffle at content-key cardinality (map-side partial counts), one
    1-row rollup.  The same shape at corpus scale as dedup-normalized;
    extending the audit to MinHash near-dup leakage is the
    dedup-incremental-near probe pointed across the split instead of
    across batches."""
    from merl_etl_spark.operators.curation import split_assign_spark
    from merl_etl_spark.operators.dedup import norm_hash_spark

    docs = load_table(spark, sf_dir, "documents").select(
        norm_hash_spark().alias("content_key"),
        split_assign_spark().alias("split"),
    )
    keys = docs.groupBy("content_key").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("in_test"),
    )
    leaked_docs = F.sum(F.when(F.col("in_train") > 0, F.col("in_test")).otherwise(0))
    return keys.agg(
        F.sum("in_train").alias("n_train_docs"),
        F.sum("in_test").alias("n_test_docs"),
        F.sum((F.col("in_train") > 0).cast("long")).alias("n_train_keys"),
        F.sum((F.col("in_test") > 0).cast("long")).alias("n_test_keys"),
        F.sum(
            ((F.col("in_train") > 0) & (F.col("in_test") > 0)).cast("long")
        ).alias("n_leaked_keys"),
        leaked_docs.alias("n_leaked_test_docs"),
        F.when(F.sum("in_test") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "sum(CASE WHEN in_train > 0 THEN in_test ELSE 0 END)"
                " * 1000000 DIV sum(in_test)"
            )
        )
        .cast("bigint")
        .alias("leak_ppm"),
    )


# ---------------------------------------------------------------------------
# dq-split-leakage-near — MinHash near-dup contamination across the split
# ---------------------------------------------------------------------------


def _split_leakage_near_oracle() -> str:
    from merl_etl_spark.operators.curation import SPLIT_CASE_DUCK
    from merl_etl_spark.operators.dedup import _minhash_bands_ctes

    return f"""
    WITH {_minhash_bands_ctes()},
    sp AS (
      SELECT doc_id, {SPLIT_CASE_DUCK} AS split FROM documents
    ),
    bs AS (
      SELECT b.doc_id, b.band_id, b.h, s.split
      FROM bands b JOIN sp s USING (doc_id)
    ),
    keys AS (
      SELECT band_id, h,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
             SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
      FROM bs GROUP BY 1, 2
    ),
    leaked AS (
      SELECT DISTINCT b.doc_id
      FROM bs b JOIN (SELECT band_id, h FROM keys WHERE in_train > 0) hot
        USING (band_id, h)
      WHERE b.split = 'test'
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train_docs,
             CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test_docs
      FROM sp
    )
    SELECT t.n_train_docs, t.n_test_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM keys
            WHERE in_train > 0 AND in_test > 0) AS n_straddling_keys,
           (SELECT CAST(count(*) AS BIGINT) FROM leaked)
             AS n_near_leaked_test_docs,
           CASE WHEN t.n_test_docs = 0 THEN 0
                ELSE CAST((SELECT count(*) FROM leaked) * 1000000
                          // t.n_test_docs AS BIGINT)
           END AS near_leak_ppm
    FROM tot t
    """


@register("dq-split-leakage-near", oracle=_split_leakage_near_oracle())
def dq_split_leakage_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate contamination audit of the train/test hash split —
    the probe dq-split-leakage's docstring promises: a test document is
    flagged when it shares ANY MinHash LSH band key (the single-sourced
    dedup-minhash-lsh banding: 3-word shingles, Kirsch–Mitzenmacher
    hashes, 4×2 bands) with at least one train document.  Exact copies
    are split-stable by construction and case/whitespace twins are
    caught by the normalized audit; THIS catches the paraphrase-grade
    overlap (≈50%+ Jaccard) that actually inflates benchmark scores.

    Output (one row): per-split doc counts, band keys hot on both sides,
    near-leaked test docs, and the near-leak rate as integer ppm of the
    test split (zero-guarded floor division) — all exact integers.

    Scale (100 TB): the band frame is the dedup-minhash-lsh shape (one
    shingle explode + one doc-grain signature aggregate); the audit adds
    one keyed count at band-key grain and one semi-join of the test-side
    band rows against train-hot keys — NO pair expansion anywhere (the
    leak test needs key co-presence, never the pair list), so the audit
    is strictly cheaper than the dedup it guards."""
    from merl_etl_spark.operators.curation import split_assign_spark
    from merl_etl_spark.operators.dedup import minhash_bands

    docs = load_table(spark, sf_dir, "documents")
    sp = docs.select("doc_id", split_assign_spark().alias("split"))
    bs = minhash_bands(docs).join(sp, "doc_id")
    keys = bs.groupBy("band_id", "h").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("in_test"),
    )
    from merl_etl_spark.lineage import cut_lineage

    keys = cut_lineage(keys, eager=False)  # two consumers: straddle + hot
    straddle = keys.where(
        (F.col("in_train") > 0) & (F.col("in_test") > 0)
    ).agg(F.count(F.lit(1)).alias("n_straddling_keys"))
    hot = keys.where(F.col("in_train") > 0).select("band_id", "h")
    leaked = (
        bs.where(F.col("split") == "test")
        .join(hot, ["band_id", "h"], "left_semi")
        .select("doc_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_near_leaked_test_docs"))
    )
    tot = sp.agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train_docs"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test_docs"),
    )
    return (
        tot.crossJoin(F.broadcast(straddle))
        .crossJoin(F.broadcast(leaked))
        .select(
            "n_train_docs",
            "n_test_docs",
            "n_straddling_keys",
            "n_near_leaked_test_docs",
            F.when(F.col("n_test_docs") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("n_near_leaked_test_docs * 1000000 DIV n_test_docs")
            )
            .alias("near_leak_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# dq-embedding-norms — exact fixed-point norm² census of the vector corpus
# ---------------------------------------------------------------------------


def _embedding_norms_oracle() -> str:
    from merl_etl_spark.operators.similarity import ASSIGN_FP_SCALE

    return f"""
    WITH comp AS (
      SELECT vec_id, label,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                        * {ASSIGN_FP_SCALE}) AS BIGINT) AS vfp
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, label, CAST(SUM(vfp * vfp) AS BIGINT) AS norm2_fp
      FROM comp GROUP BY 1, 2
    )
    SELECT CAST(length(bin(norm2_fp)) AS INT) AS band,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
           min(norm2_fp) AS min_norm2_fp,
           max(norm2_fp) AS max_norm2_fp
    FROM norms GROUP BY 1
    """


@register("dq-embedding-norms", oracle=_embedding_norms_oracle())
def dq_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm census: every embedding's squared L2 norm in exact
    fixed point, rolled up per bit-width band — the embedding-intake
    gate dq-embedding-drift (per-dimension means) cannot replace: a
    batch of UNNORMALIZED or zero vectors shifts no dimension mean but
    detonates cosine similarity downstream; here it shows up as mass in
    the wrong band (zero vectors land in band 1, a 10x-scaled batch
    ~7 bands high).

    Determinism: vfp = floor(x·2¹⁶) is the similarity tier's exact
    quantization; norm² = Σ vfp² is a pure integer (≤ 64·2³² « int64);
    the band is length(bin(…)) — bit width, no floating log; the census
    collapses order-independently (count / distinct / min / max).

    Scale (100 TB): one component explode (linear flatMap) + one
    map-side-combinable keyed sum per vector + a band rollup at ≤64
    rows.  No join, no window, no pair anywhere."""
    from merl_etl_spark.operators.similarity import ASSIGN_FP_SCALE

    emb = load_table(spark, sf_dir, "embeddings")
    comp = fixed_point_components(emb, ASSIGN_FP_SCALE, carry=("vec_id", "label"))
    norms = comp.groupBy("vec_id", "label").agg(
        F.sum(F.col("vfp") * F.col("vfp")).alias("norm2_fp")
    )
    return norms.groupBy(
        F.expr("CAST(length(bin(norm2_fp)) AS INT)").alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.countDistinct("label").alias("n_labels"),
        F.min("norm2_fp").alias("min_norm2_fp"),
        F.max("norm2_fp").alias("max_norm2_fp"),
    )


# ---------------------------------------------------------------------------
# dq-benford-digits — leading-digit conformance of order values
# ---------------------------------------------------------------------------

# Benford expected shares as exact ppm literals (round(log10(1+1/d)·10⁶);
# they sum to exactly 1,000,000) — baked as integers so the conformance
# test needs no runtime logarithm at all
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)
# dialect split: DuckDB list literal indexes 1-based with [];
# Spark arrays are 0-based with [] but 1-based with element_at
_BENFORD_DUCK = "[" + ", ".join(str(p) for p in BENFORD_PPM) + "]"
_BENFORD_SPARK = (
    "element_at(array(" + ", ".join(str(p) for p in BENFORD_PPM) + "), digit)"
)


@register(
    "dq-benford-digits",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm,
           CAST({_BENFORD_DUCK}[c.digit] AS BIGINT) AS benford_ppm,
           CAST(c.n * 1000000 // t.total
                - {_BENFORD_DUCK}[c.digit] AS BIGINT) AS dev_ppm
    FROM c, t
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order values: observed leading-digit
    shares against log10(1+1/d) — the classic synthetic-data / fraud /
    unit-mixup screen (organically-grown monetary values follow Benford;
    capped, uniform, or fabricated ones pile up in the wrong digits, as
    TPC-H's uniform prices visibly do here — the point is the MEASURE,
    and the fixture demonstrates a violation).

    Determinism: the leading digit comes from string-slicing the
    floor()ed integer part (never CAST(double AS BIGINT), where DuckDB
    rounds and Spark truncates); expected shares are baked integer ppm
    literals summing to exactly 10⁶, so every output cell is integer
    arithmetic — no logarithm anywhere at runtime.

    Scale (100 TB): one scan → 9-row keyed count → 1-row total
    broadcast.  Nothing else."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") >= 1).select(
        F.expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING),"
            " 1, 1) AS INT)"
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    from merl_etl_spark.lineage import cut_lineage

    c = cut_lineage(c, eager=False)  # two consumers: rows + total
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.expr("n * 1000000 DIV total").alias("share_ppm"),
        F.expr(f"CAST({_BENFORD_SPARK} AS BIGINT)").alias("benford_ppm"),
        F.expr(f"n * 1000000 DIV total - {_BENFORD_SPARK}").alias(
            "dev_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# dq-reconciliation — header-vs-detail balance audit (orders vs lineitem)
# ---------------------------------------------------------------------------


@register(
    "dq-reconciliation",
    oracle=f"""
    WITH rec AS (
      -- recomputed order total from the lines, exact decimal all the
      -- way: extprice(12,6) × (1−disc)(7,6) pinned at (19,12), × 
      -- (1+tax)(7,6) → (26,18); SUM widens within engine caps and the
      -- per-order total is an exact rational identical in any engine
      SELECT l_orderkey AS okey,
             SUM({net_revenue_duck()}
                 * (1 + CAST(l_tax AS DECIMAL(7,6)))) AS recomputed
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderstatus AS orderstatus,
             CAST(o.o_totalprice AS DECIMAL(12,6)) AS header,
             r.recomputed,
             CASE WHEN r.recomputed IS NULL THEN NULL
                  ELSE abs(CAST(o.o_totalprice AS DECIMAL(12,6))
                           - r.recomputed) END AS absdiff
      FROM orders o LEFT JOIN rec r ON r.okey = o.o_orderkey
    )
    SELECT orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN recomputed IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_no_lines,
           CAST(SUM(CASE WHEN absdiff IS NOT NULL
                         AND absdiff > CAST(0.005 AS DECIMAL(4,3))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
           CAST(CAST(SUM(header) AS DECIMAL(38,6)) AS DOUBLE) AS sum_header,
           round(CAST(COALESCE(SUM(recomputed), 0) AS DOUBLE), 2)
             AS sum_recomputed,
           round(CAST(COALESCE(SUM(absdiff), 0) AS DOUBLE), 2)
             AS sum_absdiff,
           round(CAST(COALESCE(max(absdiff), 0) AS DOUBLE), 2) AS max_absdiff
    FROM j GROUP BY 1
    """,
)
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: recompute each order's total from
    its lines (Σ extprice·(1−discount)·(1+tax), the TPC-H charge
    formula), diff against the stored header total, and roll the audit
    up per order status — orders with no lines, mismatch counts beyond
    a half-cent tolerance, and the absolute-drift mass/max.  The
    double-entry audit every warehouse runs between a summary table and
    its fact source after a backfill: dq-referential checks the KEYS
    line up, this checks the MONEY does.

    Determinism: the recomputed charge is exact decimal end-to-end with
    explicitly pinned intermediate scales — (12,6)×(7,6) pinned at
    (19,12) before the second product, because the engines' decimal
    width-growth rules differ and an unpinned chain either overflows
    DuckDB's 38-digit multiply or triggers Spark's precision-loss
    truncation; pinned, every per-order total is the same exact
    rational in both engines.  Sums of decimals are exact and
    order-free; each output is rounded or cast ONCE at the boundary.

    Scale (100 TB): one map-side-combinable keyed aggregate at order
    grain (co-partitioned with the join key), one equi-join against the
    header table, one status-grain rollup.  No window, no collect; AQE
    handles the orderkey skew the fixture doesn't have."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    charge = net_revenue_spark() * (
        F.lit(1) + F.col("l_tax").cast("decimal(7,6)")
    )
    rec = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(charge).alias("recomputed")
    )
    header = F.col("o_totalprice").cast("decimal(12,6)")
    j = orders.join(rec, orders["o_orderkey"] == rec["okey"], "left").select(
        F.col("o_orderstatus").alias("orderstatus"),
        header.alias("header"),
        "recomputed",
        F.when(
            F.col("recomputed").isNull(), F.lit(None)
        ).otherwise(F.abs(header - F.col("recomputed"))).alias("absdiff"),
    )
    return j.groupBy("orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("recomputed").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_no_lines"),
        F.sum(
            F.when(
                F.col("absdiff").isNotNull()
                & (F.col("absdiff") > F.lit(0.005).cast("decimal(4,3)")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_mismatch"),
        F.sum("header").cast("decimal(38,6)").cast("double").alias("sum_header"),
        F.round(F.coalesce(F.sum("recomputed"), F.lit(0)).cast("double"), 2).alias(
            "sum_recomputed"
        ),
        F.round(F.coalesce(F.sum("absdiff"), F.lit(0)).cast("double"), 2).alias(
            "sum_absdiff"
        ),
        F.round(F.coalesce(F.max("absdiff"), F.lit(0)).cast("double"), 2).alias(
            "max_absdiff"
        ),
    )


# ---------------------------------------------------------------------------
# dq-primary-keys — uniqueness audit of every table's declared key
# ---------------------------------------------------------------------------

# the declared primary key per fixture table — the contract this audit
# checks.  lineitem's key is composite (orderkey, linenumber).
PK_CONTRACT = [
    ("region", ["r_regionkey"]),
    ("nation", ["n_nationkey"]),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def _pk_oracle() -> str:
    arms = []
    for table, keys in PK_CONTRACT:
        key_tuple = ", ".join(keys)
        null_cond = " OR ".join(f"{k} IS NULL" for k in keys)
        arms.append(f"""
    SELECT '{table}' AS table_name,
           '{key_tuple}' AS key_columns,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE NOT ({null_cond})) AS BIGINT)
             AS n_keyed_rows,
           CAST((SELECT count(*) FROM (
              SELECT 1 FROM {table}
              WHERE NOT ({null_cond})
              GROUP BY {key_tuple})) AS BIGINT) AS n_distinct_keys,
           CAST((SELECT COALESCE(SUM(c - 1), 0) FROM (
              SELECT count(*) AS c FROM {table}
              WHERE NOT ({null_cond})
              GROUP BY {key_tuple}) WHERE c > 1) AS BIGINT)
             AS n_excess_rows
    FROM {table}""")
        arms.append("UNION ALL")
    return "\n".join(arms[:-1])


@register("dq-primary-keys", oracle=_pk_oracle())
def dq_primary_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across EVERY fixture table against
    the declared key contract (PK_CONTRACT — including lineitem's
    composite key): rows, non-null-keyed rows, distinct keys, and the
    excess-row mass a MERGE/upsert would silently collapse.  The
    completion of the referential tier: dq-referential checks foreign
    edges point somewhere, THIS checks the targets are unique — the
    invariant every sink-upsert operator in the engine assumes.

    Determinism: pure integer counts per table, assembled by unionAll
    in contract order (hash compare is order-free anyway).

    Scale (100 TB): one map-side-combinable keyed aggregate per table
    at key grain collapsed to 4 counters — count-distinct is exact via
    the two-level aggregate, never a global sort; the ten per-table
    audits are independent subtrees of one unioned job Spark schedules
    concurrently.

    r15 optimization (guide §2.3/§2.4): each audit used to run THREE
    aggregates per table — the key-grain rollup, its 1-row collapse, and
    a SEPARATE full-table count(*) scan crossJoined back in (2 scans +
    a BroadcastNestedLoopJoin per table, 10 tables).  NULL-keyed rows
    now ride the SAME key-grain groupBy (a group whose key tuple
    contains a NULL is flagged un-keyed at the second level, exactly the
    oracle's NOT(k IS NULL...) split), so every table is one scan + one
    two-level aggregate and the crossJoin is gone: 20 -> 10 scans,
    32 -> 21 plan exchanges, no BNLJ (plans/r15/dq-primary-keys_*)."""
    out = None
    for table, keys in PK_CONTRACT:
        df = load_table(spark, sf_dir, table)
        per_key = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn(
                "keyed",
                F.expr(" AND ".join(f"{k} IS NOT NULL" for k in keys)),
            )
        )
        arm = per_key.agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col("keyed"), F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_keyed_rows"),
            # count(when(...)) counts non-NULLs — keyed groups only; an
            # all-NULL-key table (the pathology this audit exists for)
            # yields 0 here and in the oracle
            F.count(F.when(F.col("keyed"), F.lit(1)))
            .cast("long")
            .alias("n_distinct_keys"),
            F.coalesce(
                F.sum(
                    F.when(F.col("keyed") & (F.col("c") > 1), F.col("c") - 1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_excess_rows"),
        ).select(
            F.lit(table).alias("table_name"),
            F.lit(", ".join(keys)).alias("key_columns"),
            "n_rows",
            "n_keyed_rows",
            "n_distinct_keys",
            "n_excess_rows",
        )
        out = arm if out is None else out.unionAll(arm)
    return out


# ---------------------------------------------------------------------------
# dq-temporal-coverage — per-feed day coverage, span, and largest gap
# ---------------------------------------------------------------------------


@register(
    "dq-temporal-coverage",
    oracle="""
    WITH days AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    stepped AS (
      SELECT event_type, d, n_events,
             d - lag(d) OVER (PARTITION BY event_type ORDER BY d) AS step
      FROM days
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_covered,
           CAST(max(d) - min(d) + 1 AS BIGINT) AS span_days,
           CAST(count(*) * 1000000 // (max(d) - min(d) + 1) AS BIGINT)
             AS coverage_ppm,
           CAST(COALESCE(max(step), 1) AS BIGINT) AS max_day_step,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           min(d) AS first_day,
           max(d) AS last_day
    FROM stepped GROUP BY 1
    """,
)
def dq_temporal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-coverage audit per event feed: how much of each feed's
    own [first, last] day span actually has data — covered-day count,
    coverage ppm, and the largest step between consecutive covered days
    (1 = gapless; 8 = a week-long hole).  dq-freshness asks "is the feed
    current NOW?"; this asks "did the backfill actually fill?" — the
    check that catches a re-ingested feed with a silent three-day hole
    in the middle, which no head-lag monitor can see.

    Determinism: day ordinals are exact integers; coverage is integer
    floor-division (DuckDB `//` and Spark `DIV` agree on positive
    integers); a single-day feed has no steps — max_day_step coalesces
    to 1 (gapless by definition).

    Scale (100 TB): the corpus-sized work is ONE map-side-combinable
    aggregate to (feed × day) grain; the lag window is keyed by feed
    over day rows bounded by the calendar span (value-range bounded,
    corpus-size independent); the rollup is map-side combinable."""
    events = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    epoch = F.lit("1970-01-01").cast("date")
    days = events.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), epoch).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("d")
    stepped = days.select(
        "event_type",
        "d",
        "n_events",
        (F.col("d") - F.lag("d").over(w)).alias("step"),
    )
    return stepped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_covered"),
        (F.max("d") - F.min("d") + 1).cast("long").alias("span_days"),
        F.expr("CAST(count(*) * 1000000 DIV (max(d) - min(d) + 1) AS BIGINT)")
            .alias("coverage_ppm"),
        F.coalesce(F.max("step"), F.lit(1)).cast("long").alias("max_day_step"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
    )


# ---------------------------------------------------------------------------
# dq-iqr-outliers — exact quartile fences per feed, at value-band grain
# ---------------------------------------------------------------------------


@register(
    "dq-iqr-outliers",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cv
      FROM events WHERE value IS NOT NULL
    ),
    bands AS (
      SELECT event_type, cv, CAST(count(*) AS BIGINT) AS n_b
      FROM v GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, cv, n_b,
             SUM(n_b) OVER (PARTITION BY event_type ORDER BY cv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             SUM(n_b) OVER (PARTITION BY event_type) AS n
      FROM bands
    ),
    quartiles AS (
      SELECT event_type,
             CAST(min(n) AS BIGINT) AS n,
             min(CASE WHEN 4 * c >= n THEN cv END) AS q1,
             min(CASE WHEN 2 * c >= n THEN cv END) AS med,
             min(CASE WHEN 4 * c >= 3 * n THEN cv END) AS q3
      FROM cum GROUP BY 1
    )
    SELECT q.event_type, q.n, q.q1, q.med, q.q3,
           (q.q3 - q.q1) AS iqr_centi,
           CAST(SUM(CASE WHEN 2 * b.cv < 2 * q.q1 - 3 * (q.q3 - q.q1)
                         THEN b.n_b ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * b.cv > 2 * q.q3 + 3 * (q.q3 - q.q1)
                         THEN b.n_b ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN 2 * b.cv < 2 * q.q1 - 3 * (q.q3 - q.q1)
                          OR 2 * b.cv > 2 * q.q3 + 3 * (q.q3 - q.q1)
                         THEN b.n_b ELSE 0 END) * 1000000 // q.n AS BIGINT)
             AS outlier_ppm
    FROM quartiles q JOIN bands b USING (event_type)
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event feed: exact lower-quartile /
    median / upper-quartile of the value distribution (type-1 order
    statistics at centi-unit grain), the IQR, and how many events fall
    outside the classic 1.5×IQR fences — the distribution-shape
    complement to agg-anomaly-zscore (fences are median-based and spike-
    robust; z-scores are mean-based and spike-sensitive).

    Determinism: values are frozen ONCE to integer centi-units
    (round(value·100) — identical IEEE input in both engines); each
    quartile is the smallest band whose cumulative count reaches
    ⌈k·n/4⌉ (pure integer comparisons, the ccnet-buckets cut rule); the
    fences are doubled (2v vs 2q1 − 3·iqr) so 1.5×IQR stays integral.

    Scale (100 TB): one map-side-combinable count to (feed ×
    centi-value) band grain; the cumulative window is keyed by feed
    over bands bounded by the VALUE RANGE, corpus-size independent; the
    fence count re-joins bands (not events) against the 4-number
    summary."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = events.select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cv"),
    )
    bands = v.groupBy("event_type", "cv").agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    from merl_etl_spark.lineage import cut_lineage

    bands = cut_lineage(bands, eager=False)  # consumers: quartiles + fences
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = bands.select(
        "event_type",
        "cv",
        "n_b",
        F.sum("n_b").over(w_cum).alias("c"),
        F.sum("n_b").over(w_all).alias("n"),
    )
    quartiles = cum.groupBy("event_type").agg(
        F.min("n").cast("long").alias("n"),
        F.min(F.when(4 * F.col("c") >= F.col("n"), F.col("cv"))).alias("q1"),
        F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("cv"))).alias("med"),
        F.min(F.when(4 * F.col("c") >= 3 * F.col("n"), F.col("cv"))).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    low = 2 * F.col("cv") < 2 * F.col("q1") - 3 * iqr
    high = 2 * F.col("cv") > 2 * F.col("q3") + 3 * iqr
    return (
        quartiles.join(bands, "event_type")
        .groupBy(
            "event_type",
            "n",
            "q1",
            "med",
            "q3",
            iqr.alias("iqr_centi"),
        )
        .agg(
            F.sum(F.when(low, F.col("n_b")).otherwise(0)).cast("long").alias("n_low"),
            F.sum(F.when(high, F.col("n_b")).otherwise(0)).cast("long").alias("n_high"),
            F.expr(
                "CAST(SUM(CASE WHEN 2 * cv < 2 * q1 - 3 * (q3 - q1)"
                "            OR 2 * cv > 2 * q3 + 3 * (q3 - q1)"
                "          THEN n_b ELSE 0 END) * 1000000 DIV min(n) AS BIGINT)"
            ).alias("outlier_ppm"),
        )
    )
