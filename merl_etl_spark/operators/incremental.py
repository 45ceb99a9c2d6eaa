"""Incremental-pipeline operators: CDC-style snapshot diffing and
incremental corpus dedup — the operations a continuously-ingesting
training-data pipeline runs between batches.

The reference's ETL is inherently incremental (cursor resume +
ON CONFLICT upsert, merlin_etl.py:333-357,462-463) but never *exposes*
the change set; these operators make the delta a first-class queryable
result, the way a lakehouse CDC feed or an incremental ingestion
pipeline needs it at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merl_etl_spark.operators.aggregates import dec_sum
from merl_etl_spark.operators.dedup import md5_u32_duck
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


@register(
    "cdc-snapshot-diff",
    oracle="""
    WITH cap AS (SELECT max(event_id) // 2 AS cap FROM events),
    o AS (
      SELECT user_id, count(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS total
      FROM events, cap WHERE event_id <= cap GROUP BY user_id
    ),
    n AS (
      SELECT user_id, count(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS total
      FROM events, cap WHERE event_id > cap GROUP BY user_id
    )
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'insert'
                WHEN n.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.n AS old_n, n.n AS new_n,
           CAST(o.total AS DOUBLE) AS old_total,
           CAST(n.total AS DOUBLE) AS new_total
    FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.n != n.n OR o.total != n.total
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: compare two keyed states of the same derived
    table and emit one row per changed key tagged insert/update/delete —
    the change feed the reference's ON CONFLICT upserts imply but never
    surface (schema.sql:55-66).  States here are per-user activity
    rollups over the first vs second half of the event-id range (a
    deterministic stand-in for "yesterday's snapshot vs today's").

    Scale shape: both states are map-side-partial aggregations shuffled
    once on the key; the diff is a full-outer join of two already-
    aggregated (i.e. key-unique) relations on that same key — at 100 TB
    this is two scans + two key-shuffles + one co-partitioned join, and
    unchanged keys are dropped before any downstream work."""
    events = load_table(spark, sf_dir, "events")
    cap = events.agg(F.expr("max(event_id) div 2").alias("cap"))
    base = events.join(F.broadcast(cap))

    def state(pred) -> DataFrame:
        return (
            base.filter(pred)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                dec_sum(F.col("value")).alias("total"),
            )
        )

    o = state(F.col("event_id") <= F.col("cap")).select(
        "user_id",
        F.col("n").alias("old_n"),
        F.col("total").alias("old_total"),
    )
    n = state(F.col("event_id") > F.col("cap")).select(
        "user_id",
        F.col("n").alias("new_n"),
        F.col("total").alias("new_total"),
    )
    diff = o.join(n, "user_id", "full_outer")
    return (
        diff.filter(
            F.col("old_n").isNull()
            | F.col("new_n").isNull()
            | (F.col("old_n") != F.col("new_n"))
            | (F.col("old_total") != F.col("new_total"))
        )
        .select(
            "user_id",
            F.when(F.col("old_n").isNull(), "insert")
            .when(F.col("new_n").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            "old_n",
            "new_n",
            F.col("old_total").cast("double").alias("old_total"),
            F.col("new_total").cast("double").alias("new_total"),
        )
    )


@register(
    "dedup-incremental",
    oracle="""
    WITH cap AS (SELECT max(doc_id) // 2 AS cap FROM documents),
    corpus AS (
      SELECT DISTINCT md5(text) AS digest
      FROM documents, cap WHERE doc_id <= cap
    ),
    incoming AS (
      SELECT doc_id, lang, n_chars, md5(text) AS digest,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents, cap WHERE doc_id > cap
    )
    SELECT i.doc_id, i.lang, i.n_chars, i.digest
    FROM incoming i LEFT JOIN corpus c ON i.digest = c.digest
    WHERE i.rn = 1 AND c.digest IS NULL
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: an incoming batch (upper half of the
    doc-id range) deduped first within itself (keep lowest doc_id per
    content digest) and then against the already-ingested corpus (lower
    half) via an anti-join on the digest — the batch-over-batch form of
    dedup-exact that a continuously-ingesting pipeline actually runs:
    the corpus is never re-deduped, only probed.

    Scale shape: only 32-hex digests shuffle (never text); the within-
    batch keeper is a digest-partitioned window; the corpus probe is a
    digest-keyed anti-join, co-partitioned with the keeper shuffle.  At
    100 TB the corpus side is a persisted digest index (bucketed by
    digest) so each incremental batch joins without re-scanning text."""
    docs = load_table(spark, sf_dir, "documents")
    cap = docs.agg(F.expr("max(doc_id) div 2").alias("cap"))
    base = docs.join(F.broadcast(cap)).withColumn("digest", F.md5("text"))
    corpus = base.filter(F.col("doc_id") <= F.col("cap")).select("digest").distinct()
    w = Window.partitionBy("digest").orderBy("doc_id")
    incoming = (
        base.filter(F.col("doc_id") > F.col("cap"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return incoming.join(corpus, "digest", "left_anti").select(
        "doc_id", "lang", "n_chars", "digest"
    )


@register(
    "cdc-scd2-history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT user_id, state, ts, event_id FROM ordered
      WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL) AS is_current
    FROM changes
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history build: treat each user's
    event stream as attribute updates (state = event_type), collapse
    consecutive runs of the same state (lag ≠ current keeps only actual
    CHANGES — the run-length dedup every CDC-to-warehouse merge needs so
    replayed identical updates don't mint phantom versions), then stamp
    each surviving version with its validity interval (valid_from = its
    ts, valid_to = the next change's ts via lead, NULL = current row).

    Both windows are PARTITIONED BY user_id with a (ts, event_id) total
    order — per-key linear passes that scale with the keyed shuffle,
    never a global sort.  Timestamps emit as formatted strings
    (SURVEY.md §5.2 determinism rule); valid_to of the newest version is
    NULL on both engines.  This is the reference's holders-history
    semantics (schema.sql balance snapshots) generalized to arbitrary
    attribute streams."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id"
    ).withColumn("prev_state", F.lag("state").over(w))
    changes = ordered.filter(
        F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
    )
    from merl_etl_spark.operators.joins import TS_FMT_SPARK

    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(wc)
    return changes.select(
        "user_id",
        "state",
        F.date_format("ts", TS_FMT_SPARK).alias("valid_from"),
        F.date_format(nxt, TS_FMT_SPARK).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# agg-mv-merge — materialized-view maintenance by mergeable partial state
# ---------------------------------------------------------------------------

MV_SPLIT = 7000  # event_id boundary between the "old" snapshot and the delta


@register(
    "agg-mv-merge",
    oracle=f"""
    WITH old_state AS (
      SELECT user_id, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv,
             max(ts) AS mts
      FROM events WHERE event_id < {MV_SPLIT} GROUP BY user_id
    ),
    delta_state AS (
      SELECT user_id, count(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS sv,
             max(ts) AS mts
      FROM events WHERE event_id >= {MV_SPLIT} GROUP BY user_id
    ),
    merged AS (
      SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
             SUM(sv) AS sv, max(mts) AS mts
      FROM (SELECT * FROM old_state UNION ALL SELECT * FROM delta_state)
      GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(ROUND(sv, 2) AS DOUBLE) AS total_value,
           strftime(mts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
    FROM merged
    """,
)
def agg_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance by PARTIAL-STATE MERGE: a per-user
    aggregate snapshot built from historical events is combined with a
    delta batch's state by merging the states themselves (sum of sums,
    sum of counts, max of maxes) — the old RAW data is never rescanned.
    This is the batch twin of the streaming top-100 maintenance and the
    contract behind every incremental rollup table: the aggregate must be
    ALGEBRAIC (expressible as mergeable partials), which count/sum/max
    are; avg/quantiles ride along as post-merge derivations of partials.

    The oracle mirrors the two-state merge so the driver hash pins the
    merge algebra itself; tests/ additionally pin merge ≡ full rescan.
    Scale shape: the snapshot is aggregate-sized (one row per user, not
    per event); each refresh shuffles only the delta plus the state —
    refresh cost tracks delta size, the whole point of an incremental
    MV.  Decimal partials keep the merged sum exact and order-insensitive
    at any refresh cadence."""
    from merl_etl_spark.operators.joins import TS_FMT_SPARK

    events = load_table(spark, sf_dir, "events")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
            F.max("ts").alias("mts"),
        )

    old_state = state(events.filter(F.col("event_id") < MV_SPLIT))
    delta_state = state(events.filter(F.col("event_id") >= MV_SPLIT))
    merged = (
        old_state.unionByName(delta_state)
        .groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("sv").alias("sv"),
            F.max("mts").alias("mts"),
        )
    )
    return merged.select(
        "user_id",
        "n_events",
        F.round("sv", 2).cast("double").alias("total_value"),
        F.date_format("mts", TS_FMT_SPARK).alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# cdc-merge-apply — MERGE INTO semantics over an ordered changelog
# ---------------------------------------------------------------------------

# deterministic op synthesis: every ~MERGE_DEL_MOD-th changelog entry is
# a DELETE tombstone, the rest are upserts
MERGE_DEL_MOD = 10


@register(
    "cdc-merge-apply",
    oracle=f"""
    WITH cap AS (SELECT max(event_id) // 2 AS cap FROM events),
    base AS (
      SELECT user_id, base_value FROM (
        SELECT user_id, value AS base_value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events, cap WHERE event_id <= cap AND ts IS NOT NULL
      ) WHERE rn = 1
    ),
    log_raw AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN {md5_u32_duck("CAST(event_id AS VARCHAR) || '|op'")}
                       % {MERGE_DEL_MOD} = 0
                  THEN 'D' ELSE 'U' END AS op
      FROM events, cap WHERE event_id > cap AND ts IS NOT NULL
    ),
    last_op AS (
      SELECT user_id, op, value, n_ops FROM (
        SELECT user_id, op, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops
        FROM log_raw
      ) WHERE rn = 1
    )
    SELECT COALESCE(b.user_id, l.user_id) AS user_id,
           CASE WHEN l.user_id IS NULL THEN 'kept'
                WHEN l.op = 'D' THEN 'deleted'
                WHEN b.user_id IS NULL THEN 'inserted'
                ELSE 'updated' END AS status,
           CASE WHEN l.user_id IS NULL THEN b.base_value
                WHEN l.op = 'D' THEN NULL
                ELSE l.value END AS final_value,
           COALESCE(l.n_ops, 0) AS n_ops
    FROM base b FULL OUTER JOIN last_op l ON l.user_id = b.user_id
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics applied as a batch: a base snapshot (each
    user's last value in the first half of the stream) merged with an
    ordered changelog (the second half, every MERGE_DEL_MOD-th entry a
    DELETE tombstone, the rest upserts), last-writer-wins per key.
    Emits the full disposition ledger — kept / updated / inserted /
    deleted — with the post-merge value (NULL for tombstoned keys), the
    lakehouse MERGE primitive the reference approximates with
    ON CONFLICT upserts (merlin_etl.py) but cannot express deletes in.

    Determinism: the winner per key is a row_number under the total
    (ts DESC, event_id DESC) order; final_value is the RAW DOUBLE read
    from parquet, passed through untouched — both engines emit the same
    64 bits (r10 fix: the previous double→DECIMAL(18,6) freeze made
    this the only lossy step, and DECIMAL output columns are exactly
    the shape the r9 driver env could not hash; VERDICT r9 #2);
    op synthesis is the md5-bucket coin.  Scale
    (100 TB): one window pass over the changelog keyed by user (the
    only wide exchange), then a key-cardinality full outer join — the
    same two-shuffle shape as a real MERGE's find-matches phase; at
    petabyte base sizes the join side prunes to changed keys first
    (the base scan here is already aggregated to key cardinality)."""
    from merl_etl_spark.operators.dedup import md5_u32_spark

    all_events = load_table(spark, sf_dir, "events")
    # cap comes from the UNFILTERED stream (the oracle's and
    # cdc-snapshot-diff's convention) — computing it after the ts filter
    # would split the stream at a different event_id whenever a null-ts
    # row holds the max id (review r9w3 finding, reproduced divergence)
    cap = all_events.agg(F.expr("max(event_id) DIV 2").alias("cap"))
    events = all_events.filter(F.col("ts").isNotNull())
    ev = events.crossJoin(F.broadcast(cap))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        ev.filter(F.col("event_id") <= F.col("cap"))
        .select(
            "user_id",
            F.col("value").alias("base_value"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    log_raw = ev.filter(F.col("event_id") > F.col("cap")).select(
        "user_id", "ts", "event_id",
        F.col("value"),
        F.when(
            md5_u32_spark(
                F.concat(F.col("event_id").cast("string"), F.lit("|op"))
            ) % MERGE_DEL_MOD == 0,
            "D",
        ).otherwise("U").alias("op"),
    )
    last_op = (
        log_raw.select(
            "user_id", "op", "value",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_ops"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    b = base.withColumnRenamed("user_id", "b_uid")
    merged = b.join(
        last_op.withColumnRenamed("user_id", "l_uid"),
        b["b_uid"] == F.col("l_uid"),
        "full_outer",
    )
    return merged.select(
        F.coalesce("b_uid", "l_uid").alias("user_id"),
        F.when(F.col("l_uid").isNull(), "kept")
        .when(F.col("op") == "D", "deleted")
        .when(F.col("b_uid").isNull(), "inserted")
        .otherwise("updated")
        .alias("status"),
        F.when(F.col("l_uid").isNull(), F.col("base_value"))
        .when(F.col("op") == "D", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("final_value"),
        F.coalesce("n_ops", F.lit(0)).cast("long").alias("n_ops"),
    )
