"""Projection / filter / normalization operators (SURVEY.md §2.C, src-field-drift).

The reference normalizes at write time — lowercase addresses, tolerant
casts, derived scaled columns, source→target column renames
(merlin_etl.py:276-301,390-434).  Expressed declaratively these stay
sargable: Catalyst pushes the equality/null filters into the parquet scan
and prunes unreferenced columns, which is what makes the same plan work
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.operators.joins import TS_FMT_DUCK, TS_FMT_SPARK
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


@register(
    "filter-eq-token",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE lower(event_type) = 'purchase'
    """,
)
def filter_eq_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate on a lowercased token key (filter-eq-token;
    sql/top100_compute.sql:7,21).  The lower() sits on the literal-compare
    side at write time in the reference; here it demonstrates the sargable
    normalized-equality scan."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.lower(F.col("event_type")) == "purchase").select(
        "event_id", "user_id", "value"
    )


@register(
    "filter-nonnull-fields",
    oracle="""
    SELECT event_id, user_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE props IS NOT NULL
      AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
)
def filter_nonnull_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop ingest rows missing required fields (merlin_etl.py:291-292:
    holder/quantity null guard), applied to a JSON-extracted field so the
    null path is actually exercised."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    return (
        events.withColumn("k", k)
        .filter(F.col("props").isNotNull() & F.col("k").isNotNull())
        .select("event_id", "user_id", "k")
    )


@register(
    "proj-normalize",
    oracle=f"""
    SELECT event_id AS block_number,
           lower(event_type) AS tx_kind,
           CAST(user_id AS VARCHAR) AS wallet_address,
           strftime(ts, '{TS_FMT_DUCK}') AS block_time_utc,
           CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS block_time_unix,
           CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) AS value_raw,
           CAST(CAST(CAST(CAST(round(value * 100) AS BIGINT) AS DECIMAL(18,2))
                * CAST(0.01 AS DECIMAL(4,2)) AS DECIMAL(18,6)) AS DOUBLE) AS value_18d,
           COALESCE(json_extract_string(props, '$.k'),
                    json_extract_string(props, '$.key'),
                    'missing') AS drift_field
    FROM events
    WHERE event_id < 2000
    """,
)
def proj_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 23-tuple ingestion normalization in miniature (proj-normalize +
    proj-rename-map + src-field-drift; merlin_etl.py:276-301,390-434):
    source→target renames, lowercase canonicalization, unix/UTC time
    derivation, raw-string amount + exact scaled decimal (schema.sql
    generated columns), and tolerant multi-candidate field extraction
    (merlin_etl.py:276-289) via COALESCE over JSON paths."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    raw_cents = F.round(F.col("value") * 100).cast("bigint")
    return events.select(
        F.col("event_id").alias("block_number"),
        F.lower(F.col("event_type")).alias("tx_kind"),
        F.col("user_id").cast("string").alias("wallet_address"),
        F.date_format("ts", TS_FMT_SPARK).alias("block_time_utc"),
        F.unix_timestamp("ts").alias("block_time_unix"),
        raw_cents.cast("string").alias("value_raw"),
        # internal math exact decimal; output boundary reduces scale to (18,6)
        # (values are exact at scale 2, so no rounding) then casts to double —
        # (38,18)'s unscaled value can exceed 2^53 where engines' double
        # conversions diverge, (18,6)'s cannot.
        (raw_cents.cast("decimal(38,18)") / 100)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("value_18d"),
        F.coalesce(
            F.get_json_object("props", "$.k"),
            F.get_json_object("props", "$.key"),
            F.lit("missing"),
        ).alias("drift_field"),
    )


@register(
    "proj-unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem WHERE l_orderkey <= 500
    )
    UNPIVOT INCLUDE NULLS
    (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
)
def proj_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (the inverse of agg-pivot): each lineitem row's four
    measure columns become four (measure, value) rows — the long format
    feature pipelines and per-metric profilers consume (profile-columns
    uses the same shape internally; this registers it as a first-class
    operator with native ``unpivot``).

    Scale shape: unpivot lowers to Expand — a pure map that emits N rows
    per input row with NO shuffle and no data copy beyond the projected
    measures; column pruning still reaches the scan (only the 6 referenced
    columns are read).  Values pass through untouched (all four measures
    are already double), so cross-engine equality is bit-trivial.
    NULL measures are KEPT as rows (Spark's unpivot semantics); the
    oracle says INCLUDE NULLS explicitly because DuckDB's UNPIVOT drops
    them by default — a divergence that would surface on the first
    fixture with a NULL measure (review r6c finding)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax",
        )
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
