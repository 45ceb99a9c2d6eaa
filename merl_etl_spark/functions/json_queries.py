"""Structured JSON operators (SURVEY.md §1.2 JSONB columns, §2.I
fn-json-build): typed parse (from_json with schema), path extraction, and
struct→JSON serialization — the engine treatment of the reference's
``metadata``/``stats`` JSONB payloads (schema.sql:140,154).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


@register(
    "fn-json-suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.k') AS k_string,
           json_extract_string(props, '$.missing') AS k_missing,
           to_json(struct_pack(event_id := event_id, user_id := user_id)) AS packed
    FROM events
    WHERE event_id < 1000
    """,
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse (from_json with declared schema — no inference at
    scale), string path extraction, missing-path null, and struct→JSON
    build (the stats objects of merlin_etl.py:151,174)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    parsed = F.from_json(F.col("props"), "k bigint")
    return events.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_string"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
        F.to_json(F.struct(F.col("event_id"), F.col("user_id"))).alias("packed"),
    )
