"""Malformed-JSONL ingestion policies: PERMISSIVE is oracle-checked; the
other two policy knobs (DROPMALFORMED, FAILFAST) are pinned here."""

from __future__ import annotations

import pytest

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.textfiles import (
    CORRUPT_MOD,
    JSONL_LIMIT,
    _jsonl_fixture,
)

load_all()

SCHEMA = "event_id long, user_id long, event_type string, value double"


def test_dropmalformed_keeps_exactly_the_good_rows(spark, sf_dir):
    path = _jsonl_fixture(spark, sf_dir)
    dropped = (
        spark.read.schema(SCHEMA).option("mode", "DROPMALFORMED").json(path)
    )
    from merl_etl_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    want = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_id") < JSONL_LIMIT)
            & (F.col("event_id") % CORRUPT_MOD != 0)
        )
        .count()
    )
    assert dropped.count() == want


def test_failfast_raises_on_broken_line(spark, sf_dir):
    path = _jsonl_fixture(spark, sf_dir)
    df = spark.read.schema(SCHEMA).option("mode", "FAILFAST").json(path)
    with pytest.raises(Exception) as ei:
        df.count()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_permissive_quarantines_broken_lines_verbatim(spark, sf_dir):
    """The corrupt column carries the raw broken line for dead-letter
    audits — data fields NULL, _corrupt non-NULL, prefix preserved."""
    import pyspark.sql.functions as F

    path = _jsonl_fixture(spark, sf_dir)
    parsed = (
        spark.read.schema(SCHEMA + ", _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        # Spark forbids referencing ONLY the corrupt column straight off a
        # JSON scan (internal-column pushdown restriction) — a cache of
        # the parsed frame is the documented pattern
        .cache()
    )
    bad = parsed.filter(F.col("_corrupt").isNotNull())
    assert bad.count() > 0
    assert bad.filter(~F.col("_corrupt").startswith("{broken::")).count() == 0
    assert bad.filter(
        F.col("event_id").isNotNull() | F.col("value").isNotNull()
    ).count() == 0
