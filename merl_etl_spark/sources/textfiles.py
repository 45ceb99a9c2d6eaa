"""Semi-structured text-file ingestion: JSON-lines with malformed-record
recovery — the PERMISSIVE / corrupt-record column contract every
production ingestion layer needs (log shipping, API dumps, crawl
payloads all contain broken lines; an engine that can only FAILFAST
cannot ingest them).

The fixture file is DERIVED deterministically from the events table at
query-construction time (cached per sf_dir): rows with
``event_id % CORRUPT_MOD == 0`` are written as intentionally-broken JSON.
The Spark side genuinely parses the damaged file through
``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord``; the DuckDB oracle
never touches the file — it recomputes the expected recovery relationally
from the events view, so the driver hash verifies that corrupt-record
handling recovered EXACTLY the parseable rows, no more, no fewer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

CORRUPT_MOD = 13  # every 13th event_id is written as a broken line
JSONL_LIMIT = 2000  # events serialized into the fixture
# Single source for the broken-line template prefix: used in BOTH the
# fixture cache key and the F.lit() building the broken line, so editing
# the template automatically invalidates cached fixtures (ADVICE r7 #1 —
# a hand-synced literal in the key could silently drift).
BROKEN_PREFIX = "{broken::"

_FIXTURE_CACHE: dict[tuple, str] = {}


def _jsonl_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per events.parquet generation) a JSONL file with
    deterministic corruption and return its directory path."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    # The constants and the broken-line template are part of the key:
    # changing any of them must invalidate the cached /tmp fixture, or the
    # stale file surfaces as a baffling oracle-hash failure (ADVICE r6).
    key = (src, st.st_mtime_ns, st.st_size, CORRUPT_MOD, JSONL_LIMIT,
           BROKEN_PREFIX + "<event_id>")
    cached = _FIXTURE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    # stable digest, NOT hash(): PYTHONHASHSEED randomizes str hashes per
    # process, which would grow a fresh fixture dir on every run
    import hashlib
    import os as _os
    import shutil
    import uuid

    out = "/tmp/merl_jsonl_fixture/" + hashlib.md5(repr(key).encode()).hexdigest()[:16]
    if _os.path.isdir(out):
        # another process already built this generation — reuse, never
        # overwrite in place (an overwrite deletes the dir under a
        # concurrent reader's lazy scan; review r6c finding)
        _FIXTURE_CACHE[key] = out
        return out
    tmp = f"{out}.build-{uuid.uuid4().hex}"
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < JSONL_LIMIT
    )
    line = F.to_json(F.struct("event_id", "user_id", "event_type", "value"))
    broken = F.concat(F.lit(BROKEN_PREFIX), F.col("event_id").cast("string"))
    (
        events.select(
            F.when(F.col("event_id") % CORRUPT_MOD == 0, broken)
            .otherwise(line)
            .alias("value")
        )
        .write.mode("overwrite")
        .text(tmp)
    )
    try:
        _os.rename(tmp, out)  # atomic publish; loser of a race cleans up
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    _FIXTURE_CACHE[key] = out
    return out


@register(
    "src-jsonl-corrupt",
    oracle=f"""
    WITH e AS (SELECT * FROM events WHERE event_id < {JSONL_LIMIT}),
    good AS (SELECT * FROM e WHERE event_id % {CORRUPT_MOD} <> 0)
    SELECT
      (SELECT count(*) FROM good) AS n_good,
      (SELECT count(*) FROM e WHERE event_id % {CORRUPT_MOD} = 0) AS n_corrupt,
      (SELECT CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
         FROM good) AS sum_value_good,
      (SELECT max(event_id) FROM good) AS max_good_event_id,
      (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM good)
        AS n_types_good
    """,
)
def src_jsonl_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON-lines ingestion over a deterministically-damaged
    file: broken lines land in the ``_corrupt`` column with every data
    field NULL, parseable lines come through typed — and the aggregate
    proves the recovery is exact (the oracle recomputes the expected
    split from the source table, so a parser that dropped a good line or
    salvaged a broken one fails the hash).

    Scale shape: JSON-lines is splittable — the scan parallelizes by
    byte ranges like any text source, the parse is per-line map work,
    and the malformed branch costs nothing on clean data.  PERMISSIVE
    (recover what parses, quarantine the rest for a dead-letter audit)
    is the production default; DROPMALFORMED/FAILFAST are the same scan
    with a different policy knob.  The explicit schema keeps the read
    one-pass — schema inference over TBs of JSONL would double-scan."""
    path = _jsonl_fixture(spark, sf_dir)
    parsed = (
        spark.read.schema(
            "event_id long, user_id long, event_type string, value double, "
            "_corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    good = F.col("_corrupt").isNull()
    return parsed.agg(
        F.sum(good.cast("long")).alias("n_good"),
        F.sum((~good).cast("long")).alias("n_corrupt"),
        F.round(
            F.sum(F.when(good, F.col("value")).cast("decimal(18,6)")), 2
        )
        .cast("double")
        .alias("sum_value_good"),
        F.max(F.when(good, F.col("event_id"))).alias("max_good_event_id"),
        F.count_distinct(F.when(good, F.col("event_type"))).alias("n_types_good"),
    )
