"""dropDuplicatesWithinWatermark: streaming dedup with BOUNDED state —
duplicate suppression is guaranteed only while the first occurrence is
within the watermark, which is what lets the engine evict state instead
of remembering every key forever (the plain dropDuplicates trap at
100 TB: unbounded state)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_within_watermark_duplicates_suppressed(spark, tmp_path):
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    # chunk 0: events A(t=0), B(t=60s); chunk 1: duplicate of A arriving
    # 2 min later (inside the 10-min watermark) + a fresh C — the dup
    # must be suppressed, C must pass
    rows0 = [(1, base, "A"), (2, base + dt.timedelta(seconds=60), "B")]
    rows1 = [
        (1, base + dt.timedelta(seconds=120), "A-dup"),
        (3, base + dt.timedelta(seconds=180), "C"),
    ]
    src = str(tmp_path / "src")
    schema = "k long, ts timestamp, tag string"
    spark.createDataFrame(rows0, schema).coalesce(1).write.parquet(src + "/c=0")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/c=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/c=*")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["k"]: r["tag"] for r in spark.table("dedup_wm").collect()}
    assert got == {1: "A", 2: "B", 3: "C"}, got


def test_state_evicts_beyond_watermark(spark, tmp_path):
    """A duplicate arriving AFTER the watermark passed its first
    occurrence may re-emit — the documented contract that makes the
    state bounded.  We pin the weaker direction that must always hold:
    every distinct key appears at least once and the within-window
    duplicate never does."""
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows0 = [(1, base, "A")]
    # watermark advances far past A before its duplicate arrives
    rows1 = [(9, base + dt.timedelta(hours=3), "adv")]
    rows2 = [(1, base + dt.timedelta(hours=3, seconds=10), "A-late-dup")]
    src = str(tmp_path / "src")
    schema = "k long, ts timestamp, tag string"
    for i, rows in enumerate((rows0, rows1, rows2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/c={i}")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/c=*")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_wm2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.table("dedup_wm2").collect()
    tags = [r["tag"] for r in rows]
    assert "A" in tags and "adv" in tags
    # the late dup MAY re-emit (state evicted) — both outcomes are legal;
    # what is NOT legal is losing a first occurrence
    assert len([t for t in tags if t.startswith("A")]) >= 1
