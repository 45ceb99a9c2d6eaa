"""The watermarked stream-stream attribution join must equal the batch
range join over the same events."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.sources.tables import load_table
from merl_etl_spark.streaming.pipeline import (
    purchase_click_attribution_stream,
    stream_events,
)


def test_stream_stream_attribution_matches_batch(spark, sf_dir):
    q = (
        purchase_click_attribution_stream(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("attrib")

    events = load_table(spark, sf_dir, "events")
    p = events.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = events.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("c_ts"),
    )
    want = p.join(
        c,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("purchase_id", "user_id", "p_ts", "purchase_value", "click_id", "c_ts")

    canon = lambda df: sorted(  # noqa: E731
        map(tuple, ((str(v) for v in r) for r in df.select(sorted(df.columns)).collect()))
    )
    assert got.count() > 0
    assert canon(got) == canon(want)


def test_stream_stream_left_outer_emits_expired_unmatched(spark, sf_dir, tmp_path):
    """left_outer mode: inner matches are complete, every NULL-click row
    is genuinely unmatched under batch semantics, and NULL rows DO get
    emitted once a later micro-batch advances the watermark past their
    join window (two file-chunks via maxFilesPerTrigger=1)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    mid = events.selectExpr(
        "timestamp_millis(CAST((min(unix_millis(ts)) + max(unix_millis(ts))) / 2 AS BIGINT))"
    ).first()[0]
    src = str(tmp_path / "chunks")
    # chunk files must arrive in time order for the watermark to advance
    events.filter(F.col("ts") < mid).coalesce(1).write.parquet(src + "/c=0")
    events.filter(F.col("ts") >= mid).coalesce(1).write.parquet(src + "/c=1")
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, "
                                "event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/c=*")
    )
    q = (
        purchase_click_attribution_stream(stream, how="left_outer")
        .writeStream.format("memory")
        .queryName("attrib_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("attrib_outer").cache()

    p = events.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"), F.col("value").alias("purchase_value"),
    )
    c = events.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"), F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
    )
    want_inner = p.join(c, cond).select(
        "purchase_id", "user_id", "p_ts", "purchase_value", "click_id", "c_ts"
    )
    canon = lambda df: sorted(  # noqa: E731
        map(tuple, ((str(v) for v in r) for r in df.select(sorted(df.columns)).collect()))
    )
    # 1) the matched subset is exactly the batch inner join
    assert canon(got.filter(F.col("click_id").isNotNull())) == canon(want_inner)
    # 2) soundness: every NULL-click purchase is batch-unmatched
    unmatched = p.join(c, cond, "left_anti")
    nulls = got.filter(F.col("click_id").isNull())
    assert nulls.join(
        unmatched.select("purchase_id"), "purchase_id", "left_anti"
    ).count() == 0
    # 3) non-vacuous: chunk-1 purchases whose window expired under the
    #    chunk-2 watermark must have been emitted with NULLs
    assert nulls.count() > 0
    got.unpersist()
