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
