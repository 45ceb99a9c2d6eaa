"""The live activity stream (stream-static semi-join + windowed flow)
must equal the equivalent batch computation over the same events."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.operators.aggregates import dec_sum
from merl_etl_spark.sources.tables import load_table
from merl_etl_spark.streaming.pipeline import activity_stream, stream_events


def test_activity_stream_matches_batch(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # static Top-100 stand-in: heaviest users by total value
    top = (
        events.groupBy("user_id")
        .agg(F.sum("value").alias("t"))
        .orderBy(F.col("t").desc(), F.col("user_id"))
        .limit(100)
        .select("user_id")
    )
    q = (
        activity_stream(stream_events(spark, sf_dir), top)
        .writeStream.format("memory")
        .queryName("live_flow")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("live_flow")

    want = (
        events.join(F.broadcast(top), "user_id", "left_semi")
        .groupBy(F.window("ts", "60 minutes").alias("w"), F.col("user_id"))
        .agg(
            dec_sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)
            ).alias("in_amt"),
            dec_sum(
                F.when(F.col("event_type") == "error", F.col("value")).otherwise(0)
            ).alias("out_amt"),
            F.count("*").alias("txs"),
        )
        .select(F.col("w.start").alias("window_start"), "user_id", "in_amt", "out_amt", "txs")
    )
    canon = lambda df: sorted(  # noqa: E731
        map(tuple, ((str(v) for v in r) for r in df.select(sorted(df.columns)).collect()))
    )
    assert canon(got) == canon(want)
    assert got.count() > 0
