"""Regression tests for review findings: short-document shingling must
not crash (Spark's sequence(1,0) descends), and the as-of join must keep
matched right rows atomic when right columns contain legitimate NULLs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from merl_etl_spark.operators.asof import asof_join_backward


def test_shingles_short_documents_no_crash(spark):
    docs = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "three words here"), (4, "")],
        "doc_id long, text string",
    )
    from merl_etl_spark.operators.dedup import WORDS_SHINGLES

    out = (
        docs.withColumn("words", F.split("text", " "))
        .select("doc_id", F.expr(WORDS_SHINGLES).alias("sh"))
        .collect()
    )
    by_id = {r.doc_id: r.sh for r in out}
    assert by_id[1] == [] and by_id[2] == [] and by_id[4] == []
    assert by_id[3] == ["three words here"]


def test_asof_null_right_columns_stay_atomic(spark):
    """Right rows (09:00, id=5, extra='x') and (09:10, id=7, extra=NULL):
    a left row at 09:20 must get (7, NULL), never the torn (7, 'x')."""
    base = dt.datetime(2024, 1, 1, 9, 0)
    right = spark.createDataFrame(
        [
            (5, base, "x"),
            (7, base + dt.timedelta(minutes=10), None),
        ],
        "r_id long, r_ts timestamp, extra string",
    )
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=20))], "l_id long, l_ts timestamp"
    )
    out = asof_join_backward(left, right, "l_ts", "r_ts", ["r_id", "extra"]).collect()
    assert len(out) == 1
    assert out[0].r_id == 7 and out[0].extra is None

    # and across buckets: left in a later bucket carries the (7, NULL) row
    left2 = spark.createDataFrame(
        [(2, base + dt.timedelta(hours=5))], "l_id long, l_ts timestamp"
    )
    out2 = asof_join_backward(
        left2, right, "l_ts", "r_ts", ["r_id", "extra"], bucket_seconds=60
    ).collect()
    assert out2[0].r_id == 7 and out2[0].extra is None
