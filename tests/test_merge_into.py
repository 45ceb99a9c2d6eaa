"""merge_into_parquet must behave like SQL MERGE: new keys insert,
existing keys take the newest version, untouched partitions survive, and
replaying the same updates is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.sinks import merge_into_parquet


def _cursors(spark, rows):
    return spark.createDataFrame(
        rows, "stream string, last_scanned_block long, updated long"
    )


def _order():
    return [F.col("updated").desc()]


def test_merge_unpartitioned_upsert(spark, tmp_path):
    path = str(tmp_path / "cursors")
    merge_into_parquet(
        spark, path, _cursors(spark, [("a", 10, 1), ("b", 20, 1)]), ["stream"], _order()
    )
    # update a, insert c
    merge_into_parquet(
        spark, path, _cursors(spark, [("a", 15, 2), ("c", 5, 2)]), ["stream"], _order()
    )
    got = {r.stream: r.last_scanned_block for r in spark.read.parquet(path).collect()}
    assert got == {"a": 15, "b": 20, "c": 5}
    # replay is a no-op
    merge_into_parquet(
        spark, path, _cursors(spark, [("a", 15, 2), ("c", 5, 2)]), ["stream"], _order()
    )
    again = {r.stream: r.last_scanned_block for r in spark.read.parquet(path).collect()}
    assert again == got


def test_merge_partitioned_touches_only_update_partitions(spark, tmp_path):
    path = str(tmp_path / "holders")
    df = spark.createDataFrame(
        [("t1", "h1", 100, 1), ("t1", "h2", 200, 1), ("t2", "h1", 300, 1)],
        "token string, holder string, qty long, updated long",
    )
    merge_into_parquet(
        spark, path, df, ["token", "holder"], [F.col("updated").desc()], ["token"]
    )
    # update only t1; t2's partition must be untouched
    upd = spark.createDataFrame(
        [("t1", "h1", 150, 2), ("t1", "h3", 50, 2)],
        "token string, holder string, qty long, updated long",
    )
    merge_into_parquet(
        spark, path, upd, ["token", "holder"], [F.col("updated").desc()], ["token"]
    )
    got = {
        (r.token, r.holder): r.qty for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("t1", "h1"): 150,
        ("t1", "h2"): 200,
        ("t1", "h3"): 50,
        ("t2", "h1"): 300,
    }


def test_merge_staging_cleaned_and_wrecked_dir_self_heals(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    merge_into_parquet(
        spark, path, _cursors(spark, [("a", 1, 1)]), ["stream"], _order()
    )
    # staging dirs are unique-per-run and removed on success
    assert not [d for d in os.listdir(str(tmp_path)) if ".staging-" in d]

    # a directory with no committed parquet (crashed first write) must not
    # wedge the merge — it reads as "no table" and the next merge succeeds
    wrecked = str(tmp_path / "w")
    os.makedirs(os.path.join(wrecked, "_temporary"))
    merge_into_parquet(
        spark, wrecked, _cursors(spark, [("x", 9, 1)]), ["stream"], _order()
    )
    assert {r.stream for r in spark.read.parquet(wrecked).collect()} == {"x"}
