"""The canonical partitioned layout must actually prune: a one-token /
one-bucket predicate reads only that partition's files (the engine's
replacement for the reference's B-tree indexes, SURVEY.md §1.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.plans.jobs import derive_top100
from merl_etl_spark.sinks import partition_pruning_proof, write_partitioned
from tests.fixtures import HOLDERS_SPARK_SCHEMA, TOKENS, holders_pdf


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "holders_part")
    holders = spark.createDataFrame(holders_pdf(n_holders=50), schema=HOLDERS_SPARK_SCHEMA)
    write_partitioned(
        holders.withColumn("bucket_date", F.to_date("bucket_start_utc")),
        path,
        ["contract_address", "bucket_date"],
    )
    scanned, total = partition_pruning_proof(
        spark, path, f"contract_address = '{TOKENS[0]}'"
    )
    assert scanned < total  # the other token's partitions were never read
    # and the physical plan carries the partition filter
    df = spark.read.parquet(path).filter(F.col("contract_address") == TOKENS[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "contract_address" in plan


def test_derivation_on_partitioned_layout(spark, tmp_path):
    """End-to-end: write partitioned, read back, derive Top-100 — results
    identical to deriving from the unpartitioned frame."""
    path = str(tmp_path / "holders_part2")
    holders = spark.createDataFrame(holders_pdf(), schema=HOLDERS_SPARK_SCHEMA)
    write_partitioned(
        holders.withColumn("bucket_date", F.to_date("bucket_start_utc")),
        path,
        ["contract_address", "bucket_date"],
    )
    readback = spark.read.parquet(path).drop("bucket_date")
    a = sorted(map(tuple, derive_top100(readback, TOKENS[0]).collect()))
    b = sorted(map(tuple, derive_top100(holders, TOKENS[0]).collect()))
    assert a == b
