#!/usr/bin/env python
"""Round-11 stress: sim-centroid-assign at the r10 stress scale
(500k vectors x 64 dims, 10 labels) after the broadcast-codebook argmin
rewrite (VERDICT r10 #3).  The r10 keyed-aggregate form cost 20.7 s at
this scale because every query vector exploded to 64 components and
joined 10 centroids — a 640-fold amplification through a shuffle; the
rewrite computes the argmin as a per-row array expression over a
one-row broadcast codebook, so the query half is never exploded at all.

Vectors are deterministic (xxhash64-derived), timing is hash-sum-forced
(the stress_r9_wave2 convention).
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from merl_etl_spark.registry import QUERIES, load_all  # noqa: E402
from merl_etl_spark.session import get_spark  # noqa: E402
import merl_etl_spark.operators.similarity as similarity  # noqa: E402
from merl_etl_spark.sources.tables import load_table as orig_load  # noqa: E402

STRESS_EMB = "/tmp/stress100/emb500k.parquet"
N_VECS = 500_000
N_DIMS = 64
N_LABELS = 10


def ensure_corpus(spark):
    if os.path.isdir(STRESS_EMB):
        return
    # deterministic pseudo-random floats in [-1, 1): hash of (id, dim)
    emb = (
        spark.range(1, N_VECS + 1)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"""transform(sequence(0, {N_DIMS - 1}), d -> CAST(
                  (pmod(xxhash64(id * {N_DIMS} + d), 2000000) - 1000000)
                  / CAST(1000000 AS DOUBLE) AS FLOAT))"""
            ).alias("embedding"),
            (F.col("id") % N_LABELS).cast("int").alias("label"),
        )
    )
    emb.repartition(32).write.mode("overwrite").parquet(STRESS_EMB)


def forced(label, df):
    t0 = time.perf_counter()
    row = df.agg(
        F.sum(F.xxhash64(F.struct(*df.columns))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    print(
        f"{label}: rows={row['n']} hash={row['h']} "
        f"cold={time.perf_counter() - t0:.1f}s",
        flush=True,
    )


def main():
    spark = get_spark("stress_r11", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    load_all()
    ensure_corpus(spark)

    def patched(spark_, sf_dir, name):
        if name == "embeddings":
            return spark_.read.parquet(STRESS_EMB)
        return orig_load(spark_, sf_dir, name)

    similarity.load_table = patched
    try:
        df = QUERIES["sim-centroid-assign"](spark, "/root/testdata/sf0.1")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the rewrite's invariant: no exchange at (vec, dim) component
        # grain — the only exchanges are the codebook build (reference
        # half) and the |labels|^2 confusion rollup
        n_exchanges = plan.count("Exchange hashpartitioning")
        print(f"hash exchanges in plan: {n_exchanges}", flush=True)
        forced("sim-centroid-assign 500k x 64d x 10c", df)
    finally:
        similarity.load_table = orig_load


if __name__ == "__main__":
    main()
