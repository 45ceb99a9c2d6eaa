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


STRESS_EV = "/tmp/stress100/ev.parquet"
N_EVENTS = 10_000_000


def ensure_events(spark):
    """Self-provision the 10M-event stress corpus if /tmp was cleared
    (same schema as the fixture events table; entity-scaled, not
    copied — the round-6 stress convention)."""
    if os.path.isdir(STRESS_EV):
        return
    types = "array('view', 'click', 'purchase', 'signup', 'error')"
    ev = spark.range(0, N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(SECOND, CAST(id % 2592000 AS INT), "
            "TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
        F.expr("pmod(xxhash64(id), 500000)").alias("user_id"),
        F.expr(f"element_at({types}, CAST(pmod(xxhash64(id + 7), 5) AS INT) + 1)").alias(
            "event_type"
        ),
        F.expr("CAST(pmod(xxhash64(id + 13), 10000) AS DOUBLE) / 100.0").alias(
            "value"
        ),
        F.lit('{"k": 1}').alias("props"),
    )
    ev.repartition(32).write.mode("overwrite").parquet(STRESS_EV)


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
    ensure_events(spark)

    def patched(spark_, sf_dir, name):
        if name == "embeddings":
            return spark_.read.parquet(STRESS_EMB)
        if name == "events":
            return spark_.read.parquet(STRESS_EV)
        return orig_load(spark_, sf_dir, name)

    import merl_etl_spark.operators.freq as freq
    import merl_etl_spark.operators.quality as quality
    import merl_etl_spark.operators.timeseries as timeseries

    mods = (similarity, freq, quality, timeseries)
    for mod in mods:
        mod.load_table = patched
    try:
        df = QUERIES["sim-centroid-assign"](spark, "/root/testdata/sf0.1")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the rewrite's invariant: no exchange at (vec, dim) component
        # grain — the only exchanges are the codebook build (reference
        # half) and the |labels|^2 confusion rollup
        n_exchanges = plan.count("Exchange hashpartitioning")
        print(f"hash exchanges in plan: {n_exchanges}", flush=True)
        forced("sim-centroid-assign 500k x 64d x 10c", df)
        # round-11 new ops at the same stress scales
        forced(
            "sim-rp-projection 500k x 64d -> 8d",
            QUERIES["sim-rp-projection"](spark, "/root/testdata/sf0.1"),
        )
        forced(
            "agg-bitmap-distinct 10M events",
            QUERIES["agg-bitmap-distinct"](spark, "/root/testdata/sf0.1"),
        )
        forced(
            "dq-distribution-psi 10M events",
            QUERIES["dq-distribution-psi"](spark, "/root/testdata/sf0.1"),
        )
        forced(
            "dq-freshness 10M events",
            QUERIES["dq-freshness"](spark, "/root/testdata/sf0.1"),
        )
        forced(
            "sim-pq-encode 500k x 64d, 8 subspaces x 10 codes",
            QUERIES["sim-pq-encode"](spark, "/root/testdata/sf0.1"),
        )
        forced(
            "ts-cusum-changepoint 10M events",
            QUERIES["ts-cusum-changepoint"](spark, "/root/testdata/sf0.1"),
        )
    finally:
        for mod in mods:
            mod.load_table = orig_load


if __name__ == "__main__":
    main()
