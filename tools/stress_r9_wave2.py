#!/usr/bin/env python
"""100x stress for the round-9 second-wave operators.

Events ops run over /tmp/stress100/ev.parquet (10M events), docs ops
over docs.parquet (500k documents) — the entity-scaled corpora from the
round-6/8 stress practice.  graph-components' iteration core is
stressed on a synthetic 2M-node ring graph (200k rings of 10 — known
component census, exercises the 10-round x 3-shuffle iteration shape at
graph sizes the fixture cannot reach).  Every timing is hash-sum-forced
(a bare count() lets Catalyst prune window/project expressions).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from merl_etl_spark import registry  # noqa: E402
from merl_etl_spark.session import get_spark  # noqa: E402
import merl_etl_spark.operators.aggregates as aggregates  # noqa: E402
import merl_etl_spark.operators.analytics as analytics  # noqa: E402
import merl_etl_spark.operators.curation_ext as curation_ext  # noqa: E402
import merl_etl_spark.operators.dedup as dedup  # noqa: E402
import merl_etl_spark.operators.incremental as incremental  # noqa: E402
import merl_etl_spark.operators.quality as quality  # noqa: E402
import merl_etl_spark.operators.text_analysis as text_analysis  # noqa: E402
import merl_etl_spark.operators.timeseries as timeseries  # noqa: E402
from merl_etl_spark.operators.graph import min_label_propagation  # noqa: E402
from merl_etl_spark.sources.tables import load_table as orig_load  # noqa: E402

SF = "/root/testdata/sf0.1"
STRESS = "/tmp/stress100"


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


def patched(spark_, sf_dir, name):
    if name == "events":
        return spark_.read.parquet(f"{STRESS}/ev.parquet")
    if name == "documents":
        return spark_.read.parquet(f"{STRESS}/docs.parquet")
    if name == "lineitem":
        return spark_.read.parquet(f"{STRESS}/li.parquet")
    if name == "orders":
        # entity-scaled 100x orders (15M rows, 100x customers) — the
        # stress corpus set has no orders table
        rep = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
        o = orig_load(spark_, sf_dir, "orders")
        return o.select("*", rep).select(
            (F.col("o_orderkey") + F.col("rep") * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * 10_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
        )
    return orig_load(spark_, sf_dir, name)


def main() -> int:
    registry.load_all()
    spark = get_spark("stress_r9w2")

    mods = (analytics, quality, curation_ext, incremental, text_analysis,
            aggregates, dedup, timeseries)
    for mod in mods:
        mod.load_table = patched
    try:
        forced("analytics-path-mining 100x (10M events)",
               registry.QUERIES["analytics-path-mining"](spark, SF))
        forced("analytics-attribution-lasttouch 100x (10M events)",
               registry.QUERIES["analytics-attribution-lasttouch"](spark, SF))
        forced("dq-volume-anomaly 100x (10M events)",
               registry.QUERIES["dq-volume-anomaly"](spark, SF))
        forced("curate-quality-sampling 100x (500k docs)",
               registry.QUERIES["curate-quality-sampling"](spark, SF))
        forced("cdc-merge-apply 100x (10M events)",
               registry.QUERIES["cdc-merge-apply"](spark, SF))
        forced("text-cooccurrence-pmi 100x (500k docs)",
               registry.QUERIES["text-cooccurrence-pmi"](spark, SF))
        # wave-1 operators
        forced("agg-weighted-median 100x (60M lineitem)",
               registry.QUERIES["agg-weighted-median"](spark, SF))
        forced("agg-grouping-sets 100x (60M lineitem)",
               registry.QUERIES["agg-grouping-sets"](spark, SF))
        forced("curate-softdedup-weights 100x (500k docs)",
               registry.QUERIES["curate-softdedup-weights"](spark, SF))
        forced("ts-seasonal-profile 100x (10M events)",
               registry.QUERIES["ts-seasonal-profile"](spark, SF))
        forced("ts-autocorr 100x (10M events)",
               registry.QUERIES["ts-autocorr"](spark, SF))
        forced("ts-downsample-lttb 100x (10M events)",
               registry.QUERIES["ts-downsample-lttb"](spark, SF))
        forced("dedup-bloom-incremental 100x (500k docs)",
               registry.QUERIES["dedup-bloom-incremental"](spark, SF))
        forced("analytics-rfm-segmentation 100x (15M orders, 15M customers)",
               registry.QUERIES["analytics-rfm-segmentation"](spark, SF))
    finally:
        for mod in mods:
            mod.load_table = orig_load

    # layout-partition-prune 100x, measured directly (its content-keyed
    # cache keys off the REAL fixture file, so patching load_table would
    # silently reuse the fixture-scale layout): one date-partitioned
    # write of the 10M-event table + one pruned week read
    import shutil
    import uuid

    from merl_etl_spark.operators.profiling import PRUNE_HI, PRUNE_LO

    ev = spark.read.parquet(f"{STRESS}/ev.parquet")
    out = f"/tmp/merl_prune_stress_{uuid.uuid4().hex}"
    t0 = time.perf_counter()
    (ev.withColumn("event_date", F.to_date("ts"))
       .write.mode("overwrite").partitionBy("event_date").parquet(out))
    t_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = spark.read.parquet(out).filter(
        (F.col("event_date") >= F.lit(PRUNE_LO).cast("date"))
        & (F.col("event_date") <= F.lit(PRUNE_HI).cast("date"))
    ).groupBy("event_date").agg(F.count(F.lit(1)).alias("n"))
    n = back.agg(F.sum("n")).collect()[0][0]
    t_read = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    print(f"layout-partition-prune 100x (10M events): write={t_write:.1f}s "
          f"pruned-week-agg={t_read:.1f}s rows_in_week={n}", flush=True)

    # synthetic ring graph: 200k rings of 10 nodes -> 2M nodes, 4M
    # directed edges, 200k components with known minima (ring*10)
    n_rings, ring = 200_000, 10
    base = spark.range(n_rings * ring).select(
        (F.col("id")).alias("src"),
        ((F.col("id") - F.col("id") % ring)
         + (F.col("id") + 1) % ring).alias("dst"),
    )
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    t0 = time.perf_counter()
    last, second_last = min_label_propagation(edges, 10)
    census = last.groupBy("lbl").agg(F.count(F.lit(1)).alias("n_nodes"))
    row = census.agg(
        F.count(F.lit(1)).alias("n_comp"),
        F.sum(F.xxhash64(F.struct("lbl", "n_nodes"))).alias("h"),
        F.min("n_nodes").alias("lo"), F.max("n_nodes").alias("hi"),
    ).collect()[0]
    changed = (
        last.withColumnRenamed("lbl", "a")
        .join(second_last.withColumnRenamed("lbl", "b"), "node")
        .filter(F.col("a") != F.col("b")).count()
    )
    print(
        f"graph-components core (2M nodes / 4M directed edges, 10 rounds): "
        f"components={row['n_comp']} sizes=[{row['lo']},{row['hi']}] "
        f"hash={row['h']} changed_last_round={changed} "
        f"cold={time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    assert row["n_comp"] == n_rings and row["lo"] == row["hi"] == ring
    assert changed == 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
