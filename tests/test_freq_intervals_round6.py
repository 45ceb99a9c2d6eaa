"""Property tests for the continuation-round-6 tier: frequency sketches
(partition-invariance of the Misra-Gries contract, count-min guarantee
over ALL items), the shuffle index (true permutation), the triangle
census (hand-checked K4), and the interval-overlap join (bucketed
equi-join ≡ naive theta join)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from merl_etl_spark.operators.freq import (
    CM_DEPTH,
    MG_K,
    _cm_bucket,
    _mg_partition,
)
from merl_etl_spark.operators.intervals import CAMPAIGNS, join_interval_overlap
from merl_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Misra-Gries: the contract holds under ANY partitioning
# ---------------------------------------------------------------------------

def _mg_merge(spark, df):
    """Merged MG estimates + total error for an arbitrary user_id frame."""
    summaries = df.select("user_id").mapInPandas(
        _mg_partition, schema="item long, est long, dec long"
    )
    est = {
        r["item"]: r["est"]
        for r in summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
        .collect()
    }
    total_err = summaries.agg(F.sum("dec")).collect()[0][0]
    return est, total_err


@pytest.mark.parametrize("n_parts", [1, 7, 64])
def test_mg_contract_any_partitioning(spark, sf_dir, n_parts):
    """est ≤ exact, exact ≤ est + Σdec, and Σdec·K ≤ n for every item —
    under single-partition, odd, and shredded repartitionings (counter
    values legitimately differ per layout; the bounds may not)."""
    events = load_table(spark, sf_dir, "events").repartition(n_parts)
    est, total_err = _mg_merge(spark, events)
    exact = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    assert total_err * MG_K <= n_total
    for item, ex in exact.items():
        e = est.get(item, 0)
        assert e <= ex, f"MG overcounted {item}: {e} > {ex}"
        assert ex <= e + total_err, f"MG undercount bound broken for {item}"


def test_mg_partition_summary_is_bounded():
    """Each per-partition summary is ≤ MG_K counters + one sentinel."""
    big = pd.DataFrame({"user_id": list(range(5000)) + [1] * 500})
    out = list(_mg_partition(iter([big])))
    assert len(out) == 1
    s = out[0]
    assert len(s) <= MG_K + 1
    assert s["item"].isna().sum() == 1  # exactly one sentinel row
    # the heavy item must survive: exact 501 > dec total
    dec = int(s.loc[s["item"].isna(), "dec"].iloc[0])
    assert 501 > dec
    assert 1 in set(s["item"].dropna().astype(int))


# ---------------------------------------------------------------------------
# Count-min: est ≥ exact for EVERY item, not just the probed top-10
# ---------------------------------------------------------------------------

def test_cm_overestimates_every_item(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    item = F.col("user_id").cast("string")
    cells = (
        events.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(r).alias("r"), _cm_bucket(item, r).alias("col"))
                        for r in range(CM_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_ct"))
    probe = exact.select(
        "user_id",
        "exact_ct",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cm_bucket(F.col("user_id").cast("string"), r).alias("col"),
                    )
                    for r in range(CM_DEPTH)
                ]
            )
        ).alias("cell"),
    )
    est = (
        probe.join(
            F.broadcast(cells),
            (F.col("cell.r") == cells["r"]) & (F.col("cell.col") == cells["col"]),
        )
        .groupBy("user_id", "exact_ct")
        .agg(F.min("n").alias("cm_est"))
    )
    bad = est.filter(F.col("cm_est") < F.col("exact_ct")).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Shuffle index: a permutation of 0..n-1, stable across runs
# ---------------------------------------------------------------------------

def test_shuffle_index_is_permutation(spark, sf_dir):
    from merl_etl_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES["curate-shuffle-index"](spark, sf_dir)
    n = load_table(spark, sf_dir, "documents").count()
    got = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("shuffle_pos").alias("nd"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
    ).collect()[0]
    assert (got["n"], got["nd"], got["lo"], got["hi"]) == (n, n, 0, n - 1)
    # deterministic: second evaluation is the identical assignment
    a = {r["doc_id"]: r["shuffle_pos"] for r in df.collect()}
    b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in QUERIES["curate-shuffle-index"](spark, sf_dir).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# Triangle census: hand-checked K4 through the same composition
# ---------------------------------------------------------------------------

def test_triangles_k4(spark):
    """K4 (complete graph on 4 nodes) has exactly 4 triangles and every
    node sits in 3 — pushed through the same oriented two-join
    enumeration graph_triangles uses."""
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "id_a long, id_b long",
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.id_b") == F.col("e2.id_a"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .select(
            F.col("e1.id_a").alias("x"),
            F.col("e1.id_b").alias("y"),
            F.col("e2.id_b").alias("z"),
        )
    )
    rows = tri.collect()
    assert len(rows) == 4
    assert all(r["x"] < r["y"] < r["z"] for r in rows)
    per_node: dict[int, int] = {}
    for r in rows:
        for v in (r["x"], r["y"], r["z"]):
            per_node[v] = per_node.get(v, 0) + 1
    assert per_node == {0: 3, 1: 3, 2: 3, 3: 3}


# ---------------------------------------------------------------------------
# Interval overlap: bucketed equi-join ≡ naive theta join
# ---------------------------------------------------------------------------

def test_interval_overlap_matches_naive_theta_join(spark, sf_dir):
    got = {
        r["campaign_id"]: (r["n_sessions"], r["n_users"], r["overlap_us"])
        for r in join_interval_overlap(spark, sf_dir).collect()
    }
    # naive reference: same sessions, plain cross+filter (fixture-sized)
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    from merl_etl_spark.operators.intervals import SESSION_GAP_US

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > SESSION_GAP_US)
    ).cast("int")
    sess = (
        events.select(
            "user_id",
            "ts",
            F.sum(is_new)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("sess_seq"),
        )
        .groupBy("user_id", "sess_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    campaigns = spark.createDataFrame(
        CAMPAIGNS, "campaign_id int, c_start string, c_end string"
    ).select(
        "campaign_id",
        F.col("c_start").cast("timestamp").alias("c_start"),
        F.col("c_end").cast("timestamp").alias("c_end"),
    )
    naive = (
        sess.crossJoin(F.broadcast(campaigns))
        .filter(
            (F.col("s_start") <= F.col("c_end"))
            & (F.col("c_start") <= F.col("s_end"))
        )
        .groupBy("campaign_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.unix_micros(F.least("s_end", "c_end"))
                - F.unix_micros(F.greatest("s_start", "c_start"))
            ).alias("overlap_us"),
        )
    )
    want = {
        r["campaign_id"]: (r["n_sessions"], r["n_users"], r["overlap_us"])
        for r in naive.collect()
    }
    assert got == want
    assert len(got) == len(CAMPAIGNS)  # every campaign window saw sessions
