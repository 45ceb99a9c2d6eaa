"""Semantic tests for the round-11 wave-8 operators: exact rolling
distinct actives via bitmap OR and asymmetric-distance PQ search."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# agg-rolling-distinct-bitmap: bitmap OR == plain rolling set union
# ---------------------------------------------------------------------------

def test_rolling_distinct_matches_set_reference(spark, sf_dir):
    """Every day's DAU and trailing-window WAU must equal the plain
    per-day set computation, the day universe must be exactly the days
    present in the data (no trailing ghost days past the stream end),
    and stickiness must be the integer floor ratio."""
    from merl_etl_spark.operators.freq import ROLL_DAYS

    rows = {r["day"]: r for r in QUERIES["agg-rolling-distinct-bitmap"](spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .where(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("user_id") >= 0)
        )
        .select(F.to_date("ts").alias("day"), "user_id")
        .collect()
    )
    daily: dict = defaultdict(set)
    for r in ev:
        daily[r["day"]].add(r["user_id"])
    assert set(rows) == {d.strftime("%Y-%m-%d") for d in daily}
    for d, users in daily.items():
        wau = set()
        for off in range(ROLL_DAYS):
            wau |= daily.get(d - timedelta(days=off), set())
        r = rows[d.strftime("%Y-%m-%d")]
        assert r["dau"] == len(users)
        assert r["wau"] == len(wau)
        assert r["dau"] <= r["wau"]
        assert r["stickiness_ppm"] == len(users) * 1_000_000 // len(wau)


# ---------------------------------------------------------------------------
# sim-pq-adc-topk: ADC ranking == plain-Python LUT reference
# ---------------------------------------------------------------------------

def test_pq_adc_matches_python_reference(spark, sf_dir):
    """Recompute the whole ADC pipeline in Python — reference-half
    codebook stats, held-out codes (the sim-pq-encode argmin), per-query
    LUTs, summed asymmetric distances, top-k with the (dist, vec_id)
    tie-break — and compare every returned row exactly."""
    from merl_etl_spark.operators.similarity import (
        ASSIGN_FP_SCALE,
        PQ_SUBDIM,
        PQ_SUBS,
        SIM_NQUERY,
        SIM_TOPK,
    )

    rows = load_table(spark, sf_dir, "embeddings").collect()
    cap = max(r["vec_id"] for r in rows) // 2
    ndim = len(rows[0]["embedding"])
    sums: dict[int, list[int]] = defaultdict(lambda: [0] * ndim)
    ns: dict[int, int] = Counter()
    fp_all = {}
    for r in rows:
        fp = [math.floor(float(x) * ASSIGN_FP_SCALE) for x in r["embedding"]]
        fp_all[r["vec_id"]] = fp
        if r["vec_id"] <= cap:
            sums[r["label"]] = [a + b for a, b in zip(sums[r["label"]], fp)]
            ns[r["label"]] += 1

    def sub_d2(vfp: list[int], m: int, lbl: int) -> int:
        lo = m * PQ_SUBDIM
        n, s = ns[lbl], sums[lbl]
        return sum(
            (abs(v * n - si) // n) ** 2
            for v, si in zip(vfp[lo : lo + PQ_SUBDIM], s[lo : lo + PQ_SUBDIM])
        )

    codes = {}
    for r in rows:
        if r["vec_id"] <= cap:
            continue
        codes[r["vec_id"]] = [
            min(((sub_d2(fp_all[r["vec_id"]], m, lbl), lbl) for lbl in sorted(ns)))[1]
            for m in range(PQ_SUBS)
        ]
    expect = {}
    for q in range(SIM_NQUERY):
        lut = {
            (m, lbl): sub_d2(fp_all[q], m, lbl)
            for m in range(PQ_SUBS)
            for lbl in ns
        }
        scored = sorted(
            (sum(lut[(m, cs[m])] for m in range(PQ_SUBS)), vid)
            for vid, cs in codes.items()
        )
        expect[q] = scored[:SIM_TOPK]

    got = QUERIES["sim-pq-adc-topk"](spark, sf_dir).collect()
    assert len(got) == SIM_NQUERY * SIM_TOPK
    for r in got:
        dist, vid = expect[r["query_id"]][r["rnk"] - 1]
        assert (r["vec_id"], r["adc_dist"]) == (vid, dist), (
            r["query_id"],
            r["rnk"],
        )
