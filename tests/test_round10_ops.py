"""Round-10 operators: the broadcast-weights classifier filter and the
distribution-drift audit (both exact-integer/raw-double surfaces per the
r10 no-decimal-output rule)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all

load_all()


def _md5_bucket(text: str, buckets: int) -> int:
    return int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % buckets


# ---------------------------------------------------------------------------
# curate-classifier-filter
# ---------------------------------------------------------------------------

def test_classifier_filter_matches_python_model(spark, sf_dir):
    """Recompute the hashed-feature logit in Python for a handful of
    documents — the Spark plan's broadcast-join scoring must equal the
    reference implementation exactly (features = distinct md5 buckets of
    lowercase alpha words, weights = md5-derived integers)."""
    import re

    from merl_etl_spark.operators.curation_ext import (
        CLF_BUCKETS,
        CLF_SALT,
        CLF_WEIGHT_SPAN,
    )
    from merl_etl_spark.sources.tables import load_table

    out = {
        r["doc_id"]: r
        for r in QUERIES["curate-classifier-filter"](spark, sf_dir).collect()
    }
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(25)
        .collect()
    )
    checked = 0
    for d in docs:
        words = set(re.findall(r"[a-z]+", (d["text"] or "").lower()))
        buckets = {_md5_bucket(w, CLF_BUCKETS) for w in words}
        if not buckets:
            assert d["doc_id"] not in out
            continue
        logit = sum(
            _md5_bucket(f"{CLF_SALT}{b}", 2 * CLF_WEIGHT_SPAN + 1)
            - CLF_WEIGHT_SPAN
            for b in buckets
        )
        r = out[d["doc_id"]]
        assert r["n_feats"] == len(buckets)
        assert r["logit_milli"] == logit
        assert r["keep"] == (logit > 0)
        assert r["score_norm"] == logit / (len(buckets) * CLF_WEIGHT_SPAN)
        checked += 1
    assert checked >= 20


def test_classifier_filter_weight_table_is_broadcast(spark, sf_dir):
    """The weight table must reach the corpus as a broadcast join — a
    shuffled scoring join would move the corpus for a 4096-row model."""
    plan = (
        QUERIES["curate-classifier-filter"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# dq-distribution-drift
# ---------------------------------------------------------------------------

def test_distribution_drift_shares_and_rank(spark, sf_dir):
    """Shares on each side sum to 1, drift is exactly the share
    difference, the drifted flag matches the threshold, and rnk is a
    1..n permutation ordered by |drift| desc."""
    from merl_etl_spark.operators.quality import DRIFT_PP

    rows = QUERIES["dq-distribution-drift"](spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["ref_share"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["cur_share"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r["drift"] == r["cur_share"] - r["ref_share"]
        assert r["drifted"] == (abs(r["drift"]) > DRIFT_PP)
    ranks = sorted(r["rnk"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    drifts = [abs(r["drift"]) for r in by_rank]
    assert drifts == sorted(drifts, reverse=True)


def test_embedding_drift_matches_numpy_fixed_point(spark, sf_dir):
    """Recompute the per-dimension fixed-point sums and means in Python —
    float32 × 2^30 is exact in double arithmetic, so equality is exact,
    not approximate."""
    import math

    from merl_etl_spark.operators.quality import EMB_FP_SCALE
    from merl_etl_spark.sources.tables import load_table

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cap = max(vecs) // 2
    rows = {r["dim"]: r for r in QUERIES["dq-embedding-drift"](spark, sf_dir).collect()}
    ndim = len(next(iter(vecs.values())))
    assert set(rows) == set(range(1, ndim + 1))
    for dim in (1, 2, ndim):
        ref = [v[dim - 1] for k, v in vecs.items() if k <= cap]
        cur = [v[dim - 1] for k, v in vecs.items() if k > cap]
        ref_fp = sum(math.floor(float(x) * EMB_FP_SCALE) for x in ref)
        cur_fp = sum(math.floor(float(x) * EMB_FP_SCALE) for x in cur)
        r = rows[dim]
        assert (r["ref_n"], r["cur_n"]) == (len(ref), len(cur))
        assert r["ref_sum_fp"] == ref_fp
        assert r["cur_sum_fp"] == cur_fp
        assert r["mean_ref"] == ref_fp / (len(ref) * EMB_FP_SCALE)
        assert r["shift"] == r["mean_cur"] - r["mean_ref"]
    ranks = sorted(r["rnk"] for r in rows.values())
    assert ranks == list(range(1, ndim + 1))


def test_centroid_assign_matches_python_nearest(spark, sf_dir):
    """Recompute the exact-integer assignment in Python: quantize every
    query vector at ASSIGN_FP_SCALE, build per-label fixed-point
    centroid sums from the reference half, take the integer-metric
    argmin with the (d2, label) tie-break, and compare the confusion
    matrix exactly."""
    import math
    from collections import Counter, defaultdict

    from merl_etl_spark.operators.similarity import ASSIGN_FP_SCALE
    from merl_etl_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").collect()
    cap = max(r["vec_id"] for r in rows) // 2
    sums: dict[int, list[int]] = defaultdict(lambda: None)
    ns: dict[int, int] = Counter()
    ndim = len(rows[0]["embedding"])
    for r in rows:
        if r["vec_id"] > cap:
            continue
        fp = [math.floor(float(x) * ASSIGN_FP_SCALE) for x in r["embedding"]]
        if sums[r["label"]] is None:
            sums[r["label"]] = [0] * ndim
        sums[r["label"]] = [a + b for a, b in zip(sums[r["label"]], fp)]
        ns[r["label"]] += 1
    confusion = Counter()
    for r in rows:
        if r["vec_id"] <= cap:
            continue
        vfp = [math.floor(float(x) * ASSIGN_FP_SCALE) for x in r["embedding"]]
        best = None
        for lbl in sorted(ns):
            n, s = ns[lbl], sums[lbl]
            # abs before the integer divide: non-negative operands make
            # Python's floor-div equal to both engines' truncation
            d2 = sum((abs(v * n - si) // n) ** 2 for v, si in zip(vfp, s))
            if best is None or (d2, lbl) < best[:2]:
                best = (d2, lbl)
        confusion[(r["label"], best[1])] += 1
    out = {
        (r["true_label"], r["assigned_label"]): (r["n"], r["is_correct"])
        for r in QUERIES["sim-centroid-assign"](spark, sf_dir).collect()
    }
    assert {k: v[0] for k, v in out.items()} == dict(confusion)
    for (t, a), (_, correct) in out.items():
        assert correct == (t == a)


def test_backtest_seasonal_matches_python_reference(spark, sf_dir):
    """Recompute the seasonal-naive backtest in Python with exact
    Decimal hourly sums: MAE/bias must equal the operator's
    VARCHAR-routed double boundary exactly, eval counts must respect
    gaps (an hour with no t-24h actual produces NO eval row)."""
    import datetime as dt
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from merl_etl_spark.operators.timeseries import BACKTEST_LAG_HOURS
    from merl_etl_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select("event_type", "ts", "value")
        .collect()
    )
    hourly: dict = defaultdict(lambda: Decimal(0))
    for r in rows:
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        # quantize exactly like CAST(value AS DECIMAL(18,6)): HALF_UP on
        # the double's EXACT binary expansion (Decimal(float), not
        # Decimal(repr(float)) — the shortest repr can round a near-tie
        # the other way)
        hourly[(r["event_type"], h)] += Decimal(r["value"]).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    lag = dt.timedelta(hours=BACKTEST_LAG_HOURS)
    stats: dict = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
    n_hours: dict = defaultdict(set)
    for (t, h) in hourly:
        n_hours[t].add(h)
        prev = (t, h - lag)
        if prev in hourly:
            err = hourly[(t, h)] - hourly[prev]
            s = stats[t]
            s[0] += 1
            s[1] += abs(err)
            s[2] += err
    out = {r["event_type"]: r for r in QUERIES["ts-backtest-seasonal"](spark, sf_dir).collect()}
    assert set(out) == set(stats)
    for t, (n, sab, ser) in stats.items():
        r = out[t]
        assert r["n_hours"] == len(n_hours[t])
        assert r["n_evals"] == n
        assert r["mae"] == float(sab) / n
        assert r["bias"] == float(ser) / n


def test_distribution_drift_counts_split_the_stream(spark, sf_dir):
    """ref + cur counts must cover every event exactly once under the
    unfiltered-stream cap convention."""
    from merl_etl_spark.sources.tables import load_table

    rows = QUERIES["dq-distribution-drift"](spark, sf_dir).collect()
    total = sum(r["ref_count"] + r["cur_count"] for r in rows)
    events = load_table(spark, sf_dir, "events")
    assert total == events.count()
    cap = events.agg(F.expr("max(event_id) DIV 2").alias("c")).collect()[0]["c"]
    ref_expect = events.filter(F.col("event_id") <= cap).count()
    assert sum(r["ref_count"] for r in rows) == ref_expect
