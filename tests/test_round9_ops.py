"""Semantic tests for the round-9 work: the sharded ts-moving-stats
execution mode (the ts-ewma chunked-overlap pattern generalized to a
bounded RANGE frame) and the transcendental determinism canary."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all

load_all()


# ---------------------------------------------------------------------------
# ts-moving-stats sharded mode
# ---------------------------------------------------------------------------

def _movstats_rows(spark, sf_dir):
    return sorted(
        (r["event_type"], r["event_id"], r["ts_str"], r["mov_n"], r["mov_sum"])
        for r in QUERIES["ts-moving-stats"](spark, sf_dir).collect()
    )


def test_movstats_sharded_mode_equals_default(spark, sf_dir):
    """The time-bucketed carry plan (spark.merl.movstats.sharded=true)
    must be BIT-identical to the per-series RANGE window: every row's
    trailing 3600 s lives entirely inside its (series, shard) partition
    because rows in the last FRAME seconds of a shard are carried into
    the next one, and both modes sum the same exact decimals."""
    from merl_etl_spark.operators.timeseries import MOVSTATS_SHARDED_CONF

    spark.conf.set(MOVSTATS_SHARDED_CONF, "true")
    try:
        sharded = _movstats_rows(spark, sf_dir)
    finally:
        spark.conf.set(MOVSTATS_SHARDED_CONF, "false")
    default = _movstats_rows(spark, sf_dir)
    assert len(sharded) == len(default) > 0
    assert sharded == default


def test_movstats_sharded_null_ts_and_narrow_bucket(spark, sf_dir):
    """(1) null-ts rows must survive sharding (they collapse into one
    NULL shard per series — the same all-nulls frame group the default
    RANGE window forms); (2) a shard narrower than the frame fails
    loudly; (3) a non-default width (exactly the frame) still matches,
    including rows that sit exactly ON a shard boundary."""
    import merl_etl_spark.operators.timeseries as ts_mod
    from merl_etl_spark.operators.timeseries import (
        MOVSTATS_BUCKET_CONF,
        MOVSTATS_SHARDED_CONF,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        # irregular spacing incl. exact multiples of 3600 s from base so
        # several events land exactly on shard boundaries
        (i, "a" if i % 3 else "b", base + dt.timedelta(seconds=(i * 977) % 90000),
         float(i % 11))
        for i in range(1, 400)
    ]
    rows += [(901, "a", None, 5.0), (902, "a", None, 7.0), (903, "b", None, 1.0)]
    synth = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    orig = ts_mod.load_table
    ts_mod.load_table = lambda s, d, n: synth
    try:
        def run():
            return _movstats_rows(spark, "unused")

        spark.conf.set(MOVSTATS_SHARDED_CONF, "false")
        default = run()
        assert len(default) == 402
        spark.conf.set(MOVSTATS_SHARDED_CONF, "true")
        assert run() == default
        spark.conf.set(MOVSTATS_BUCKET_CONF, "3600")
        assert run() == default
        spark.conf.set(MOVSTATS_BUCKET_CONF, "1800")
        with pytest.raises(ValueError, match="spark.merl.movstats.bucket"):
            QUERIES["ts-moving-stats"](spark, "unused")
    finally:
        ts_mod.load_table = orig
        spark.conf.set(MOVSTATS_SHARDED_CONF, "false")
        spark.conf.set(MOVSTATS_BUCKET_CONF, str(4 * 3600))
    # null-ts rows: frame group = all null rows of the series
    null_rows = [r for r in default if r[2] is None]
    assert {(r[0], r[3]) for r in null_rows} == {("a", 2), ("b", 1)}


# ---------------------------------------------------------------------------
# fn-canary-* (the per-class environment determinism probes)
# ---------------------------------------------------------------------------

# class query id → the case prefixes it must cover (mirrors
# scalar_queries._CANARY_CLASSES; re-stated here so a registration
# change that silently drops a class fails THIS file, not the driver)
_CANARY_CLASS_QUERIES = {
    "fn-canary-ln-int": "ln_int_",
    "fn-canary-ln-ratio": "ln_ratio_",
    "fn-canary-sqrt": "sqrt_",
    "fn-canary-pow": "pow_",
    "fn-canary-exp": "exp_",
    "fn-canary-dcast": "dcast_",
}


def test_canary_cases_partition_exactly_into_class_queries():
    """Every _CANARY_CASES row must appear in EXACTLY ONE registered
    class query — a future case whose prefix is missing from
    _CANARY_CLASSES would otherwise silently vanish from every canary
    (the prefix filter matches nothing and no test would notice)."""
    from merl_etl_spark.functions.scalar_queries import (
        _CANARY_CASES,
        _CANARY_CLASSES,
        _CANARY_REPR_CASES,
    )

    for cid, _ in _CANARY_CASES:
        owners = [
            qid
            for qid, prefixes in _CANARY_CLASSES
            if cid.startswith(prefixes)
        ]
        assert len(owners) == 1, (cid, owners)
    for cid, _ in _CANARY_REPR_CASES:
        owners = [p for p in ("drepr_", "fprepr_") if cid.startswith(p)]
        assert len(owners) == 1, (cid, owners)


def test_canary_split_one_query_per_class(spark, sf_dir):
    """Every transcendental class is its own registered query (VERDICT r9
    #1: per-query driver hash booleans must NAME the divergent class),
    each query holds only its own class's rows, ids are unique, and the
    values are non-null — the canaries must never be the thing that
    flakes."""
    for qid, prefix in _CANARY_CLASS_QUERIES.items():
        out = QUERIES[qid](spark, sf_dir).collect()
        ids = [r["case_id"] for r in out]
        assert ids, qid
        assert len(ids) == len(set(ids)), qid
        assert all(i.startswith(prefix) for i in ids), (qid, ids)
        assert all(r["val"] is not None for r in out), qid


def test_canary_known_values(spark, sf_dir):
    """Pin a few values analytically so a fixture-independent regression
    (e.g. someone re-typing an expression) is caught locally, not by the
    driver.  Values are emitted as exact 6-dp decimal TEXT (the r10
    repr-layer finding: DECIMAL output columns are the one shape the
    driver env cannot hash, so the math canaries must not ride on it)."""
    import math

    vals = {
        r["case_id"]: r["val"]
        for qid in _CANARY_CLASS_QUERIES
        for r in QUERIES[qid](spark, sf_dir).collect()
    }
    assert vals["ln_int_2"] == f"{round(math.log(2), 6):.6f}"
    assert vals["sqrt_2"] == f"{round(math.sqrt(2), 6):.6f}"
    assert vals["exp_1"] == f"{round(math.e, 6):.6f}"
    # the decimal→double cast probes are engineered so a correctly-rounded
    # cast yields EXACTLY zero — any nonzero value is the signed ulp-scaled
    # divergence of this environment's cast path
    for cid, v in vals.items():
        if cid.startswith("dcast_"):
            assert v == "0.000000", (cid, v)


def test_canary_repr_classes(spark, sf_dir):
    """The two representation-layer canaries: decimal rows carry the
    exact literal values (incl. the NULL row), double rows carry the
    exact IEEE values — pinned analytically so only an ENGINE/hash-layer
    change can ever flip the driver row."""
    from decimal import Decimal

    # fn-canary-decimal-repr was retired from the driver registry in r13
    # (its r10 red row proved the driver env cannot hash DECIMAL output —
    # job done); the probe function survives unregistered and this pin
    # drives it directly so the repr contract stays tested locally.
    from merl_etl_spark.functions.scalar_queries import fn_canary_decimal_repr

    assert "fn-canary-decimal-repr" not in QUERIES
    dec = {
        r["case_id"]: r["val"]
        for r in fn_canary_decimal_repr(spark, sf_dir).collect()
    }
    assert dec["drepr_neg"] == Decimal("-0.847298")
    assert dec["drepr_sub_neg"] == Decimal("-0.847298")
    assert dec["drepr_mul_neg"] == Decimal("-0.004181")
    assert dec["drepr_null"] is None
    assert dec["drepr_wide"] == Decimal("123456789012.654321")

    dbl = {
        r["case_id"]: r["val"]
        for r in QUERIES["fn-canary-double-repr"](spark, sf_dir).collect()
    }
    assert dbl["fprepr_div"] == 1.0 / 3.0
    assert dbl["fprepr_tenth"] == 0.1
    assert dbl["fprepr_null"] is None
    assert dbl["fprepr_big"] == 9007199254740992.0


# ---------------------------------------------------------------------------
# round-9 first-wave operators (weighted median … LTTB)
# ---------------------------------------------------------------------------

def test_weighted_median_is_observed_value_at_half_mass(spark, sf_dir):
    """The weighted median must be an actually observed price, and the
    cumulative weight strictly below it must be under half the total
    while including it reaches half."""
    out = {
        r["l_returnflag"]: r
        for r in QUERIES["agg-weighted-median"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("p"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    for flag, r in out.items():
        med, total = r["w_median"], r["w_total"]
        grp = li.filter(F.col("l_returnflag") == flag)
        below = grp.filter(F.col("p") < med).agg(F.sum("w")).collect()[0][0] or 0
        at_or_below = grp.filter(F.col("p") <= med).agg(F.sum("w")).collect()[0][0]
        n_at = grp.filter(F.col("p") == med).count()
        assert n_at > 0, f"{flag}: median not an observed value"
        assert 2 * below < total <= 2 * at_or_below, flag


def test_grouping_sets_levels_and_totals(spark, sf_dir):
    """gid ∈ {0,1,3}; per-level row counts match the distinct key counts;
    the grand-total row equals the sum of the detail level."""
    rows = QUERIES["agg-grouping-sets"](spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[3]) == 1  # grand total
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert len(by_gid[0]) == li.select("l_returnflag", "l_linestatus").distinct().count()
    assert len(by_gid[1]) == li.select("l_returnflag").distinct().count()
    assert by_gid[3][0]["n_rows"] == li.count()
    assert abs(sum(r["sum_qty"] for r in by_gid[0]) - by_gid[3][0]["sum_qty"]) < 1e-6
    # grouped-out columns are NULL at their level
    assert all(r["l_linestatus"] is None for r in by_gid[1])
    assert by_gid[3][0]["l_returnflag"] is None


def test_softdedup_weights_unit_mass_per_cluster(spark, sf_dir):
    """Every duplicate cluster contributes exactly 1.0 expected copies
    (sum of keep_prob == 1 per cluster — exact: c * (1/c) in IEEE is not
    always exactly 1, so allow 1-ulp-scale tolerance), and exactly one
    canonical doc per cluster."""
    out = QUERIES["curate-softdedup-weights"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.md5("text").alias("h")
    )
    per_cluster = (
        out.join(docs, "doc_id")
        .groupBy("h")
        .agg(
            F.sum("keep_prob").alias("mass"),
            F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
            F.count(F.lit(1)).alias("n"),
            F.max("dup_count").alias("dc"),
        )
        .collect()
    )
    assert len(per_cluster) > 0
    for r in per_cluster:
        assert r["n"] == r["dc"]
        assert r["n_canon"] == 1
        assert abs(r["mass"] - 1.0) < 1e-9


def test_seasonal_profile_invariants(spark, sf_dir):
    """One peak hour per series, hod ∈ [0,23], and the n-weighted
    seasonal deviations cancel within float tolerance."""
    rows = QUERIES["ts-seasonal-profile"](spark, sf_dir).collect()
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r)
    for st, rs in series.items():
        assert sum(1 for r in rs if r["is_peak_hour"]) == 1, st
        assert all(0 <= r["hod"] <= 23 for r in rs)
        total_n = sum(r["n"] for r in rs)
        wdev = sum(r["n"] * r["seasonal_dev"] for r in rs)
        assert abs(wdev) / total_n < 1e-6, st


def test_bloom_incremental_no_false_negatives_and_bounded_fpr(spark, sf_dir):
    """A true duplicate ALWAYS hits the filter (shared digest ⇒ shared
    positions — the property that makes bloom dedup safe), and the
    false-positive rate stays far under the geometry bound."""
    rows = QUERIES["dedup-bloom-incremental"](spark, sf_dir).collect()
    assert len(rows) > 0
    fn = [r for r in rows if r["true_dup"] and not r["bloom_hit"]]
    assert fn == []
    new = [r for r in rows if not r["true_dup"]]
    fp = [r for r in new if r["bloom_hit"]]
    if new:
        assert len(fp) / len(new) < 0.05
    for r in rows:
        expect = (
            "dup" if r["bloom_hit"] and r["true_dup"]
            else "false_positive" if r["bloom_hit"]
            else "new"
        )
        assert r["verdict"] == expect


def test_partition_prune_plan_and_values(spark, sf_dir):
    """The pruned scan must carry the date predicate as a PARTITION
    filter (planning-time pruning — no PushedFilters/data read for the
    excluded weeks), and the aggregate must equal computing directly on
    the source table."""
    out = QUERIES["layout-partition-prune"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan[:2000]
    got = {r["event_date"]: (r["n_events"], r["sum_value"]) for r in out.collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = (
        ev.withColumn("d", F.to_date("ts"))
        .filter((F.col("d") >= "2024-01-08") & (F.col("d") <= "2024-01-14"))
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    )
    assert got == {r["d"]: (r["n"], r["s"]) for r in direct}
    assert len(got) == 7


def test_rfm_quartiles_balanced_and_segment_consistent(spark, sf_dir):
    """ntile(4) bucket sizes differ by at most 1 per dimension; the
    segment string always equals the concatenated scores; better
    recency implies a lower-or-equal r_score for any two customers."""
    rows = QUERIES["analytics-rfm-segmentation"](spark, sf_dir).collect()
    assert len(rows) > 0
    for dim in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            sizes[r[dim]] = sizes.get(r[dim], 0) + 1
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (dim, sizes)
    for r in rows:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
    best = min(rows, key=lambda r: (-r["frequency"], r["custkey"]))
    assert best["f_score"] == 1


def test_rfm_scalable_ntile_equals_window_ntile(spark, sf_dir):
    """The r10 scalable exact-ntile (range-bucket → parallel rank →
    broadcast offsets → positional formula; VERDICT r9 #6) must be
    BIT-IDENTICAL to the global ntile(4) window it replaced, per metric,
    for every customer."""
    from pyspark.sql.window import Window

    from merl_etl_spark.sources.tables import load_table

    out = {
        r["custkey"]: (r["r_score"], r["f_score"], r["m_score"])
        for r in QUERIES["analytics-rfm-segmentation"](spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("o_totalprice").alias("monetary_dec"),
    )
    ref = rfm.select(
        "custkey",
        F.ntile(4)
        .over(Window.orderBy(F.desc("last_order"), F.asc("custkey")))
        .cast("bigint")
        .alias("r"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("custkey")))
        .cast("bigint")
        .alias("f"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary_dec"), F.asc("custkey")))
        .cast("bigint")
        .alias("m"),
    )
    expect = {r["custkey"]: (r["r"], r["f"], r["m"]) for r in ref.collect()}
    assert out == expect


def test_autocorr_bounds_and_lag_structure(spark, sf_dir):
    """Every autocorrelation sits in [-1, 1]; 3 lags per series; pair
    counts shrink by exactly 1 per extra lag step (series length n
    yields n-k pairs)."""
    rows = QUERIES["ts-autocorr"](spark, sf_dir).collect()
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], {})[r["lag"]] = r
    for st, lags in series.items():
        assert set(lags) == {1, 2, 3}, st
        for k, r in lags.items():
            if r["autocorr"] is not None:
                assert -1.0 - 1e-9 <= r["autocorr"] <= 1.0 + 1e-9, (st, k)
        n1 = lags[1]["n_pairs"]
        assert lags[2]["n_pairs"] == n1 - 1
        assert lags[3]["n_pairs"] == n1 - 2


def test_lttb_one_point_per_bucket_and_edges(spark, sf_dir):
    """Exactly one selected point per (series, bucket); bucket count is
    ceil(series_len / 200); only the first and last bucket of each
    series can be edge buckets (and are)."""
    rows = QUERIES["ts-downsample-lttb"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    lens = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    per_series = {}
    for r in rows:
        per_series.setdefault(r["event_type"], []).append(r)
    for st, rs in per_series.items():
        n_buckets = -(-lens[st] // 200)
        assert len(rs) == n_buckets, st
        assert len({r["bkt"] for r in rs}) == n_buckets
        edges = sorted(r["bkt"] for r in rs if r["is_edge_bucket"])
        expect = [0] if n_buckets == 1 else [0, n_buckets - 1]
        assert edges == expect, (st, edges)


# ---------------------------------------------------------------------------
# round-9 second wave: components / paths / attribution / volume / sampling
# ---------------------------------------------------------------------------

def test_components_are_edge_consistent_and_min_labeled(spark, sf_dir):
    """Every thresholded edge's endpoints must land in one component,
    the component label must be the minimum node id inside it, and the
    fixture graph must converge within the fixed iteration budget."""
    from merl_etl_spark.operators.graph import CC_MIN_W
    from merl_etl_spark.sources.tables import load_table

    out = QUERIES["graph-components"](spark, sf_dir).collect()
    assert out and all(r["converged"] for r in out)

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= CC_MIN_W)
        .select("c", "s")
        .collect()
    )
    # union-find ground truth in plain Python
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in e0:
        ra, rb = find(r["c"]), find(r["s"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth: dict[int, list[int]] = {}
    for node in parent:
        truth.setdefault(find(node), []).append(node)
    expected = sorted((min(m), len(m)) for m in truth.values())
    got = sorted((r["component"], r["n_nodes"]) for r in out)
    assert got == expected


def test_components_multi_component_synthetic(spark):
    """The fixture trade graph is one giant component at every SF, so
    pin the multi-component case on a synthetic graph: three components
    of sizes 3 (c1,c2 via s1), 2 (c3-s2), and 5 (c4-s3-c5-s4-c6 chain —
    exercises propagation across >1 hop)."""
    import merl_etl_spark.operators.graph as graph_mod

    pairs = [  # (custkey, suppkey), each repeated CC_MIN_W times below
        (1, 1), (2, 1),
        (3, 2),
        (4, 3), (5, 3), (5, 4), (6, 4),
    ]
    orders_rows = [(i, c) for i, (c, _) in enumerate(pairs)]
    li_rows = [(i, s) for i, (_, s) in enumerate(pairs) for _ in range(2)]
    orders = spark.createDataFrame(orders_rows, "o_orderkey long, o_custkey long")
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_suppkey long")
    orig = graph_mod.load_table
    graph_mod.load_table = lambda s, d, n: {"orders": orders, "lineitem": li}[n]
    try:
        out = sorted(
            (r["component"], r["n_nodes"], r["converged"])
            for r in QUERIES["graph-components"](spark, "unused").collect()
        )
    finally:
        graph_mod.load_table = orig
    # node ids: custkey*2, suppkey*2+1 → components min-labeled at
    # 2 (c1,c2,s1), 5 (s2,c3 — min is s2=2*2+1=5? no: c3=6 > 5), 7 (chain)
    assert out == [
        (2, 3, True),   # {c1=2, c2=4, s1=3}
        (5, 2, True),   # {c3=6, s2=5}
        (7, 5, True),   # {c4=8, c5=10, c6=12, s3=7, s4=9}
    ]


def test_path_mining_ranked_and_normalized(spark, sf_dir):
    from merl_etl_spark.operators.analytics import PATH_TOP

    out = QUERIES["analytics-path-mining"](spark, sf_dir).collect()
    assert 0 < len(out) <= PATH_TOP
    assert [r["rnk"] for r in out] == list(range(1, len(out) + 1))
    ns = [r["n"] for r in out]
    assert ns == sorted(ns, reverse=True)
    assert all(len(r["path"].split(">")) == 3 for r in out)
    assert sum(r["share"] for r in out) <= 1.0 + 1e-9


def test_attribution_matches_python_replay(spark, sf_dir):
    """Exhaustively recompute last-touch attribution in plain Python
    over the fixture's event stream and compare row-for-row."""
    from merl_etl_spark.operators.analytics import (
        ATTR_CONVERSION,
        ATTR_TOUCH_TYPES,
        ATTR_WINDOW_S,
    )
    from merl_etl_spark.sources.tables import load_table

    events = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in load_table(spark, sf_dir, "events")
            .filter(F.col("ts").isNotNull())
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        ),
    )
    expected = {}
    last_touch: dict[int, tuple] = {}
    for user, ts, eid, etype in events:
        if etype == ATTR_CONVERSION:
            t = last_touch.get(user)
            if t is not None and (ts - t[0]).total_seconds() <= ATTR_WINDOW_S:
                gap = int((ts - t[0]).total_seconds())
                expected[eid] = (t[1], t[2], gap)
            else:
                expected[eid] = (None, None, None)
        if etype in ATTR_TOUCH_TYPES:
            last_touch[user] = (ts, eid, etype)
    got = {
        r["purchase_id"]: (r["attributed_id"], r["attributed_type"], r["gap_s"])
        for r in QUERIES["analytics-attribution-lasttouch"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    assert got == expected
    assert any(v[0] is not None for v in got.values())


def test_volume_anomaly_matches_python_median_mad(spark, sf_dir):
    import statistics

    from merl_etl_spark.operators.quality import VOL_K
    from merl_etl_spark.sources.tables import load_table

    counts = {
        str(r["day"]): r["n"]
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    med = statistics.median(counts.values())
    mad = statistics.median(abs(v - med) for v in counts.values())
    out = QUERIES["dq-volume-anomaly"](spark, sf_dir).collect()
    assert {r["day"] for r in out} == set(counts)
    for r in out:
        assert r["med_x2"] == int(2 * med)
        assert r["mad_x4"] == int(4 * mad)
        assert r["is_anomaly"] == (abs(counts[r["day"]] - med) > VOL_K * mad)


def test_quality_sampling_exact_python_replay(spark, sf_dir):
    """The keep coin must be the documented md5 bucket, and tiers the
    documented integer gates — replay both exactly in Python."""
    import hashlib
    import re

    from merl_etl_spark.operators.curation_ext import QSAMP_RATES, QSAMP_SALT
    from merl_etl_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    out = QUERIES["curate-quality-sampling"](spark, sf_dir).collect()
    assert {r["doc_id"] for r in out} == set(docs)
    for r in out:
        text = docs[r["doc_id"]]
        toks = text.split(" ")
        tier = (
            int(len(toks) >= 20)
            + int(2 * len(set(toks)) > len(toks))
            + int(10 * len(re.findall(r"[0-9]", text)) < len(text))
            + int(5 * len(re.findall(r"[^a-zA-Z0-9 ]", text)) < len(text))
        )
        assert r["tier"] == tier
        assert r["sample_pct"] == QSAMP_RATES[tier]
        coin = (
            int(hashlib.md5(f"{r['doc_id']}{QSAMP_SALT}".encode()).hexdigest()[:8], 16)
            % 100
        )
        assert r["kept"] == (coin < QSAMP_RATES[tier])


# ---------------------------------------------------------------------------
# round-9 third wave: MERGE apply + bounded-vocab PMI
# ---------------------------------------------------------------------------

def test_merge_apply_all_four_statuses_synthetic(spark):
    """The fixture's users are all active in both stream halves, so the
    kept/inserted branches never fire there — pin all four dispositions
    on a synthetic stream.  Op synthesis is md5-keyed on event_id, so
    pick event ids whose coin is known by replaying the hash."""
    import datetime as dt
    import hashlib

    import merl_etl_spark.operators.incremental as inc_mod
    from merl_etl_spark.operators.incremental import MERGE_DEL_MOD

    def coin(eid: int) -> bool:  # True = DELETE tombstone
        h = int(hashlib.md5(f"{eid}|op".encode()).hexdigest()[:8], 16)
        return h % MERGE_DEL_MOD == 0

    base_t = dt.datetime(2024, 1, 1)
    lo = [  # base half: users 1 (kept), 2 (updated), 3 (deleted)
        (1, 1, base_t, 10.0),
        (2, 2, base_t, 20.0),
        (3, 3, base_t, 30.0),
    ]
    # changelog half: user 2 upsert, user 3 delete, user 4 insert —
    # search ids with the right coin so the op synthesis yields that.
    # All candidates live in [10000, 12000): cap = max(event_id) DIV 2
    # < 6000, so base ids (< 10) stay below and changelog ids above the
    # split no matter which three are picked
    ids = iter(range(10_000, 12_000))
    eid_u2 = next(i for i in ids if not coin(i))
    eid_d3 = next(i for i in ids if coin(i))
    eid_u4 = next(i for i in ids if not coin(i))
    hi = [
        (eid_u2, 2, base_t + dt.timedelta(hours=1), 21.0),
        (eid_d3, 3, base_t + dt.timedelta(hours=1), 0.0),
        (eid_u4, 4, base_t + dt.timedelta(hours=1), 40.0),
    ]
    # a null-ts row holding the MAX event_id: excluded from both halves
    # by the ts filter, but it must still drive the cap (= 12001 DIV 2 =
    # 6000, keeping base ids below and changelog ids above) exactly as
    # the oracle computes it from the unfiltered stream (review r9w3:
    # a post-filter cap diverged row-for-row on this shape)
    null_row = [(12_001, 5, None, 99.0)]
    synth = spark.createDataFrame(
        lo + hi + null_row,
        "event_id long, user_id long, ts timestamp, value double",
    )
    orig = inc_mod.load_table
    inc_mod.load_table = lambda s, d, n: synth
    try:
        rows = {
            r["user_id"]: (r["status"], r["final_value"], r["n_ops"])
            for r in QUERIES["cdc-merge-apply"](spark, "unused").collect()
        }
    finally:
        inc_mod.load_table = orig
    from decimal import Decimal

    assert rows[1] == ("kept", Decimal("10.000000"), 0)
    assert rows[2] == ("updated", Decimal("21.000000"), 1)
    assert rows[3] == ("deleted", None, 1)
    assert rows[4] == ("inserted", Decimal("40.000000"), 1)
    assert 5 not in rows  # the null-ts row is cap-only, never data


def test_pmi_matches_python_counts(spark, sf_dir):
    """Recompute N, the marginals, and the co-occurrence counts in
    Python for the emitted pairs, and check PMI against math.log with
    the 6-dp-rounded-per-term contract."""
    import math
    from decimal import Decimal

    from merl_etl_spark.operators.text_analysis import PMI_TOP
    from merl_etl_spark.sources.tables import load_table

    docs = [
        (r["doc_id"], set(w for w in r["text"].split(" ") if w))
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    ]
    n = len(docs)
    out = QUERIES["text-cooccurrence-pmi"](spark, sf_dir).collect()
    assert 0 < len(out) <= PMI_TOP
    for r in out[:10]:  # spot-check the head
        cx = sum(1 for _, ws in docs if r["x"] in ws)
        cy = sum(1 for _, ws in docs if r["y"] in ws)
        cxy = sum(1 for _, ws in docs if r["x"] in ws and r["y"] in ws)
        assert r["c_xy"] == cxy and r["x"] < r["y"]
        expect = (
            Decimal(str(round(math.log(n * cxy), 6)))
            - Decimal(str(round(math.log(cx), 6)))
            - Decimal(str(round(math.log(cy), 6)))
        )
        # pmi is DOUBLE at the output boundary (r10: DECIMAL columns are
        # driver-unhashable) — expect the correctly-rounded double of the
        # exact decimal
        assert r["pmi"] == float(expect), (r, expect)


# ---------------------------------------------------------------------------
# ts-autocorr sharded mode (the lead-side _chunked_rows generalization)
# ---------------------------------------------------------------------------

def _autocorr_rows(spark, sf_dir):
    return sorted(
        (r["event_type"], r["lag"], r["n_pairs"], r["autocorr"])
        for r in QUERIES["ts-autocorr"](spark, sf_dir).collect()
    )


def test_autocorr_sharded_mode_equals_default(spark, sf_dir):
    """Lookahead-side chunked-overlap (first max-lag rows of each chunk
    carried into the previous one) must reproduce the global per-series
    lead() pair set exactly — the sums are exact decimals, so equality
    is bit-level."""
    from merl_etl_spark.operators.timeseries import AUTOCORR_SHARDED_CONF

    spark.conf.set(AUTOCORR_SHARDED_CONF, "true")
    try:
        sharded = _autocorr_rows(spark, sf_dir)
    finally:
        spark.conf.set(AUTOCORR_SHARDED_CONF, "false")
    default = _autocorr_rows(spark, sf_dir)
    assert len(sharded) == len(default) > 0
    assert sharded == default


def test_autocorr_sharded_null_ts_and_chunk_boundaries(spark):
    """Null-ts rows (NULLS FIRST in both modes' order) and rows exactly
    on chunk boundaries must not shift the lead alignment; a synthetic
    series longer than several chunks exercises multiple carries."""
    import merl_etl_spark.operators.timeseries as ts_mod
    from merl_etl_spark.operators.timeseries import (
        AUTOCORR_BUCKET_CONF,
        AUTOCORR_SHARDED_CONF,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        # series "a" gets 2099 rows → chunk indices 0..4 of 512, so four
        # carry boundaries are exercised (review r9w4: the earlier 1350
        # rows covered only two)
        (i, "a" if i % 4 else "b", base + dt.timedelta(seconds=i * 613),
         float((i * 7) % 23))
        for i in range(1, 2800)
    ]
    rows += [(9001, "a", None, 3.0), (9002, "b", None, 9.0)]
    synth = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    orig = ts_mod.load_table
    ts_mod.load_table = lambda s, d, n: synth
    try:
        default = _autocorr_rows(spark, "unused")
        spark.conf.set(AUTOCORR_SHARDED_CONF, "true")
        assert _autocorr_rows(spark, "unused") == default
        spark.conf.set(AUTOCORR_BUCKET_CONF, "hour")
        assert _autocorr_rows(spark, "unused") == default
        # invalid unit fails loudly (inside _chunked_rows, so every
        # sharded mode inherits the check) — a silent fallback would
        # recreate the single-partition cliff via an all-NULL bucket
        spark.conf.set(AUTOCORR_BUCKET_CONF, "fortnight")
        with pytest.raises(ValueError, match="spark.merl.autocorr.bucket"):
            QUERIES["ts-autocorr"](spark, "unused")
    finally:
        ts_mod.load_table = orig
        spark.conf.set(AUTOCORR_SHARDED_CONF, "false")
        spark.conf.set(AUTOCORR_BUCKET_CONF, "day")


# ---------------------------------------------------------------------------
# layout-bucketed-join
# ---------------------------------------------------------------------------

def test_bucketed_join_plan_is_exchange_free(spark, sf_dir):
    """The whole query — SortMergeJoin AND the per-customer rollup —
    must consume the bucket distribution: ZERO shuffle exchanges
    anywhere in the physical plan.  This is the property the operator
    exists to demonstrate; a broadcast fallback or a re-shuffled
    aggregate would silently pass value checks while losing it."""
    df = QUERIES["layout-bucketed-join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_bucketed_join_values_match_plain_join(spark, sf_dir):
    """The layout must never change the answer: compare against the
    straightforward unbucketed join+rollup."""
    from merl_etl_spark.sources.tables import load_table

    got = sorted(
        map(tuple, QUERIES["layout-bucketed-join"](spark, sf_dir).collect())
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plain = sorted(
        map(
            tuple,
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy(F.col("c_custkey").alias("custkey"))
            .agg(
                F.max("c_mktsegment").alias("mktsegment"),
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_spend"),
            )
            .collect(),
        )
    )
    assert got == plain and len(got) > 0
