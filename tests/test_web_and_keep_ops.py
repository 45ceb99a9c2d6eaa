"""Semantic tests for the URL-curation tier, the tolerance as-of join,
the streak window, and SemDeDup medoid keep — hand-built inputs where
the expected answer is known by construction (the oracle-parity suite
separately pins cross-engine equality on the fixtures)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all

load_all()


# ---------------------------------------------------------------------------
# curate-url-dedup semantics
# ---------------------------------------------------------------------------

def test_url_dedup_dispositions_partition_the_corpus(spark, sf_dir):
    """Every document gets exactly one disposition; per normalized URL at
    most one row survives; per host at most HOST_CAP survive."""
    from merl_etl_spark.operators.web import HOST_CAP

    out = QUERIES["curate-url-dedup"](spark, sf_dir).cache()
    total = out.count()
    by_disp = {r["disposition"]: r["n"] for r in
               out.groupBy("disposition").agg(F.count("*").alias("n")).collect()}
    assert sum(by_disp.values()) == total
    kept = out.filter(F.col("disposition") == "kept")
    # kept ∪ host_cap are the URL-dedup survivors: unique per url_norm
    surv = out.filter(F.col("disposition") != "dup_url")
    assert surv.groupBy("url_norm").count().filter("count > 1").count() == 0
    per_host = kept.groupBy("host").count().agg(F.max("count")).first()[0]
    assert per_host <= HOST_CAP
    out.unpersist()


def test_url_dedup_keeps_best_quality_per_url(spark, sf_dir):
    """Within a duplicated normalized URL, the kept/capped row has the
    max n_chars (doc_id tie-break) among its dup group."""
    from merl_etl_spark.sources.tables import load_table

    out = QUERIES["curate-url-dedup"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = out.join(docs, "doc_id")
    best = j.groupBy("url_norm").agg(
        F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("negid"))).alias("b")
    ).select("url_norm", F.col("b.n_chars").alias("best_chars"))
    surv = j.filter(F.col("disposition") != "dup_url").join(best, "url_norm")
    assert surv.filter(F.col("n_chars") != F.col("best_chars")).count() == 0


# ---------------------------------------------------------------------------
# join-asof-tolerance semantics
# ---------------------------------------------------------------------------

def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    """Tolerance output equals the plain backward as-of with matches older
    than the tolerance blanked to NULL — never a different match."""
    plain = QUERIES["join-asof"](spark, sf_dir).select(
        "purchase_id", "purchase_ts",
        F.col("click_id").alias("p_click"), F.col("click_ts").alias("p_cts"),
    )
    tol = QUERIES["join-asof-tolerance"](spark, sf_dir).select(
        "purchase_id", F.col("click_id").alias("t_click"),
        F.col("click_ts").alias("t_cts"),
    )
    from merl_etl_spark.operators.asof import TOLERANCE_SECONDS

    j = plain.join(tol, "purchase_id").withColumn(
        "delta_s",
        F.unix_micros(F.col("purchase_ts").cast("timestamp")) / 1e6
        - F.unix_micros(F.col("p_cts").cast("timestamp")) / 1e6,
    )
    in_tol = j.filter(F.col("delta_s") <= TOLERANCE_SECONDS)
    out_tol = j.filter(
        F.col("p_cts").isNull() | (F.col("delta_s") > TOLERANCE_SECONDS)
    )
    assert in_tol.filter(
        (F.col("t_click") != F.col("p_click")) | F.col("t_click").isNull()
    ).count() == 0
    assert out_tol.filter(F.col("t_click").isNotNull()).count() == 0
    # the fixture must actually exercise both branches
    assert in_tol.count() > 0 and out_tol.count() > 0


# ---------------------------------------------------------------------------
# win-streak semantics
# ---------------------------------------------------------------------------

def test_streak_on_hand_built_days(spark, sf_dir, monkeypatch):
    """user 1: days 1,2,3, 5,6 → longest 3; user 2: one day → longest 1."""
    rows = []
    d0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    for i, day in enumerate([0, 1, 2, 4, 5]):
        rows.append((i, d0 + dt.timedelta(days=day), 1, "view", 1.0, "{}"))
    rows.append((99, d0, 2, "click", 1.0, "{}"))
    # a non-qualifying event type must not extend a streak
    rows.append((100, d0 + dt.timedelta(days=3), 1, "error", 1.0, "{}"))
    hand = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    monkeypatch.setattr(
        "merl_etl_spark.operators.windows_analytic.load_table",
        lambda _s, _d, _t: hand,
    )
    out = {r["user_id"]: r.asDict() for r in QUERIES["win-streak"](spark, sf_dir).collect()}
    assert out[1]["longest_streak_days"] == 3
    assert out[1]["n_streaks"] == 2
    assert out[1]["n_active_days"] == 5
    assert out[1]["streak_start"] == "2024-03-01"
    assert out[2]["longest_streak_days"] == 1
    assert out[2]["n_streaks"] == 1


# ---------------------------------------------------------------------------
# curate-semdedup-keep semantics
# ---------------------------------------------------------------------------

def test_semdedup_keep_one_representative_per_cluster(spark, sf_dir):
    out = QUERIES["curate-semdedup-keep"](spark, sf_dir).cache()
    # exactly one representative per cluster, every corpus vector present
    per_cluster = out.groupBy("cluster_id").agg(
        F.sum(F.col("is_representative").cast("int")).alias("reps")
    )
    assert per_cluster.filter(F.col("reps") != 1).count() == 0
    from merl_etl_spark.sources.tables import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert out.count() == n_vecs
    # representative has the max (score, -vec_id) in its cluster
    best = out.groupBy("cluster_id").agg(
        F.max(F.struct("score", (-F.col("vec_id")).alias("ni"))).alias("b")
    )
    reps = out.filter("is_representative").join(best, "cluster_id")
    assert reps.filter(F.col("score") != F.col("b.score")).count() == 0
    # singletons are their own representative with zero similarity mass
    singles = out.groupBy("cluster_id").count().filter("count = 1")
    s = out.join(singles.select("cluster_id"), "cluster_id")
    assert s.filter(
        (~F.col("is_representative")) | (F.col("degree") != 0) | (F.col("score") != 0.0)
    ).count() == 0
    out.unpersist()


def test_streak_property_vs_bruteforce(spark, sf_dir, monkeypatch):
    """Randomized day sets (fixed seed): the operator's per-user answer
    must equal a direct python computation of longest run / streak count."""
    import random

    rng = random.Random(20240814)
    rows, expected = [], {}
    eid = 0
    for user in range(1, 31):
        days = sorted(rng.sample(range(0, 60), rng.randint(1, 20)))
        runs, start = [], days[0]
        for a, b in zip(days, days[1:]):
            if b != a + 1:
                runs.append((start, a))
                start = b
        runs.append((start, days[-1]))
        lens = [(e - s + 1, s, e) for s, e in runs]
        best = max(lens, key=lambda t: (t[0], -t[1]))
        expected[user] = {
            "longest_streak_days": best[0],
            "n_streaks": len(runs),
            "n_active_days": len(days),
            "streak_start": (dt.date(2024, 1, 1) + dt.timedelta(days=best[1])).isoformat(),
        }
        for d in days:
            # two events on some days: distinct-day collapse must hold
            for _ in range(rng.randint(1, 2)):
                rows.append(
                    (eid, dt.datetime(2024, 1, 1, rng.randint(0, 23)) + dt.timedelta(days=d),
                     user, rng.choice(["view", "click", "purchase"]), 1.0, "{}")
                )
                eid += 1
    hand = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    )
    monkeypatch.setattr(
        "merl_etl_spark.operators.windows_analytic.load_table",
        lambda _s, _d, _t: hand,
    )
    got = {r["user_id"]: r.asDict() for r in QUERIES["win-streak"](spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for u, exp in expected.items():
        for k, v in exp.items():
            assert got[u][k] == v, (u, k, got[u], exp)


# ---------------------------------------------------------------------------
# agg-mv-merge: merge ≡ full rescan
# ---------------------------------------------------------------------------

def test_mv_merge_equals_full_rescan(spark, sf_dir):
    from merl_etl_spark.operators.joins import TS_FMT_SPARK
    from merl_etl_spark.sources.tables import load_table

    got = QUERIES["agg-mv-merge"](spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    want = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
            F.max("ts").alias("mts"),
        )
        .select(
            "user_id", "n_events",
            F.round("sv", 2).cast("double").alias("total_value"),
            F.date_format("mts", TS_FMT_SPARK).alias("last_ts"),
        )
    )
    canon = lambda df: sorted(  # noqa: E731
        map(tuple, ((str(v) for v in r) for r in df.select(sorted(df.columns)).collect()))
    )
    assert canon(got) == canon(want)
