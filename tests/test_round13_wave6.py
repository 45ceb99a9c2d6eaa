"""Semantic tests for the round-13 wave-6 operator: sweep-line peak
concurrency with the two-level prefix-max decomposition."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.operators.intervals import SESSION_GAP_US
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _replay(spark, sf_dir):
    """Naive global sweep in Python: sessionize, emit deltas, one sorted
    pass — the O(n log n) single-machine ground truth the distributed
    decomposition must equal."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    import datetime as _dt

    epoch = _dt.datetime(1970, 1, 1)
    one_us = _dt.timedelta(microseconds=1)
    by_user = defaultdict(list)
    for r in ev:
        # exact integer microseconds (timedelta // timedelta is exact;
        # .timestamp()*1e6 is a float round-trip that can be off by 1us)
        us = (r.ts - epoch) // one_us
        by_user[r.user_id].append((us, r.event_id))
    deltas: dict[int, int] = defaultdict(int)
    for rows in by_user.values():
        rows.sort()
        s = e = rows[0][0]
        for us, _ in rows[1:]:
            if us - e > SESSION_GAP_US:
                deltas[s] += 1
                deltas[e + 1] -= 1
                s = us
            e = us
        deltas[s] += 1
        deltas[e + 1] -= 1
    conc = 0
    day_peak: dict[int, int] = {}
    day_points: dict[int, int] = defaultdict(int)
    for tsu in sorted(deltas):
        conc += deltas[tsu]
        day = tsu // 86_400_000_000
        day_peak[day] = max(day_peak.get(day, conc), conc)
        day_points[day] += 1
    return {d: (day_peak[d], day_points[d]) for d in day_peak}


def test_peak_concurrency_matches_naive_sweep(spark, sf_dir):
    exp = _replay(spark, sf_dir)
    got = {
        r.day_ord: (r.peak_concurrency, r.n_change_points)
        for r in QUERIES["analytics-peak-concurrency"](spark, sf_dir).collect()
    }
    assert got == exp


def test_peak_concurrency_planted_scenario(spark):
    """Hand-built overlap pattern on one day: three users whose sessions
    stack 1→2→3→2→1, plus a user whose two events are far enough apart
    to split into two sessions (concurrency must NOT bridge the gap).
    Peak = 3, at the instant all three overlap."""
    import tempfile

    from merl_etl_spark.operators.intervals import analytics_peak_concurrency

    base = "2024-03-01 "
    rows = [
        # user 1: session 10:00:00 - 10:40:00 (events 20 min apart < gap)
        (1, base + "10:00:00", 1),
        (2, base + "10:20:00", 1),
        (3, base + "10:40:00", 1),
        # user 2: session 10:10:00 - 10:30:00
        (4, base + "10:10:00", 2),
        (5, base + "10:30:00", 2),
        # user 3: point session at 10:25:00, then ANOTHER at 12:00:00
        (6, base + "10:25:00", 3),
        (7, base + "12:00:00", 3),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(eid, ts, uid, "click", 1.0, "{}") for eid, ts, uid in rows],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            f"{tmp}/events.parquet"
        )
        out = {r.day_ord: r for r in analytics_peak_concurrency(spark, tmp).collect()}
    assert len(out) == 1
    r = next(iter(out.values()))
    # overlap at 10:25: user1 [10:00,10:40], user2 [10:10,10:30],
    # user3 point [10:25,10:25] -> 3 concurrent; the 12:00 session never
    # overlaps anything (peak stays 3, not 4)
    assert r.peak_concurrency == 3
    # change points: starts 10:00,10:10,10:25,12:00 and ends+1us
    # 10:25, 10:30, 10:40, 12:00 — the 10:25 end+1us and any coincident
    # instants collapse per distinct microsecond: count them exactly
    starts = {"10:00:00", "10:10:00", "10:25:00", "12:00:00"}
    ends_plus = {"10:25:00.000001", "10:30:00.000001", "10:40:00.000001",
                 "12:00:00.000001"}
    assert r.n_change_points == len(starts | ends_plus)


def test_peak_concurrency_bucket_boundary_carry(spark):
    """A session spanning several hour buckets must carry its +1 across
    bucket boundaries: one long session (events every 25 min for 3h)
    plus a short burst in the LAST hour -> peak 2 in that hour, and the
    long session's own hour shows peak 1 even though its start bucket
    saw the only delta."""
    import tempfile

    from merl_etl_spark.operators.intervals import analytics_peak_concurrency

    rows = []
    eid = 0
    # long session: 06:00 .. 09:00, events every 25 min (gap < 30 min)
    for k in range(8):
        mins = 25 * k
        rows.append((eid, f"2024-03-02 {6 + mins // 60:02d}:{mins % 60:02d}:00", 1))
        eid += 1
    # burst: user 2 point session at 08:30
    rows.append((eid, "2024-03-02 08:30:00", 2))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(e, ts, u, "view", 1.0, "{}") for e, ts, u in rows],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            f"{tmp}/events.parquet"
        )
        out = analytics_peak_concurrency(spark, tmp).collect()
    assert len(out) == 1
    assert out[0].peak_concurrency == 2  # long session + burst overlap at 08:30
