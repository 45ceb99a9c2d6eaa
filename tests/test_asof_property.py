"""Property test for the scalable as-of join: on random timestamp data it
must agree with the naive per-row definition (the greatest right_ts <=
left_ts), across bucket widths — including widths that force most matches
through the cross-bucket carry path."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from merl_etl_spark.operators.asof import asof_join_backward

BASE = dt.datetime(2024, 6, 1)


def _random_frames(spark, seed: int, n_left: int = 300, n_right: int = 150):
    rng = np.random.default_rng(seed)
    # sparse right side, clustered left side → many cross-bucket matches;
    # include exact-equal timestamps to pin the <= (not <) semantics
    right_ts = sorted(int(x) for x in rng.choice(10**6, size=n_right, replace=False))
    left_ts = [int(x) for x in rng.choice(10**6, size=n_left - 10, replace=False)]
    left_ts += right_ts[:10]  # exact ties
    left = spark.createDataFrame(
        [(i, BASE + dt.timedelta(seconds=s)) for i, s in enumerate(left_ts)],
        "l_id long, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [(1000 + i, BASE + dt.timedelta(seconds=s)) for i, s in enumerate(right_ts)],
        "r_id long, r_ts timestamp",
    )
    return left, right, left_ts, right_ts


@pytest.mark.parametrize("seed,bucket", [(1, 3600), (2, 60), (3, 500_000), (4, 7)])
def test_asof_matches_naive(spark, seed, bucket):
    left, right, left_ts, right_ts = _random_frames(spark, seed)
    got = {
        r.l_id: r.r_id
        for r in asof_join_backward(
            left, right, "l_ts", "r_ts", ["r_id"], bucket_seconds=bucket
        ).collect()
    }
    # naive definition, computed driver-side
    rs = sorted((s, 1000 + i) for i, s in enumerate(right_ts))
    import bisect

    for l_id, s in enumerate(left_ts):
        pos = bisect.bisect_right([x[0] for x in rs], s)
        expected = rs[pos - 1][1] if pos else None
        assert got[l_id] == expected, (
            f"l_id={l_id} ts={s} bucket={bucket}: got {got[l_id]}, want {expected}"
        )


@pytest.mark.parametrize("seed,bucket", [(5, 3600), (6, 41)])
def test_asof_forward_matches_naive(spark, seed, bucket):
    from merl_etl_spark.operators.asof import asof_join_forward

    left, right, left_ts, right_ts = _random_frames(spark, seed)
    got = {
        r.l_id: r.r_id
        for r in asof_join_forward(
            left, right, "l_ts", "r_ts", ["r_id"], bucket_seconds=bucket
        ).collect()
    }
    rs = sorted((s, 1000 + i) for i, s in enumerate(right_ts))
    import bisect

    keys = [x[0] for x in rs]
    for l_id, s in enumerate(left_ts):
        pos = bisect.bisect_left(keys, s)
        expected = rs[pos][1] if pos < len(rs) else None
        assert got[l_id] == expected, (
            f"l_id={l_id} ts={s} bucket={bucket}: got {got[l_id]}, want {expected}"
        )


def test_asof_left_rows_preserved(spark):
    left, right, *_ = _random_frames(spark, seed=9)
    out = asof_join_backward(left, right, "l_ts", "r_ts", ["r_id"], bucket_seconds=977)
    assert out.count() == left.count()
    # no right row earlier than everything → null matches allowed, never dropped rows
    earliest_left = left.agg(F.min("l_ts")).collect()[0][0]
    earliest_right = right.agg(F.min("r_ts")).collect()[0][0]
    if earliest_left < earliest_right:
        assert out.filter(F.col("r_id").isNull()).count() > 0


@pytest.mark.parametrize("seed,bucket", [(7, 3600), (8, 97)])
def test_asof_nearest_matches_naive(spark, seed, bucket):
    """Nearest = min |r_ts - l_ts|, ties toward the at-or-before match;
    direction column must agree with which side won."""
    from merl_etl_spark.operators.asof import asof_join_nearest

    left, right, left_ts, right_ts = _random_frames(spark, seed)
    # right_cols deliberately omits r_ts — the operator must include it
    # internally for the distance pick without emitting it
    got = {
        r.l_id: (r.r_id, r.direction)
        for r in asof_join_nearest(
            left, right, "l_ts", "r_ts", ["r_id"],
            left_key="l_id", bucket_seconds=bucket, check_unique_key=True,
        ).collect()
    }
    import bisect

    rs = sorted((s, 1000 + i) for i, s in enumerate(right_ts))
    ts_only = [x[0] for x in rs]
    for l_id, s in enumerate(left_ts):
        pos = bisect.bisect_right(ts_only, s)
        before = rs[pos - 1] if pos else None
        after = rs[pos] if pos < len(rs) else None
        if before is None and after is None:
            expected = (None, None)
        elif after is None or (before is not None and s - before[0] <= after[0] - s):
            expected = (before[1], "before")
        else:
            expected = (after[1], "after")
        assert got[l_id] == expected, (
            f"l_id={l_id} ts={s} bucket={bucket}: got {got[l_id]}, want {expected}"
        )


def test_keyed_asof_matches_per_user_naive(spark, sf_dir):
    """join-asof-keyed must equal the per-user naive definition computed
    driver-side from the raw events (greatest same-user click ts <=
    purchase ts; click ties at a ts resolved to max event_id)."""
    import bisect
    from collections import defaultdict

    from merl_etl_spark.registry import QUERIES, load_all
    from merl_etl_spark.sources.tables import load_table

    load_all()
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).collect()
    clicks = defaultdict(dict)  # user -> ts -> max event_id
    for r in events:
        if r.event_type == "click":
            cur = clicks[r.user_id].get(r.ts)
            clicks[r.user_id][r.ts] = r.event_id if cur is None else max(cur, r.event_id)
    sorted_clicks = {
        u: sorted(d.items()) for u, d in clicks.items()
    }
    want = {}
    for r in events:
        if r.event_type != "purchase":
            continue
        cl = sorted_clicks.get(r.user_id, [])
        i = bisect.bisect_right([t for t, _ in cl], r.ts)
        want[r.event_id] = cl[i - 1][1] if i else None
    got = {
        row.purchase_id: row.click_id
        for row in QUERIES["join-asof-keyed"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diffs, f"{len(diffs)} mismatches, first: {list(diffs.items())[:3]}"
