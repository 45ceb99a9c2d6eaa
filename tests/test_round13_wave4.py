"""Semantic tests for the round-13 wave-4 operators: exact per-nation
Gini concentration (two-level rank decomposition) and the per-key mode
election.  Replays are full recomputations; the Gini also carries an
analytic pin on constructed distributions."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# analytics-gini-concentration
# ---------------------------------------------------------------------------


def _gini_replay(spark, sf_dir):
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    cust_nation = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    nation_name = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    spend: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in orders:
        key = (nation_name[cust_nation[r.o_custkey]], r.o_custkey)
        spend[key] += Decimal(f"{r.o_totalprice:.2f}")
    per_nation: dict[str, list[int]] = defaultdict(list)
    for (nation, _), v in spend.items():
        per_nation[nation].append(int(v * 100))
    exp = {}
    for nation, xs in per_nation.items():
        xs.sort()  # the naive global sort the operator avoids
        n = len(xs)
        t = sum(xs)
        s = sum((i + 1) * x for i, x in enumerate(xs))
        gini = 2 * s / (n * t) - (n + 1) / n
        exp[nation] = (n, str(t), math.floor(gini * 1_000_000))
    return exp


def test_gini_matches_naive_sorted_replay(spark, sf_dir):
    """The two-level band decomposition must equal the textbook
    sorted-rank formula — the equivalence proof that no window ever
    needing more than one coarse band still yields the exact global
    rank sum."""
    exp = _gini_replay(spark, sf_dir)
    got = {
        r.nation: (r.n_customers, r.total_cents, r.gini_ppm)
        for r in QUERIES["analytics-gini-concentration"](spark, sf_dir).collect()
    }
    assert got == exp


def test_gini_analytic_pins(spark):
    """Constructed distributions with known Gini: perfect equality -> 0;
    one customer holding everything among k -> (k-1)/k - tiny rank term.
    Built directly as orders/customer/nation parquet fixtures."""
    import tempfile

    from merl_etl_spark.operators.analytics import analytics_gini_concentration

    # nation EQ: 4 customers spending identically -> gini exactly 0
    # nation ONE: 5 customers, one spends 1000.00, four spend 0.01 each
    custs = [(i, 0) for i in range(1, 5)] + [(i, 1) for i in range(10, 15)]
    orders = [(100 + i, i, 250.00, "2024-01-05") for i in range(1, 5)]
    orders += [(200, 10, 1000.00, "2024-01-05")]
    orders += [(200 + i, 10 + i, 0.01, "2024-01-05") for i in range(1, 5)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(o, c, p, d) for o, c, p, d in orders],
            "o_orderkey long, o_custkey long, o_totalprice double,"
            " o_orderdate string",
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.parquet(
            f"{tmp}/orders.parquet"
        )
        spark.createDataFrame(
            custs, "c_custkey long, c_nationkey int"
        ).write.parquet(f"{tmp}/customer.parquet")
        spark.createDataFrame(
            [(0, "EQ", 0), (1, "ONE", 0)],
            "n_nationkey int, n_name string, n_regionkey int",
        ).write.parquet(f"{tmp}/nation.parquet")
        got = {
            r.nation: r
            for r in analytics_gini_concentration(spark, tmp).collect()
        }
    assert got["EQ"].gini_ppm == 0
    assert got["EQ"].n_customers == 4
    # ONE: xs = [1,1,1,1,100000] cents; n=5, T=100004,
    # S = 1+2+3+4 + 5*100000 = 500010; G = 2*500010/(5*100004) - 6/5
    xs = [1, 1, 1, 1, 100000]
    n, t = 5, sum(xs)
    s = sum((i + 1) * x for i, x in enumerate(xs))
    expected = math.floor((2 * s / (n * t) - (n + 1) / n) * 1_000_000)
    assert got["ONE"].gini_ppm == expected
    assert 780_000 < got["ONE"].gini_ppm < 800_000  # ~0.8: near-total concentration


# ---------------------------------------------------------------------------
# agg-group-mode
# ---------------------------------------------------------------------------


def test_group_mode_matches_python_replay(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    counts: dict[int, Counter] = defaultdict(Counter)
    for r in ev:
        counts[r.user_id][r.event_type] += 1
    exp = {}
    for uid, ctr in counts.items():
        mode, n = min(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(ctr.values())
        exp[uid] = (mode, n, total, len(ctr), n * 1_000_000 // total)
    got = {
        r.user_id: (r.mode_event, r.n_mode, r.n_total, r.n_types, r.mode_ppm)
        for r in QUERIES["agg-group-mode"](spark, sf_dir).collect()
    }
    assert got == exp


def test_group_mode_tie_break_is_lexicographic(spark, sf_dir):
    """Any user whose top two types tie on count must elect the
    lexicographically smaller type — verify against raw counts for every
    tied user in the fixture (and assert the fixture HAS at least one
    tie, or the tie rule is untested)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    counts: dict[int, Counter] = defaultdict(Counter)
    for r in ev:
        counts[r.user_id][r.event_type] += 1
    got = {
        r.user_id: r.mode_event
        for r in QUERIES["agg-group-mode"](spark, sf_dir).collect()
    }
    n_ties = 0
    for uid, ctr in counts.items():
        top = max(ctr.values())
        tied = sorted(t for t, c in ctr.items() if c == top)
        if len(tied) > 1:
            n_ties += 1
            assert got[uid] == tied[0], (uid, tied, got[uid])
    assert n_ties > 0, "fixture exercises no tie — tie-break untested"
