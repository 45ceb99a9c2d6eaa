"""Semantic tests for the round-11 wave-19 operators: interval
coalescing and the quality-gate funnel."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# intervals-coalesce
# ---------------------------------------------------------------------------


def _python_coalesce(intervals):
    """Merge overlapping [s, e] integer intervals; return island list."""
    islands = []
    for s, e in sorted(intervals):
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
        else:
            islands.append([s, e, 1])
    return islands


def test_intervals_coalesce_matches_python_merge(spark, sf_dir):
    rows = QUERIES["intervals-coalesce"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    iv = (
        orders.where(F.col("o_orderdate").isNotNull())
        .join(
            lines.where(F.col("l_shipdate").isNotNull()),
            orders["o_orderkey"] == lines["l_orderkey"],
        )
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("ship_end"))
        .collect()
    )
    import datetime

    epoch = datetime.date(1970, 1, 1)
    per_cust: dict = defaultdict(list)
    for r in iv:
        s_d = (r.o_orderdate.date() - epoch).days
        e_d = max((r.ship_end.date() - epoch).days, s_d)  # the clamp
        per_cust[r.o_custkey].append((s_d, e_d))
    assert {r.custkey for r in rows} == set(per_cust)
    for r in rows:
        islands = _python_coalesce(per_cust[r.custkey])
        covered = sum(e - s + 1 for s, e, _ in islands)
        span = islands[-1][1] - islands[0][0] + 1
        assert r.n_islands == len(islands)
        assert r.n_orders == len(per_cust[r.custkey])
        assert r.covered_days == covered
        assert r.span_days == span
        assert r.busy_ppm == covered * 1_000_000 // span


def test_intervals_coalesce_nested_interval_regression(spark):
    """A long interval fully containing later short ones must stay ONE
    island — the case a lag-on-start implementation splits wrongly
    (running max of ends is the correct flag).  Drives the PRODUCTION
    window chain (coalesce_islands) on the synthetic set and checks it
    against the Python replica (r11 ADVICE: the regression must pin the
    operator, not the test helper)."""
    from merl_etl_spark.operators.intervals import coalesce_islands

    raw = [(1, 10, 50), (1, 12, 15), (1, 20, 22), (1, 60, 61)]
    df = spark.createDataFrame(raw, "custkey long, s long, e long")
    islands = _python_coalesce([(s, e) for _, s, e in raw])
    assert len(islands) == 2  # [10,50] swallows both short ones; [60,61] apart

    rows = coalesce_islands(df).collect()
    assert len(rows) == 1
    r = rows[0]
    covered = sum(e - s + 1 for s, e, _ in islands)
    span = islands[-1][1] - islands[0][0] + 1
    assert r.n_islands == len(islands) == 2
    assert r.n_orders == len(raw)
    assert r.covered_days == covered
    assert r.span_days == span
    assert r.busy_ppm == covered * 1_000_000 // span


def test_intervals_coalesce_islands_vary(spark, sf_dir):
    rows = QUERIES["intervals-coalesce"](spark, sf_dir).collect()
    assert any(r.n_islands > 1 for r in rows)  # the merge branch is exercised
    assert any(r.n_islands == 1 for r in rows)


# ---------------------------------------------------------------------------
# curate-filter-funnel
# ---------------------------------------------------------------------------


def test_filter_funnel_is_consistent_with_gopher_flags(spark, sf_dir):
    """Cross-query pin: the funnel's stage attribution must equal the
    first failing flag of text-gopher-rules' own output, in gate order —
    drift between the two surfaces fails here."""
    flags = {
        r.doc_id: r
        for r in QUERIES["text-gopher-rules"](spark, sf_dir).collect()
    }
    doc_src = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    order = [
        ("ok_word_count", "1-word-count"),
        ("ok_mean_word_len", "2-mean-word-len"),
        ("ok_symbol_ratio", "3-symbol-ratio"),
        ("ok_alpha_words", "4-alpha-words"),
        ("ok_stop_words", "5-stop-words"),
    ]
    expected: dict = defaultdict(int)
    for doc_id, fl in flags.items():
        src = doc_src[doc_id]
        if src is None:
            continue
        stage = "6-keep"
        for col, label in order:
            if not getattr(fl, col):
                stage = label
                break
        expected[(src, stage)] += 1
    rows = QUERIES["curate-filter-funnel"](spark, sf_dir).collect()
    got = {(r.source, r.stage): r.n_docs for r in rows}
    assert got == dict(expected)


def test_filter_funnel_shares_sum_per_source(spark, sf_dir):
    rows = QUERIES["curate-filter-funnel"](spark, sf_dir).collect()
    per_src: dict = defaultdict(int)
    per_src_ppm: dict = defaultdict(int)
    for r in rows:
        per_src[r.source] += r.n_docs
        per_src_ppm[r.source] += r.stage_ppm
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    totals = dict(
        (r.source, r["count"])
        for r in docs.groupBy("source").count().collect()
    )
    assert per_src == totals
    # floor-quotient ppm shares under-sum by < one stage's worth
    for src, s in per_src_ppm.items():
        assert 1_000_000 - 6 <= s <= 1_000_000
