"""Semantic tests for the round-11 wave-18 operators: k-core peeling,
the Heaps vocabulary curve, and the shipping-delay census."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.operators.graph import KCORE_K
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# graph-kcore
# ---------------------------------------------------------------------------


def test_kcore_matches_python_peeling(spark, sf_dir):
    """Replay the peel to a true fixpoint in Python over the query's own
    kNN edges — the fixed round budget must have converged (an
    undershoot would show up as extra surviving nodes here)."""
    knn = QUERIES["sim-knn-graph"](spark, sf_dir).collect()
    und = set()
    for e in knn:
        und.add((e.src, e.dst))
        und.add((e.dst, e.src))
    surv = {u for u, _ in und}
    while True:
        deg: dict = defaultdict(int)
        for u, v in und:
            if u in surv and v in surv:
                deg[u] += 1
        nxt = {u for u in surv if deg[u] >= KCORE_K}
        if nxt == surv:
            break
        surv = nxt
    hist: dict = defaultdict(list)
    for u in surv:
        d = sum(1 for (a, b) in und if a == u and b in surv)
        hist[d].append(u)
    expected = sorted(
        (d, len(m), min(m), max(m)) for d, m in hist.items()
    )
    rows = sorted(
        (r.deg, r.n_nodes, r.min_node, r.max_node)
        for r in QUERIES["graph-kcore"](spark, sf_dir).collect()
    )
    assert rows == expected
    assert rows  # the core must be non-empty at fixture scale


def test_kcore_every_survivor_meets_the_core_order(spark, sf_dir):
    rows = QUERIES["graph-kcore"](spark, sf_dir).collect()
    assert all(r.deg >= KCORE_K for r in rows)


# ---------------------------------------------------------------------------
# text-vocab-growth
# ---------------------------------------------------------------------------


def test_vocab_growth_matches_python_sets(spark, sf_dir):
    from merl_etl_spark.operators.profiling import md5_bucket_spark  # noqa: F401
    from merl_etl_spark.operators.text_analysis import VOCAB_SLICES

    rows = sorted(
        QUERIES["text-vocab-growth"](spark, sf_dir).collect(),
        key=lambda r: r.slice,
    )
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    per_slice_words: dict = defaultdict(set)
    per_slice_docs: dict = defaultdict(int)
    for d in docs:
        if d.doc_id is None:
            continue
        h = hashlib.md5(f"{d.doc_id}|vocab".encode()).hexdigest()[:8]
        s = int(h, 16) % VOCAB_SLICES
        per_slice_docs[s] += 1
        per_slice_words[s].update(d.text.split(" "))
    seen: set = set()
    cum_docs = 0
    for r in rows:
        cum_docs += per_slice_docs[r.slice]
        new = per_slice_words[r.slice] - seen
        seen |= per_slice_words[r.slice]
        assert r.n_docs == per_slice_docs[r.slice]
        assert r.cum_docs == cum_docs
        assert r.n_new_words == len(new)
        assert r.cum_vocab == len(seen)
    # the fixture's synthetic corpus has a ~31-word shared vocabulary, so
    # the curve SATURATES at the first slice — the degenerate-extreme of
    # the deceleration Heaps' law predicts; assert the monotone/concave
    # shape without requiring continued growth
    assert rows[-1].cum_vocab >= rows[0].cum_vocab
    assert rows[-1].n_new_words <= rows[0].n_new_words
    assert all(a.cum_vocab <= b.cum_vocab for a, b in zip(rows, rows[1:]))


# ---------------------------------------------------------------------------
# analytics-shipping-delay
# ---------------------------------------------------------------------------


def test_shipping_delay_matches_join_replay(spark, sf_dir):
    rows = QUERIES["analytics-shipping-delay"](spark, sf_dir).collect()
    orders = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate)
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    }
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    agg: dict = defaultdict(list)
    for ln in lines:
        o = orders.get(ln.l_orderkey)
        if o is None or o[1] is None or ln.l_shipdate is None:
            continue
        delay = (ln.l_shipdate.date() - o[1].date()).days
        if delay >= 0:
            agg[(o[0], delay // 7)].append(delay)
    assert {(r.priority, r.week_band) for r in rows} == set(agg)
    for r in rows:
        ds = agg[(r.priority, r.week_band)]
        assert r.n_lines == len(ds)
        assert (r.min_days, r.max_days) == (min(ds), max(ds))
    # every week band's min/max stays inside the band
    for r in rows:
        assert r.week_band * 7 <= r.min_days <= r.max_days < (r.week_band + 1) * 7
