"""Semantic tests for the round-11 wave-6 operators: exact bitmap
audience overlap, scalable exact percentiles, cohort LTV, measured ANN
recall, common-neighbor link prediction, and the inter-arrival
histogram.  Each op is recomputed with an independent plain-Python
reference (sets/sorts/dicts — no Spark, no SQL) and compared exactly."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# agg-bitmap-intersect: bitmap AND == plain set intersection
# ---------------------------------------------------------------------------

def test_bitmap_intersect_equals_set_intersection(spark, sf_dir):
    """Every pair row must equal the plain-Python set computation —
    intersection, inclusion-exclusion union, and both integer ppm
    ratios — and the pair universe must be exactly all feed pairs
    (including any with an empty intersection)."""
    rows = QUERIES["agg-bitmap-intersect"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & (F.col("user_id") >= 0))
        .select("event_type", "user_id")
        .collect()
    )
    audiences: dict[str, set[int]] = defaultdict(set)
    for r in ev:
        audiences[r["event_type"]].add(r["user_id"])
    feeds = sorted(audiences)
    expected_pairs = {
        (a, b) for i, a in enumerate(feeds) for b in feeds[i + 1 :]
    }
    assert {(r["feed_a"], r["feed_b"]) for r in rows} == expected_pairs
    for r in rows:
        sa, sb = audiences[r["feed_a"]], audiences[r["feed_b"]]
        both = len(sa & sb)
        either = len(sa | sb)
        assert (r["n_a"], r["n_b"]) == (len(sa), len(sb))
        assert (r["n_both"], r["n_either"]) == (both, either)
        assert r["jaccard_ppm"] == both * 1_000_000 // either
        assert r["containment_ppm"] == both * 1_000_000 // min(len(sa), len(sb))


# ---------------------------------------------------------------------------
# analytics-order-percentiles: rank reconstruction == plain sorted select
# ---------------------------------------------------------------------------

def test_order_percentiles_match_sorted_reference(spark, sf_dir):
    """The bucketed rank reconstruction must select exactly the value at
    rank ceil(p*n) of the plain ascending sort, per group — bit-identical
    percentile_disc semantics with no group ever sorted in one
    partition."""
    rows = QUERIES["analytics-order-percentiles"](spark, sf_dir).collect()
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_grp: dict[str, list[float]] = defaultdict(list)
    for r in orders:
        by_grp[r["o_orderpriority"]].append(r["o_totalprice"])
    assert {r["priority"] for r in rows} == set(by_grp)
    for r in rows:
        vals = sorted(by_grp[r["priority"]])
        n = len(vals)
        assert r["n_orders"] == n
        # ceil(p*n) as pure integer arithmetic, 1-indexed
        assert r["p50"] == vals[(n + 1) // 2 - 1]
        assert r["p90"] == vals[(9 * n + 9) // 10 - 1]
        assert r["p99"] == vals[(99 * n + 99) // 100 - 1]
        assert (r["min_price"], r["max_price"]) == (vals[0], vals[-1])
        assert r["p50"] <= r["p90"] <= r["p99"] <= r["max_price"]


# ---------------------------------------------------------------------------
# analytics-cohort-ltv: cumulative revenue + conservation invariants
# ---------------------------------------------------------------------------

def test_cohort_ltv_matches_python_reference(spark, sf_dir):
    """Recompute the full LTV triangle in Python (first-order month per
    customer, exact centi-cent integer revenue accumulation along age)
    and compare every row; plus the structural invariants — age 0 exists
    for every cohort with n_active == cohort_size conservation at age 0
    not required (a cohort's members all ordered in month 0 by
    definition, so n_active(0) == cohort_size), and cum_revenue is
    non-decreasing along age."""
    rows = QUERIES["analytics-cohort-ltv"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    ym = lambda d: d.year * 12 + d.month  # noqa: E731
    first: dict[int, int] = {}
    for r in orders:
        m = ym(r["o_orderdate"])
        k = r["o_custkey"]
        if k not in first or m < first[k]:
            first[k] = m
    sizes: dict[int, int] = defaultdict(int)
    for m in first.values():
        sizes[m] += 1
    # exact integer micro-units (the DECIMAL(18,6) cast is exact for
    # 2dp parquet doubles)
    grain_rev: dict[tuple[int, int], int] = defaultdict(int)
    grain_cust: dict[tuple[int, int], set[int]] = defaultdict(set)
    for r in orders:
        c = first[r["o_custkey"]]
        age = ym(r["o_orderdate"]) - c
        grain_rev[(c, age)] += round(r["o_totalprice"] * 1_000_000)
        grain_cust[(c, age)].add(r["o_custkey"])
    got = {
        (r["cohort_month"], r["age_months"]): r for r in rows
    }
    assert len(got) == len(grain_rev)
    label = lambda m: f"{(m - 1) // 12:04d}-{(m - 1) % 12 + 1:02d}"  # noqa: E731
    for (c, age), rev in sorted(grain_rev.items()):
        r = got[(label(c), age)]
        assert r["n_active"] == len(grain_cust[(c, age)])
        assert r["cohort_size"] == sizes[c]
        # revenue column is the 2dp-exact decimal → double boundary
        assert round(r["revenue"] * 100) == round(rev / 10_000)
        cum = sum(v for (cc, aa), v in grain_rev.items() if cc == c and aa <= age)
        assert round(r["cum_revenue"] * 100) == round(cum / 10_000)
        assert r["ltv_per_customer"] == r["cum_revenue"] / sizes[c]
    # age-0 completeness + monotone accumulation
    cohorts = {r["cohort_month"] for r in rows}
    for cm in cohorts:
        series = sorted(
            (r["age_months"], r["cum_revenue"]) for r in rows if r["cohort_month"] == cm
        )
        assert series[0][0] == 0
        assert all(a[1] <= b[1] for a, b in zip(series, series[1:]))
        r0 = got[(cm, 0)]
        assert r0["n_active"] == r0["cohort_size"]


# ---------------------------------------------------------------------------
# sim-ann-recall-eval: hits/candidates == numpy brute force + sign buckets
# ---------------------------------------------------------------------------

def test_ann_recall_matches_numpy_reference(spark, sf_dir):
    """Recompute ground truth (exact cosine top-k) and the sign-LSH
    candidate sets in numpy/Python and compare hits, candidate counts,
    and the integer recall exactly."""
    import numpy as np

    from merl_etl_spark.operators.similarity import (
        N_PLANES,
        SIM_NQUERY,
        SIM_TOPK,
    )

    rows = {r["query_id"]: r for r in QUERIES["sim-ann-recall-eval"](spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    mat = np.array([list(map(float, r["embedding"])) for r in emb])
    buckets = {}
    for i, vid in enumerate(ids):
        b = 0
        for j in range(N_PLANES):
            if mat[i, j] >= 0:
                b += 1 << j
        buckets[int(vid)] = b
    norms = np.linalg.norm(mat, axis=1)
    assert len(rows) == SIM_NQUERY
    for q in range(SIM_NQUERY):
        qi = int(np.where(ids == q)[0][0])
        cand = {
            int(v) for v in ids if int(v) != q and buckets[int(v)] == buckets[q]
        }
        cos = (mat @ mat[qi]) / (norms * norms[qi])
        order = sorted(
            (float(-cos[i]), int(ids[i])) for i in range(len(ids)) if int(ids[i]) != q
        )
        topk = {vid for _, vid in order[:SIM_TOPK]}
        hits = len(topk & cand)
        r = rows[q]
        assert r["n_candidates"] == len(cand)
        assert r["hits"] == hits
        assert r["recall_ppm"] == hits * 1_000_000 // SIM_TOPK


# ---------------------------------------------------------------------------
# graph-jaccard-links: predicted links == plain-dict graph reference
# ---------------------------------------------------------------------------

def test_jaccard_links_match_python_reference(spark, sf_dir):
    """Rebuild the censused edge list (top-K shared-part pairs with the
    documented tie-break) and the common-neighbor Jaccard top-20 in
    plain Python and compare exactly."""
    from merl_etl_spark.operators.graph import LP_TOP, TRI_EDGE_TOP

    rows = QUERIES["graph-jaccard-links"](spark, sf_dir).collect()
    su = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_part: dict[int, list[int]] = defaultdict(list)
    for r in su:
        by_part[r["l_partkey"]].append(r["l_suppkey"])
    shared: dict[tuple[int, int], int] = defaultdict(int)
    for supps in by_part.values():
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                shared[(a, b)] += 1
    edges = [
        p for p, _ in sorted(shared.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:TRI_EDGE_TOP]
    edge_set = set(edges)
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scored = []
    cn_cnt: dict[tuple[int, int], int] = defaultdict(int)
    for mid, ns in nbrs.items():
        ss = sorted(ns)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                cn_cnt[(a, b)] += 1
    for (a, b), cn in cn_cnt.items():
        if (a, b) in edge_set:
            continue
        ppm = cn * 1_000_000 // (len(nbrs[a]) + len(nbrs[b]) - cn)
        scored.append((-ppm, a, b, cn, len(nbrs[a]), len(nbrs[b])))
    scored.sort()
    expect = scored[:LP_TOP]
    assert len(rows) == len(expect)
    for r, (nppm, a, b, cn, da, db) in zip(rows, expect):
        assert (r["id_a"], r["id_b"], r["cn"]) == (a, b, cn)
        assert (r["deg_a"], r["deg_b"]) == (da, db)
        assert r["jaccard_ppm"] == -nppm


# ---------------------------------------------------------------------------
# ts-interarrival-hist: bands == plain-Python bit-width histogram
# ---------------------------------------------------------------------------

def test_interarrival_hist_matches_python_reference(spark, sf_dir):
    """Recompute the per-(user, feed) gaps, the bit-width bands, and the
    integer ppm shares in Python and compare every band row; the band
    bounds must tile [0, inf) without overlap."""
    rows = QUERIES["ts-interarrival-hist"](spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .where(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    series: dict[tuple[int, str], list] = defaultdict(list)
    for r in ev:
        series[(r["user_id"], r["event_type"])].append((r["ts"], r["event_id"]))
    import calendar

    def epoch_floor(ts) -> int:
        return calendar.timegm(ts.timetuple())

    bands: dict[tuple[str, int], list[int]] = defaultdict(list)
    for (_, feed), evs in series.items():
        evs.sort()
        for (t0, _), (t1, _) in zip(evs, evs[1:]):
            gap = epoch_floor(t1) - epoch_floor(t0)
            bands[(feed, max(gap.bit_length(), 1))].append(gap)
    totals: dict[str, int] = defaultdict(int)
    for (feed, _), gaps in bands.items():
        totals[feed] += len(gaps)
    assert {(r["event_type"], r["band"]) for r in rows} == set(bands)
    for r in rows:
        gaps = bands[(r["event_type"], r["band"])]
        assert r["n_gaps"] == len(gaps)
        assert (r["min_gap_s"], r["max_gap_s"]) == (min(gaps), max(gaps))
        assert r["share_ppm"] == len(gaps) * 1_000_000 // totals[r["event_type"]]
        # band bounds tile: floor = 2^(band-1) (0 for band 1), ceil = 2^band - 1
        lo = 0 if r["band"] == 1 else 1 << (r["band"] - 1)
        assert (r["band_floor_s"], r["band_ceil_s"]) == (lo, (1 << r["band"]) - 1)
        assert lo <= r["min_gap_s"] <= r["max_gap_s"] <= r["band_ceil_s"]
