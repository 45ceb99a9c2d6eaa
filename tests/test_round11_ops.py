"""Semantic tests for the round-11 work: superseded bucket-tag cleanup
(VERDICT r10 #6), the single-valued ntile cutpoints (ADVICE r10 medium),
and the round's new/rewritten operators."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all

load_all()


# ---------------------------------------------------------------------------
# layout-bucketed-join: superseded merl_bkt_* tags are dropped on rewrite
# ---------------------------------------------------------------------------

def test_superseded_bucket_tags_are_dropped(spark, sf_dir):
    """Simulating a fixture regeneration: when the current content tag is
    (re)materialized, sibling merl_bkt_* catalog tables and leftover
    warehouse directories bearing a DIFFERENT tag are superseded stale
    state and must be removed — exactly one tag survives (VERDICT r10
    #6).  The CURRENT tag keeps the non-destructive rule: the test also
    proves the current-tag table still answers the query afterwards."""
    from merl_etl_spark.operators.profiling import _ensure_bucketed_tables
    from merl_etl_spark.operators.skew import write_bucketed
    from merl_etl_spark.sources.tables import load_table

    # current tag exists (created on demand)
    t_o, t_c = _ensure_bucketed_tables(spark, sf_dir)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")

    # plant a superseded sibling: an old-tag catalog table AND an orphan
    # old-tag directory with no catalog entry (the two leftover shapes)
    old_tbl = "merl_bkt_orders_deadbeef0bad"
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").limit(10),
        old_tbl, ["o_custkey"], 4, ["o_custkey"],
    )
    orphan = os.path.join(warehouse, "merl_bkt_customer_feedface0bad")
    os.makedirs(orphan, exist_ok=True)
    assert spark.catalog.tableExists(old_tbl)

    # simulate a fresh session re-ensuring the layout: the current-tag
    # catalog entries are gone (in-memory catalog of a new process) but
    # their committed directories remain → re-attach path runs, and the
    # cleanup must fire before it
    spark.sql(f"DROP TABLE IF EXISTS {t_o}")
    spark.sql(f"DROP TABLE IF EXISTS {t_c}")
    t_o2, t_c2 = _ensure_bucketed_tables(spark, sf_dir)
    assert (t_o2, t_c2) == (t_o, t_c)

    assert not spark.catalog.tableExists(old_tbl)
    assert not os.path.isdir(os.path.join(warehouse, old_tbl))
    assert not os.path.isdir(orphan)
    surviving = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("merl_bkt_orders_")
    ]
    assert surviving == [t_o2], surviving

    # the current tag still answers (non-destructive for the live tag)
    assert QUERIES["layout-bucketed-join"](spark, sf_dir).count() > 0


# ---------------------------------------------------------------------------
# dq-distribution-psi: Decimal-reference parity (VERDICT r10 #4)
# ---------------------------------------------------------------------------

def test_psi_matches_decimal_reference(spark, sf_dir):
    """Recompute the PSI surface in Python with decimal.Decimal
    mirroring Spark's semantics exactly: Decimal(float) — the EXACT
    binary expansion, not the shortest repr — quantized ROUND_HALF_UP
    matches Catalyst's BigDecimal(double).setScale(n, HALF_UP) for both
    the 6-dp ln freezes and the 6-dp term freeze; the smoothed shares
    and the term product are plain IEEE doubles on both sides."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from merl_etl_spark.sources.tables import load_table

    six = Decimal("0.000001")

    def ln6(x: int) -> Decimal:
        return Decimal(math.log(float(x))).quantize(six, ROUND_HALF_UP)

    rows = load_table(spark, sf_dir, "events").select("event_id", "event_type").collect()
    cap = max(r["event_id"] for r in rows) // 2
    ref, cur = Counter(), Counter()
    for r in rows:
        (ref if r["event_id"] <= cap else cur)[r["event_type"]] += 1
    cats = sorted(set(ref) | set(cur), key=lambda c: (c is None, c))
    rt, ct, k = sum(ref.values()), sum(cur.values()), len(cats)
    expect = {}
    terms = []
    for c in cats:
        rc, cc = ref.get(c, 0), cur.get(c, 0)
        ref_share = float(rc + 1) / float(rt + k)
        cur_share = float(cc + 1) / float(ct + k)
        lr = float(ln6(cc + 1) - ln6(rc + 1) + ln6(rt + k) - ln6(ct + k))
        term = Decimal((cur_share - ref_share) * lr).quantize(six, ROUND_HALF_UP)
        terms.append(term)
        expect[c] = (rc, cc, ref_share, cur_share, float(term))
    total = float(sum(terms))

    got = QUERIES["dq-distribution-psi"](spark, sf_dir).collect()
    assert len(got) == len(cats)
    for r in got:
        rc, cc, rs, cs, term = expect[r["event_type"]]
        assert (r["ref_count"], r["cur_count"]) == (rc, cc)
        assert r["ref_share"] == rs and r["cur_share"] == cs
        assert r["psi_term"] == term
        assert r["psi_total"] == total
    # rank is a permutation ordered by the frozen term
    by_rank = sorted(got, key=lambda r: r["rnk"])
    assert [r["rnk"] for r in by_rank] == list(range(1, len(cats) + 1))
    assert all(
        a["psi_term"] >= b["psi_term"] for a, b in zip(by_rank, by_rank[1:])
    )


# ---------------------------------------------------------------------------
# frame_sample_plan: the decode seam is decoder-agnostic (VERDICT r10 #7)
# ---------------------------------------------------------------------------

def test_frame_sample_plan_accepts_injected_real_decoder(spark, sf_dir):
    """Inject a fake 'REAL' decoder — different frame width, reversed
    bytes, a synthetic header frame — through the frame_sample_plan seam
    and prove the mapInPandas plumbing is decoder-agnostic: same schema,
    correct 1→N fan-out for the NEW kernel, per-document frame order and
    digests matching a pure-Python reference.  The closure ships the
    kernel by value, so this is exactly how a PIL/ffmpeg decoder would
    deploy — no Spark-side changes (decode_frames is an interface, not a
    TODO)."""
    import hashlib

    from merl_etl_spark.operators.multimodal import (
        FRAME_SCHEMA,
        binary_docs,
        frame_sample_plan,
        mm_frame_sample,
    )
    from merl_etl_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(spark)

    def fake_real_decoder(payload: bytes) -> list[bytes]:
        # header frame + reversed 32-byte tiles: shaped like a real
        # decoder (frames ≠ byte slices of the input, count ≠ stub's)
        return [b"HDR:" + payload[:8]] + [
            payload[i : i + 32][::-1] for i in range(0, len(payload), 32)
        ]

    docs = binary_docs(spark, sf_dir).limit(50)
    got = frame_sample_plan(docs, decoder=fake_real_decoder, stride=3).collect()

    # schema identical to the stub-backed operator
    stub_df = mm_frame_sample(spark, sf_dir)
    assert [f.name for f in stub_df.schema.fields] == [
        "doc_id", "frame_id", "frame_bytes", "frame_md5",
    ]
    assert frame_sample_plan(docs, decoder=fake_real_decoder).schema == stub_df.schema

    # pure-Python reference: same kernel, same stride
    expect = {}
    for r in docs.collect():
        frames = fake_real_decoder(bytes(r["payload"]))
        expect[r["doc_id"]] = [
            (fid, len(frames[fid]), hashlib.md5(frames[fid]).hexdigest())
            for fid in range(0, len(frames), 3)
        ]
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["frame_id"], r["frame_bytes"], r["frame_md5"])
        )
    assert set(by_doc) == set(expect)
    for doc_id, frames in expect.items():
        # mapInPandas preserves within-partition row order → per-doc
        # frame sequence arrives exactly as the kernel emitted it
        assert by_doc[doc_id] == frames, doc_id


# ---------------------------------------------------------------------------
# agg-bitmap-distinct: popcount result equals a plain count(distinct)
# ---------------------------------------------------------------------------

def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    """The bitmap-word popcount must give EXACTLY count(distinct) —
    same answer, different (map-side-combinable) physics — and n_words
    must equal the distinct word count (the bitmap's true shuffle
    grain)."""
    from merl_etl_spark.operators.freq import BITMAP_WORD
    from merl_etl_spark.sources.tables import load_table

    got = {
        r["event_type"]: (r["n_events"], r["n_users"], r["n_words"])
        for r in QUERIES["agg-bitmap-distinct"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    ref = {
        r["event_type"]: (r["n"], r["nu"], r["nw"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("nu"),
            F.countDistinct(F.expr(f"user_id DIV {BITMAP_WORD}")).alias("nw"),
        )
        .collect()
    }
    assert got == ref and got


# ---------------------------------------------------------------------------
# sim-rp-projection: pure-map plan + Python parity
# ---------------------------------------------------------------------------

def test_rp_projection_is_shuffle_free_and_matches_python(spark, sf_dir):
    """The JL projection must be a PURE MAP — zero shuffle exchanges
    anywhere (the literal sign arrays make it embarrassingly parallel;
    this is the property the operator exists for at 100 TB) — and every
    projected component must equal a plain-Python fixed-point
    recomputation, including the sign-LSH bucket."""
    import math

    from merl_etl_spark.operators.similarity import (
        RP_DIMS,
        RP_FP_SCALE,
        _rp_sign,
    )
    from merl_etl_spark.sources.tables import load_table

    df = QUERIES["sim-rp-projection"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    emb = {r["vec_id"]: r for r in load_table(spark, sf_dir, "embeddings").collect()}
    for r in df.collect():
        e = emb[r["vec_id"]]
        vfp = [math.floor(float(x) * RP_FP_SCALE) for x in e["embedding"]]
        bucket = 0
        for j in range(RP_DIMS):
            rp = sum(
                v * _rp_sign(d + 1, j) for d, v in enumerate(vfp)
            )
            assert r[f"rp_{j}"] == rp, (r["vec_id"], j)
            if rp >= 0:
                bucket += 1 << j
        assert r["rp_bucket"] == bucket and r["label"] == e["label"]


# ---------------------------------------------------------------------------
# sim-pq-encode: Python parity (per-subspace exact-integer argmin)
# ---------------------------------------------------------------------------

def test_pq_encode_matches_python_reference(spark, sf_dir):
    """Recompute the PQ codes in Python: quantize at ASSIGN_FP_SCALE,
    build per-(subspace, label) fixed-point centroid sums from the
    reference half, take the per-subspace integer-metric argmin with the
    (d2, label) tie-break, and compare every code and the total
    quantization distance exactly — the sim-centroid-assign parity test
    extended to the subspace split."""
    import math
    from collections import Counter, defaultdict

    from merl_etl_spark.operators.similarity import (
        ASSIGN_FP_SCALE,
        PQ_SUBDIM,
        PQ_SUBS,
    )
    from merl_etl_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").collect()
    cap = max(r["vec_id"] for r in rows) // 2
    ndim = len(rows[0]["embedding"])
    sums: dict[int, list[int]] = defaultdict(lambda: [0] * ndim)
    ns: dict[int, int] = Counter()
    for r in rows:
        if r["vec_id"] > cap:
            continue
        fp = [math.floor(float(x) * ASSIGN_FP_SCALE) for x in r["embedding"]]
        sums[r["label"]] = [a + b for a, b in zip(sums[r["label"]], fp)]
        ns[r["label"]] += 1
    expect = {}
    for r in rows:
        if r["vec_id"] <= cap:
            continue
        vfp = [math.floor(float(x) * ASSIGN_FP_SCALE) for x in r["embedding"]]
        codes, qdist = [], 0
        for m in range(PQ_SUBS):
            lo = m * PQ_SUBDIM
            best = None
            for lbl in sorted(ns):
                n, s = ns[lbl], sums[lbl]
                d2 = sum(
                    (abs(v * n - si) // n) ** 2
                    for v, si in zip(vfp[lo : lo + PQ_SUBDIM], s[lo : lo + PQ_SUBDIM])
                )
                if best is None or (d2, lbl) < best:
                    best = (d2, lbl)
            codes.append(best[1])
            qdist += best[0]
        expect[r["vec_id"]] = (r["label"], codes, qdist)

    got = QUERIES["sim-pq-encode"](spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        lbl, codes, qdist = expect[r["vec_id"]]
        assert r["true_label"] == lbl
        assert [r[f"code_{m}"] for m in range(PQ_SUBS)] == codes, r["vec_id"]
        assert r["qdist"] == qdist, r["vec_id"]


# ---------------------------------------------------------------------------
# ts-cusum-changepoint: Python parity
# ---------------------------------------------------------------------------

def test_cusum_matches_python_reference(spark, sf_dir):
    """Integer CUSUM recomputed in pure Python over the daily counts:
    scaled deviations D*n_d - N, running sum in day order, changepoint =
    every day whose |cusum| equals the global max."""
    from collections import Counter

    from merl_etl_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "events").select("ts").collect()
    per_day = Counter(r["ts"].date() for r in rows if r["ts"] is not None)
    days = sorted(per_day)
    nd, tot = len(days), sum(per_day.values())
    cusum, acc, expect = {}, 0, {}
    for d in days:
        sdev = nd * per_day[d] - tot
        acc += sdev
        cusum[d] = (per_day[d], sdev, acc)
    peak = max(abs(c) for _, _, c in cusum.values())
    got = QUERIES["ts-cusum-changepoint"](spark, sf_dir).collect()
    assert len(got) == nd
    flagged = 0
    for r in got:
        import datetime as dt

        d = dt.date.fromisoformat(r["day"])
        n, sdev, c = cusum[d]
        assert (r["n_events"], r["sdev"], r["cusum"]) == (n, sdev, c)
        assert r["abs_cusum"] == abs(c)
        assert r["is_changepoint"] == (abs(c) == peak)
        flagged += r["is_changepoint"]
    assert flagged >= 1
    # the running sum of scaled deviations telescopes to zero
    assert sum(r["sdev"] for r in got) == 0


# ---------------------------------------------------------------------------
# dq-freshness: Python parity
# ---------------------------------------------------------------------------

def test_freshness_matches_python_reference(spark, sf_dir):
    """Recompute the freshness surface in Python over the collected
    timestamps: per-feed last event, whole-second epoch-floor lag vs
    the stream head, 24 h window count, SLA flag."""
    import datetime as dt

    from merl_etl_spark.operators.quality import FRESH_SLA_MIN
    from merl_etl_spark.sources.tables import load_table

    rows = [
        r
        for r in load_table(spark, sf_dir, "events")
        .select("ts", "event_type")
        .collect()
        if r["ts"] is not None
    ]
    gmax = max(r["ts"] for r in rows)
    epoch = dt.datetime(1970, 1, 1)

    def esec(t):
        return int((t - epoch).total_seconds() // 1)

    per = {}
    for r in rows:
        st = per.setdefault(r["event_type"], [0, None, 0])
        st[0] += 1
        st[1] = r["ts"] if st[1] is None or r["ts"] > st[1] else st[1]
        st[2] += r["ts"] >= gmax - dt.timedelta(hours=24)
    got = QUERIES["dq-freshness"](spark, sf_dir).collect()
    assert len(got) == len(per)
    head_feeds = 0
    for r in got:
        n, last, n24 = per[r["event_type"]]
        lag = (esec(gmax) - esec(last)) // 60
        assert (r["n_events"], r["n_last_24h"]) == (n, n24)
        assert r["last_ts"] == last.strftime("%Y-%m-%d %H:%M:%S")
        assert r["last_epoch_s"] == esec(last)
        assert r["lag_minutes"] == lag
        assert r["is_stale"] == (lag > FRESH_SLA_MIN)
        head_feeds += r["lag_minutes"] == 0
    # the feed carrying the stream head is by definition fresh
    assert head_feeds >= 1


# ---------------------------------------------------------------------------
# curate-canonical-keep: survivorship invariants
# ---------------------------------------------------------------------------

def test_canonical_keep_survivorship_invariants(spark, sf_dir):
    """Every document appears exactly once in the ledger; every cluster
    keeps EXACTLY one member; the keeper dominates its cluster on
    (n_chars DESC, doc_id ASC); dup_count equals the cluster size; and
    the keeper set matches a pure-Python recomputation on the shared
    normalization key."""
    import hashlib
    import re

    from merl_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").collect()
    clusters = {}
    for r in docs:
        key = hashlib.md5(
            re.sub(r"[ \t\n\r\f\x0b]+", " ", r["text"].lower()).strip().encode()
        ).hexdigest()
        clusters.setdefault(key, []).append((-r["n_chars"], r["doc_id"]))

    got = QUERIES["curate-canonical-keep"](spark, sf_dir).collect()
    assert len(got) == len(docs)
    by_key = {}
    for r in got:
        by_key.setdefault(r["content_key"], []).append(r)
    assert set(by_key) == set(clusters)
    for key, rows in by_key.items():
        members = clusters[key]
        assert all(r["dup_count"] == len(members) for r in rows)
        keeps = [r for r in rows if r["is_canonical"]]
        assert len(keeps) == 1
        assert keeps[0]["action"] == "keep"
        assert keeps[0]["doc_id"] == min(members)[1]
        assert all(
            r["action"] == "drop" for r in rows if not r["is_canonical"]
        )


# ---------------------------------------------------------------------------
# dq-profile-drift: per-column counts match direct recomputation
# ---------------------------------------------------------------------------

def test_profile_drift_matches_direct_counts(spark, sf_dir):
    """Each column's per-half row/null/distinct counts must equal a
    direct per-column Spark recomputation (no unpivot, no string cast —
    proving the stacked two-level-distinct form changes physics, not
    answers)."""
    from merl_etl_spark.operators.quality import PROFILE_DRIFT_COLS
    from merl_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    cap = ev.agg(F.expr("max(event_id) DIV 2").alias("cap")).collect()[0]["cap"]
    got = {r["col"]: r for r in QUERIES["dq-profile-drift"](spark, sf_dir).collect()}
    assert set(got) == set(PROFILE_DRIFT_COLS)
    for c in PROFILE_DRIFT_COLS:
        for half, pfx in ((F.col("event_id") <= cap, "ref"), (F.col("event_id") > cap, "cur")):
            ref = ev.where(half).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("nn"),
                F.countDistinct(c).alias("nd"),
            ).collect()[0]
            assert got[c][f"{pfx}_n"] == ref["n"], (c, pfx)
            assert got[c][f"{pfx}_nulls"] == (ref["nn"] or 0), (c, pfx)
            assert got[c][f"{pfx}_distinct"] == ref["nd"], (c, pfx)
        assert got[c]["distinct_drift"] == got[c]["cur_distinct"] - got[c]["ref_distinct"]


# ---------------------------------------------------------------------------
# analytics-decayed-engagement: Decimal-reference parity
# ---------------------------------------------------------------------------

def test_decayed_engagement_matches_decimal_reference(spark, sf_dir):
    """Recompute the score in Python mirroring the frozen-weight
    contract: one pow per distinct day, Decimal(float) quantized
    ROUND_HALF_UP at 6 dp (the exact-binary-expansion rule), exact
    integer-weighted decimal sums, double boundary."""
    from collections import Counter, defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from merl_etl_spark.operators.analytics import DECAY_HALFLIFE_D
    from merl_etl_spark.sources.tables import load_table

    six = Decimal("0.000001")
    rows = [
        r
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "ts")
        .collect()
        if r["ts"] is not None and r["user_id"] is not None
    ]
    per = defaultdict(Counter)
    for r in rows:
        per[r["user_id"]][r["ts"].date()] += 1
    maxd = max(d for c in per.values() for d in c)
    wday = {
        d: Decimal(0.5 ** (float((maxd - d).days) / float(DECAY_HALFLIFE_D))).quantize(
            six, ROUND_HALF_UP
        )
        for c in per.values()
        for d in c
    }
    got = {
        r["user_id"]: r
        for r in QUERIES["analytics-decayed-engagement"](spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for uid, days in per.items():
        r = got[uid]
        assert r["n_events"] == sum(days.values())
        assert r["active_days"] == len(days)
        assert r["last_day"] == max(days).strftime("%Y-%m-%d")
        score = sum(n * wday[d] for d, n in days.items())
        assert r["engagement"] == float(score), uid


# ---------------------------------------------------------------------------
# analytics-new-returning: conservation invariants
# ---------------------------------------------------------------------------

def test_new_returning_conserves_users(spark, sf_dir):
    """new + returning = active on every day; Σ new over all days =
    |distinct users| (every user is new exactly once); day 1 is all
    new; shares are the exact ratio."""
    got = sorted(
        QUERIES["analytics-new-returning"](spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert got
    from merl_etl_spark.sources.tables import load_table

    n_users = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_new"] for r in got) == n_users
    assert got[0]["n_returning"] == 0
    for r in got:
        assert r["n_new"] + r["n_returning"] == r["n_active"]
        assert r["new_share"] == r["n_new"] / r["n_active"]


# ---------------------------------------------------------------------------
# curate-mixture-sample: budget/coin invariants
# ---------------------------------------------------------------------------

def test_mixture_sample_budget_and_coin_invariants(spark, sf_dir):
    """Every keep decision is exactly coin < rate; coins recompute from
    hashlib md5; a source's rate is capped at 1.0 (ppm 10^6); the kept
    token mass per source approaches its weight x budget allocation
    (within the granularity a finite doc count allows — bounded by the
    largest doc plus binomial noise, asserted loosely as <=2x)."""
    import hashlib
    from collections import defaultdict

    from merl_etl_spark.operators.curation_ext import MIX_BUDGET_FRAC, MIX_PPM

    rows = QUERIES["curate-mixture-sample"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    per_src = defaultdict(lambda: [0, 0, None, None])  # kept_tokens, src_tokens, rate, weight
    for r in rows:
        coin = (
            int(
                hashlib.md5(f"{r['doc_id']}|mix-seed".encode()).hexdigest()[:8], 16
            )
            % MIX_PPM
        )
        assert r["coin_ppm"] == coin
        assert r["kept"] == (coin < r["rate_ppm"])
        assert 0 <= r["rate_ppm"] <= MIX_PPM
        st = per_src[r["source"]]
        st[0] += r["n_tokens"] * r["kept"]
        st[1] += r["n_tokens"]
        st[2], st[3] = r["rate_ppm"], r["weight"]
    budget = MIX_BUDGET_FRAC * total
    for src, (kept_tokens, src_tokens, rate_ppm, weight) in per_src.items():
        alloc = weight * budget
        if rate_ppm == MIX_PPM:
            # saturated source: everything kept, allocation exceeds supply
            assert kept_tokens == src_tokens
        else:
            assert kept_tokens <= 2 * alloc + 1, (src, kept_tokens, alloc)
