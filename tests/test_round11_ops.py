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
