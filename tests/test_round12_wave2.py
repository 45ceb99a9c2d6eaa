"""Semantic tests for the round-12 wave-2 operators: source JSD matrix
and the header-vs-detail reconciliation.  Python replays from raw
fixture rows, plus structural invariants (symmetry bounds, conservation).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# text-source-divergence
# ---------------------------------------------------------------------------


def _jsd_replay(spark, sf_dir):
    from merl_etl_spark.operators.text_analysis import JSD_VOCAB

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", "text")
        .collect()
    )
    per_src: dict = defaultdict(Counter)
    glob: Counter = Counter()
    for r in docs:
        ws = [w for w in r.text.split(" ") if w != ""]
        per_src[r.source].update(ws)
        glob.update(ws)
    vocab = [w for w, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:JSD_VOCAB]]
    V = JSD_VOCAB
    tot = {s: sum(c[w] for w in vocab) for s, c in per_src.items()}
    out = {}
    for a in per_src:
        for b in per_src:
            if not a < b:
                continue
            total = Decimal(0)
            for w in vocab:
                ca, cb = per_src[a][w], per_src[b][w]
                ta, tb = tot[a], tot[b]
                ia = (ca + 1) * (tb + V)
                ib = (cb + 1) * (ta + V)
                ln2a = Decimal(str(round(math.log(2 * ia), 6)))
                ln2b = Decimal(str(round(math.log(2 * ib), 6)))
                lnab = Decimal(str(round(math.log(ia + ib), 6)))
                pa = (ca + 1) / (ta + V)
                pb = (cb + 1) / (tb + V)
                term = (pa * float(ln2a - lnab) + pb * float(ln2b - lnab)) / 2.0
                total += Decimal(str(round(term, 6)))
            out[(a, b)] = float(total)
    return out


def test_source_divergence_matches_python_replay(spark, sf_dir):
    expect = _jsd_replay(spark, sf_dir)
    rows = QUERIES["text-source-divergence"](spark, sf_dir).collect()
    got = {(r.source_a, r.source_b): r.jsd for r in rows}
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert math.isclose(got[k], v, rel_tol=0, abs_tol=1e-9), (k, got[k], v)


def test_source_divergence_bounds_and_shape(spark, sf_dir):
    from merl_etl_spark.operators.text_analysis import JSD_VOCAB

    n_vocab = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    rows = QUERIES["text-source-divergence"](spark, sf_dir).collect()
    srcs = set()
    for r in rows:
        srcs.add(r.source_a)
        srcs.add(r.source_b)
        assert r.source_a < r.source_b  # unordered pairs, emitted once
        assert r.n_words == min(JSD_VOCAB, n_vocab)
        # JSD ∈ [0, ln 2]; the 6-dp term rounding can push the sum a
        # hair past the analytic bound but never materially
        assert -1e-4 <= r.jsd <= math.log(2) + 1e-4
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2  # the full matrix, once per pair


def test_identical_distributions_have_zero_jsd():
    """Pure-python anchor on the exact formula: a source paired with an
    identical count vector must score jsd == 0 (every ln ratio is
    ln(2A) - ln(2A) = 0 exactly, no rounding residue)."""
    V = 3
    counts = {"x": 7, "y": 2, "z": 0}
    t = sum(counts.values())
    total = 0.0
    for w, c in counts.items():
        ia = (c + 1) * (t + V)
        ib = (c + 1) * (t + V)
        ln2a = round(math.log(2 * ia), 6)
        lnab = round(math.log(ia + ib), 6)
        assert math.isclose(ln2a, lnab)
        pa = (c + 1) / (t + V)
        total += round((pa * (ln2a - lnab)) * 2 / 2.0, 6)
    assert total == 0.0


# ---------------------------------------------------------------------------
# dq-reconciliation
# ---------------------------------------------------------------------------


def test_reconciliation_matches_python_replay(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
        .collect()
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    )

    def d6(x) -> Decimal:
        return Decimal(f"{x:.6f}")

    rec: dict = defaultdict(Decimal)
    seen = set()
    for r in li:
        charge = d6(r.l_extendedprice) * (1 - d6(r.l_discount))
        # pin at scale 12 exactly like the (19,12) cast, then × (1+tax)
        charge = charge.quantize(Decimal("1E-12"))
        charge = charge * (1 + d6(r.l_tax))
        rec[r.l_orderkey] += charge
        seen.add(r.l_orderkey)
    agg: dict = defaultdict(
        lambda: {
            "n": 0,
            "no_lines": 0,
            "mismatch": 0,
            "hdr": Decimal(0),
            "rec": Decimal(0),
            "abs": Decimal(0),
            "max": Decimal(0),
        }
    )
    for o in orders:
        a = agg[o.o_orderstatus]
        a["n"] += 1
        hdr = d6(o.o_totalprice)
        a["hdr"] += hdr
        if o.o_orderkey not in seen:
            a["no_lines"] += 1
            continue
        r = rec[o.o_orderkey]
        a["rec"] += r
        diff = abs(hdr - r)
        a["abs"] += diff
        a["max"] = max(a["max"], diff)
        if diff > Decimal("0.005"):
            a["mismatch"] += 1
    rows = {r.orderstatus: r for r in QUERIES["dq-reconciliation"](spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for st, a in agg.items():
        r = rows[st]
        assert r.n_orders == a["n"]
        assert r.n_no_lines == a["no_lines"]
        assert r.n_mismatch == a["mismatch"]
        assert math.isclose(r.sum_header, float(a["hdr"]), abs_tol=1e-6)
        assert r.sum_recomputed == float(round(a["rec"], 2))
        assert r.sum_absdiff == float(round(a["abs"], 2))
        assert r.max_absdiff == float(round(a["max"], 2))


def test_reconciliation_conservation(spark, sf_dir):
    """Row conservation: status-grain order counts must sum to the
    orders rowcount, and no-lines counts to the anti-join cardinality."""
    rows = QUERIES["dq-reconciliation"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r.n_orders for r in rows) == orders.count()
    n_orphan = orders.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
        "o_orderkey",
        "left_anti",
    ).count()
    assert sum(r.n_no_lines for r in rows) == n_orphan
    for r in rows:
        assert r.n_mismatch <= r.n_orders - r.n_no_lines
        assert r.max_absdiff <= r.sum_absdiff + 1e-9
