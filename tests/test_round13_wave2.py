"""Semantic tests for the round-13 wave-2 operators: CCNet-style
LM-score tertile bucketing and the feed temporal-coverage audit.
Full Python replays (the wave-gate rule), plus semantic invariants."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _half_away(x: float, dp: int) -> float:
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP
        )
    )


# ---------------------------------------------------------------------------
# curate-ccnet-buckets
# ---------------------------------------------------------------------------


def _lm_scores_replay(spark, sf_dir):
    """Per-doc (n_bigrams, score4) under the corpus bigram model —
    mirrors lm_doc_scores in plain Python."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .collect()
    )
    tok_re = re.compile(r"[a-z]+")
    doc_bigrams: dict[int, list] = {}
    cb: Counter = Counter()
    cu: Counter = Counter()
    vocab = set()
    for r in docs:
        toks = tok_re.findall((r.text or "").lower())
        vocab.update(toks)
        bgs = list(zip(toks, toks[1:]))
        doc_bigrams[r.doc_id] = bgs
        cb.update(bgs)
        cu.update(w1 for w1, _ in bgs)
    V = len(vocab)
    out = {}
    src = {r.doc_id: r.source for r in docs}
    for doc_id, bgs in doc_bigrams.items():
        if not bgs:
            continue
        avg = sum(
            math.log((cb[bg] + 1) / (cu[bg[0]] + V)) for bg in bgs
        ) / len(bgs)
        score4 = int(_half_away(_half_away(avg, 4) * 10000, 0))
        out[doc_id] = (src[doc_id], len(bgs), score4)
    return out


def _ccnet_replay(spark, sf_dir):
    scores = _lm_scores_replay(spark, sf_dir)
    per_source: dict[str, list] = defaultdict(list)
    for source, n_big, score4 in scores.values():
        if source is not None:
            per_source[source].append((score4, n_big))
    exp = {}
    for source, rows in per_source.items():
        n = len(rows)
        bands = Counter(s for s, _ in rows)
        cum = 0
        t1 = t2 = None
        for s in sorted(bands):
            cum += bands[s]
            if t1 is None and cum * 3 >= n:
                t1 = s
            if t2 is None and cum * 3 >= 2 * n:
                t2 = s
        agg: dict[str, list] = defaultdict(lambda: [0, 0, None, None])
        for s, n_big in rows:
            b = "tail" if s <= t1 else ("middle" if s <= t2 else "head")
            a = agg[b]
            a[0] += 1
            a[1] += n_big
            a[2] = s if a[2] is None else min(a[2], s)
            a[3] = s if a[3] is None else max(a[3], s)
        for b, a in agg.items():
            exp[(source, b)] = tuple(a)
    return exp


def test_ccnet_buckets_match_python_replay(spark, sf_dir):
    exp = _ccnet_replay(spark, sf_dir)
    got = {
        (r.source, r.bucket): (r.n_docs, r.n_bigrams, r.lo_score4, r.hi_score4)
        for r in QUERIES["curate-ccnet-buckets"](spark, sf_dir).collect()
    }
    assert got == exp


def test_ccnet_buckets_are_ordered_thirds(spark, sf_dir):
    """Bucket score ranges must be disjoint and ordered tail < middle <
    head, and each bucket must hold between ~1/6 and ~2/3 of the docs
    (the threshold rule can deviate from n/3 only through ties)."""
    rows = QUERIES["curate-ccnet-buckets"](spark, sf_dir).collect()
    by_src = defaultdict(dict)
    for r in rows:
        by_src[r.source][r.bucket] = r
    for source, bk in by_src.items():
        assert set(bk) == {"tail", "middle", "head"}, (source, set(bk))
        assert bk["tail"].hi_score4 < bk["middle"].lo_score4
        assert bk["middle"].hi_score4 < bk["head"].lo_score4
        n = sum(r.n_docs for r in bk.values())
        for b in ("tail", "middle", "head"):
            assert n / 6 <= bk[b].n_docs <= 2 * n / 3, (source, b, bk[b].n_docs, n)


# ---------------------------------------------------------------------------
# dq-temporal-coverage
# ---------------------------------------------------------------------------


def _coverage_replay(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    import datetime

    epoch = datetime.date(1970, 1, 1)
    per_type: dict[str, Counter] = defaultdict(Counter)
    for r in ev:
        per_type[r.event_type][(r.day - epoch).days] += 1
    exp = {}
    for et, days in per_type.items():
        ds = sorted(days)
        steps = [b - a for a, b in zip(ds, ds[1:])]
        span = ds[-1] - ds[0] + 1
        exp[et] = (
            len(ds),
            span,
            len(ds) * 1_000_000 // span,
            max(steps) if steps else 1,
            sum(days.values()),
            ds[0],
            ds[-1],
        )
    return exp


def test_temporal_coverage_matches_python_replay(spark, sf_dir):
    exp = _coverage_replay(spark, sf_dir)
    got = {
        r.event_type: (
            r.n_days_covered,
            r.span_days,
            r.coverage_ppm,
            r.max_day_step,
            r.n_events,
            r.first_day,
            r.last_day,
        )
        for r in QUERIES["dq-temporal-coverage"](spark, sf_dir).collect()
    }
    assert got == exp


def test_temporal_coverage_detects_planted_gap(spark):
    """A feed with a hole must report it: synthetic events covering days
    0-9 except 4-6 -> 7 covered days, span 10, max step 4."""
    import tempfile

    from merl_etl_spark.operators.quality import dq_temporal_coverage

    rows = [
        (i, f"2024-01-{d + 1:02d} 12:00:00", 1, "gappy", 1.0, "{}")
        for i, d in enumerate([0, 1, 2, 3, 7, 8, 9])
    ] + [(100 + d, f"2024-01-{d + 1:02d} 12:00:00", 1, "dense", 1.0, "{}") for d in range(10)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/events.parquet")
        got = {r.event_type: r for r in dq_temporal_coverage(spark, tmp).collect()}
    g = got["gappy"]
    assert (g.n_days_covered, g.span_days, g.max_day_step) == (7, 10, 4)
    assert g.coverage_ppm == 700_000
    d = got["dense"]
    assert (d.n_days_covered, d.span_days, d.max_day_step) == (10, 10, 1)
    assert d.coverage_ppm == 1_000_000
