"""Semantic tests for the round-13 wave-3 operators: PCM sliding-window
energy and the per-source Pareto-frontier skyline.  Full numpy/Python
replays plus analytic pins on constructed inputs."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from pyspark.sql import functions as F

from merl_etl_spark.operators.multimodal import PCM_HOP, PCM_WIN
from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


# ---------------------------------------------------------------------------
# mm-pcm-window-energy
# ---------------------------------------------------------------------------


def _pcm_replay(payload: bytes):
    s = np.frombuffer(payload, np.uint8).astype(np.int64) - 128
    n = len(s)
    e = s * s
    frames = []
    f = 0
    while f * PCM_HOP < n:
        frames.append(int(e[f * PCM_HOP : f * PCM_HOP + PCM_WIN].sum()))
        f += 1
    peak = max(range(len(frames)), key=lambda i: (frames[i], -i))
    return (n, len(frames), peak, frames[peak], int(e.sum()))


def test_pcm_energy_matches_numpy_replay(spark, sf_dir):
    docs = {
        r.doc_id: r.text.encode()
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .collect()
        if len(r.text.encode()) == len(r.text) and len(r.text) > 0
    }
    exp = {d: _pcm_replay(p) for d, p in docs.items()}
    got = {
        r.doc_id: (r.n_samples, r.n_frames, r.peak_frame, r.peak_energy,
                   r.total_energy)
        for r in QUERIES["mm-pcm-window-energy"](spark, sf_dir).collect()
    }
    assert got == exp


def test_pcm_energy_analytic_pin(spark):
    """A constructed two-tone 'signal': 300 quiet bytes (value 128 ->
    energy 0) then 300 loud bytes (value 228 -> energy 100^2 each).
    Frame math is checkable by hand: windows are 256 samples every 128;
    the loudest full window sits entirely in the loud region."""
    from merl_etl_spark.operators.multimodal import pcm_window_energy_plan

    payload = bytes([128] * 300 + [228] * 300)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    r = pcm_window_energy_plan(df).collect()[0]
    assert r.n_samples == 600
    assert r.n_frames == (600 - 1) // PCM_HOP + 1  # 5 frames
    # frame 3 covers samples [384, 600) -> 216 loud samples;
    # frame 2 covers [256, 512) -> 212 loud; frame 4 covers [512, 600)
    # -> 88 loud.  Peak is frame 3 with 216 * 100^2.
    assert r.peak_frame == 3
    assert r.peak_energy == 216 * 100 * 100
    assert r.total_energy == 300 * 100 * 100


def test_pcm_energy_tie_takes_first_frame(spark):
    """Two identical loud bursts -> two frames with equal energy; the
    FIRST must win (numpy argmax == oracle min(f))."""
    from merl_etl_spark.operators.multimodal import pcm_window_energy_plan

    burst = [228] * 128
    quiet = [128] * 128
    # frames at 0,128,256,384: frame 0 = burst+quiet, frame 2 = burst+quiet
    payload = bytes(burst + quiet + burst + quiet)
    df = spark.createDataFrame([(7, bytearray(payload))],
                               "doc_id long, payload binary")
    r = pcm_window_energy_plan(df).collect()[0]
    assert r.peak_frame == 0
    assert r.peak_energy == 128 * 100 * 100


# ---------------------------------------------------------------------------
# curate-pareto-frontier
# ---------------------------------------------------------------------------


def _frontier_replay(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", "text")
        .collect()
    )
    objs = []
    for r in docs:
        words = [w for w in r.text.split(" ") if w != ""]
        if words:
            objs.append((r.doc_id, r.source, len(words), len(set(words))))
    by_src = defaultdict(list)
    for rec in objs:
        by_src[rec[1]].append(rec)
    keep = set()
    for source, rows in by_src.items():
        for d1 in rows:  # quadratic ground truth — fixture-scale only
            dominated = any(
                d2[2] > d1[2] and d2[3] > d1[3] for d2 in rows
            )
            if not dominated:
                keep.add((d1[0], d1[1], d1[2], d1[3]))
    return keep


def test_pareto_frontier_matches_quadratic_ground_truth(spark, sf_dir):
    """The band-rollup skyline must equal the O(n²) literal dominance
    check — the equivalence proof that the running-max trick implements
    strict two-objective dominance exactly."""
    exp = _frontier_replay(spark, sf_dir)
    got = {
        (r.doc_id, r.source, r.n_tokens, r.n_distinct)
        for r in QUERIES["curate-pareto-frontier"](spark, sf_dir).collect()
    }
    assert got == exp


def test_pareto_frontier_strictness_on_constructed_set(spark):
    """Hand-built objective set: ties on one axis never dominate; a doc
    beaten on both axes is dropped; incomparable docs all survive."""
    import tempfile

    from merl_etl_spark.operators.curation_ext import curate_pareto_frontier

    rows = [
        # (doc_id, tokens..., distinct target) encoded as actual text
        (1, "a b c d e", "s"),        # 5 tokens, 5 distinct  — frontier
        (2, "a a b b c c", "s"),      # 6 tokens, 3 distinct  — frontier
        (3, "a a b c", "s"),          # 4 tokens, 3 distinct  — dominated by 1
        (4, "a b c", "s"),            # 3 tokens, 3 distinct  — dominated by 1
        (5, "x x y y z z", "t"),      # other source: 6 tok, 3 distinct — frontier
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t, s, "en") for i, t, s in rows],
            "doc_id long, text string, source string, lang string",
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {r.doc_id for r in curate_pareto_frontier(spark, tmp).collect()}
    assert got == {1, 2, 5}
