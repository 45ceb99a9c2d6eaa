"""Semantic tests for the round-8 extension operators (EWMA, Markov
transitions, Gopher rules, DSIR weighting, substring-span dedup) — the
oracle-parity suite pins cross-engine equality; these pin *semantics*:
invariants that hold by construction of the operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all

load_all()


# ---------------------------------------------------------------------------
# ts-ewma
# ---------------------------------------------------------------------------

def test_ewma_first_row_equals_value_and_stays_in_range(spark, sf_dir):
    """The first observation of every series is its own EWMA (single tap,
    weight 1), and every EWMA is a convex combination of observed values,
    so it must stay inside the series' [min, max] envelope."""
    out = QUERIES["ts-ewma"](spark, sf_dir)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    first = (
        events.groupBy("event_type")
        .agg(F.min(F.struct("ts", "event_id", "value")).alias("s"))
        .select("event_type", F.col("s.event_id").alias("event_id"), F.col("s.value").alias("v"))
    )
    j = out.join(first, ["event_type", "event_id"]).select("v", "ewma").collect()
    assert j, "no first rows matched"
    for r in j:
        assert abs(r["ewma"] - r["v"]) < 1e-6, (r["v"], r["ewma"])
    env = events.groupBy("event_type").agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bad = (
        out.join(env, "event_type")
        .where((F.col("ewma") < F.col("lo") - 1e-6) | (F.col("ewma") > F.col("hi") + 1e-6))
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------------------------
# analytics-markov-transitions
# ---------------------------------------------------------------------------

def test_markov_rows_are_distributions_and_mass_balances(spark, sf_dir):
    """Per-prev-type probabilities sum to 1, and the matrix's total count
    equals (events - users): each user with k events contributes k-1
    transitions."""
    out = QUERIES["analytics-markov-transitions"](spark, sf_dir)
    sums = out.groupBy("prev_type").agg(F.sum("p").alias("sp"), F.sum("n").alias("sn")).collect()
    assert sums
    for r in sums:
        assert abs(r["sp"] - 1.0) < 1e-9, r
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r["sn"] for r in sums) == n_events - n_users


# ---------------------------------------------------------------------------
# text-gopher-rules
# ---------------------------------------------------------------------------

def test_gopher_keep_is_conjunction_of_flags(spark, sf_dir):
    out = QUERIES["text-gopher-rules"](spark, sf_dir)
    flags = ["ok_word_count", "ok_mean_word_len", "ok_symbol_ratio", "ok_alpha_words", "ok_stop_words"]
    conj = F.lit(True)
    for f in flags:
        conj = conj & F.col(f)
    assert out.where(F.col("keep") != conj).count() == 0
    # the rule set must actually discriminate on the fixture (mixed
    # langs → the alpha/stopword rules split the corpus)
    kept = out.where("keep").count()
    total = out.count()
    assert 0 < kept < total, (kept, total)


def test_gopher_ratio_columns_are_consistent(spark, sf_dir):
    """The emitted ratio columns must agree with their own flags — the
    flags are thresholded forms of the published ratios, so a reader can
    re-derive every decision from the row itself."""
    out = QUERIES["text-gopher-rules"](spark, sf_dir)
    bad = out.where(
        (F.col("ok_mean_word_len") != F.col("mean_word_len").between(3.0, 10.0))
        | (F.col("ok_alpha_words") != (F.col("alpha_word_ratio") >= 0.8))
        | (F.col("ok_stop_words") != (F.col("n_stop_distinct") >= 2))
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# curate-dsir
# ---------------------------------------------------------------------------

def test_dsir_weights_separate_target_from_raw(spark, sf_dir):
    """The point of importance weighting: target-language docs must score
    higher on average than raw docs (their bigrams are over-represented
    in the target distribution)."""
    out = QUERIES["curate-dsir"](spark, sf_dir)
    avgs = {
        r["is_target"]: r["aw"]
        for r in out.groupBy("is_target")
        .agg(F.avg(F.col("dsir_weight").cast("double")).alias("aw"))
        .collect()
    }
    assert set(avgs) == {True, False}
    assert avgs[True] > avgs[False]


def test_dsir_target_flag_matches_lang(spark, sf_dir):
    out = QUERIES["curate-dsir"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    bad = (
        out.join(docs, "doc_id")
        .where(F.col("is_target") != (F.col("lang") == "en"))
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------------------------
# dedup-substring
# ---------------------------------------------------------------------------

def test_substring_window_counts_and_dup_bounds(spark, sf_dir):
    """The per-doc window count must equal the closed-form
    floor((len-W)/stride)+1 for docs with len ≥ W (an independent pin on
    the sequence() emission), dup counts are bounded by window counts,
    dup_ratio is exactly their quotient, and the word-soup fixture must
    actually contain cross-document duplicated spans."""
    out = QUERIES["dedup-substring"](spark, sf_dir)
    assert out.where(F.col("n_dup_windows") > F.col("n_windows")).count() == 0
    assert out.where(F.col("max_span_docs") < 1).count() == 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.length("text") >= 40)
    expected = docs.select(
        "doc_id",
        (F.floor((F.length("text") - 40) / 10) + 1).cast("long").alias("exp_windows"),
    )
    assert out.count() == docs.count()
    assert out.join(expected, "doc_id").where(F.col("n_windows") != F.col("exp_windows")).count() == 0
    bad_ratio = out.where(
        F.abs(F.col("dup_ratio") - F.col("n_dup_windows") / F.col("n_windows")) > 1e-12
    ).count()
    assert bad_ratio == 0
    assert out.where(F.col("n_dup_windows") > 0).count() > 0, "no duplicated spans found"


# ---------------------------------------------------------------------------
# text-entropy
# ---------------------------------------------------------------------------

def test_entropy_bounds_and_degenerate_cases(spark, sf_dir):
    """0 ≤ H ≤ ln(n_distinct) (+rounding slack), entropy_norm ∈ [0, 1],
    and a uniform-unique document (all words distinct) must sit at the
    maximum: H = ln(n) exactly (every ln is rounded identically), norm
    = 1."""
    out = QUERIES["text-entropy"](spark, sf_dir)
    eps = 1e-5
    assert out.where(F.col("word_entropy") < -eps).count() == 0
    bad_hi = out.where(
        F.col("word_entropy") > F.log(F.col("n_distinct").cast("double")) + eps
    ).count()
    assert bad_hi == 0
    assert (
        out.where(F.col("entropy_norm").isNotNull())
        .where((F.col("entropy_norm") < -eps) | (F.col("entropy_norm") > 1 + eps))
        .count()
        == 0
    )
    uniq = out.where(F.col("n_distinct") == F.col("n_tokens")).where(F.col("n_tokens") > 1)
    if uniq.count():
        assert uniq.where(F.abs(F.col("entropy_norm") - 1.0) > eps).count() == 0


# ---------------------------------------------------------------------------
# dq-referential
# ---------------------------------------------------------------------------

def test_referential_consistent_fks_pass_and_planted_violation_fires(spark, sf_dir):
    """The TPC-H-consistent relations must report zero orphans; the
    deliberately-violated relation (parent restricted to even customer
    keys) must report orphans equal to the independently-computed count
    of events whose user_id is odd (odd keys were filtered out of the
    parent)."""
    out = {r["relation"]: r for r in QUERIES["dq-referential"](spark, sf_dir).collect()}
    assert len(out) == 5
    for rel, r in out.items():
        assert r["ok"] == (r["n_orphan_rows"] == 0)
        if "[even]" not in rel:
            assert r["n_orphan_rows"] == 0, rel
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected_orphans = events.where("user_id % 2 <> 0").count()
    bad = out["events.user_id->customer[even]"]
    assert bad["n_orphan_rows"] == expected_orphans
    assert not bad["ok"]


# ---------------------------------------------------------------------------
# text-winnowing
# ---------------------------------------------------------------------------

def test_winnowing_density_guarantee_and_bounds(spark, sf_dir):
    """Winnowing's density upper bound: at most one distinct fingerprint
    per window (n_kgrams - W + 1).  No positional LOWER bound survives
    the by-value dedup — repetitive text collapses many selected
    positions into one value (e.g. 'ab'*30 has a single fingerprint), so
    only >= 1 holds.  Shared counts are bounded by totals, and the
    word-soup fixture must share spans."""
    from merl_etl_spark.operators.text_analysis import WINNOW_W

    out = QUERIES["text-winnowing"](spark, sf_dir)
    windows = F.col("n_kgrams") - (WINNOW_W - 1)
    assert out.where(F.col("n_fingerprints") > windows).count() == 0
    assert out.where(F.col("n_fingerprints") < 1).count() == 0
    assert out.where(F.col("n_shared_fp") > F.col("n_fingerprints")).count() == 0
    assert out.where(F.col("n_shared_fp") > 0).count() > 0, "no shared fingerprints"


def test_ewma_sharded_mode_equals_default(spark, sf_dir):
    """The chunked-overlap sharded plan (spark.merl.ewma.sharded=true)
    must be BIT-identical to the per-series window: the carry rows give
    every chunk-local lag the same 11 predecessors the global window
    sees, and both modes share _ewma_taps, so even the rounding inputs
    are the same exact decimals."""
    from merl_etl_spark.operators.timeseries import EWMA_SHARDED_CONF

    def rows():
        return sorted(
            (r["event_type"], r["event_id"], r["ts_s"], r["ewma"])
            for r in QUERIES["ts-ewma"](spark, sf_dir).collect()
        )

    spark.conf.set(EWMA_SHARDED_CONF, "true")
    try:
        sharded = rows()
    finally:
        spark.conf.set(EWMA_SHARDED_CONF, "false")
    default = rows()
    assert len(sharded) == len(default) > 0
    assert sharded == default


def test_ewma_sharded_keeps_null_ts_rows_and_validates_bucket_unit(spark, sf_dir):
    """Review regression pins: (1) a null-ts row must survive sharded
    mode (the offsets join is null-safe; a plain equi-join dropped it);
    (2) the hour-granularity bucket produces the same answer; (3) an
    unknown bucket unit fails loudly."""
    import datetime as dt

    import pytest

    import merl_etl_spark.operators.timeseries as ts_mod
    from merl_etl_spark.operators.timeseries import (
        EWMA_BUCKET_CONF,
        EWMA_SHARDED_CONF,
    )

    rows = [
        (i, "a", dt.datetime(2024, 1, 1 + i % 5, 3, i % 50), float(i % 7))
        for i in range(1, 300)
    ]
    rows.append((999, "a", None, 42.0))
    synth = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    orig = ts_mod.load_table
    ts_mod.load_table = lambda s, d, n: synth
    try:
        def run():
            return sorted(
                (r["event_id"], r["ewma"])
                for r in QUERIES["ts-ewma"](spark, sf_dir).collect()
            )

        spark.conf.set(EWMA_SHARDED_CONF, "false")
        default = run()
        spark.conf.set(EWMA_SHARDED_CONF, "true")
        assert run() == default
        spark.conf.set(EWMA_BUCKET_CONF, "hour")
        assert run() == default
        spark.conf.set(EWMA_BUCKET_CONF, "fortnight")
        with pytest.raises(ValueError, match="spark.merl.ewma.bucket"):
            QUERIES["ts-ewma"](spark, sf_dir)
    finally:
        ts_mod.load_table = orig
        spark.conf.set(EWMA_SHARDED_CONF, "false")
        spark.conf.set(EWMA_BUCKET_CONF, "day")
    assert len(default) == 300
