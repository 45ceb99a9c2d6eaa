"""Semantic tests for the round-9 work: the sharded ts-moving-stats
execution mode (the ts-ewma chunked-overlap pattern generalized to a
bounded RANGE frame) and the transcendental determinism canary."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all

load_all()


# ---------------------------------------------------------------------------
# ts-moving-stats sharded mode
# ---------------------------------------------------------------------------

def _movstats_rows(spark, sf_dir):
    return sorted(
        (r["event_type"], r["event_id"], r["ts_str"], r["mov_n"], r["mov_sum"])
        for r in QUERIES["ts-moving-stats"](spark, sf_dir).collect()
    )


def test_movstats_sharded_mode_equals_default(spark, sf_dir):
    """The time-bucketed carry plan (spark.merl.movstats.sharded=true)
    must be BIT-identical to the per-series RANGE window: every row's
    trailing 3600 s lives entirely inside its (series, shard) partition
    because rows in the last FRAME seconds of a shard are carried into
    the next one, and both modes sum the same exact decimals."""
    from merl_etl_spark.operators.timeseries import MOVSTATS_SHARDED_CONF

    spark.conf.set(MOVSTATS_SHARDED_CONF, "true")
    try:
        sharded = _movstats_rows(spark, sf_dir)
    finally:
        spark.conf.set(MOVSTATS_SHARDED_CONF, "false")
    default = _movstats_rows(spark, sf_dir)
    assert len(sharded) == len(default) > 0
    assert sharded == default


def test_movstats_sharded_null_ts_and_narrow_bucket(spark, sf_dir):
    """(1) null-ts rows must survive sharding (they collapse into one
    NULL shard per series — the same all-nulls frame group the default
    RANGE window forms); (2) a shard narrower than the frame fails
    loudly; (3) a non-default width (exactly the frame) still matches,
    including rows that sit exactly ON a shard boundary."""
    import merl_etl_spark.operators.timeseries as ts_mod
    from merl_etl_spark.operators.timeseries import (
        MOVSTATS_BUCKET_CONF,
        MOVSTATS_SHARDED_CONF,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        # irregular spacing incl. exact multiples of 3600 s from base so
        # several events land exactly on shard boundaries
        (i, "a" if i % 3 else "b", base + dt.timedelta(seconds=(i * 977) % 90000),
         float(i % 11))
        for i in range(1, 400)
    ]
    rows += [(901, "a", None, 5.0), (902, "a", None, 7.0), (903, "b", None, 1.0)]
    synth = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    orig = ts_mod.load_table
    ts_mod.load_table = lambda s, d, n: synth
    try:
        def run():
            return _movstats_rows(spark, "unused")

        spark.conf.set(MOVSTATS_SHARDED_CONF, "false")
        default = run()
        assert len(default) == 402
        spark.conf.set(MOVSTATS_SHARDED_CONF, "true")
        assert run() == default
        spark.conf.set(MOVSTATS_BUCKET_CONF, "3600")
        assert run() == default
        spark.conf.set(MOVSTATS_BUCKET_CONF, "1800")
        with pytest.raises(ValueError, match="spark.merl.movstats.bucket"):
            QUERIES["ts-moving-stats"](spark, "unused")
    finally:
        ts_mod.load_table = orig
        spark.conf.set(MOVSTATS_SHARDED_CONF, "false")
        spark.conf.set(MOVSTATS_BUCKET_CONF, str(4 * 3600))
    # null-ts rows: frame group = all null rows of the series
    null_rows = [r for r in default if r[2] is None]
    assert {(r[0], r[3]) for r in null_rows} == {("a", 2), ("b", 1)}


# ---------------------------------------------------------------------------
# fn-transcendental-canary
# ---------------------------------------------------------------------------

def test_canary_covers_every_class_once(spark, sf_dir):
    """One row per case, every transcendental class present, and the
    values are finite non-null decimals — the canary must never be the
    thing that flakes."""
    out = QUERIES["fn-transcendental-canary"](spark, sf_dir).collect()
    ids = [r["case_id"] for r in out]
    assert len(ids) == len(set(ids))
    for prefix in ("ln_int_", "ln_ratio_", "sqrt_", "pow_", "exp_"):
        assert any(i.startswith(prefix) for i in ids), prefix
    assert all(r["val"] is not None for r in out)


def test_canary_known_values(spark, sf_dir):
    """Pin a few values analytically so a fixture-independent regression
    (e.g. someone re-typing an expression) is caught locally, not by the
    driver."""
    import math
    from decimal import Decimal

    vals = {
        r["case_id"]: r["val"]
        for r in QUERIES["fn-transcendental-canary"](spark, sf_dir).collect()
    }
    assert vals["ln_int_2"] == Decimal(str(round(math.log(2), 6)))
    assert vals["sqrt_2"] == Decimal(str(round(math.sqrt(2), 6)))
    assert vals["exp_1"] == Decimal(str(round(math.e, 6)))
