"""Lineage-cut knob (ARCHITECTURE.md "Lineage cuts"): the reliable-
checkpoint mode must be a pure execution-strategy swap — identical
results to the default executor-local mode."""

from __future__ import annotations

from merl_etl_spark.lineage import RELIABLE_CONF
from merl_etl_spark.registry import QUERIES, load_all

load_all()


def test_reliable_checkpoint_mode_is_equivalent(spark, sf_dir, tmp_path):
    # dedup-clusters exercises cut_lineage twice (edge materialization +
    # per-iteration label cut in connected_components)
    base = sorted(map(tuple, QUERIES["dedup-clusters"](spark, sf_dir).collect()))
    spark.sparkContext.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        rel = sorted(map(tuple, QUERIES["dedup-clusters"](spark, sf_dir).collect()))
    finally:
        spark.conf.unset(RELIABLE_CONF)
    assert base == rel
