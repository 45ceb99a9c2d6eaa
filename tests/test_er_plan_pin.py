"""Plan pin for the ER pair join (round-8 PassJoin form): the
verify-bearing candidate join must be keyed on the pigeonhole SEGMENT
(candidates ≈ matches, no block-size² mass) and run under a SHUFFLED
join — a broadcast build would bound the verify parallelism by the
probe side's task count (PERF.md 'broadcast-probe trap')."""

from __future__ import annotations

import re

from merl_etl_spark.registry import QUERIES, load_all

load_all()


def _plan(spark, sf_dir) -> str:
    return (
        QUERIES["link-fuzzy-match"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_fuzzy_candidate_join_is_shuffled_and_segment_keyed(spark, sf_dir):
    plan = _plan(spark, sf_dir)
    shuffled = [
        ln for ln in plan.splitlines()
        if "ShuffledHashJoin" in ln or "SortMergeJoin" in ln
    ]
    assert shuffled, plan[:2000]
    # the main candidate join's key must include the exploded segment
    # text (seg#N) — the PassJoin property that keeps candidate volume
    # output-bound instead of block²
    assert any(re.search(r"\bseg#\d+", ln) for ln in shuffled), shuffled


def test_fuzzy_levenshtein_join_not_broadcast(spark, sf_dir):
    """Broadcast joins are allowed only for the bounded short-name arm
    (names shorter than t+1 chars — a degenerate sliver); the segment
    join itself must never broadcast."""
    plan = _plan(spark, sf_dir)
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln:
            assert not re.search(r"\bseg#\d+", ln), ln
