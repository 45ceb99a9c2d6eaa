"""Plan pin for the ER pair join: the quadratic in-block comparison must
run under a SHUFFLED join (salt-spread reducers), never a broadcast —
a broadcast build bounds the compare parallelism by the probe side's
file-split count (PERF.md 'broadcast-probe trap')."""

from __future__ import annotations

from merl_etl_spark.registry import QUERIES, load_all

load_all()


def test_fuzzy_pair_join_is_shuffled_not_broadcast(spark, sf_dir):
    plan = (
        QUERIES["link-fuzzy-match"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan[:2000]
    # the levenshtein-bearing pair join must not be broadcast; dimension
    # broadcasts elsewhere in the plan would be fine, but this query has
    # only the one join
    assert "BroadcastHashJoin" not in plan, plan[:2000]


def test_fuzzy_pair_join_carries_salt_key(spark, sf_dir):
    plan = (
        QUERIES["link-fuzzy-match"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "salt" in plan, "salted physical key missing from the pair join"
