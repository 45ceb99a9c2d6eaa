"""Plan gate: dq-referential must scan each table once per FK relation
(VERDICT r14 #7, strengthened in r15).

The r14 form computed the child rollup once and fanned it into an
anti-join arm and a totals arm, assuming the duplicated subtrees would
bottom out at an identical exchange that exchange reuse dedups.  The
assumption was false: Catalyst pushes a left-anti join BELOW an
aggregate (PushDownLeftSemiAntiJoin) and the isnotnull filter into the
scan, so the arms diverged and every child table was scanned and
key-rolled TWICE per relation.  r15 rewrote the audit as one left join
+ conditional sums, and this gate pins the resulting invariant directly:
exactly ONE FileScan per table reference (child + parent per relation),
so a future edit that re-splits the audit into diverging arms fails
here instead of silently doubling the 100 TB fact scans.
"""

from __future__ import annotations

from merl_etl_spark.operators.quality import _FK_RELATIONS, dq_referential


def _collect(node, pred, out):
    if pred(node):
        out.append(node)
    children = node.children()
    for i in range(children.size()):
        _collect(children.apply(i), pred, out)


def _prepared_plan(df):
    # executedPlan() is AdaptiveSparkPlanExec (childless until run) and
    # sparkPlan() predates EnsureRequirements (no exchanges inserted
    # yet); the AQE root's initialPlan is the prepared pre-execution
    # plan that carries the real scan/exchange nodes
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.initialPlan()
    return plan


def test_one_scan_per_table_reference(spark, sf_dir):
    df = dq_referential(spark, sf_dir)
    plan = _prepared_plan(df)
    scans = []
    _collect(plan, lambda n: n.nodeName().startswith("Scan parquet"), scans)
    want = 2 * len(_FK_RELATIONS)  # one child + one parent per relation
    assert len(scans) == want, (
        f"expected {want} parquet scans (child + parent per FK relation), "
        f"found {len(scans)} — an audit arm has re-split and a table "
        "will be scanned more than once per relation"
    )


def test_no_nested_loop_join(spark, sf_dir):
    df = dq_referential(spark, sf_dir)
    plan = _prepared_plan(df)
    bad = []
    _collect(
        plan,
        lambda n: n.nodeName()
        in ("BroadcastNestedLoopJoin", "CartesianProduct"),
        bad,
    )
    assert not bad, f"unexpected nested-loop joins: {[n.nodeName() for n in bad]}"
