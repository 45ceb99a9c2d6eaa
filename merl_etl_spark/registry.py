"""Query registry — the single source of truth behind ``__spark_entry__``.

Every operator module registers its driver-checkable queries here with
``@register("op-id", oracle="SELECT ...")``.  The op IDs are the stable
identifiers from SURVEY.md §2; the oracle is the equivalent ANSI SQL that
DuckDB runs on the same parquet fixtures.  Ops whose semantics DuckDB
cannot express (custom stateful streaming, iterative algorithms) register
without an oracle and get the driver's weaker rows-only check.

Determinism rules (SURVEY.md §5.2) enforced by convention here:
- every computed column is aliased identically in the Spark plan and the SQL;
- timestamps are emitted as formatted strings (sidesteps tz/driver-repr);
- money math is done in DecimalType (exact, order-insensitive sums) —
  double sums would differ across partition orders and break value hashes;
- every ranked/limited query carries a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Driver-sweep priority (VERDICT r3 "Next round" #2).  The external driver
# oracles only the first ~50 registered queries per round, so ordering is a
# correctness-coverage decision, not cosmetics.  Tiers, most urgent first:
#   1. churn — queries whose code changed since their last driver-green
#      round (a green row on old code is stale evidence);
#   2. new — queries that have never had a driver CORRECTNESS row;
#   3. stale-green — queries whose latest driver green is ≥2 rounds old.
# Queries NOT listed here keep their module registration order and fill the
# remaining budget.  Update per round: move anything you modify into tier 1.
SWEEP_PRIORITY: list[str] = [
    # ROUND 7 = consolidation (VERDICT r6 "Next round" #1): the 39 queries
    # that have never had a driver CORRECTNESS row, plus sim-ivf-ann
    # (rows-only, last row r4) and the 7 stale-r4 greens, fill the budget.
    # NO new queries enter ahead of this block.
    #
    # -- tier 1: never driver-checked AND code churned in round 7 --------
    "link-fuzzy-match",          # linkage prefilter (VERDICT r6 task #2)
    "link-golden-record",        # rides the same blocked_fuzzy_pairs
    "win-frame-suite",           # ADVICE r6: drop round() tie risk
    "analytics-market-share",    # ADVICE r6: NULLIF denominator guard
    "src-jsonl-corrupt",         # ADVICE r6: fixture cache-key fix
    # -- tier 1b: driver-green r6 but code churned in round 7 ------------
    "sim-topk-pandas",           # query side generalized to a DataFrame
    # -- tier 2: never driver-checked (round-6 extension tiers) ----------
    "analytics-funnel", "dedup-paragraph", "cdc-scd2-history",
    "ts-twap", "analytics-retention-cohort",
    "graph-pagerank", "text-lm-score", "stream-session-window",
    "agg-countmin", "agg-heavy-hitters", "ts-ohlc-bars",
    "win-cumulative-distinct", "graph-triangles",
    "join-interval-overlap", "curate-shuffle-index",
    "analytics-basket-affinity", "profile-dataset-card", "sim-knn-graph",
    "fn-url-suite", "curate-url-dedup", "join-asof-tolerance",
    "win-streak", "curate-semdedup-keep",
    "analytics-small-qty-revenue", "analytics-customer-distribution",
    "proj-unpivot", "agg-mv-merge", "text-bpe-step", "dedup-normalized",
    "agg-k-anonymity", "join-asof-keyed", "analytics-disjunctive-filter",
    "fn-regex-suite", "dq-sequence-gaps",
    # -- tier 2b: rows-only op, last driver row r4 -----------------------
    "sim-ivf-ann",
    # -- tier 3: latest driver green is round 4 (code untouched since;
    #    hypothesis properties green every round) -----------------------
    "text-ngram-counts", "text-pii-scrub", "text-fingerprint",
    "fn-string-suite", "fn-format-suite", "fn-json-suite",
    "sample-hash-split",
]

# Budget triage (round 7): the prioritized block is 48 entries, so the
# first ~2 SWEEP_DEFER entries land in the driver's ~50-slot budget as
# churn insurance.  The defer list is the round-8 priority seed: all 48
# r5-latest-green queries, which will be two rounds stale by then —
# numerically sensitive window/as-of suites lead so they pick up this
# round's spare slots.
SWEEP_DEFER: list[str] = [
    "win-analytic-suite", "join-asof-blocktime",
    "win-sessionize", "join-asof", "join-asof-forward",
    "join-range-interval", "agg-conditional-flow",
    "agg-conditional-flow-coalesce", "agg-pivot", "agg-rollup", "agg-cube",
    "agg-max-scalar", "agg-count-rows", "agg-scalar-rollup",
    "agg-greatest-rowwise", "agg-running-max",
    "cdc-snapshot-diff", "dedup-incremental",
    "analytics-pricing-summary", "analytics-shipping-priority",
    "analytics-regional-volume",
    "join-cross-1row", "join-semi-top100", "join-outer-anti",
    "win-rank-top100", "sort-topk-rank100", "plan-top100-derive",
    "sort-limit-top10", "sort-movers-multi", "filter-time-window",
    "stream-tumbling-6h", "stream-sliding-60m", "stream-cursor-resume",
    "sink-upsert-holders", "sink-insert-ignore-tx", "sink-upsert-cursor",
    "sink-view", "fn-vector-suite",
    "src-datasource-paged", "src-blockcursor-replay",
    "mm-binary-meta", "mm-frame-sample", "mm-resize-plan",
    "mm-feature-extract",
    "curate-token-pack", "sample-stratified", "curate-mixture-weights",
    "curate-corpus-pipeline",
]


def _apply_sweep_priority() -> None:
    """Rebuild QUERIES/ORACLES so SWEEP_PRIORITY entries come first (in
    listed order), then SWEEP_DEFER (the documented just-past-budget
    block), then everything else in registration order."""
    prioritized = [q for q in SWEEP_PRIORITY + SWEEP_DEFER if q in QUERIES]
    prio_set = set(prioritized)
    rest = [q for q in QUERIES if q not in prio_set]
    for mapping in (QUERIES, ORACLES):
        ordered = {q: mapping[q] for q in prioritized + rest if q in mapping}
        mapping.clear()
        mapping.update(ordered)


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent), then put
    the registry in driver-sweep order.

    Earlier rounds encoded the sweep order in the import sequence below;
    that was fragile (transitive imports interleave registration), so the
    order is now applied explicitly by ``_apply_sweep_priority`` after all
    modules have loaded — the import list no longer carries meaning beyond
    "load everything".  The invariant — every churned/new/stale-green
    query sits within the driver's ~50-query budget — is asserted by
    tests/test_registry_order.py."""
    import merl_etl_spark.sources.datasource  # noqa: F401
    import merl_etl_spark.operators.multimodal  # noqa: F401
    import merl_etl_spark.operators.curation  # noqa: F401
    import merl_etl_spark.operators.curation_ext  # noqa: F401
    import merl_etl_spark.operators.incremental  # noqa: F401
    import merl_etl_spark.operators.sql_api  # noqa: F401
    import merl_etl_spark.operators.setops  # noqa: F401
    import merl_etl_spark.operators.analytics  # noqa: F401
    import merl_etl_spark.operators.windows_analytic  # noqa: F401
    import merl_etl_spark.sinks  # noqa: F401
    import merl_etl_spark.plans.jobs  # noqa: F401
    import merl_etl_spark.operators.dedup  # noqa: F401
    import merl_etl_spark.operators.ranking  # noqa: F401
    import merl_etl_spark.operators.joins  # noqa: F401
    import merl_etl_spark.operators.aggregates  # noqa: F401
    import merl_etl_spark.operators.sorts  # noqa: F401
    import merl_etl_spark.functions.scalar_queries  # noqa: F401
    import merl_etl_spark.functions.json_queries  # noqa: F401
    import merl_etl_spark.functions.uint256  # noqa: F401
    import merl_etl_spark.operators.windows_time  # noqa: F401
    import merl_etl_spark.operators.projections  # noqa: F401
    import merl_etl_spark.operators.asof  # noqa: F401
    import merl_etl_spark.operators.similarity  # noqa: F401
    import merl_etl_spark.operators.text_analysis  # noqa: F401
    import merl_etl_spark.operators.profiling  # noqa: F401
    import merl_etl_spark.operators.retrieval  # noqa: F401
    import merl_etl_spark.operators.quality  # noqa: F401
    import merl_etl_spark.operators.timeseries  # noqa: F401
    import merl_etl_spark.operators.graph  # noqa: F401
    import merl_etl_spark.operators.linkage  # noqa: F401
    import merl_etl_spark.operators.lm  # noqa: F401
    import merl_etl_spark.operators.freq  # noqa: F401
    import merl_etl_spark.operators.intervals  # noqa: F401
    import merl_etl_spark.operators.web  # noqa: F401
    import merl_etl_spark.sources.textfiles  # noqa: F401

    _apply_sweep_priority()
