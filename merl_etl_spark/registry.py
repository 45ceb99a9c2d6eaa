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
- **decimals stay INTERNAL — no query may EMIT a DECIMAL column** (r10
  finding: the four r9-red queries were exactly the four with DECIMAL
  output columns; the driver env cannot hash that output shape).  The
  boundary type is DOUBLE (Spark's decimal→double cast is correctly
  rounded; route the oracle's through VARCHAR when unscaled digits can
  exceed 2^53), STRING (exact decimal text), or integers — enforced by
  tests/test_no_decimal_surfaces.py;
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
    # ROUND 12: tier 1 = this round's churn (the three r11 ADVICE fixes:
    # the coalesce_islands extraction, the HUGEINT/DECIMAL moment-product
    # widening across the exact-moments family, the layout-shard-skew
    # doc_id null guard); tier 2 = the ENTIRE never-driver-checked r11
    # cohort (51 queries added in r11 waves 1-22 after the head filled —
    # every one 3-SF hash-swept + Python-parity-tested locally, but the
    # driver has never seen them; they ARE the r12 correctness story).
    # fn-map-suite is the one spill past the 50 budget (pure function
    # suite, lowest numeric risk) — it leads SWEEP_DEFER.
    #
    # -- tier 1: r12 churn (code changed since last local/driver green) --
    "intervals-coalesce",        # island chain factored into coalesce_islands
    "agg-variance-exact",        # moment sums widened DECIMAL/HUGEINT
    "agg-corr-exact",            # moment sums+products widened
    "agg-skewness-exact",        # per-row cube + sums widened
    "analytics-seasonality-strength",  # m·ssq−sdet² widened
    "graph-assortativity",       # degree moments widened
    "layout-shard-skew",         # doc_id IS NOT NULL guard (ADVICE parity)
    # -- tier 2: never-driver-checked r11 operators, wave order ----------
    "dq-freshness", "sim-pq-encode", "ts-cusum-changepoint",
    "curate-canonical-keep", "dq-profile-drift",
    "analytics-decayed-engagement", "analytics-new-returning",
    "curate-mixture-sample",
    "agg-bitmap-intersect", "analytics-order-percentiles",
    "sim-ann-recall-eval", "graph-jaccard-links", "ts-interarrival-hist",
    "analytics-revenue-concentration", "dedup-lsh-precision-eval",
    "text-readability",
    "agg-rolling-distinct-bitmap", "sim-pq-adc-topk",
    "dq-split-leakage", "curate-dedup-impact",
    "fn-array-suite",
    "agg-bitmap-rollup", "ts-rolling-median",
    "analytics-ab-test", "sim-kmeans-update",
    "ts-decompose", "graph-label-propagation", "layout-compaction-plan",
    "analytics-powerlaw-fit", "agg-argmax-suite",
    "dq-split-leakage-near", "curate-upsample-plan", "text-ngram-novelty",
    "curate-truncation-plan", "dq-embedding-norms", "fn-bit-suite",
    "dq-benford-digits", "sample-poisson-bootstrap",
    "graph-kcore", "text-vocab-growth", "analytics-shipping-delay",
    "curate-filter-funnel",
    "dedup-source-overlap",
]

# Budget triage (round 12): the prioritized block above is 50 entries, so
# this defer list registers immediately after it (first in line for the
# r13 sweep).  It leads with fn-map-suite (the one never-checked r11 op
# the 50 budget couldn't fit), then the two r7-stale text ops displaced
# in r11, then fn-canary-decimal-repr — the PERMANENT env sentinel for
# the r10 finding (the driver environment cannot value-hash DECIMAL
# output columns; its red row is EXPECTED and opt-in, never a regression
# signal) — then the remaining r10-green canaries, then the r8-evidence
# cohort (the stalest green tier).
SWEEP_DEFER: list[str] = [
    # never-driver-checked r11 op, spilled by the 50 budget (pure
    # function suite, lowest numeric risk of the cohort)
    "fn-map-suite",
    # r12-wave-1 ops (3-SF hash-swept + Python-parity-tested locally;
    # driver-checked from here once the r11 cohort drains)
    "graph-clustering-coefficient",
    "agg-kurtosis-exact",
    "sample-reservoir",
    # r12-wave-2 ops (same local-evidence tier)
    "text-source-divergence",
    "dq-reconciliation",
    # r12-wave-3 ops (same local-evidence tier)
    "sim-matryoshka-eval",
    "curate-anneal-schedule",
    # r12-wave-4 ops (same local-evidence tier)
    "ts-anomaly-mad",
    "analytics-revenue-bridge",
    # r12-wave-5 ops (same local-evidence tier)
    "curate-budget-select",
    "fn-struct-suite",
    # r12-wave-6 ops (same local-evidence tier)
    "sim-pq-recall-eval",
    "text-distinctive-terms",
    # r12-wave-7 ops (same local-evidence tier)
    "sim-cluster-nmi",
    "analytics-returned-revenue",
    # r12-wave-8 ops (same local-evidence tier)
    "analytics-promo-share",
    "dq-primary-keys",
    # r12-wave-9 ops (same local-evidence tier)
    "dedup-lsh-curve",
    "text-tokenizer-fertility",
    # r12-wave-10 op (same local-evidence tier)
    "analytics-monthly-growth",
    # displaced from the r11 head by late-r11 churn; r7-stale evidence
    "text-ngram-counts",
    "text-pii-scrub",
    "fn-canary-decimal-repr",    # DELIBERATE decimal surface — expected red
    # the full canary split is r10-green (freshest evidence in the
    # registry); it re-arms from here whenever a numeric class wobbles
    "fn-canary-ln-int", "fn-canary-double-repr",
    "fn-canary-ln-ratio", "fn-canary-sqrt", "fn-canary-pow",
    "fn-canary-exp", "fn-canary-dcast",
    # r8-evidence cohort (latest driver row is round 8)
    "agg-conditional-flow", "agg-conditional-flow-coalesce",
    "agg-count-rows", "agg-cube", "agg-greatest-rowwise",
    "agg-max-scalar", "agg-pivot", "agg-rollup", "agg-running-max",
    "agg-scalar-rollup", "analytics-markov-transitions",
    "analytics-pricing-summary", "analytics-regional-volume",
    "analytics-shipping-priority", "cdc-snapshot-diff",
    "curate-token-pack", "dedup-incremental", "dedup-substring",
    "dq-referential", "filter-time-window", "join-asof",
    "join-asof-forward", "join-cross-1row", "join-outer-anti",
    "join-range-interval", "join-semi-top100", "link-fuzzy-match",
    "mm-binary-meta", "mm-binary-simhash", "plan-top100-derive",
    "sample-stratified", "sim-topk-pandas", "sink-insert-ignore-tx",
    "sink-upsert-cursor", "sink-upsert-holders", "sink-view",
    "sort-limit-top10", "sort-movers-multi", "sort-topk-rank100",
    "stream-cursor-resume", "stream-sliding-60m", "stream-tumbling-6h",
    "text-gopher-rules", "text-winnowing", "win-rank-top100",
    "win-sessionize",
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
