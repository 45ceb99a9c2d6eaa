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
    # ROUND 11 (VERDICT r10 "Next round" #1-#4): tier 1 = this round's
    # churn (the broadcast-codebook centroid rewrite, the single-valued
    # ntile cutpoints, the drift tie-break null pin, the bucket-tag
    # housekeeping) + the one new operator; tier 2 = the ENTIRE r7
    # stale-evidence cohort (43 queries whose latest driver row predates
    # both the r9 env change and the r10 decimal finding — VERDICT #1);
    # two canaries stay as env sentinels.  fn-canary-decimal-repr —
    # hypothesis CONFIRMED by its expected-red r10 row — retires to
    # SWEEP_DEFER (VERDICT #2) so the head carries no expected-red entry.
    #
    # -- tier 1: r11 churn (code changed since last driver green) --------
    "sim-centroid-assign",       # broadcast-codebook argmin rewrite (+ the
                                 # assigned_label_expr extraction, late r11)
    "analytics-rfm-segmentation",  # driver-collected literal cutpoints
    "dq-distribution-drift",     # tie-break NULLS LAST pin
    "layout-bucketed-join",      # superseded-tag cleanup + pid-dir probe
    # late-r11 churn: int-width output casts found by the strict
    # arrow-dtype gate, and the knn_edges single-sourcing refactor —
    # their last driver greens predate those code changes
    "analytics-cohort-ltv",      # age_months int32→int64 cast
    "graph-bfs-hops",            # hops int32→int64 cast
    "sim-knn-graph",             # edge build factored into knn_edges
    # -- tier 1c: NEW r11 operators (never driver-checked) ----------------
    "dq-distribution-psi",       # population-stability index drift score
    "sim-rp-projection",         # exact-integer JL sign projection
    "agg-bitmap-distinct",       # popcount-exact distinct via bitmap words
    # -- tier 2: the r7 stale-evidence cohort (VERDICT r10 #1) ------------
    # numerically-sensitive first, then plumbing
    "text-lm-score", "ts-twap", "graph-pagerank", "graph-triangles",
    "agg-countmin", "agg-heavy-hitters", "sample-hash-split",
    "analytics-retention-cohort", "ts-ohlc-bars",
    "analytics-basket-affinity", "analytics-customer-distribution",
    "analytics-disjunctive-filter", "analytics-funnel",
    "analytics-market-share", "analytics-small-qty-revenue",
    "win-analytic-suite", "win-frame-suite", "win-streak",
    "win-cumulative-distinct",
    "join-asof-blocktime", "join-asof-keyed", "join-asof-tolerance",
    "join-interval-overlap",
    "agg-k-anonymity", "agg-mv-merge",
    "fn-string-suite", "fn-json-suite", "fn-regex-suite", "fn-url-suite",
    "cdc-scd2-history", "curate-shuffle-index", "curate-url-dedup",
    "dedup-normalized", "dedup-paragraph", "dq-sequence-gaps",
    "profile-dataset-card", "proj-unpivot",
    "stream-session-window",
    "text-bpe-step", "text-fingerprint",
]

# Budget triage (round 11): the prioritized block above is 50 entries, so
# this defer list registers immediately after it (first in line for the
# r12 sweep).  It leads with fn-canary-decimal-repr — the PERMANENT env
# sentinel for the r10 finding (the driver environment cannot value-hash
# DECIMAL output columns; its red row is EXPECTED and opt-in, never a
# regression signal) — then the remaining r10-green canaries, then the
# r8-evidence cohort (stalest after this round's r7 drain).
SWEEP_DEFER: list[str] = [
    # displaced from the r7-cohort head block by the late-r11 churn
    # entries (churn outranks stale-green); first in line for r12
    "text-ngram-counts",
    "text-pii-scrub",
    # these eight are r11-new but the head is full at 50 (the 43-query r7
    # drain takes priority per VERDICT r10 #1) — each is 3-SF hash-swept,
    # Python-parity-tested, and /verify-driven locally; they lead the r12
    # driver seed from here
    "dq-freshness",
    "sim-pq-encode",
    "ts-cusum-changepoint",
    "curate-canonical-keep",
    "dq-profile-drift",
    "analytics-decayed-engagement",
    "analytics-new-returning",
    "curate-mixture-sample",
    # wave-6 r11 ops (same status: 3-SF hash-swept + Python-parity-tested
    # locally, driver-checked from here in r12)
    "agg-bitmap-intersect",
    "analytics-order-percentiles",
    "sim-ann-recall-eval",
    "graph-jaccard-links",
    "ts-interarrival-hist",
    # wave-7 r11 ops (same evidence tier)
    "analytics-revenue-concentration",
    "dedup-lsh-precision-eval",
    "text-readability",
    # wave-8 r11 ops (same evidence tier)
    "agg-rolling-distinct-bitmap",
    "sim-pq-adc-topk",
    # wave-9 r11 ops (same evidence tier)
    "dq-split-leakage",
    "curate-dedup-impact",
    # wave-10 r11 ops (same evidence tier)
    "fn-array-suite",
    # wave-11 r11 ops (same evidence tier)
    "agg-bitmap-rollup",
    "ts-rolling-median",
    # wave-12 r11 ops (same evidence tier)
    "analytics-ab-test",
    "sim-kmeans-update",
    "layout-shard-skew",
    # wave-13 r11 ops (same evidence tier)
    "ts-decompose",
    "graph-label-propagation",
    "layout-compaction-plan",
    # wave-14 r11 ops (same evidence tier)
    "analytics-powerlaw-fit",
    "fn-map-suite",
    "agg-argmax-suite",
    # wave-15 r11 ops (same evidence tier)
    "dq-split-leakage-near",
    "curate-upsample-plan",
    "text-ngram-novelty",
    # wave-16 r11 ops (same evidence tier)
    "curate-truncation-plan",
    "dq-embedding-norms",
    "fn-bit-suite",
    # wave-17 r11 ops (same evidence tier)
    "dq-benford-digits",
    "agg-variance-exact",
    "sample-poisson-bootstrap",
    # wave-18 r11 ops (same evidence tier)
    "graph-kcore",
    "text-vocab-growth",
    "analytics-shipping-delay",
    # wave-19 r11 ops (same evidence tier)
    "intervals-coalesce",
    "curate-filter-funnel",
    # wave-20 r11 ops (same evidence tier)
    "agg-corr-exact",
    "graph-assortativity",
    # wave-21 r11 ops (same evidence tier)
    "dedup-source-overlap",
    # wave-22 r11 ops (same evidence tier)
    "agg-skewness-exact",
    "analytics-seasonality-strength",
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
