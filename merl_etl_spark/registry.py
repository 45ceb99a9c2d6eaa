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
    # ROUND 10 (VERDICT r9 "Next round" #1-#5): tier 1 = the canary split
    # (one registered query per numeric/repr class — the per-query driver
    # hash booleans must NAME the divergent class; the r10 repr-layer
    # finding says fn-canary-decimal-repr is the one expected red), then
    # the three de-decimaled reds + the two at-risk stale-greens + the
    # RFM rewrite, tier 3 = the r6 cohort (4 rounds stale), then the
    # oldest numerically-interesting r7 entries that still fit.
    #
    # -- tier 1: the canary split (VERDICT r9 #1) -------------------------
    "fn-canary-ln-int",
    "fn-canary-ln-ratio",
    "fn-canary-sqrt",
    "fn-canary-pow",
    "fn-canary-exp",
    "fn-canary-dcast",
    "fn-canary-decimal-repr",    # DELIBERATE decimal surface — the probe
    "fn-canary-double-repr",
    # -- tier 1: r10 churn (DECIMAL output columns removed) ---------------
    "curate-dsir",               # weight now DOUBLE at the boundary
    "cdc-merge-apply",           # final_value now raw-double passthrough
    "text-cooccurrence-pmi",     # pmi now DOUBLE at the boundary
    "analytics-rfm-segmentation",  # ntile → approx-quantile cutpoints
    # -- tier 1b: at-risk stale-greens re-armed this round (VERDICT #4) --
    "text-entropy",              # r8 green; double surface, re-confirm
    "curate-semdedup-keep",      # r7 green; double surface, re-confirm
    # -- tier 1c: NEW r10 operators (never driver-checked) ----------------
    "curate-classifier-filter",  # broadcast-weights linear quality filter
    "dq-distribution-drift",     # ref-vs-current share drift audit
    "dq-embedding-drift",        # fixed-point per-dim centroid shift
    "sim-centroid-assign",       # exact-integer nearest-centroid assign
    "ts-backtest-seasonal",      # rolling-origin seasonal-naive backtest
    # -- tier 3: r6 cohort (latest driver evidence is round 6) -----------
    # numerically-sensitive suites first, then the float-free plumbing
    "dedup-incremental-near", "text-hybrid-rrf", "text-chunking",
    "text-decontaminate", "curate-pipeline", "curate-source-cap",
    "fn-datetime-suite", "fn-numeric-suite", "fn-vector-quantize",
    "dedup-exact", "dedup-simhash-pairs", "dedup-clusters",
    "text-langid", "text-tokens",
    "dedup-ngram-jaccard", "dedup-containment",
    "join-latest-bucket",
    "dq-expectations",
    "uint256-exact-scale", "uint256-exact-sum",
    "filter-blockrange", "filter-eq-token", "filter-nonnull-fields",
    "proj-normalize", "setop-union-intersect-except", "sort-source-asc",
    "sql-api-top100", "layout-zorder",
    "profile-columns", "profile-histogram",
    # -- tier 4: oldest r7 entries, numerically-sensitive first ----------
    "fn-format-suite",           # round(x,2)→decimal→varchar rendering
]

# Budget triage (round 10): the prioritized block above is 50 entries, so
# this defer list registers immediately after it (first in line for the
# r11 sweep).  It holds the REMAINING r7 cohort — driver-green in r7,
# displaced by the canary split + r10 churn + the 30-entry r6 cohort.
# Anything left at r7 after this round leads the round-11 seed.
SWEEP_DEFER: list[str] = [
    "text-lm-score", "ts-twap", "graph-pagerank", "sample-hash-split",
    "analytics-retention-cohort",
    "fn-string-suite", "fn-json-suite", "fn-regex-suite", "fn-url-suite",
    "win-analytic-suite", "win-frame-suite", "win-streak",
    "win-cumulative-distinct",
    "join-asof-blocktime", "join-asof-keyed", "join-asof-tolerance",
    "join-interval-overlap",
    "agg-countmin", "agg-heavy-hitters", "agg-k-anonymity", "agg-mv-merge",
    "analytics-basket-affinity", "analytics-customer-distribution",
    "analytics-disjunctive-filter", "analytics-funnel",
    "analytics-market-share", "analytics-small-qty-revenue",
    "cdc-scd2-history", "curate-shuffle-index", "curate-url-dedup",
    "dedup-normalized", "dedup-paragraph", "dq-sequence-gaps",
    "graph-triangles", "profile-dataset-card", "proj-unpivot",
    "sim-knn-graph", "stream-session-window",
    "text-bpe-step", "text-fingerprint", "text-ngram-counts",
    "text-pii-scrub", "ts-ohlc-bars",
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
