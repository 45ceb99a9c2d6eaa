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
    # ROUND 8 (VERDICT r7 "Next round" #3): refresh the r5 cohort — the
    # 46 queries whose latest driver green is round 5 (two rounds stale)
    # fill the budget behind this round's churn.
    #
    # -- tier 1: code churned in round 8 ---------------------------------
    "sim-topk-pandas",    # crossJoin→explode plan fix (VERDICT r7 #1)
    "sim-ivf-ann",        # NEW contract-boolean oracle (VERDICT r7 #2)
    "mm-binary-simhash",  # NEW: decoder-free binary near-dup (VERDICT r7 #5)
    "link-fuzzy-match",   # PassJoin segment-keyed rewrite + bounded levenshtein
    # -- tier 1b: NEW queries this round (never driver-checked) ----------
    "dedup-substring",            # duplicate-span detection (Lee et al. shape)
    "curate-dsir",                # hashed-ngram importance weights (DSIR)
    "text-gopher-rules",          # Gopher rule-set quality flags
    "analytics-markov-transitions",  # event-type transition matrix
    "ts-ewma",                    # decimal-exact trailing EWMA
    "text-entropy",               # word-distribution Shannon entropy
    "dq-referential",             # cross-table FK orphan audit
    "text-winnowing",             # MOSS winnowed fingerprints
    # -- tier 2: stale-green — latest driver green is round 5 ------------
    # numerically-sensitive window/as-of/stream suites first
    "win-sessionize", "join-asof", "join-asof-forward",
    "join-range-interval", "win-rank-top100",
    "agg-conditional-flow", "agg-conditional-flow-coalesce",
    "agg-pivot", "agg-rollup", "agg-cube",
    "agg-max-scalar", "agg-count-rows", "agg-scalar-rollup",
    "agg-greatest-rowwise", "agg-running-max",
    "analytics-pricing-summary", "analytics-shipping-priority",
    "analytics-regional-volume",
    "cdc-snapshot-diff", "dedup-incremental",
    "join-cross-1row", "join-semi-top100", "join-outer-anti",
    "sort-topk-rank100", "plan-top100-derive",
    "sort-limit-top10", "sort-movers-multi", "filter-time-window",
    "stream-tumbling-6h", "stream-sliding-60m", "stream-cursor-resume",
    "sink-upsert-holders", "sink-insert-ignore-tx", "sink-upsert-cursor",
    "sink-view",
    "mm-binary-meta",
    "curate-token-pack", "sample-stratified",
]

# Budget triage (round 8): the prioritized block is 50 entries, so the
# defer list leads with the remaining round-8 churn insurance —
# link-golden-record rides the SAME blocked_fuzzy_pairs helper as
# link-fuzzy-match (one driver check covers the shared path; both are
# locally hash-green at sf0.001/0.01/0.1) and src-jsonl-corrupt's change
# is a constant extraction (behavior-preserving by construction).  Then
# the r6 cohort, which becomes the round-9 priority seed.
SWEEP_DEFER: list[str] = [
    # displaced by the eight new round-8 queries (tier 1b): never-checked
    # queries rank above stale-green in the rotation doctrine (tier 2 vs
    # tier 3 above), so 38 of the 46-query r5 cohort refresh this round
    # and these eight — the cohort entries with the strongest secondary
    # evidence — lead the round-9 seed: the mm queries share
    # multimodal.py's pytest surface with mm-binary-meta (still in
    # budget), src-datasource-paged and src-blockcursor-replay have the
    # full DS-API / streaming-replay edge-test suites, and
    # curate-corpus-pipeline / fn-vector-suite / curate-mixture-weights
    # are compositions or small aggregates of stages individually green
    # this round or last.
    "src-datasource-paged", "mm-resize-plan", "mm-feature-extract",
    "mm-frame-sample", "src-blockcursor-replay",
    "curate-corpus-pipeline", "fn-vector-suite", "curate-mixture-weights",
    "link-golden-record", "src-jsonl-corrupt",
    "ts-gap-fill", "ts-moving-stats", "ts-linear-trend",
    "join-asof-nearest", "join-latest-bucket", "join-salted-skew",
    "agg-anomaly-zscore", "agg-approx-sketches", "agg-exact-quantiles",
    "agg-hll-merge",
    "dedup-exact", "dedup-minhash-lsh", "dedup-simhash",
    "dedup-simhash-pairs", "dedup-ngram-jaccard", "dedup-containment",
    "dedup-clusters", "dedup-embedding-cosine", "dedup-embedding-clusters",
    "dedup-incremental-near", "sim-lsh-bucketed", "sim-topk-cosine",
    "text-langid", "text-quality", "text-tokens", "text-repetition",
    "text-tfidf", "text-bm25", "text-hybrid-rrf", "text-chunking",
    "text-decontaminate",
    "curate-pipeline", "curate-source-cap",
    "filter-blockrange", "filter-eq-token", "filter-nonnull-fields",
    "proj-normalize", "setop-union-intersect-except", "sort-source-asc",
    "sql-api-top100", "layout-zorder",
    "profile-columns", "profile-histogram",
    "fn-datetime-suite", "fn-numeric-suite", "fn-vector-quantize",
    "dq-expectations", "uint256-exact-scale", "uint256-exact-sum",
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
