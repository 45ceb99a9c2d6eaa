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
    # -- tier 1: code churned in round 6 (capped_bucket_pairs now backs
    #    every LSH pair expansion; IVF probes moved in-engine; nearest
    #    as-of fused into a single bucketed pass; the ts determinism
    #    fixes from the sf0.1 sweep go FIRST — churn outranks everything)
    "ts-gap-fill",              # REWRITTEN avg: exact decimal sum / count(value)
    "ts-moving-stats",          # REWRITTEN frame sum: exact decimal, no round
    "ts-linear-trend",          # REWRITTEN quantization: integer floor grid
    "join-asof-nearest",        # REWRITTEN: fused single-pass composition
    "dedup-minhash-lsh",        # refactored onto capped_bucket_pairs
    "dedup-embedding-cosine",   # multi-table join now bucket-capped
    "sim-lsh-bucketed",         # single-table join now bucket-capped
    "dedup-containment",        # rides the refactored LSH candidates
    "dedup-ngram-jaccard",      # rides the refactored LSH candidates
    "dedup-clusters",           # consumes the refactored pair list
    # -- tier 2: first-ever hash oracle (rows-only through r5) -----------
    "agg-approx-sketches",      # exact values + error-bound booleans
    "sim-topk-pandas",          # 6-dp rounded kernel, full hash compare
    # -- tier 2b: new in round 6 -----------------------------------------
    "dedup-embedding-clusters",  # semantic-dedup components + keepers
    "fn-vector-quantize",        # uint8 scalar quantization summary
    "dedup-incremental-near",    # batch-vs-corpus LSH near-dup probe
    "profile-columns",           # single-pass per-column profiler
    "profile-histogram",         # equi-width value histogram
    "layout-zorder",             # Morton-code layout bounding boxes
    "text-tfidf",                # per-doc top-k TF-IDF terms
    "text-bm25",                 # BM25 probe-query ranking
    "dq-expectations",           # one-scan expectation-rule suite
    "agg-anomaly-zscore",        # per-type 3-sigma outlier flags
    "agg-hll-merge",             # mergeable-sketch rollup contract
    "text-hybrid-rrf",           # RRF fusion of BM25 + tf arms
    "agg-exact-quantiles",       # cross-engine percentile_disc parity
    "join-salted-skew",          # salted join ≡ plain join hash proof
    # -- tier 3: latest driver green is round 4 --------------------------
    "text-chunking", "curate-pipeline",
    "dedup-exact", "dedup-simhash", "dedup-simhash-pairs",
    "text-decontaminate", "text-repetition", "curate-source-cap",
    "join-latest-bucket", "sql-api-top100", "setop-union-intersect-except",
    "sort-source-asc",
    "fn-numeric-suite", "fn-datetime-suite",
    "uint256-exact-sum", "uint256-exact-scale",
    "filter-blockrange", "filter-eq-token", "filter-nonnull-fields",
    "proj-normalize",
    "sim-topk-cosine",
    "text-langid", "text-tokens", "text-quality",
    # (text-ngram-counts / text-pii-scrub / text-fingerprint displaced to
    # the head of SWEEP_DEFER by the three churned ts-* entries above —
    # their r4 greens are stale but their code is untouched)
]

# Budget triage (review r6): never-driver-checked queries outrank
# stale-green ones, so the four tier-3 entries with the strongest
# non-driver evidence — the scalar fn-suites (hypothesis-tested
# expression libraries, untouched since their r4 green) and
# sample-hash-split (property-tested, untouched) — are deliberately
# deferred past the 50-slot budget this round.  They register
# immediately after the prioritized block (positions 51-54) and MUST
# lead the r7 sweep.
SWEEP_DEFER: list[str] = [
    "text-ngram-counts", "text-pii-scrub", "text-fingerprint",
    "fn-string-suite", "fn-format-suite", "fn-json-suite",
    "sample-hash-split",
    # late-round-6 additions that did not fit the budget either — never
    # driver-checked yet (locally hash-green at sf0.001+sf0.01); they and
    # the four above are the r7 tier-1 block:
    "analytics-funnel", "dedup-paragraph", "cdc-scd2-history",
    # (ts-gap-fill / ts-moving-stats / ts-linear-trend promoted to
    # tier 1 of SWEEP_PRIORITY after the sf0.1-sweep rewrites)
    "ts-twap", "analytics-retention-cohort",
    "graph-pagerank", "link-fuzzy-match", "text-lm-score",
    "stream-session-window",
    # continuation-session round-6 additions (same status: locally
    # hash-green at sf0.001+sf0.01, never driver-checked):
    "agg-countmin", "agg-heavy-hitters", "ts-ohlc-bars",
    "win-cumulative-distinct", "graph-triangles",
    "join-interval-overlap", "curate-shuffle-index",
    "analytics-basket-affinity", "profile-dataset-card", "sim-knn-graph",
    "fn-url-suite", "curate-url-dedup", "join-asof-tolerance",
    "win-streak", "curate-semdedup-keep",
    "analytics-market-share", "analytics-small-qty-revenue",
    "analytics-customer-distribution", "proj-unpivot",
    "agg-mv-merge", "text-bpe-step", "dedup-normalized",
    "src-jsonl-corrupt", "agg-k-anonymity", "link-golden-record",
    "join-asof-keyed", "analytics-disjunctive-filter",
    "fn-regex-suite", "dq-sequence-gaps", "win-frame-suite",
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
