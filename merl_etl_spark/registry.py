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
#   3. stale-green — last driver-checked in round 2 (code unmodified);
#   4. fresh-green — driver-checked green in round 3.
# Queries NOT listed here keep their module registration order and fill the
# remaining budget.  Update per round: move anything you modify into tier 1.
SWEEP_PRIORITY: list[str] = [
    # -- tier 1: modified since last driver check ------------------------
    "agg-approx-sketches",      # r3 err row; quantiles rebuilt as scalars (r4)
    "dedup-clusters",           # DuckDB recursive oracle added (r4)
    "dedup-embedding-cosine",   # rebased 64a2adf (r3), last checked r2
    "sim-lsh-bucketed",         # band routing f9200ad (r3), last checked r2
    "sim-topk-cosine",          # band routing f9200ad (r3), last checked r2
    "sim-ivf-ann",              # band routing f9200ad (r3), last checked r2
    "sim-topk-pandas",          # band routing f9200ad (r3), last checked r2
    "uint256-exact-sum",        # lpad/rounding fixes fe2fee5 (r3), last checked r2
    "uint256-exact-scale",      # lpad/rounding fixes fe2fee5 (r3), last checked r2
    "join-asof",                # summary-window restructure (r4)
    "text-ngram-counts",        # top-k window restructure (r4)
    # -- tier 2: never driver-checked (new in round 4) -------------------
    "src-blockcursor-replay",
    # -- tier 3: green only in round 2, code unmodified ------------------
    "filter-blockrange", "filter-eq-token", "filter-nonnull-fields",
    "filter-time-window", "proj-normalize", "sort-source-asc",
    "fn-string-suite", "fn-numeric-suite", "fn-datetime-suite",
    "fn-format-suite", "fn-json-suite",
    "join-asof-forward",
    "stream-cursor-resume", "stream-tumbling-6h", "stream-sliding-60m",
    "text-langid", "text-quality", "text-tokens", "text-fingerprint",
    "text-pii-scrub",
]


def _apply_sweep_priority() -> None:
    """Rebuild QUERIES/ORACLES so SWEEP_PRIORITY entries come first (in
    listed order), followed by everything else in registration order."""
    prioritized = [q for q in SWEEP_PRIORITY if q in QUERIES]
    rest = [q for q in QUERIES if q not in set(prioritized)]
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

    _apply_sweep_priority()
