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
    """Import every module that registers queries (idempotent).

    Registration order is deliberate: the driver's correctness sweep has a
    finite per-round query budget (observed: the first 50 registered), so
    modules whose queries have never been driver-oracled import FIRST
    (VERDICT r1 "Next round" #2).  NOTE the import list below is NOT the
    final registration order — transitive imports interleave it
    (sql_api/setops/analytics pull joins+aggregates, windows_analytic
    pulls joins, plans.jobs pulls ranking, so those green modules register
    mid-block).  The invariant that actually matters — every never-
    oracled query sits within the first 50 registrations — is asserted by
    tests/test_registry_order.py; adding queries to any early or
    transitively-imported module must keep that test green."""
    # -- never-oracled in rounds 1-2: register first --
    import merl_etl_spark.sources.datasource  # noqa: F401  (new in round 3)
    import merl_etl_spark.operators.multimodal  # noqa: F401
    import merl_etl_spark.operators.curation  # noqa: F401
    import merl_etl_spark.operators.curation_ext  # noqa: F401  (new in round 3)
    import merl_etl_spark.operators.sql_api  # noqa: F401
    import merl_etl_spark.operators.setops  # noqa: F401
    import merl_etl_spark.operators.analytics  # noqa: F401
    import merl_etl_spark.operators.windows_analytic  # noqa: F401
    import merl_etl_spark.sinks  # noqa: F401
    import merl_etl_spark.plans.jobs  # noqa: F401
    # dedup next: dedup-simhash-pairs is new in round 3 (never oracled)
    import merl_etl_spark.operators.dedup  # noqa: F401
    # -- green on record from rounds 1-2 --
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
