"""merl_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Merl-ETL reference pipeline.

The reference (prabuddh-selini/Merl-ETL) is a Postgres-backed token-holder /
transfer-event ETL: paged REST ingestion, keyed idempotent upserts, 6-hour
bucketed holder snapshots, window-ranked Top-100 derivation, sliding-window
inflow/outflow aggregation, and formatted reporting.  This package
re-expresses that entire surface — plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing) —
as idiomatic Spark: DataFrame / Spark SQL plans that Catalyst optimizes,
partition-aware writes, broadcast joins for small sides, and Structured
Streaming for the incremental semantics.

Layout
------
session.py            tuned SparkSession builder (AQE, UTC, Arrow)
sources/              table loaders + paged-source simulation (ingestion edge)
functions/            scalar column-expression library (SURVEY.md §2.I)
operators/            relational + LLM-data operators (SURVEY.md §2, ext.)
plans/                the three reference pipeline assemblies (SURVEY.md §3)
streaming/            Structured Streaming forms (SURVEY.md §2.J)
sinks.py              idempotent write patterns (SURVEY.md §2.B)
"""

__version__ = "0.1.0"
