"""Python UDTF surface (SURVEY.md §2.K) — Spark 4's arrow-less
table-valued functions: one input row → N output rows with a declared
schema, registered and callable from SQL.

``explode_chunks`` is the UDTF twin of the text-chunking operator
(operators/curation.py): same 64/48 overlapping token windows, expressed
as a row-generator class instead of array expressions.  The expression
form is the hot path (codegen, no Python); the UDTF form is the template
for chunkers that need real Python (tokenizers, sentence splitters) while
staying usable from plain SQL: ``SELECT * FROM explode_chunks(...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from merl_etl_spark.operators.curation import CHUNK_STRIDE, CHUNK_TOKENS


class _ExplodeChunks:
    def eval(self, doc_id: int, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        words = text.split(" ")  # always ≥1 element; short trailing windows emit
        for chunk_id, start in enumerate(range(0, len(words), CHUNK_STRIDE)):
            chunk = words[start : start + CHUNK_TOKENS]
            yield doc_id, chunk_id, " ".join(chunk), len(chunk)


def explode_chunks_udtf():
    """Build the UDTF lazily (type parsing needs an active session)."""
    return udtf(
        _ExplodeChunks,
        returnType="doc_id bigint, chunk_id bigint, chunk_text string, n_tokens bigint",
    )


def chunk_documents_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the documents table through the registered UDTF from SQL —
    the §2.K user-extensible path."""
    from merl_etl_spark.pyfiles import ensure_package_on_workers
    from merl_etl_spark.sources.tables import load_table

    ensure_package_on_workers(spark)
    spark.udtf.register("explode_chunks", explode_chunks_udtf())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        "SELECT c.* FROM v_docs_udtf, LATERAL explode_chunks(doc_id, text) c"
    )
