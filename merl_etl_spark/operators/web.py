"""Web-crawl URL operators: parsing, normalization, URL-keyed dedup, and
per-host document caps — the curation steps every crawl-derived training
corpus runs before text-level filtering (cf. the RefinedWeb / C4 pipeline
shape: URL canonicalization → exact-URL dedup → per-site quotas).

The documents fixture carries no URL column, so each query derives one
DETERMINISTICALLY from existing columns (source / lang / doc_id) with the
identical concat expression on both engines — what is under test is the
parsing, normalization, and dedup machinery, not the synthesis.  The
constructed URLs deliberately include mixed-case hosts, optional ports,
query strings, and fragments so normalization has real work to do.

Spark side uses the native ``parse_url`` expression (JVM, codegen'd);
the DuckDB oracle re-derives each component with anchored regexes —
a genuine cross-implementation check, not a shared code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

# Deterministic URL synthesis (identical text in Spark SQL and DuckDB SQL):
# https://{source}-{id%4}.Example.{tld}[:8080 if id%5=0]/{lang}/page/{id%50}
#   ?ref={id%7}&utm_source=feed#sec{id%5}
_URL_SPARK = (
    "concat('https://', source, '-', CAST(doc_id % 4 AS STRING), '.Example.', "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END, "
    "CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END, "
    "'/', lang, '/page/', CAST(doc_id % 50 AS STRING), "
    "'?ref=', CAST(doc_id % 7 AS STRING), '&utm_source=feed', "
    "'#sec', CAST(doc_id % 5 AS STRING))"
)
_URL_DUCK = (
    "'https://' || source || '-' || CAST(doc_id % 4 AS VARCHAR) || '.Example.' || "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END || "
    "CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END || "
    "'/' || lang || '/page/' || CAST(doc_id % 50 AS VARCHAR) || "
    "'?ref=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_source=feed' || "
    "'#sec' || CAST(doc_id % 5 AS VARCHAR)"
)

# DuckDB component regexes (RFC-3986-lite, enough for http(s) URLs):
_D_HOST = "regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)"
_D_PATH = "regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1)"
_D_QUERY = "regexp_extract(url, '\\?([^#]*)', 1)"
_D_REF = "regexp_extract(url, '[?&]ref=([^&#]*)', 1)"
_D_FRAG = "regexp_extract(url, '#(.*)$', 1)"
_D_PROTO = "regexp_extract(url, '^([a-z]+)://', 1)"


@register(
    "fn-url-suite",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {_URL_DUCK} AS url FROM documents WHERE doc_id < 300
    )
    SELECT doc_id, url,
           {_D_PROTO} AS protocol,
           {_D_HOST} AS host,
           {_D_PATH} AS path,
           {_D_QUERY} AS query,
           {_D_REF} AS ref_param,
           {_D_FRAG} AS fragment,
           lower(regexp_extract({_D_HOST}, '([^.]+\\.[^.]+)$', 1)) AS registered_domain,
           'https://' || lower({_D_HOST}) || {_D_PATH} AS url_normalized
    FROM u
    """,
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar-function suite: protocol / host / path / query / named
    query param / fragment extraction via the native ``parse_url``
    expression, a registered-domain heuristic (last two host labels), and
    canonical normalization (lowercase host, strip port + query +
    fragment) — the key every crawl dedup pipeline groups on.

    Pure map, no shuffle, corpus-linear; ``parse_url`` is a JVM codegen
    expression, so the whole projection stays in WholeStageCodegen.  The
    oracle re-derives every component with anchored regexes — the two
    engines share only the input text."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    u = docs.select("doc_id", F.expr(_URL_SPARK).alias("url"))
    host = "parse_url(url, 'HOST')"
    return u.select(
        "doc_id",
        "url",
        F.expr("parse_url(url, 'PROTOCOL')").alias("protocol"),
        F.expr(host).alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'QUERY', 'ref')").alias("ref_param"),
        F.expr("parse_url(url, 'REF')").alias("fragment"),
        F.expr(f"lower(regexp_extract({host}, '([^.]+\\\\.[^.]+)$', 1))").alias(
            "registered_domain"
        ),
        F.expr(f"concat('https://', lower({host}), parse_url(url, 'PATH'))").alias(
            "url_normalized"
        ),
    )


HOST_CAP = 12  # max docs kept per host after URL dedup (RefinedWeb-style quota)


@register(
    "curate-url-dedup",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, n_chars, {_URL_DUCK} AS url FROM documents
    ),
    parsed AS (
      SELECT doc_id, n_chars,
             lower({_D_HOST}) AS host,
             'https://' || lower({_D_HOST}) || {_D_PATH} AS url_norm
      FROM u
    ),
    uranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY url_norm ORDER BY n_chars DESC, doc_id ASC
             ) AS url_rank
      FROM parsed
    ),
    hranked AS (
      SELECT *, CASE WHEN url_rank = 1 THEN row_number() OVER (
               PARTITION BY host, (url_rank = 1)
               ORDER BY n_chars DESC, doc_id ASC)
             ELSE NULL END AS host_rank
      FROM uranked
    )
    SELECT doc_id, host, url_norm,
           CASE WHEN url_rank > 1 THEN 'dup_url'
                WHEN host_rank > {HOST_CAP} THEN 'host_cap'
                ELSE 'kept' END AS disposition
    FROM hranked
    """,
)
def curate_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonical dedup + per-host quota, emitting a per-document
    disposition (``kept`` / ``dup_url`` / ``host_cap``) — the crawl-tier
    front half of corpus curation: canonicalize (lowercase host, strip
    port/query/fragment), keep the best document per canonical URL
    (longest text, doc_id tie-break), then cap each host at HOST_CAP
    survivors so no single site dominates the corpus.

    Scale shape: both windows partition on high-cardinality keys
    (url_norm groups are near-singleton after canonicalization; host
    groups are site-sized).  A mega-site host is the known skew hazard —
    the same one curate-source-cap handles; when only the KEPT rows are
    needed the ``host_rank <= cap`` filter collapses to a
    WindowGroupLimit (top-k per host, partial before the shuffle).  This
    query keeps the dropped rows too because the disposition ledger is
    the point (curation audits need to know WHY a doc was dropped), which
    forces the full per-host rank — at production scale you'd write the
    ledger partitioned by disposition and let the kept-path stay
    WindowGroupLimit-shaped.  The DuckDB oracle conditions its host rank
    on the same survivor predicate (rank-1 rows only) so both engines
    rank identical row sets."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    host = "parse_url(url, 'HOST')"
    parsed = docs.select(
        "doc_id",
        "n_chars",
        F.expr(_URL_SPARK).alias("url"),
    ).select(
        "doc_id",
        "n_chars",
        F.expr(f"lower({host})").alias("host"),
        F.expr(f"concat('https://', lower({host}), parse_url(url, 'PATH'))").alias(
            "url_norm"
        ),
    )
    wu = Window.partitionBy("url_norm").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    uranked = parsed.withColumn("url_rank", F.row_number().over(wu))
    # host quota ranks URL-dedup survivors only; losers keep a NULL host
    # rank (they are already disposed as dup_url)
    wh = Window.partitionBy("host", F.col("url_rank") == 1).orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    hranked = uranked.withColumn(
        "host_rank",
        F.when(F.col("url_rank") == 1, F.row_number().over(wh)),
    )
    return hranked.select(
        "doc_id",
        "host",
        "url_norm",
        F.when(F.col("url_rank") > 1, F.lit("dup_url"))
        .when(F.col("host_rank") > HOST_CAP, F.lit("host_cap"))
        .otherwise(F.lit("kept"))
        .alias("disposition"),
    )
