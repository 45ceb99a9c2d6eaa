"""Lexical retrieval scoring over the documents corpus: TF-IDF term
weighting and BM25 ranking — the classic sparse-retrieval primitives a
training-data pipeline uses for quality filtering, topic bucketing, and
query-based corpus audits (which documents dominate a probe query?).

Scale shapes (both corpus-linear, all equi-joins):

- text-tfidf   explode words → (doc, term) partial-count shuffle → a
               term-keyed DF aggregate over the already-distinct (doc,
               term) pairs → equi-join tf×idf → per-doc WindowGroupLimit
               top-k.  Vocabulary-sized df table joins on term (hash,
               well-distributed); no window without a doc_id partition.
- text-bm25    the query term set is a LITERAL IN-list (pushed into the
               scan) so the fact-side explode is filtered before any
               shuffle; df/N/avgdl are 1-to-3-row aggregates broadcast;
               the per-document score is assembled from per-term
               components in a FIXED literal order so the double sum is
               bit-deterministic; final top-10 is TakeOrderedAndProject
               (distributed heap), not a global window.

Determinism (SURVEY.md §5.2): ln() on doubles hits the same libm in both
engines; scores are rounded to 6 dp BEFORE ranking on both sides (the
curate-mixture-weights trick) with doc_id/term total-order tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

TOKEN_RE = "[a-z]+"
TOPK_TERMS = 5

# ---------------------------------------------------------------------------
# text-tfidf
# ---------------------------------------------------------------------------


@register(
    "text-tfidf",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             round(t.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)), 6) AS score
      FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score, rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOPK_TERMS}
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF terms per document: tf = raw in-doc count, idf =
    ln((N+1)/(df+1)) (smoothed so an every-doc term scores 0⁺ instead of
    dividing by zero), score = tf·idf rounded to 6 dp before the per-doc
    rank (rounding makes the cross-engine hash exact; ties introduced by
    rounding break on term).

    The (doc, term) count is the only large shuffle and it is partially
    aggregated map-side; df reuses the tf output (already distinct per
    doc) so corpus text is tokenized exactly once.  N rides in as a 1-row
    broadcast.  The rank compiles to WindowGroupLimit partitioned by
    doc_id — per-doc top-k never concentrates rows."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0))
        ).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    scored = (
        tf.join(df, "term")
        .crossJoin(n)
        .withColumn(
            "score",
            F.round(F.expr("tf * ln((n_docs + 1.0) / (df + 1.0))"), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK_TERMS)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# text-bm25
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
# probe query: one common term, one mid-frequency term, one rare term
# (fixture dfs ≈ 391 / 393 / 25 of 500 docs) — exercises the idf range
BM25_TERMS = ("stream", "merge", "dup")


def _bm25_component(tf: str, df: str, dl: str, dialect: str) -> str:
    """One query term's BM25 contribution — identical arithmetic text in
    both dialects so the doubles agree bitwise before the 6-dp round."""
    idf = f"ln((n_docs - {df} + 0.5) / ({df} + 0.5) + 1.0)"
    norm = f"({tf} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * {dl} / avgdl))"
    return f"{idf} * ({tf} * {BM25_K1 + 1}) / {norm}"


def _bm25_scored_ctes() -> str:
    """The shared WITH-body computing per-doc BM25 components — reused by
    the text-bm25 oracle and the RRF fusion oracle."""
    in_list = ", ".join(f"'{t}'" for t in BM25_TERMS)
    pivots = ",\n             ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN tf END), 0) AS tf_{t}"
        for t in BM25_TERMS
    )
    comps = ",\n           ".join(
        f"round({_bm25_component(f'tf_{t}', f'df_{t}', 'dl', 'duck')}, 6) AS s_{t}"
        for t in BM25_TERMS
    )
    dfs = ",\n             ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN df END), 0) AS df_{t}"
        for t in BM25_TERMS
    )
    return f"""words AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
      FROM documents
    ),
    doclen AS (
      SELECT doc_id, len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS dl
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM words
      WHERE term IN ({in_list}) GROUP BY doc_id, term
    ),
    df AS (
      SELECT {dfs}
      FROM (SELECT term, count(DISTINCT doc_id) AS df FROM words
            WHERE term IN ({in_list}) GROUP BY term)
    ),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM doclen
    ),
    pivoted AS (
      SELECT doc_id,
             {pivots}
      FROM tf GROUP BY doc_id
    ),
    scored AS (
      SELECT p.doc_id, d.dl,
           {" + ".join(f"p.tf_{t}" for t in BM25_TERMS)} AS total_tf,
           {comps}
      FROM pivoted p
      JOIN doclen d ON d.doc_id = p.doc_id
      CROSS JOIN df CROSS JOIN stats
    )"""


def _bm25_oracle() -> str:
    total = " + ".join(f"s_{t}" for t in BM25_TERMS)
    return f"""
    WITH {_bm25_scored_ctes()}
    SELECT doc_id, dl, total_tf, {", ".join(f"s_{t}" for t in BM25_TERMS)},
           {total} AS bm25
    FROM scored
    ORDER BY {total} DESC, doc_id ASC
    LIMIT 10
    """


@register("text-bm25", oracle=_bm25_oracle())
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed 3-term probe query (k1=1.2,
    b=0.75): per-term idf uses the classic ln((N-df+0.5)/(df+0.5)+1)
    and per-doc length normalization against the corpus mean doclen.

    Determinism of the cross-term sum: each term's component is rounded
    to 6 dp, then the total is assembled in FIXED literal order
    (s_stream + s_merge + s_dup) — never a SUM aggregate over doubles,
    whose partition order would perturb the low bits.  avgdl divides an
    exact long sum by an exact count, one double op.  The final top-10
    compiles to TakeOrderedAndProject (distributed bounded heap — no
    global window, no allowlist entry needed).

    Scale: the IN-list filter on the exploded terms cuts the shuffle to
    query-matched postings only (3 terms ≈ |query| ≪ vocab); df and
    (N, avgdl) are 1-row broadcasts; everything else is map-side."""
    return _bm25_scored(spark, sf_dir).orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    ).limit(10)


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-matched-doc BM25 component frame (the Spark twin of the
    ``scored`` CTE): doc_id, dl, one rounded component per probe term,
    and the fixed-order bm25 total."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0))
    words = docs.select("doc_id", F.explode(toks).alias("term"))
    matched = words.filter(F.col("term").isin(*BM25_TERMS))
    tf = matched.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = docs.select("doc_id", F.size(toks).cast("long").alias("dl"))
    df_wide = F.broadcast(
        matched.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("term") == t, F.col("df"))), F.lit(0)
                ).alias(f"df_{t}")
                for t in BM25_TERMS
            ]
        )
    )
    stats = F.broadcast(
        doclen.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
    )
    pivoted = tf.groupBy("doc_id").agg(
        *[
            F.coalesce(F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)).alias(
                f"tf_{t}"
            )
            for t in BM25_TERMS
        ]
    )
    scored = (
        pivoted.join(doclen, "doc_id")
        .crossJoin(df_wide)
        .crossJoin(stats)
        .select(
            "doc_id",
            "dl",
            F.expr(" + ".join(f"tf_{t}" for t in BM25_TERMS)).alias("total_tf"),
            *[
                F.round(
                    F.expr(_bm25_component(f"tf_{t}", f"df_{t}", "dl", "spark")), 6
                ).alias(f"s_{t}")
                for t in BM25_TERMS
            ],
        )
        .withColumn("bm25", F.expr(" + ".join(f"s_{t}" for t in BM25_TERMS)))
    )
    return scored


# ---------------------------------------------------------------------------
# text-hybrid-rrf
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_POOL = 20  # candidates taken from each ranker before fusion


def _rrf_oracle() -> str:
    return f"""
    WITH {_bm25_scored_ctes()},
    bm25_top AS (
      SELECT doc_id, {" + ".join(f"s_{t}" for t in BM25_TERMS)} AS bm25
      FROM scored
      ORDER BY {" + ".join(f"s_{t}" for t in BM25_TERMS)} DESC, doc_id ASC
      LIMIT {RRF_POOL}
    ),
    bm25_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_bm25
      FROM bm25_top
    ),
    tf_top AS (
      SELECT doc_id, total_tf FROM scored
      ORDER BY total_tf DESC, doc_id ASC
      LIMIT {RRF_POOL}
    ),
    tf_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY total_tf DESC, doc_id ASC) AS r_tf
      FROM tf_top
    ),
    fused AS (
      SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
             b.r_bm25 AS r_bm25,
             t.r_tf AS r_tf,
             coalesce(1.0 / ({RRF_K} + b.r_bm25), CAST(0.0 AS DOUBLE))
               + coalesce(1.0 / ({RRF_K} + t.r_tf), CAST(0.0 AS DOUBLE)) AS rrf
      FROM bm25_ranked b FULL OUTER JOIN tf_ranked t ON t.doc_id = b.doc_id
    )
    SELECT doc_id, r_bm25, r_tf, rrf
    FROM fused
    ORDER BY rrf DESC, doc_id ASC
    LIMIT 10
    """


@register("text-hybrid-rrf", oracle=_rrf_oracle())
def text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of two retrieval rankers over the
    same probe query — BM25 and a raw term-frequency baseline — the
    standard hybrid-search combiner (lexical + semantic in production;
    two lexical rankers here keep both arms oracle-exact).

    Determinism and scale hang on the same trick: each ranker's global
    ordering is materialized only as a TakeOrdered top-{RRF_POOL}
    (distributed bounded heap), so the rank row_numbers run on ≤{RRF_POOL}
    rows (the text-ngram-counts bounded-window pattern — allowlisted),
    the fusion join is a {RRF_POOL}-row full-outer equi-join, and the
    RRF sum is two exact divisions of integer ranks added in fixed
    literal order — no floating noise anywhere.  A missing rank
    contributes 0 (the standard RRF convention for off-list docs).

    Both arms read the SAME _bm25_scored frame (its total_tf column is
    the fixed-order sum of the pivoted per-term tfs), so the corpus is
    tokenized once for the whole fusion — the TF arm costs one extra
    TakeOrdered over an already-computed column, not a second explode
    (review r6 finding)."""
    scored = _bm25_scored(spark, sf_dir)
    bm25_top = scored.select("doc_id", "bm25").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    ).limit(RRF_POOL)
    wb = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    bm25_ranked = bm25_top.select(
        "doc_id", F.row_number().over(wb).cast("long").alias("r_bm25")
    )

    tf_top = scored.select("doc_id", "total_tf").orderBy(
        F.col("total_tf").desc(), F.col("doc_id").asc()
    ).limit(RRF_POOL)
    wt = Window.orderBy(F.col("total_tf").desc(), F.col("doc_id").asc())
    tf_ranked = tf_top.select(
        "doc_id", F.row_number().over(wt).cast("long").alias("r_tf")
    )

    fused = (
        bm25_ranked.join(tf_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_bm25",
            "r_tf",
            (
                F.coalesce(1.0 / (RRF_K + F.col("r_bm25")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("r_tf")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(10)
