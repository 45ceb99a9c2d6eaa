"""Statistical language-model scoring: corpus-estimated bigram
log-probabilities as a document-quality signal.

The classic pre-neural corpus filter (KenLM-style): estimate an n-gram
model on the corpus itself, score each document by its average bigram
log-probability, and drop the tails — gibberish scores far below the
mode, boilerplate far above.  Complements the surface-statistics filter
(text-quality) and the repetition filter (text-repetition) with an
actual probabilistic model, all in DataFrame ops — no Python in the
loop, no model artifact to ship.

Shape at scale: tokenize → per-doc bigrams via a lead() window
partitioned by doc (per-document window, bounded by doc length) →
two corpus count tables (bigram types, context types) built by keyed
aggregation — counts tables are vocabulary-sized, vastly smaller than
the corpus, and join back to the bigram stream on equi-keys (hot-key
skew on common bigrams is AQE's bread and butter).  Add-one smoothing
keeps unseen bigrams finite.

Determinism: counts and the unseen/OOV components are exact integers
(hash-exact); the log-prob average is rounded to 4 dp — per-bigram
``ln()`` may differ by 1 ulp between JVM and C runtimes (~1e-15 on
values ~10), and a ~doc-length double sum keeps accumulated drift
~1e-13, six orders below the 5e-5 rounding granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

_TOKEN_RE = "[a-z]+"

# The per-doc score CTE chain, single-sourced (review-pass rule) so
# text-lm-score and curate-ccnet-buckets cannot drift: `scores` is
# (doc_id, n_bigrams, n_hapax, avg_logprob).
_LM_SCORE_CTES = f"""toks AS MATERIALIZED (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE}') AS l
            FROM documents)
    ),
    bigrams AS (
      SELECT doc_id, tok AS w1,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    big AS MATERIALIZED (SELECT doc_id, w1, w2 FROM bigrams WHERE w2 IS NOT NULL),
    cb AS (SELECT w1, w2, count(*) AS c_big FROM big GROUP BY w1, w2),
    cu AS (SELECT w1, count(*) AS c_ctx FROM big GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS vocab FROM toks),
    scores AS (
      SELECT b.doc_id,
             count(*) AS n_bigrams,
             count(CASE WHEN cb.c_big = 1 THEN 1 END) AS n_hapax,
             round(avg(ln(CAST(cb.c_big + 1 AS DOUBLE)
                          / (cu.c_ctx + (SELECT vocab FROM v)))), 4) AS avg_logprob
      FROM big b
      JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
      JOIN cu ON cu.w1 = b.w1
      GROUP BY b.doc_id
    )"""


@register(
    "text-lm-score",
    oracle=f"""
    WITH {_LM_SCORE_CTES}
    SELECT doc_id, n_bigrams, n_hapax, avg_logprob FROM scores
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by its average add-one-smoothed bigram
    log-probability under the corpus's own bigram model:
    ``ln((c(w1,w2)+1) / (c(w1,·)+V))`` averaged over the document's
    bigrams.  Also emits the exact bigram count and the hapax count
    (bigrams occurring exactly once corpus-wide — a burstiness signal)."""
    return lm_doc_scores(spark, sf_dir)


def lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _LM_SCORE_CTES' final ``scores``: per-doc
    (n_bigrams, n_hapax, avg_logprob) under the corpus bigram model —
    shared by text-lm-score and curate-ccnet-buckets."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), F.lit(0))
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    cu = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_ctx"))
    vocab = toks.select("tok").distinct().count()
    return (
        big.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("c_big") == 1, 1).otherwise(0)).alias("n_hapax"),
            F.round(
                F.avg(
                    F.log(
                        (F.col("c_big") + 1).cast("double")
                        / (F.col("c_ctx") + F.lit(vocab))
                    )
                ),
                4,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# curate-ccnet-buckets — CCNet-style head/middle/tail LM-score tertiles
# ---------------------------------------------------------------------------


@register(
    "curate-ccnet-buckets",
    oracle=f"""
    WITH {_LM_SCORE_CTES},
    docs_s AS (
      SELECT s.doc_id, d.source, s.n_bigrams,
             CAST(round(s.avg_logprob * 10000, 0) AS BIGINT) AS score4
      FROM scores s JOIN documents d USING (doc_id)
      WHERE d.source IS NOT NULL
    ),
    bands AS (
      SELECT source, score4, CAST(count(*) AS BIGINT) AS cnt
      FROM docs_s GROUP BY 1, 2
    ),
    cum AS (
      SELECT source, score4, cnt,
             SUM(cnt) OVER (PARTITION BY source ORDER BY score4
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY source) AS n
      FROM bands
    ),
    cuts AS (
      SELECT source,
             min(CASE WHEN cum_cnt * 3 >= n THEN score4 END) AS t1,
             min(CASE WHEN cum_cnt * 3 >= 2 * n THEN score4 END) AS t2
      FROM cum GROUP BY 1
    )
    SELECT d.source,
           CASE WHEN d.score4 <= c.t1 THEN 'tail'
                WHEN d.score4 <= c.t2 THEN 'middle'
                ELSE 'head' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_bigrams) AS BIGINT) AS n_bigrams,
           min(d.score4) AS lo_score4,
           max(d.score4) AS hi_score4
    FROM docs_s d JOIN cuts c USING (source)
    GROUP BY 1, 2
    """,
)
def curate_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus partitioning: per source, split documents into
    head/middle/tail thirds by their LM score (the curation move behind
    CCNet/CC-100 — train on the head, sample the middle, drop or
    down-weight the tail), emitting per-bucket doc counts, token mass,
    and the score range so a mixture designer can price each tier.

    Cut semantics (pinned): scores are frozen at 4 dp and scaled to the
    integer `score4` grain; the tertile cut T_k is the smallest score
    band where the cumulative doc count reaches ⌈k·n/3⌉ (cum*3 >= k·n),
    and ALL docs tied at a cut band fall in the lower bucket — a
    threshold rule (CCNet's), not an arbitrary intra-tie split, so both
    engines bucket identically without a doc-grain sort.

    Scale (100 TB): the corpus-sized work is the bigram model + per-doc
    score (text-lm-score's exact shape, shared code); bucketing then
    runs entirely at (source × score4-band) grain — the cumulative
    window is keyed by source over bands bounded by the SCORE RANGE
    (≈150k values), corpus-size-independent, which is why the cuts are
    band thresholds rather than ntile()'s full per-source sort."""
    scores = lm_doc_scores(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    ).select("doc_id", "source")
    docs_s = scores.join(docs, "doc_id").selectExpr(
        "doc_id",
        "source",
        "n_bigrams",
        "CAST(round(avg_logprob * 10000, 0) AS BIGINT) AS score4",
    )
    from merl_etl_spark.lineage import cut_lineage

    docs_s = cut_lineage(docs_s, eager=False)  # two consumers: bands + body
    bands = docs_s.groupBy("source", "score4").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("score4")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("source")
    cum = bands.select(
        "source",
        "score4",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    cuts = cum.groupBy("source").agg(
        F.min(
            F.when(F.col("cum_cnt") * 3 >= F.col("n"), F.col("score4"))
        ).alias("t1"),
        F.min(
            F.when(F.col("cum_cnt") * 3 >= 2 * F.col("n"), F.col("score4"))
        ).alias("t2"),
    )
    bucket = (
        F.when(F.col("score4") <= F.col("t1"), F.lit("tail"))
        .when(F.col("score4") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return (
        docs_s.join(F.broadcast(cuts), "source")
        .groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.min("score4").alias("lo_score4"),
            F.max("score4").alias("hi_score4"),
        )
    )
