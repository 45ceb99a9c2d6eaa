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


@register(
    "text-lm-score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE}') AS l
            FROM documents)
    ),
    bigrams AS (
      SELECT doc_id, tok AS w1,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    big AS (SELECT doc_id, w1, w2 FROM bigrams WHERE w2 IS NOT NULL),
    cb AS (SELECT w1, w2, count(*) AS c_big FROM big GROUP BY w1, w2),
    cu AS (SELECT w1, count(*) AS c_ctx FROM big GROUP BY w1),
    v AS (SELECT count(DISTINCT tok) AS vocab FROM toks)
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           count(CASE WHEN cb.c_big = 1 THEN 1 END) AS n_hapax,
           round(avg(ln(CAST(cb.c_big + 1 AS DOUBLE)
                        / (cu.c_ctx + (SELECT vocab FROM v)))), 4) AS avg_logprob
    FROM big b
    JOIN cb ON cb.w1 = b.w1 AND cb.w2 = b.w2
    JOIN cu ON cu.w1 = b.w1
    GROUP BY b.doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by its average add-one-smoothed bigram
    log-probability under the corpus's own bigram model:
    ``ln((c(w1,w2)+1) / (c(w1,·)+V))`` averaged over the document's
    bigrams.  Also emits the exact bigram count and the hapax count
    (bigrams occurring exactly once corpus-wide — a burstiness signal)."""
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
