"""Training-corpus curation extensions: benchmark decontamination and
Gopher-style repetition quality signals.

Neither exists in the reference (it is a token-ETL, not a corpus
pipeline); both are core operations of a large-scale training-data
pipeline and compose with the dedup/quality tiers in
``operators/dedup.py`` / ``operators/text_analysis.py``:

- **text-decontaminate** — flag corpus documents sharing any word n-gram
  with a benchmark/holdout set (the standard eval-contamination guard).
  Production uses 13-grams; here the shared 3-gram shingler keeps the
  Spark/DuckDB twin expressions identical to the dedup tier's.
- **text-repetition** — per-document repetition signals from the Gopher
  quality rules: duplicate-word fraction and the fraction of all bigrams
  taken by the single most frequent bigram (excessive repetition is the
  top predictor of boilerplate/spam in web corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merl_etl_spark.operators.dedup import (
    DUCK_SHINGLES,
    NORM_HASH_DUCK,
    md5_bucket_duck,
    md5_bucket_spark,
    ngram_shingles_expr,
    pin_parallelism,
)
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

# every ~97th doc stands in for the benchmark/holdout set
BENCH_MOD = 97

# per-source document cap (anti-boilerplate domain capping)
SOURCE_CAP = 10


@register(
    "text-decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s
      FROM (SELECT doc_id, unnest({DUCK_SHINGLES}) AS s FROM documents)
    ),
    bm AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0)
    SELECT doc_id, count(*) AS n_hits
    FROM sh JOIN bm USING (s)
    WHERE doc_id % {BENCH_MOD} <> 0
    GROUP BY doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents that share at least
    one 3-gram shingle with the holdout set (doc_id % 97 == 0), with
    the count of distinct shared shingles.

    Scale shape: the benchmark shingle set is bounded (eval suites are
    tiny next to the corpus) so it BROADCASTS — the corpus-side shingle
    stream is scanned once, map-side, with NO pre-join distinct (that
    would shuffle every corpus shingle); only the benchmark HITS reach
    the shuffle, deduplicated per doc by countDistinct's partial
    aggregate.  Corpus-linear at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = docs.withColumn("words", F.split("text", " ")).select(
        "doc_id", F.explode(F.expr(ngram_shingles_expr(3))).alias("s")
    )
    bm = sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("s").distinct()
    corpus = sh.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bm), "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_hits"))
    )


@register(
    "text-repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    base AS (
      SELECT doc_id,
             1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)
               AS dup_word_frac
      FROM w
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS b
      FROM w
    ),
    c AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
    top AS (
      SELECT doc_id,
             CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS top_bigram_frac
      FROM c GROUP BY 1
    )
    SELECT base.doc_id, dup_word_frac, top_bigram_frac
    FROM base JOIN top USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals per document: duplicate-word fraction
    (1 - distinct/total) and top-bigram fraction (share of all bigrams
    held by the most frequent one).

    Scale shape: the word-level fraction is a pure array expression (no
    explode); the bigram top is explode → two-phase hash aggregate
    (partial max/sum map-side), i.e. corpus-linear with one shuffle on
    doc_id — the alternative per-doc quadratic array scan
    (transform(distinct, count-in-array)) is O(len²) on pathological
    docs and was rejected.  Doubles divide int-exact inputs identically
    in Spark and DuckDB (IEEE), so no rounding is needed."""
    words = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
    )
    base = words.select(
        "doc_id",
        (
            F.lit(1.0)
            - F.size(F.array_distinct("w")).cast("double") / F.size("w").cast("double")
        ).alias("dup_word_frac"),
    )
    bigrams = words.select(
        "doc_id", F.explode(F.expr(ngram_shingles_expr(2, "w"))).alias("b")
    )
    top = (
        bigrams.groupBy("doc_id", "b")
        .count()
        .groupBy("doc_id")
        .agg(
            (F.max("count").cast("double") / F.sum("count").cast("double")).alias(
                "top_bigram_frac"
            )
        )
    )
    return base.join(top, "doc_id").select("doc_id", "dup_word_frac", "top_bigram_frac")


@register(
    "curate-source-cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS src_rank
      FROM documents
    )
    SELECT source, doc_id, n_chars, src_rank
    FROM ranked WHERE src_rank <= {SOURCE_CAP}
    """,
)
def curate_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — keep the top SOURCE_CAP (10) documents
    per source by length (n_chars, doc_id tiebreak): the standard guard
    against a single boilerplate-heavy domain dominating the corpus
    (C4/RefinedWeb-style domain capping; rank by any quality score the
    same way).

    Scale shape: compiles to WindowGroupLimit — each map task keeps at
    most the cap per source BEFORE the shuffle, so the exchange carries
    ≤ cap × sources × partitions rows regardless of corpus size (the
    plan probe pins this)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        # cast: DuckDB row_number is BIGINT, Spark's is INT
        docs.withColumn("src_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("src_rank") <= SOURCE_CAP)
        .select("source", "doc_id", "n_chars", "src_rank")
    )


# training-shard token budget (packing target per shard)
PACK_BUDGET = 8192
# hash-bucket fan-out for parallel packing
PACK_BUCKETS = 16


@register(
    "curate-token-pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(text || '|pack-seed'), 1, 8))::BIGINT
               % {PACK_BUCKETS} AS bucket,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT bucket, doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t
    )
    SELECT bucket, (cum - n_tokens) // {PACK_BUDGET} AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
    FROM c GROUP BY 1, 2
    """,
)
def curate_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: greedily pack documents into training
    shards of ~PACK_BUDGET(=8192) tokens by running-sum assignment — a
    document opens a new shard when the budget its predecessors consumed
    crosses a multiple of the budget.  The sequential scan is confined to
    PACK_BUCKETS(=16) independent hash buckets (content-stable md5
    bucket, same recipe as sample-hash-split), so packing parallelizes:
    at 100 TB you raise PACK_BUCKETS to O(cluster cores) and each bucket
    packs its slice independently — no global order, no single-partition
    window, deterministic across reruns."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("text"), F.lit("|pack-seed"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % PACK_BUCKETS
    )
    t = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.withColumn("shard_id", F.expr(f"(cum - n_tokens) div {PACK_BUDGET}"))
        .groupBy("bucket", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
    )


# per-stratum keep-rates (percent of the 0-99 hash space): head language
# downsampled, tail languages kept at a higher rate — the standard
# rebalancing move for a multilingual corpus
STRAT_RATE_EN = 20
STRAT_RATE_OTHER = 60


@register(
    "sample-stratified",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(text || '|strat-seed'), 1, 8))::BIGINT
               % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket
    FROM b
    WHERE bucket < CASE WHEN lang = 'en' THEN {STRAT_RATE_EN}
                        ELSE {STRAT_RATE_OTHER} END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates over a
    content-stable hash (never random() — reruns and backfills must keep
    the exact same documents): 'en' kept at 20%, every other language
    at 60%.  Pure filter over column expressions — no shuffle, no
    state; the rate table extends to a broadcast-joined per-(lang,
    source) quota map without changing the plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("text"), F.lit("|strat-seed"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    rate = F.when(F.col("lang") == "en", STRAT_RATE_EN).otherwise(STRAT_RATE_OTHER)
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "bucket")
    )


# mixture-reweighting temperature (UnifiedQA/Gopher-style alpha)
MIX_ALPHA = 0.7

# The temperature-weight formula lives in ONE place per engine (review
# r11: curate-mixture-sample had copied both the Spark frame and the
# oracle CTEs — four copies of the formula that could silently drift).
# Oracle side: CTEs s/t/w ending in the per-source weight table.
MIX_WEIGHT_CTES = f"""s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s),
    w AS (
      SELECT s.source, s.n_docs, s.n_tokens, t.total,
             round(CAST(s.n_tokens AS DOUBLE) / t.total, 6) AS share,
             round(
               pow(CAST(s.n_tokens AS DOUBLE) / t.total, {MIX_ALPHA})
               / sum(pow(CAST(s.n_tokens AS DOUBLE) / t.total,
                         {MIX_ALPHA})) OVER (),
               6
             ) AS weight
      FROM s, t
    )"""


def mixture_weight_frame(docs: DataFrame) -> DataFrame:
    """Spark twin of MIX_WEIGHT_CTES: per-source (n_docs, n_tokens,
    total, share, weight) with the share and the temperature weight each
    rounded ONCE at 6 dp — the frozen surface both mixture ops consume.
    The normalizer window runs over the per-source-row summary (bounded
    by the source count, not data volume)."""
    s = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    t = s.agg(F.sum("n_tokens").alias("total"))
    share = F.col("n_tokens").cast("double") / F.col("total")
    w_all = Window.partitionBy()
    return (
        s.join(F.broadcast(t))
        .withColumn("p_alpha", F.pow(share, F.lit(MIX_ALPHA)))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "total",
            F.round(share, 6).alias("share"),
            F.round(F.col("p_alpha") / F.sum("p_alpha").over(w_all), 6).alias(
                "weight"
            ),
        )
    )


@register(
    "curate-mixture-weights",
    oracle=f"""
    WITH {MIX_WEIGHT_CTES}
    SELECT source, n_docs, n_tokens, share, weight FROM w
    """,
)
def curate_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture weights: per-source token share
    p_i raised to alpha(=0.7) and renormalized — the standard corpus
    rebalancing that upweights tail sources without letting any dominate
    (alpha=1 keeps natural proportions, alpha=0 is uniform).  The
    per-source rollup is a map-side-partial aggregation; the scalar
    total and the weight normalizer run over the handful of source rows
    (one per corpus source — bounded by construction, not by data
    volume).  Rounded to 6 decimals on both engines so the value hash
    is insensitive to sub-ulp libm differences."""
    docs = load_table(spark, sf_dir, "documents")
    return mixture_weight_frame(docs).select(
        "source", "n_docs", "n_tokens", "share", "weight"
    )


@register(
    "curate-corpus-pipeline",
    oracle=f"""
    WITH keepers AS (
      SELECT doc_id, text,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ),
    q AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM keepers WHERE rn = 1
    ),
    filtered AS (
      SELECT doc_id, text, n_tokens FROM q
      WHERE n_tokens >= 40
        AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.30
        AND doc_id % {BENCH_MOD} <> 0
    ),
    sh AS (
      SELECT DISTINCT doc_id, s
      FROM (SELECT doc_id, unnest({DUCK_SHINGLES}) AS s FROM documents)
    ),
    bm AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    contaminated AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bm USING (s)),
    clean AS (
      SELECT f.doc_id, f.text, f.n_tokens
      FROM filtered f LEFT JOIN contaminated c ON f.doc_id = c.doc_id
      WHERE c.doc_id IS NULL
    ),
    b AS (
      SELECT doc_id, n_tokens,
             ('0x' || substr(md5(text || '|pack-seed'), 1, 8))::BIGINT
               % {PACK_BUCKETS} AS bucket
      FROM clean
    ),
    packed AS (
      SELECT doc_id, bucket, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM b
    )
    SELECT doc_id, bucket, (cum - n_tokens) // {PACK_BUDGET} AS shard_id, n_tokens
    FROM packed
    """,
)
def curate_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE corpus curation pipeline as one composed plan:
    exact-dedup keeper selection ∘ quality floors (length, vocabulary
    diversity) ∘ benchmark decontamination (drop any doc sharing a
    3-gram shingle with the holdout) ∘ token-budget shard packing —
    raw crawl in, training-shard assignments out.  Each stage is the
    already-oracled standalone operator; composing them in one DataFrame
    chain lets Catalyst share the scan between the dedup window and the
    quality columns and keeps the whole thing a single job.

    Scale shape: digest-partitioned keeper window (map-side group-limit),
    broadcast benchmark shingles (bounded holdout) probed map-side with
    only hits shuffling, hash-bucketed packing windows — no global order,
    no unbounded single-partition stage anywhere."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    q = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("words", F.split("text", " "))
        .withColumn("n_tokens", F.size("words").cast("long"))
        .withColumn("n_distinct", F.size(F.array_distinct("words")).cast("long"))
    )
    filtered = q.filter(
        (F.col("n_tokens") >= 40)
        & (F.col("n_distinct").cast("double") / F.col("n_tokens") >= 0.30)
        & (F.col("doc_id") % BENCH_MOD != 0)
    ).select("doc_id", "text", "n_tokens", "words")

    bm = (
        docs.filter(F.col("doc_id") % BENCH_MOD == 0)
        .withColumn("words", F.split("text", " "))
        .select(F.explode(F.expr(ngram_shingles_expr(3))).alias("s"))
        .distinct()
    )
    survivor_shingles = filtered.select(
        "doc_id", F.explode(F.expr(ngram_shingles_expr(3))).alias("s")
    )
    contaminated = (
        survivor_shingles.join(F.broadcast(bm), "s").select("doc_id").distinct()
    )
    clean = filtered.join(contaminated, "doc_id", "left_anti")

    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("text"), F.lit("|pack-seed"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % PACK_BUCKETS
    )
    b = clean.select("doc_id", "n_tokens", bucket.alias("bucket"))
    w_pack = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = b.withColumn("cum", F.sum("n_tokens").over(w_pack))
    return packed.select(
        "doc_id",
        "bucket",
        F.expr(f"(cum - n_tokens) div {PACK_BUDGET}").alias("shard_id"),
        "n_tokens",
    )


# ---------------------------------------------------------------------------
# curate-shuffle-index — deterministic global shuffle without a global sort
# ---------------------------------------------------------------------------

# Training pipelines need every example assigned a stable pseudo-random
# position (the "global shuffle" before sharding into training files).
SHUFFLE_SEED = "shuf42|"
SHUFFLE_BUCKETS = 256  # first md5 byte — fixed fan-out for the offset pass


@register(
    "curate-shuffle-index",
    oracle=f"""
    SELECT doc_id,
           ('0x' || substr(md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
             AS bucket,
           row_number() OVER (
             ORDER BY md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS shuffle_pos
    FROM documents
    """,
)
def curate_shuffle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a deterministic pseudo-random global
    position (seeded md5 of the key) — the pre-training "global shuffle"
    — WITHOUT a global sort/window: rank within each of the 256 md5
    buckets (partitioned window), then add broadcast per-bucket offsets
    (a running sum over the 256-row bucket-count summary).

    shuffle_pos is exactly row_number() over the global md5 order (the
    oracle computes it that way), but the Spark plan never moves the
    corpus to one partition: the only unpartitioned window runs over the
    ≤SHUFFLE_BUCKETS-row count summary (allowlisted in
    test_plan_properties with that boundedness argument), which is the
    same bounded-carry pattern the as-of tier uses.  Content-seeded
    hashing — never rand() — keeps the shuffle reproducible across
    retries and engines (the sample-hash-split stance)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        key.alias("k"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("long").alias("bucket"),
    )
    w_rank = Window.partitionBy("bucket").orderBy("k", "doc_id")
    ranked = keyed.withColumn("r", F.row_number().over(w_rank))
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    return ranked.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "bucket",
        (F.col("off") + F.col("r") - 1).alias("shuffle_pos"),
    )


# ---------------------------------------------------------------------------
# curate-dsir — hashed-n-gram importance weights (DSIR)
# ---------------------------------------------------------------------------

# Data Selection via Importance Resampling (Xie et al. 2023): score every
# raw document by how target-like its hashed bag-of-bigrams is under two
# smoothed unigram-over-buckets distributions.  Here the target
# distribution is the English slice of the corpus (lang = 'en') and the
# raw distribution is everything else.
DSIR_BUCKETS = 256


@register(
    "curate-dsir",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                   i -> w[i] || ' ' || w[i + 1])) AS g
      FROM words
    ),
    feat AS (
      SELECT doc_id, lang,
             {md5_bucket_duck('g', DSIR_BUCKETS)} AS b,
             count(*) AS c
      FROM bg GROUP BY 1, 2, 3
    ),
    bucket AS (
      SELECT b,
             SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS t,
             SUM(CASE WHEN lang <> 'en' THEN c ELSE 0 END) AS r
      FROM feat GROUP BY 1
    ),
    tot AS (SELECT SUM(t) AS tt, SUM(r) AS rr FROM bucket),
    lam AS (
      -- integer-argument ln()s, each rounded once to 6 dp and frozen as
      -- decimal BEFORE combining (the driver-green text-entropy pattern):
      -- lam = ln(t+1) - ln(r+1) + ln(rr+B) - ln(tt+B)
      SELECT b,
             CAST(round(ln(t + 1), 6) AS DECIMAL(18,6))
             - CAST(round(ln(r + 1), 6) AS DECIMAL(18,6))
             + CAST(round(ln(rr + {DSIR_BUCKETS}), 6) AS DECIMAL(18,6))
             - CAST(round(ln(tt + {DSIR_BUCKETS}), 6) AS DECIMAL(18,6))
             AS lam
      FROM bucket, tot
    )
    SELECT f.doc_id,
           (f.lang = 'en') AS is_target,
           CAST(SUM(f.c) AS BIGINT) AS n_feats,
           -- boundary cast to DOUBLE via VARCHAR (exact decimal→text +
           -- correctly-rounded strtod — matches Spark's BigDecimal
           -- .doubleValue at ANY unscaled magnitude); the decimal itself
           -- must not be emitted: DECIMAL output columns are the one
           -- shape the r9 driver env could not hash (r10 finding)
           CAST(CAST(CAST(SUM(f.c * l.lam) AS DECIMAL(38,6)) AS VARCHAR)
                AS DOUBLE) AS dsir_weight
    FROM feat f JOIN lam l USING (b)
    GROUP BY 1, 2
    """,
)
def curate_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document (Xie et al. 2023): hashed
    word-bigram features (md5 → 256 buckets), add-1-smoothed target
    (lang='en') vs raw bucket distributions, per-doc weight
    = sum_b c_b * ln(p_target(b) / p_raw(b)).

    Determinism: the only transcendentals are four INTEGER-argument
    ln()s per bucket row (ln(t+1), ln(r+1), ln(rr+B), ln(tt+B)), each
    rounded to 6 dp once on the 256-row bucket table and frozen as
    DECIMAL(18,6) before the exact decimal combination — the
    text-entropy pattern, adopted after the float-ratio form proved
    environment-sensitive (VERDICT r8 #1).  The per-doc weight is an
    exact integer-weighted decimal sum, order-independent at any DOP,
    cast to DOUBLE only at the output boundary (r10: the r8/r9 driver
    reds were the DECIMAL output column itself — the one output shape
    the driver env cannot hash — not the ln math; the oracle routes its
    boundary cast through VARCHAR so both engines read the exact
    decimal text with a correctly-rounded strtod).

    Scale (100 TB): feature extraction is a narrow explode + keyed agg
    (map-side partials); the bucket distribution table is a fixed 256
    rows, so both the totals (broadcast 1-row cross join) and the
    per-doc scoring join (broadcast) never shuffle the corpus more than
    once.  This is the exact shape DSIR runs at CommonCrawl scale.
    """
    B = DSIR_BUCKETS
    # the bigram explode (~|words| rows/doc) feeds two consumers (bucket
    # distributions + per-doc scoring) — pin its parallelism
    docs = pin_parallelism(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", F.split("text", " ").alias("words")
        ),
        "doc_id",
    )
    bg = docs.select(
        "doc_id", "lang", F.explode(F.expr(ngram_shingles_expr(2))).alias("g")
    )
    feat = bg.groupBy(
        "doc_id",
        "lang",
        md5_bucket_spark(F.col("g"), B).alias("b"),
    ).agg(F.count(F.lit(1)).alias("c"))
    bucket = feat.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0)).alias("t"),
        F.sum(F.when(F.col("lang") != "en", F.col("c")).otherwise(0)).alias("r"),
    )
    tot = bucket.agg(F.sum("t").alias("tt"), F.sum("r").alias("rr"))

    # Integer-argument ln()s, each rounded once to 6 dp and frozen as
    # decimal(18,6) BEFORE the exact decimal combination — the
    # text-entropy pattern (text_analysis.py), which survived the driver
    # environment where the float-ratio form did not (VERDICT r8 #1):
    # lam = ln(t+1) - ln(r+1) + ln(rr+B) - ln(tt+B).
    def _ln6(col):
        return F.round(F.log(col), 6).cast("decimal(18,6)")

    lam = bucket.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            _ln6(F.col("t") + 1)
            - _ln6(F.col("r") + 1)
            + _ln6(F.col("rr") + B)
            - _ln6(F.col("tt") + B)
        ).alias("lam"),
    )
    return (
        feat.join(F.broadcast(lam), "b")
        .groupBy("doc_id", (F.col("lang") == "en").alias("is_target"))
        .agg(
            F.sum("c").alias("n_feats"),
            # exact decimal sum internally; DOUBLE at the output boundary
            # (Spark's decimal→double is correctly rounded; the oracle
            # routes the same cast through VARCHAR) — DECIMAL columns must
            # never be EMITTED (the r9-red repr class, VERDICT r9 #3)
            F.sum(F.col("c") * F.col("lam"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("dsir_weight"),
        )
    )


# ---------------------------------------------------------------------------
# curate-softdedup-weights — down-weight duplicates instead of dropping
# ---------------------------------------------------------------------------

@register(
    "curate-softdedup-weights",
    oracle="""
    WITH sig AS (
      SELECT doc_id, md5(text) AS h FROM documents
    ),
    clusters AS (
      SELECT h, count(*) AS dup_count, min(doc_id) AS canon
      FROM sig GROUP BY h
    )
    SELECT s.doc_id,
           c.dup_count,
           (s.doc_id = c.canon) AS is_canonical,
           CAST(1 AS DOUBLE) / c.dup_count AS keep_prob,
           CASE WHEN c.dup_count = 1 THEN 'unique'
                WHEN c.dup_count <= 3 THEN 'low'
                ELSE 'high' END AS commonness
    FROM sig s JOIN clusters c USING (h)
    """,
)
def curate_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (SlimPajama/FineWeb practice): instead of
    DROPPING exact duplicates, assign every document a sampling weight
    1/cluster_size so each distinct content unit contributes one
    expected copy to the training mix — duplication frequency is signal
    (popular content) that hard dedup throws away.

    Determinism: keep_prob is one IEEE double division of two integers —
    bit-identical across engines; no rounding needed.  Scale (100 TB):
    one content-hash keyed agg (map-side combinable, cluster table is
    distinct-content cardinality) + one hash-keyed join back — the
    payload text never shuffles, only its 32-char digest.  The
    commonness tier is the mix-building knob downstream samplers group
    by."""
    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select("doc_id", F.md5("text").alias("h"))
    clusters = sig.groupBy("h").agg(
        F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("canon")
    )
    return sig.join(clusters, "h").select(
        "doc_id",
        "dup_count",
        (F.col("doc_id") == F.col("canon")).alias("is_canonical"),
        (F.lit(1).cast("double") / F.col("dup_count")).alias("keep_prob"),
        F.when(F.col("dup_count") == 1, "unique")
        .when(F.col("dup_count") <= 3, "low")
        .otherwise("high")
        .alias("commonness"),
    )


# ---------------------------------------------------------------------------
# curate-quality-sampling — quality-tiered deterministic sampling rates
# ---------------------------------------------------------------------------

# Integer quality gates (each is a pure integer comparison — no float
# ratios), one tier point per gate passed:
#   length   n_tokens >= 20
#   vocab    2*n_distinct > n_tokens      (distinct ratio > 1/2)
#   digits   10*n_digits < n_chars        (digit ratio  < 1/10)
#   punct    5*n_punct  < n_chars         (punct ratio  < 1/5)
# Keep-rate percentage by tier: junk is thinned hard, clean text kept.
QSAMP_RATES = (5, 15, 40, 70, 100)  # tier 0..4
QSAMP_SALT = "|qsamp"


@register(
    "curate-quality-sampling",
    oracle=rf"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(regexp_extract_all(text, '[0-9]')) AS n_digits,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct
      FROM documents
    ),
    t AS (
      SELECT doc_id,
             CAST(n_tokens >= 20 AS BIGINT)
             + CAST(2 * n_distinct > n_tokens AS BIGINT)
             + CAST(10 * n_digits < n_chars AS BIGINT)
             + CAST(5 * n_punct < n_chars AS BIGINT) AS tier
      FROM m
    )
    SELECT doc_id, tier,
           CAST(CASE tier {" ".join(f"WHEN {i} THEN {r}" for i, r in enumerate(QSAMP_RATES))} END
                AS BIGINT) AS sample_pct,
           {md5_bucket_duck(f"CAST(doc_id AS VARCHAR) || '{QSAMP_SALT}'", 100)}
             < CASE tier {" ".join(f"WHEN {i} THEN {r}" for i, r in enumerate(QSAMP_RATES))} END
             AS kept
    FROM t
    """,
)
def curate_quality_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-tiered subsampling: score each document 0-4 on integer
    quality gates (length, vocabulary diversity, digit density,
    punctuation density — the text-quality ratio family recast as
    exact integer comparisons), then keep a deterministic hash sample
    at a tier-specific rate (QSAMP_RATES) — the "thin the junk, keep
    the clean text" curation step between filtering (drop outright)
    and DSIR-style importance weighting (continuous reweight).

    Determinism: gates and tiers are integer arithmetic; the keep
    decision is the md5-bucket coin every sampling operator here uses
    (sample-hash-split) — replayable in any engine, stable across
    runs/partitionings.  Scale (100 TB): embarrassingly parallel
    narrow projection, zero shuffles; the sample is decided per-row
    with no global state, so it composes with streaming ingest."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    m = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[0-9]"), F.lit(0))
        ).alias("n_digits"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9 ]"), F.lit(0))
        ).alias("n_punct"),
    )
    tier = (
        (F.col("n_tokens") >= 20).cast("long")
        + (2 * F.col("n_distinct") > F.col("n_tokens")).cast("long")
        + (10 * F.col("n_digits") < F.col("n_chars")).cast("long")
        + (5 * F.col("n_punct") < F.col("n_chars")).cast("long")
    )
    t = m.select("doc_id", tier.alias("tier"))
    # tier directly indexes QSAMP_RATES (element_at is 1-based)
    pct = F.element_at(
        F.array(*[F.lit(r).cast("long") for r in QSAMP_RATES]),
        (F.col("tier") + 1).cast("int"),
    )
    coin = md5_bucket_spark(
        F.concat(F.col("doc_id").cast("string"), F.lit(QSAMP_SALT)), 100
    )
    return t.select(
        "doc_id",
        "tier",
        pct.alias("sample_pct"),
        (coin < pct).alias("kept"),
    )


# ---------------------------------------------------------------------------
# curate-classifier-filter — model-based quality filtering at corpus scale
# ---------------------------------------------------------------------------

# The modern curation stage the heuristic tiers (Gopher rules, quality
# sampling) feed into: a LINEAR CLASSIFIER over hashed bag-of-words
# features scoring every document, with the weight vector broadcast to
# the corpus (the FineWeb-Edu / DCLM fastText-filter shape).  The weights
# here are a deterministic synthetic table (md5 of the bucket index) —
# a stand-in for trained weights with the identical execution shape: at
# production scale the table is the trained model's hashed-feature
# weights, loaded instead of generated, and everything else is unchanged.
CLF_BUCKETS = 4096      # hashed feature space (fastText-style 2^k buckets)
CLF_WEIGHT_SPAN = 1000  # weights are integers in [-1000, 1000] ("milli" units)
CLF_SALT = "clfw|"


@register(
    "curate-classifier-filter",
    oracle=f"""
    WITH w AS (
      SELECT b, {md5_bucket_duck(f"'{CLF_SALT}' || CAST(b AS VARCHAR)", 2 * CLF_WEIGHT_SPAN + 1)}
               - {CLF_WEIGHT_SPAN} AS wt
      FROM (SELECT unnest(generate_series(0, {CLF_BUCKETS - 1})) AS b)
    ),
    feats AS (
      SELECT DISTINCT doc_id,
             {md5_bucket_duck("t", CLF_BUCKETS)} AS b
      FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
            FROM documents)
    )
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           CAST(SUM(w.wt) AS BIGINT) AS logit_milli,
           (SUM(w.wt) > 0) AS keep,
           CAST(SUM(w.wt) AS DOUBLE)
             / CAST(count(*) * {CLF_WEIGHT_SPAN} AS DOUBLE) AS score_norm
    FROM feats f JOIN w USING (b)
    GROUP BY 1
    """,
)
def curate_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: hash each document's distinct words
    into CLF_BUCKETS presence features, score with a broadcast integer
    weight table (per-doc logit = Σ weights of present features), keep
    where the logit is positive.  This is the execution shape of the
    classifier-filter stage in modern corpus pipelines (a fastText-like
    linear model applied to every document): model application is ONE
    broadcast hash join plus a keyed integer sum — no UDF, no
    per-document model invocation.

    Determinism: features and weights are md5-derived integers; the
    logit is an exact integer sum (order-insensitive), keep is an
    integer comparison, and score_norm is one IEEE division of two
    exact integers — the proven raw-double class.  Scale (100 TB): the
    weight table is CLF_BUCKETS rows (broadcast; a trained model's
    hashed weights load the same way); the feature stream is a narrow
    (doc_id, bucket) projection through two exchanges — the presence
    distinct (whose map-side PARTIAL dedup bounds the shuffle at
    distinct (doc, bucket) pairs, not raw word volume — the reason a
    single-exchange repartition(doc_id) variant would be WORSE: it
    ships every exploded word occurrence) and the doc-cardinality score
    rollup, which is tiny.  Swapping the synthetic weights for trained
    ones changes a table, not the plan."""
    docs = load_table(spark, sf_dir, "documents")
    w = spark.range(CLF_BUCKETS).select(
        F.col("id").alias("b"),
        (
            md5_bucket_spark(
                F.concat(F.lit(CLF_SALT), F.col("id").cast("string")),
                2 * CLF_WEIGHT_SPAN + 1,
            )
            - CLF_WEIGHT_SPAN
        ).alias("wt"),
    )
    feats = (
        docs.select(
            "doc_id",
            # array_distinct BEFORE the explode: presence features only
            # need each word once per doc, and md5 is the operator's
            # dominant cost — hashing per OCCURRENCE was ~2x slower at
            # 500k docs (the oracle's DISTINCT is over buckets, so the
            # result is unchanged)
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.lower("text"), F.lit("[a-z]+"), F.lit(0)
                    )
                )
            ).alias("t"),
        )
        .select("doc_id", md5_bucket_spark(F.col("t"), CLF_BUCKETS).alias("b"))
        .distinct()
    )
    logit = F.sum("wt")
    return (
        feats.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            logit.alias("logit_milli"),
            (logit > 0).alias("keep"),
            (
                logit.cast("double")
                / (F.count(F.lit(1)) * CLF_WEIGHT_SPAN).cast("double")
            ).alias("score_norm"),
        )
    )


# ---------------------------------------------------------------------------
# curate-canonical-keep — quality-ranked survivorship per duplicate cluster
# ---------------------------------------------------------------------------


@register(
    "curate-canonical-keep",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, n_chars, source,
             {NORM_HASH_DUCK} AS content_key
      FROM documents
    ),
    r AS (
      SELECT doc_id, content_key, n_chars, source,
             CAST(count(*) OVER (PARTITION BY content_key) AS BIGINT)
               AS dup_count,
             row_number() OVER (PARTITION BY content_key
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM n
    )
    SELECT doc_id, content_key, dup_count, n_chars, source,
           (rn = 1) AS is_canonical,
           CASE WHEN rn = 1 THEN 'keep' ELSE 'drop' END AS action
    FROM r
    """,
)
def curate_canonical_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked survivorship: documents cluster by their
    CANONICAL-form digest (the dedup-normalized key: casefold +
    whitespace collapse), and each cluster keeps its highest-quality
    member — longest raw form first (most formatting preserved), doc_id
    as the total-order tie-break — emitting the full per-document
    disposition ledger (keep/drop), not just the survivors.  This is
    the survivorship step real curation pipelines run between candidate
    generation and the write: dedup-normalized answers "which clusters
    have copies", THIS op answers "which exact copy do we train on"
    (the curate-url-dedup ledger pattern applied to content clusters;
    complementary to curate-semdedup-keep's embedding medoids and
    curate-softdedup-weights' down-weighting).

    Determinism: the digest is the shared NORM_HASH lockstep expression;
    the rank order (n_chars DESC, doc_id) is total — ties cannot split.
    Scale (100 TB): one map-side digest + ONE shuffle at cluster
    cardinality; the rank window is partitioned by cluster (bounded by
    the largest duplicate family, the same partitioning every dedup
    tier already relies on), and the ledger is a map over the ranked
    rows — no second scan, no global sort."""
    from merl_etl_spark.operators.dedup import norm_hash_spark

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "source", norm_hash_spark().alias("content_key")
    )
    w_c = Window.partitionBy("content_key")
    w_r = Window.partitionBy("content_key").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    r = docs.select(
        "doc_id",
        "content_key",
        F.count(F.lit(1)).over(w_c).alias("dup_count"),
        "n_chars",
        "source",
        F.row_number().over(w_r).alias("rn"),
    )
    return r.select(
        "doc_id",
        "content_key",
        "dup_count",
        "n_chars",
        "source",
        (F.col("rn") == 1).alias("is_canonical"),
        F.when(F.col("rn") == 1, F.lit("keep")).otherwise(F.lit("drop")).alias(
            "action"
        ),
    )


# ---------------------------------------------------------------------------
# curate-mixture-sample — materialize the temperature mixture under a budget
# ---------------------------------------------------------------------------

# fraction of the corpus token count handed to the mixture as its budget
MIX_BUDGET_FRAC = 0.5
# per-million granularity of the deterministic sampling coin
MIX_PPM = 1_000_000


_MIX_COIN_DUCK = md5_bucket_duck(
    "CAST(d.doc_id AS VARCHAR) || '|mix-seed'", MIX_PPM
)


@register(
    "curate-mixture-sample",
    oracle=f"""
    WITH {MIX_WEIGHT_CTES},
    r AS (
      -- per-source keep rate in ppm: min(1, weight * budget / n_tokens)
      -- computed from the FROZEN 6-dp weight; round() before the BIGINT
      -- cast (DuckDB casts round, Spark casts truncate)
      SELECT w.source, w.weight,
             CAST(round(least(CAST(1 AS DOUBLE),
                              w.weight * CAST({MIX_BUDGET_FRAC} AS DOUBLE)
                                * w.total / w.n_tokens)
                        * {MIX_PPM}, 0) AS BIGINT) AS rate_ppm
      FROM w
    )
    SELECT d.doc_id, d.source,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           r.weight, r.rate_ppm,
           {_MIX_COIN_DUCK} AS coin_ppm,
           ({_MIX_COIN_DUCK} < r.rate_ppm) AS kept
    FROM documents d JOIN r USING (source)
    """,
)
def curate_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature-scaled mixture (the EXECUTION half of
    curate-mixture-weights): hand the mixture a token budget
    (MIX_BUDGET_FRAC of the corpus), give each source
    weight × budget tokens, and keep each document by a deterministic
    md5 coin against its source's keep rate — emitting the full
    per-document ledger (coin, rate, kept), so the sample is
    reproducible, auditable, and re-runnable incrementally (a new dump
    re-flips only its own coins; the curate-quality-sampling coin
    convention).

    Determinism: the only libm calls are the pow()s of the SHARED
    weight formula (mixture_weight_frame / MIX_WEIGHT_CTES — one
    definition per engine, review r11), frozen once at 6 dp on the
    per-source-row summary; the keep rate becomes an exact INTEGER ppm
    threshold (round before the BIGINT cast — DuckDB casts round, Spark
    casts truncate), and every keep decision is an exact integer
    md5-coin comparison through the shared md5_bucket split.

    Scale (100 TB): one per-source rollup (map-side partials), the
    per-source-row rate table broadcast back over one corpus scan, keep
    decision is a map — the whole mixture materializes in a single
    pass with no shuffle of document text."""
    docs = load_table(spark, sf_dir, "documents")
    w = mixture_weight_frame(docs)
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.col("weight")
            * F.lit(MIX_BUDGET_FRAC)
            * F.col("total").cast("double")
            / F.col("n_tokens").cast("double"),
        )
        * MIX_PPM,
        0,
    ).cast("long")
    r = w.select("source", "weight", rate.alias("rate_ppm"))
    coin = md5_bucket_spark(
        F.concat(F.col("doc_id").cast("string"), F.lit("|mix-seed")), MIX_PPM
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .join(F.broadcast(r), "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "weight",
            "rate_ppm",
            coin.alias("coin_ppm"),
            (coin < F.col("rate_ppm")).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# curate-dedup-impact — what canonical dedup costs each source
# ---------------------------------------------------------------------------


@register(
    "curate-dedup-impact",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, n_chars, source,
             len(string_split(text, ' ')) AS n_tokens,
             {NORM_HASH_DUCK} AS content_key
      FROM documents
    ),
    r AS (
      SELECT source, n_tokens,
             row_number() OVER (PARTITION BY content_key
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM n
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS doc_retention_ppm,
           CASE WHEN SUM(n_tokens) = 0 THEN 0
                ELSE CAST(SUM(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END)
                          * 1000000 // SUM(n_tokens) AS BIGINT)
           END AS token_retention_ppm
    FROM r GROUP BY 1
    """,
)
def curate_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report: what the canonical-keep survivorship rule
    (curate-canonical-keep's exact ledger — longest raw form per
    normalized-content cluster) costs EACH SOURCE, in documents and in
    whitespace tokens — the per-source retention table every curation
    run publishes before committing a corpus version ("crawl-B lost 40%
    of its tokens to dedup against crawl-A" is a mixture-weights input,
    not a footnote; see curate-mixture-weights).  Retention rates emit
    as exact integer ppm (zero-guarded floor divisions).

    The survivorship rank is the SAME (NORM_HASH, n_chars DESC, doc_id)
    rule curate-canonical-keep registers — a doc counted kept here is
    exactly a doc that ledger marks 'keep' (pinned by pytest cross-
    consistency).

    Scale (100 TB): identical physics to curate-canonical-keep — one
    map-side digest + token count, ONE shuffle at content-key grain for
    the rank, then a keyed source rollup.  No second corpus scan."""
    from merl_etl_spark.operators.dedup import norm_hash_spark

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        norm_hash_spark().alias("content_key"),
    )
    w_r = Window.partitionBy("content_key").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    r = docs.select(
        "source", "n_tokens", F.row_number().over(w_r).alias("rn")
    )
    kept = F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
    kept_tokens = F.sum(F.when(F.col("rn") == 1, F.col("n_tokens")).otherwise(0))
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        kept.alias("n_kept"),
        F.sum("n_tokens").alias("tokens_total"),
        kept_tokens.alias("tokens_kept"),
        F.expr(
            "sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 1000000 DIV count(*)"
        ).alias("doc_retention_ppm"),
        F.when(F.sum("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END)"
                " * 1000000 DIV sum(n_tokens)"
            )
        )
        .cast("bigint")
        .alias("token_retention_ppm"),
    )


# ---------------------------------------------------------------------------
# curate-upsample-plan — class-rebalancing repetition factors per language
# ---------------------------------------------------------------------------


@register(
    "curate-upsample-plan",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents WHERE lang IS NOT NULL GROUP BY 1
    ),
    t AS (SELECT CAST(max(n_docs) AS BIGINT) AS target FROM c)
    SELECT c.lang, c.n_docs, t.target,
           CAST(t.target * 1000000 // c.n_docs AS BIGINT) AS up_factor_ppm,
           CAST((t.target * 1000000 // c.n_docs) * c.n_docs // 1000000
                AS BIGINT) AS planned_docs,
           CAST((t.target * 1000000 // c.n_docs) // 1000000 AS BIGINT)
             AS full_epochs,
           CAST((t.target * 1000000 // c.n_docs) % 1000000 AS BIGINT)
             AS partial_epoch_ppm
    FROM c, t
    """,
)
def curate_upsample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-rebalancing plan: per language, the repetition factor that
    brings its document mass up to the LARGEST class — the oversampling
    side of mixture curation (curate-source-cap trims the head;
    curate-mixture-sample downsamples to a token budget; THIS plans the
    minority upweighting, split into whole epochs plus a partial-epoch
    keep-rate the md5-coin sampler executes).

    Determinism: pure integer arithmetic — the factor is a ppm floor
    quotient of exact counts, epochs/remainder its integer split; no
    floats anywhere.  (target·10⁶ overflows int64 only past ~9.2
    trillion docs per class.)

    Scale (100 TB): one map-side-combinable keyed count per language +
    a 1-row max broadcast back across the |langs|-row summary — the
    plan never touches documents again; execution is the
    curate-mixture-sample coin at scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.where(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    from merl_etl_spark.lineage import cut_lineage

    c = cut_lineage(c, eager=False)  # two consumers: rows + the max
    t = c.agg(F.max("n_docs").alias("target"))
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        "target",
        F.expr("target * 1000000 DIV n_docs").alias("up_factor_ppm"),
        F.expr("(target * 1000000 DIV n_docs) * n_docs DIV 1000000").alias(
            "planned_docs"
        ),
        F.expr("(target * 1000000 DIV n_docs) DIV 1000000").alias("full_epochs"),
        F.expr("(target * 1000000 DIV n_docs) % 1000000").alias(
            "partial_epoch_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# curate-truncation-plan — per-source cost of a max-length cutoff
# ---------------------------------------------------------------------------

# whitespace-token truncation budget per document.  Fixture docs run
# ~20-60 words, so this cutoff actually bites at every SF (a vacuous
# budget would leave the truncated branch untested).
TRUNC_MAX_TOKENS = 32


@register(
    "curate-truncation-plan",
    oracle=f"""
    WITH d AS (
      SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents WHERE source IS NOT NULL
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN n_tok > {TRUNC_MAX_TOKENS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated_docs,
           CAST(SUM(least(n_tok, {TRUNC_MAX_TOKENS})) AS BIGINT)
             AS n_kept_tokens,
           CAST(SUM(greatest(n_tok - {TRUNC_MAX_TOKENS}, 0)) AS BIGINT)
             AS n_lost_tokens,
           CAST(SUM(greatest(n_tok - {TRUNC_MAX_TOKENS}, 0)) * 1000000
                // SUM(n_tok) AS BIGINT) AS loss_ppm
    FROM d GROUP BY 1
    """,
)
def curate_truncation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-budget audit: per source, what a TRUNC_MAX_TOKENS
    max-sequence cutoff costs — documents clipped, tokens kept/lost,
    loss rate — the sizing study run before fixing a training
    max_seq_len (too low silently deletes the long-document tail of
    exactly the sources whose depth you bought; this quantifies that
    before the tokenizer ever runs).  Completes the budget-planning
    tier: curate-token-pack packs sequences, curate-mixture-sample
    spends a corpus budget, THIS prices the per-document cutoff.

    Determinism: whitespace token counts (the text-tokens definition),
    integer least/greatest clips, exact sums, one ppm floor quotient —
    no floats.

    Scale (100 TB): one scan, one map-side-combinable keyed rollup at
    source cardinality.  Token counting is size(split(…)) — expression-
    level, codegen-friendly, no UDF."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    d = docs.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    lost = F.greatest(F.col("n_tok") - TRUNC_MAX_TOKENS, F.lit(0))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum((F.col("n_tok") > TRUNC_MAX_TOKENS).cast("long")).alias(
            "n_truncated_docs"
        ),
        F.sum(F.least(F.col("n_tok"), F.lit(TRUNC_MAX_TOKENS))).alias(
            "n_kept_tokens"
        ),
        F.sum(lost).alias("n_lost_tokens"),
        F.expr(
            f"SUM(greatest(n_tok - {TRUNC_MAX_TOKENS}, 0)) * 1000000"
            " DIV SUM(n_tok)"
        ).alias("loss_ppm"),
    )


# ---------------------------------------------------------------------------
# curate-filter-funnel — first-failing-rule attribution of the quality gate
# ---------------------------------------------------------------------------

# the Gopher rule chain in gate order (text-gopher-rules' five flags).
# Funnel semantics: a document is attributed to the FIRST rule that
# rejects it, so stage counts are the waterfall a curation run reports;
# tests/test_round11_wave19.py pins stage-vs-flag consistency against
# text-gopher-rules' own output so the two surfaces cannot drift.
_FUNNEL_STAGES_DUCK = """
      CASE WHEN NOT (n_words BETWEEN 50 AND 100000) THEN '1-word-count'
           WHEN NOT (CAST(n_nonspace AS DOUBLE) / n_words
                     BETWEEN 3.0 AND 10.0) THEN '2-mean-word-len'
           WHEN NOT (CAST(n_symbols AS DOUBLE) / n_words <= 0.1)
             THEN '3-symbol-ratio'
           WHEN NOT (CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8)
             THEN '4-alpha-words'
           WHEN NOT (n_stop_distinct >= 2) THEN '5-stop-words'
           ELSE '6-keep' END
"""


def _filter_funnel_oracle() -> str:
    from merl_etl_spark.operators.text_analysis import _GOPHER_STOPS

    stops = ", ".join(f"'{s}'" for s in _GOPHER_STOPS)
    return f"""
    WITH m AS (
      SELECT source, string_split(text, ' ') AS words,
             length(replace(text, ' ', '')) AS n_nonspace,
             len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_symbols
      FROM documents WHERE source IS NOT NULL
    ),
    c AS (
      SELECT source, len(words) AS n_words, n_nonspace, n_symbols,
             len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
               AS n_alpha_words,
             len(list_distinct(list_filter(words, w -> w IN ({stops}))))
               AS n_stop_distinct
      FROM m
    ),
    staged AS (
      SELECT source, {_FUNNEL_STAGES_DUCK} AS stage FROM c
    ),
    g AS (
      SELECT source, stage, CAST(count(*) AS BIGINT) AS n_docs
      FROM staged GROUP BY 1, 2
    ),
    t AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS total FROM g GROUP BY 1)
    SELECT g.source, g.stage, g.n_docs,
           CAST(g.n_docs * 1000000 // t.total AS BIGINT) AS stage_ppm
    FROM g JOIN t USING (source)
    """


@register("curate-filter-funnel", oracle=_filter_funnel_oracle())
def curate_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate waterfall: every document is attributed to the FIRST
    Gopher rule that rejects it (text-gopher-rules' five flags, in gate
    order), per source — the curation-debugging report that says which
    rule is doing the killing and where (a source whose mass dies at
    '1-word-count' needs a segmenter, not a better classifier; one dying
    at '5-stop-words' is probably non-prose).  text-gopher-rules emits
    the per-document flags; THIS is the rollup a pipeline run actually
    prints, and the wave-19 pytest pins the two surfaces against each
    other so the rule chain cannot drift.

    Determinism: the stage label is a CASE over the same rational-vs-
    literal comparisons the flag query pins; counts and ppm shares are
    exact integers.

    Scale (100 TB): one scan (the rule expressions are codegen'd array
    ops), one keyed rollup at (source × 6 stages), a source-grain total
    join.  Nothing shuffles at document grain."""
    from merl_etl_spark.operators.text_analysis import _GOPHER_STOPS

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    words = F.split("text", " ")
    m = docs.select(
        "source",
        words.alias("words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_nonspace"
        ),
        (
            F.size(F.regexp_extract_all(F.col("text"), F.lit("#"), F.lit(0)))
            + F.size(
                F.regexp_extract_all(F.col("text"), F.lit(r"\.\.\."), F.lit(0))
            )
        ).alias("n_symbols"),
    )
    c = m.select(
        "source",
        F.size("words").cast("long").alias("n_words"),
        "n_nonspace",
        "n_symbols",
        F.size(F.filter("words", lambda w: w.rlike("[a-zA-Z]"))).alias(
            "n_alpha_words"
        ),
        F.size(
            F.array_distinct(
                F.filter(
                    "words",
                    lambda w: w.isin(*_GOPHER_STOPS),
                )
            )
        ).alias("n_stop_distinct"),
    )
    staged = c.select("source", F.expr(_FUNNEL_STAGES_DUCK).alias("stage"))
    g = staged.groupBy("source", "stage").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from merl_etl_spark.lineage import cut_lineage

    g = cut_lineage(g, eager=False)  # two consumers: rows + totals
    t = g.groupBy("source").agg(F.sum("n_docs").alias("total"))
    return g.join(F.broadcast(t), "source").select(
        "source",
        "stage",
        "n_docs",
        F.expr("n_docs * 1000000 DIV total").alias("stage_ppm"),
    )


# ---------------------------------------------------------------------------
# curate-anneal-schedule — two-phase mixture with a quality-gated anneal
# ---------------------------------------------------------------------------

# anneal-phase share of the total token budget, and its (flatter)
# temperature.  Midtraining shape: ~90% of tokens follow the standard
# temperature mixture; the last ~10% re-draw from above-average-quality
# sources only, at a flatter alpha (closer to uniform over survivors).
ANNEAL_BUDGET_PCT = 10
ANNEAL_ALPHA = 0.3


def _anneal_oracle() -> str:
    funnel = _filter_funnel_oracle()
    return f"""
    WITH {MIX_WEIGHT_CTES},
    fun AS MATERIALIZED ({funnel}),
    keep AS (SELECT source, stage_ppm AS keep_ppm FROM fun
             WHERE stage = '6-keep'),
    gk AS (
      SELECT CAST(SUM(CASE WHEN stage = '6-keep' THEN n_docs ELSE 0 END)
                  * 1000000 // SUM(n_docs) AS BIGINT) AS global_keep_ppm
      FROM fun
    ),
    base AS (
      SELECT w.source, w.n_tokens, w.weight,
             COALESCE(k.keep_ppm, CAST(0 AS BIGINT)) AS keep_ppm,
             g.global_keep_ppm,
             CAST(w.total * (100 - {ANNEAL_BUDGET_PCT}) // 100 AS BIGINT)
               AS b_pre,
             CAST(w.total * {ANNEAL_BUDGET_PCT} // 100 AS BIGINT) AS b_ann,
             CAST(round(pow(w.share, {ANNEAL_ALPHA}), 6) AS DECIMAL(18,6))
               AS pw
      FROM w LEFT JOIN keep k ON k.source = w.source CROSS JOIN gk g
    ),
    e AS (
      SELECT *, keep_ppm >= global_keep_ppm AS eligible FROM base
    ),
    n AS (
      SELECT *, SUM(CASE WHEN eligible THEN pw END) OVER () AS norm FROM e
    ),
    alloc AS (
      SELECT source, n_tokens, keep_ppm, eligible AS anneal_eligible,
             weight AS pre_weight,
             CAST(floor(weight * CAST(b_pre AS DOUBLE)) AS BIGINT)
               AS pre_tokens,
             CASE WHEN eligible
                  THEN round(CAST(pw AS DOUBLE) / CAST(norm AS DOUBLE), 6)
                  END AS anneal_weight,
             CASE WHEN eligible
                  THEN CAST(floor(round(CAST(pw AS DOUBLE)
                                        / CAST(norm AS DOUBLE), 6)
                                  * CAST(b_ann AS DOUBLE)) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS anneal_tokens
      FROM n
    )
    SELECT source, n_tokens, keep_ppm, anneal_eligible, pre_weight,
           pre_tokens, anneal_weight, anneal_tokens,
           CAST(floor(CAST(pre_tokens + anneal_tokens AS DOUBLE)
                      * CAST(1000000 AS DOUBLE)
                      / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS epochs_ppm
    FROM alloc
    """


@register("curate-anneal-schedule", oracle=_anneal_oracle())
def curate_anneal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase training-mixture schedule (the midtraining/anneal shape:
    a long pretrain phase on the temperature mixture, then a short
    anneal on high-quality data only): phase 1 allocates
    {100 - ANNEAL_BUDGET_PCT}% of the corpus token budget by the PINNED
    curate-mixture-weights temperature weights; phase 2 allocates the
    remaining {ANNEAL_BUDGET_PCT}% at the flatter alpha={ANNEAL_ALPHA}
    restricted to sources whose Gopher keep rate (the PINNED
    curate-filter-funnel '6-keep' share) is at or above the corpus-wide
    rate.  epochs_ppm = allocated/available tokens per source — the
    repetition factor the data loader actually needs (>10⁶ means that
    source repeats within the run).

    Composition, not re-derivation: the weight table is
    mixture_weight_frame / MIX_WEIGHT_CTES and the quality gate is
    curate-filter-funnel's own output — both already single-sourced per
    engine, so this schedule CANNOT drift from the surfaces it cites.

    Determinism: the anneal pow() (driver-green class) is rounded once
    and FROZEN as decimal before the eligible-sum normalizer (exact,
    order-free); token allocations are floor(weight × integer budget)
    where both factors are engine-identical doubles (budgets stay under
    2^53 to ~9·10¹⁵ tokens — document past that); epochs_ppm is one
    shared floor expression.  NULL-source docs keep their mixture row
    (the unattributed shard is schedulable mass) but never pass the
    quality gate (the funnel audits attributed sources only).

    Scale (100 TB): both substrates are one corpus scan each collapsing
    to source grain; everything here joins and windows |sources|-row
    summaries."""
    docs = load_table(spark, sf_dir, "documents")
    mw = mixture_weight_frame(docs)
    funnel = curate_filter_funnel(spark, sf_dir)
    from merl_etl_spark.lineage import cut_lineage

    funnel = cut_lineage(funnel, eager=False)  # two consumers: keep + global
    keep = funnel.where(F.col("stage") == "6-keep").select(
        "source", F.col("stage_ppm").alias("keep_ppm")
    )
    gk = funnel.agg(
        F.expr(
            "CAST(SUM(CASE WHEN stage = '6-keep' THEN n_docs ELSE 0 END)"
            " * 1000000 DIV SUM(n_docs) AS BIGINT)"
        ).alias("global_keep_ppm")
    )
    base = (
        mw.join(keep, "source", "left")
        .crossJoin(F.broadcast(gk))
        .selectExpr(
            "source",
            "n_tokens",
            "weight",
            "COALESCE(keep_ppm, CAST(0 AS BIGINT)) AS keep_ppm",
            "global_keep_ppm",
            f"CAST(total * (100 - {ANNEAL_BUDGET_PCT}) DIV 100 AS BIGINT) AS b_pre",
            f"CAST(total * {ANNEAL_BUDGET_PCT} DIV 100 AS BIGINT) AS b_ann",
            f"CAST(round(pow(share, {ANNEAL_ALPHA}), 6) AS DECIMAL(18,6)) AS pw",
        )
        .withColumn("eligible", F.col("keep_ppm") >= F.col("global_keep_ppm"))
    )
    n = base.withColumn(
        "norm",
        F.sum(F.when(F.col("eligible"), F.col("pw"))).over(Window.partitionBy()),
    )
    alloc = n.selectExpr(
        "source",
        "n_tokens",
        "keep_ppm",
        "eligible AS anneal_eligible",
        "weight AS pre_weight",
        "CAST(floor(weight * CAST(b_pre AS DOUBLE)) AS BIGINT) AS pre_tokens",
        "CASE WHEN eligible"
        " THEN round(CAST(pw AS DOUBLE) / CAST(norm AS DOUBLE), 6)"
        " END AS anneal_weight",
        "CASE WHEN eligible"
        " THEN CAST(floor(round(CAST(pw AS DOUBLE) / CAST(norm AS DOUBLE), 6)"
        "                 * CAST(b_ann AS DOUBLE)) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END AS anneal_tokens",
    )
    return alloc.selectExpr(
        "source",
        "n_tokens",
        "keep_ppm",
        "anneal_eligible",
        "pre_weight",
        "pre_tokens",
        "anneal_weight",
        "anneal_tokens",
        "CAST(floor(CAST(pre_tokens + anneal_tokens AS DOUBLE)"
        " * CAST(1000000 AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS BIGINT)"
        " AS epochs_ppm",
    )


# ---------------------------------------------------------------------------
# curate-budget-select — quality-first selection under a token budget
# ---------------------------------------------------------------------------

# per-source keep budget as a percent of that source's own token mass,
# and the score-band width for the scalable two-pass selection.  Both
# are dials: the budget is policy, the band width trades boundary-band
# size against band-summary cardinality.
BUDGET_PCT = 30
BUDGET_BAND_MILLI = 1000


def _budget_select_oracle() -> str:
    from merl_etl_spark.operators.text_analysis import (
        READ_METRICS_DUCK,
        flesch_score_expr,
    )

    score = flesch_score_expr("//")
    return f"""
    WITH m AS (
      SELECT source, doc_id, {READ_METRICS_DUCK}
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    sc AS (
      SELECT source, doc_id, n_words AS n_tokens,
             GREATEST({score}, 0) AS score
      FROM m
    ),
    bud AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(n_tokens) * {BUDGET_PCT} // 100 AS BIGINT) AS budget_tokens
      FROM sc GROUP BY 1
    ),
    r AS (
      SELECT source, doc_id, n_tokens, score,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY score DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM sc
    ),
    j AS (SELECT r.*, b.budget_tokens FROM r JOIN bud b USING (source)),
    cut AS (
      SELECT source,
             CAST(max(score) // {BUDGET_BAND_MILLI} AS BIGINT) AS cut_band
      FROM j WHERE cum > budget_tokens GROUP BY 1
    ),
    kept AS (
      SELECT j.source,
             CAST(count(*) AS BIGINT) AS n_kept,
             CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS tokens_kept,
             CAST(COALESCE(SUM(CASE WHEN score // {BUDGET_BAND_MILLI}
                                         = c.cut_band THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_boundary_kept
      FROM j LEFT JOIN cut c USING (source)
      WHERE cum <= budget_tokens GROUP BY 1
    )
    SELECT b.source, b.total_tokens, b.budget_tokens,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept,
           CAST(COALESCE(k.tokens_kept, 0) * 1000000 // b.total_tokens
                AS BIGINT) AS kept_ppm,
           c.cut_band,
           CAST(COALESCE(k.n_boundary_kept, 0) AS BIGINT) AS n_boundary_kept
    FROM bud b
    LEFT JOIN kept k ON k.source = b.source
    LEFT JOIN cut c ON c.source = b.source
    """


@register("curate-budget-select", oracle=_budget_select_oracle())
def curate_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-first selection under a token budget — THE core curation
    action: per source, keep the maximal prefix of documents in
    descending quality order (the PINNED text-readability Flesch score,
    clamped at 0; ties on doc_id) whose running token mass stays within
    {BUDGET_PCT}% of the source's tokens.  Reports the kept mass, the
    cut band, and how many survivors sit ON the boundary band (the
    docs a ±1-point score change would swap).

    Spark-first two-pass shape (the oracle states the naive
    single-window semantics; the plan never runs it): pass 1 rolls doc
    mass up to (source × score-band) — ≤207 bands at
    {BUDGET_BAND_MILLI} milli-points — and a BOUNDED window over that
    summary finds each source's boundary band and its token prefix;
    pass 2 ranks ONLY the boundary band's documents (a per-source
    partition that is one band wide, not the source) against the
    remaining budget.  Equivalence to the naive order holds because
    the band is a monotone function of the score (scores clamped ≥ 0 —
    floor-division direction never disagrees between engines), so
    (band DESC, score DESC, doc_id) IS (score DESC, doc_id).

    Determinism: scores, bands, budgets, and running masses are pure
    integers; the keep rule cum ≤ budget is an integer comparison;
    kept_ppm is floor-division.  No float anywhere.

    Scale (100 TB): one metric scan; one map-side-combinable rollup to
    band grain; bounded band-summary windows; doc-grain ranking only
    inside the single boundary band per source."""
    from merl_etl_spark.operators.text_analysis import (
        flesch_score_expr,
        readability_metrics,
    )
    from merl_etl_spark.lineage import cut_lineage

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    m = readability_metrics(docs, "source", "doc_id")
    sc = m.select(
        "source",
        "doc_id",
        F.col("n_words").alias("n_tokens"),
        F.greatest(F.expr(flesch_score_expr("DIV")), F.lit(0)).alias("score"),
    )
    sc = cut_lineage(sc, eager=False)  # consumers: budgets, bands, boundary
    bud = sc.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(f"CAST(SUM(n_tokens) * {BUDGET_PCT} DIV 100 AS BIGINT)").alias(
            "budget_tokens"
        ),
    )
    band = F.expr(f"score DIV {BUDGET_BAND_MILLI}")
    bands = sc.groupBy("source", band.alias("band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tok"),
    )
    w_desc = (
        Window.partitionBy("source")
        .orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bands = bands.withColumn("bcum", F.sum("tok").over(w_desc)).join(
        F.broadcast(bud), "source"
    )
    bands = cut_lineage(bands, eager=False)  # consumers: cut + full-kept
    cut = (
        bands.where(F.col("bcum") > F.col("budget_tokens"))
        .groupBy("source")
        .agg(F.max("band").cast("long").alias("cut_band"))
    )
    full_kept = (
        bands.join(F.broadcast(cut), "source", "left")
        .where(F.col("cut_band").isNull() | (F.col("band") > F.col("cut_band")))
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("nf"),
            F.sum("tok").alias("tf"),
        )
    )
    # boundary-band prefix (tokens already committed above the band)
    pb = (
        bands.join(F.broadcast(cut), "source")
        .where(F.col("band") == F.col("cut_band"))
        .select(
            "source",
            "cut_band",
            (F.col("bcum") - F.col("tok")).alias("prefix_tok"),
            "budget_tokens",
        )
    )
    bdocs = sc.withColumn("band", band).join(
        F.broadcast(pb.withColumnRenamed("cut_band", "band")),
        ["source", "band"],
    )
    w_doc = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bk = (
        bdocs.withColumn("dcum", F.sum("n_tokens").over(w_doc))
        .where(F.col("prefix_tok") + F.col("dcum") <= F.col("budget_tokens"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("nb"), F.sum("n_tokens").alias("tb"))
    )
    out = (
        bud.join(full_kept, "source", "left")
        .join(bk, "source", "left")
        .join(cut, "source", "left")
    )
    return out.selectExpr(
        "source",
        "total_tokens",
        "budget_tokens",
        "CAST(COALESCE(nf, 0) + COALESCE(nb, 0) AS BIGINT) AS n_kept",
        "CAST(COALESCE(tf, 0) + COALESCE(tb, 0) AS BIGINT) AS tokens_kept",
        "CAST((COALESCE(tf, 0) + COALESCE(tb, 0)) * 1000000"
        " DIV total_tokens AS BIGINT) AS kept_ppm",
        "cut_band",
        "CAST(COALESCE(nb, 0) AS BIGINT) AS n_boundary_kept",
    )


# ---------------------------------------------------------------------------
# curate-pareto-frontier — two-objective skyline per source
# ---------------------------------------------------------------------------


@register(
    "curate-pareto-frontier",
    oracle="""
    WITH obj AS (
      SELECT doc_id, source,
             CAST(length(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST(length(list_distinct(list_filter(string_split(text, ' '),
                                                   x -> x <> '')))
                  AS BIGINT) AS n_distinct
      FROM documents
      WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    o AS (SELECT * FROM obj WHERE n_tokens > 0),
    bands AS (
      SELECT source, n_distinct, max(n_tokens) AS band_max
      FROM o GROUP BY 1, 2
    ),
    dom AS (
      SELECT source, n_distinct,
             max(band_max) OVER (
               PARTITION BY source ORDER BY n_distinct DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_above
      FROM bands
    )
    SELECT o.doc_id, o.source, o.n_tokens, o.n_distinct
    FROM o JOIN dom ON dom.source = o.source
                   AND dom.n_distinct = o.n_distinct
    WHERE dom.best_above IS NULL OR dom.best_above <= o.n_tokens
    """,
)
def curate_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-objective skyline per source: the documents not strictly
    dominated on (token count, distinct-token count) — a doc is dropped
    only if some other doc in its source beats it on BOTH length and
    lexical diversity.  This is the classic Pareto-frontier selection a
    curation pass runs when two quality axes trade off (longer docs
    repeat themselves; diverse docs run short) and a scalar weighting
    would bake in an arbitrary exchange rate.

    Dominance test at BAND grain (the skyline trick that avoids the
    quadratic all-pairs check): group docs by n_distinct, keep each
    band's max n_tokens, and a doc is dominated iff the running max of
    band maxima over STRICTLY HIGHER n_distinct exceeds its n_tokens —
    exact strict semantics (ties on either axis never dominate), pure
    integers end to end.

    Scale (100 TB): the corpus-sized work is one tokenize + doc-grain
    objective computation (a map) and one (source × n_distinct) band
    rollup; the dominance window is keyed by source over bands bounded
    by the VALUE RANGE of n_distinct (vocabulary-bounded, corpus-size
    independent); the final filter is an equi-join of docs against the
    band verdicts."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    words = F.filter(F.split("text", " "), lambda x: x != "")
    o = docs.select(
        "doc_id",
        "source",
        F.size(words).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
    ).where(F.col("n_tokens") > 0)
    from merl_etl_spark.lineage import cut_lineage

    o = cut_lineage(o, eager=False)  # two consumers: bands + final filter
    bands = o.groupBy("source", "n_distinct").agg(
        F.max("n_tokens").alias("band_max")
    )
    w_above = (
        Window.partitionBy("source")
        .orderBy(F.col("n_distinct").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dom = bands.select(
        "source",
        "n_distinct",
        F.max("band_max").over(w_above).alias("best_above"),
    )
    return (
        o.join(F.broadcast(dom), ["source", "n_distinct"])
        .where(
            F.col("best_above").isNull()
            | (F.col("best_above") <= F.col("n_tokens"))
        )
        .select("doc_id", "source", "n_tokens", "n_distinct")
    )


# ---------------------------------------------------------------------------
# curate-dataset-card — per-source dataset-card summary row
# ---------------------------------------------------------------------------


@register(
    "curate-dataset-card",
    oracle="""
    WITH d AS (
      SELECT source, lang, md5(text) AS h,
             CAST(length(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS BIGINT) AS toks,
             CAST(octet_length(encode(text)) AS BIGINT) AS chars
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    base AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS n_tokens,
             CAST(SUM(chars) AS BIGINT) AS n_bytes,
             CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM d GROUP BY 1
    ),
    lc AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM d WHERE lang IS NOT NULL GROUP BY 1, 2
    ),
    top_lang AS (
      SELECT source, lang, n FROM (
        SELECT source, lang, n,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n DESC, lang) AS rn
        FROM lc
      ) WHERE rn = 1
    )
    SELECT b.source, b.n_docs, b.n_tokens, b.n_bytes,
           b.n_unique_texts, b.n_langs,
           t.lang AS top_lang,
           CAST(t.n * 1000000 // b.n_docs AS BIGINT) AS top_lang_ppm,
           CAST((b.n_docs - b.n_unique_texts) * 1000000 // b.n_docs
                AS BIGINT) AS dup_ppm,
           CAST(b.n_bytes // b.n_docs AS BIGINT) AS avg_bytes
    FROM base b JOIN top_lang t USING (source)
    """,
)
def curate_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card row a corpus release ships per source: volume
    (docs / tokens / bytes), exact-duplicate rate (md5-distinct), the
    language profile (count + dominant language with its share), and
    mean doc size — the summary every mixture/curation decision starts
    from, computed in one pass instead of five notebook cells.

    Determinism: counts and md5-distinct are exact; the language
    election reuses the agg-group-mode total tie-break (count DESC,
    lang ASC); shares are positive-integer floor divisions.

    Scale (100 TB): one corpus scan to (source, lang, hash, sizes)
    grain; the distinct-hash count is a keyed two-level aggregate; the
    language election window is keyed by source over at most |langs|
    rows.  Output is |sources| rows."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    words = F.filter(F.split("text", " "), lambda x: x != "")
    d = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.size(words).cast("long").alias("toks"),
        F.octet_length("text").cast("long").alias("chars"),
    )
    from merl_etl_spark.lineage import cut_lineage

    d = cut_lineage(d, eager=False)  # two consumers: base + lang election
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.sum("chars").cast("long").alias("n_bytes"),
        F.countDistinct("h").cast("long").alias("n_unique_texts"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    lc = d.where(F.col("lang").isNotNull()).groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("lang").asc()
    )
    top_lang = (
        lc.select("source", "lang", "n", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
    )
    return (
        base.join(F.broadcast(top_lang), "source")
        .selectExpr(
            "source", "n_docs", "n_tokens", "n_bytes",
            "n_unique_texts", "n_langs",
            "lang AS top_lang",
            "CAST(n * 1000000 DIV n_docs AS BIGINT) AS top_lang_ppm",
            "CAST((n_docs - n_unique_texts) * 1000000 DIV n_docs"
            " AS BIGINT) AS dup_ppm",
            "CAST(n_bytes DIV n_docs AS BIGINT) AS avg_bytes",
        )
    )
