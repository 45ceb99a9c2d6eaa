"""Training-data curation operators: document chunking, deterministic
train/test splitting, and the composed quality-filter pipeline — the
stages between raw corpus and training shards in an LLM data pipeline
(BASELINE.json north star), all pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap


@register(
    "text-chunking",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(generate_series(
               0, greatest((len(w) - 1) // {CHUNK_STRIDE}, 0))) AS chunk_id
      FROM words
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(w[chunk_id * {CHUNK_STRIDE} + 1 :
                             chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ') AS chunk_text,
           len(w[chunk_id * {CHUNK_STRIDE} + 1 :
                 chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS n_tokens
    FROM idx
    WHERE len(w[chunk_id * {CHUNK_STRIDE} + 1 :
                chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) > 0
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunking: CHUNK_TOKENS(=64)-token windows
    sliding by CHUNK_STRIDE(=48) — 16-token overlap, the standard
    pretraining shard preparation.  explode(sequence) is a flatMap; no
    shuffle; chunk text is sliced from the split array, never re-scanned."""
    docs = load_table(spark, sf_dir, "documents").withColumn("w", F.split("text", " "))
    n_chunks = F.greatest(
        ((F.size("w") - 1) / CHUNK_STRIDE).cast("bigint"), F.lit(0)
    )
    chunked = docs.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks)).alias("chunk_id"),
    ).withColumn(
        "chunk", F.slice(F.col("w"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS)
    )
    return (
        chunked.filter(F.size("chunk") > 0)
        .select(
            "doc_id",
            "chunk_id",
            F.array_join("chunk", " ").alias("chunk_text"),
            F.size("chunk").cast("long").alias("n_tokens"),
        )
    )


# the content-stable split assignment — ONE definition per engine,
# shared by sample-hash-split and dq-split-leakage (round 11 wave 9) so
# the split boundary audited is provably the split boundary produced
SPLIT_BUCKET_DUCK = (
    "('0x' || substr(md5(text || '|split-seed'), 1, 8))::BIGINT % 100"
)
SPLIT_CASE_DUCK = (
    f"CASE WHEN {SPLIT_BUCKET_DUCK} < 90 THEN 'train' ELSE 'test' END"
)


def split_assign_spark() -> F.Column:
    """'train'/'test' per document — the Spark twin of SPLIT_CASE_DUCK."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("text"), F.lit("|split-seed"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return F.when(bucket < 90, "train").otherwise("test")


@register(
    "sample-hash-split",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, lang, {SPLIT_CASE_DUCK} AS split
      FROM documents
    )
    SELECT lang, split, count(*) AS n_docs
    FROM assigned
    GROUP BY 1, 2
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by content-stable hash bucket
    (never random() — reruns and backfills must route every doc to the
    same split).  The bucket hashes the document TEXT, not its id: ids can
    be re-assigned by a backfill, which would silently migrate documents
    across the train/test boundary (test contamination); content cannot.
    The md5-derived bucket is engine-portable and uniform; stratification
    falls out of grouping by (lang, split)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", split_assign_spark().alias("split"))
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "curate-pipeline",
    oracle=r"""
    WITH m AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio
    FROM m
    WHERE dup_rank = 1
      AND n_tokens >= 40
      AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.30
    """,
)
def curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation filter: exact-dedup keeper selection (keep
    lowest doc_id per content digest) ∘ length floor ∘ vocabulary-diversity
    floor — a single-pass plan where dedup's window and the quality
    predicates share one scan.  The Gopher/C4-style filter chain as the
    engine expresses it."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    m = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n_distinct"),
        F.row_number().over(w).alias("dup_rank"),
    )
    return (
        m.filter(
            (F.col("dup_rank") == 1)
            & (F.col("n_tokens") >= 40)
            & (F.col("n_distinct").cast("double") / F.col("n_tokens") >= 0.30)
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias("distinct_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# sample-poisson-bootstrap — deterministic bootstrap replicates of a mean
# ---------------------------------------------------------------------------

# bootstrap replicate count and the Poisson(1) weight table: the md5 coin
# in [0, 1000) maps to a weight via the cumulative pmf (368/368/184/61/19
# per-mille for w = 0..4, the >=5 tail folded into 4).  Deterministic —
# every rerun draws the same resample.
BOOT_REPLICATES = 16
_BOOT_CUTS = (368, 736, 920, 981)


def _boot_weight_sql(coin: str) -> str:
    c = _BOOT_CUTS
    return (
        f"CASE WHEN {coin} < {c[0]} THEN 0 WHEN {coin} < {c[1]} THEN 1 "
        f"WHEN {coin} < {c[2]} THEN 2 WHEN {coin} < {c[3]} THEN 3 ELSE 4 END"
    )


def _bootstrap_oracle() -> str:
    from merl_etl_spark.operators.dedup import md5_bucket_duck

    coin = md5_bucket_duck(
        "doc_id::VARCHAR || '|boot' || b::VARCHAR", 1000
    )
    return f"""
    WITH reps AS (
      SELECT d.doc_id, d.n_chars, r.b,
             {_boot_weight_sql(f"({coin})")} AS w
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(0,
                    {BOOT_REPLICATES - 1})) AS b) r
      WHERE d.doc_id IS NOT NULL
    )
    SELECT b AS replicate,
           CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
             AS mean_chars
    FROM reps GROUP BY 1
    """


@register("sample-poisson-bootstrap", oracle=_bootstrap_oracle())
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the corpus mean document length: every
    document contributes a Poisson(1)-distributed weight to each of
    BOOT_REPLICATES resamples (Chamandy 2012 — the bootstrap that
    streams: no sampling WITH replacement from an unmaterializable
    corpus, just a deterministic per-(doc, replicate) weight), yielding
    the spread any corpus statistic should be reported with.

    Determinism: the weight is an md5-coin lookup in a baked cumulative
    pmf table (the md5_bucket twins again — reruns draw the SAME
    resample); replicate sums are exact integers; the mean is one IEEE
    division per replicate row.

    Scale (100 TB): the replicate fan-out is a per-row flatMap (×B rows
    map-side) that partial-aggregates to B rows per partition BEFORE the
    only shuffle — B × #partitions rows move, never B × corpus.  This
    is why Poisson bootstrap exists: classical resampling would shuffle
    the corpus B times."""
    from merl_etl_spark.operators.dedup import md5_bucket_duck

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    from merl_etl_spark.operators.dedup import md5_bucket_spark

    reps = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPLICATES - 1))).alias(
            "b_i"
        ),
    ).select(
        "doc_id",
        "n_chars",
        # cast to long: sequence(int, int) explodes as int32, and the
        # oracle's generate_series is int64 — the driver's arrow-dtype
        # gate rejects exactly this width drift (cast in a separate
        # select: a generator cannot be nested inside expressions)
        F.col("b_i").cast("long").alias("b"),
    )
    # the single-sourced md5 coin (dedup's bucket twins), as a column
    coin = md5_bucket_spark(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("|boot"), F.col("b").cast("string")
        ),
        1000,
    )
    reps = reps.withColumn("coin", coin)
    w = F.expr(_boot_weight_sql("coin"))
    return (
        reps.select(F.col("b").alias("replicate"), w.alias("w"), "n_chars")
        .groupBy("replicate")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.col("w") * F.col("n_chars")).alias("sum_chars"),
            (
                F.sum(F.col("w") * F.col("n_chars")).cast("double")
                / F.sum("w").cast("double")
            ).alias("mean_chars"),
        )
    )


# ---------------------------------------------------------------------------
# sample-reservoir — exact-k-per-stratum deterministic reservoir
# ---------------------------------------------------------------------------

# reservoir size per source.  A sizing dial (how many docs each QA
# eyeball batch gets), not a correctness knob.
RESERVOIR_K = 25


@register(
    "sample-reservoir",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ('0x' || substr(md5(doc_id::VARCHAR || '|resv-seed'), 1, 15))::BIGINT
               AS rkey
      FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
    ),
    ranked AS (
      SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY rkey, doc_id) AS BIGINT) AS slot
      FROM keyed
    )
    SELECT source, slot, doc_id, n_chars
    FROM ranked WHERE slot <= {RESERVOIR_K}
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum reservoir sample: each source contributes its
    {RESERVOIR_K} documents with the smallest salted content-stable hash
    — a uniform without-replacement draw that is REPLAYABLE (reruns,
    backfills, and any engine pick the same documents, unlike
    rand()-based reservoirs) and INCREMENTAL (new data can only displace
    old picks by hashing lower; no reshuffle of survivors).  The
    fixed-count sibling of sample-stratified's fixed-rate filter — rate
    sampling scales the sample WITH the stratum, this pins the QA/eyeball
    batch size per source regardless of stratum skew.

    The hash keys doc_id (the id IS the replay contract here — a QA
    queue keys follow-ups by id); the 15-hex-digit prefix (60 bits)
    makes collisions negligible and the (rkey, doc_id) tie-break makes
    them harmless.

    Scale (100 TB): the rank filter is a WindowGroupLimit — Spark pushes
    the k-limit below the shuffle, so every map partition forwards at
    most {RESERVOIR_K} rows per source and the per-source sort never
    materializes the stratum (the filter-topk-rank physics, re-used as a
    sampler).  Output is sources × k rows."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull() & F.col("source").isNotNull()
    )
    from pyspark.sql.window import Window

    rkey = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|resv-seed"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("source").orderBy("rkey", "doc_id")
    return (
        docs.select("source", "doc_id", "n_chars", rkey.alias("rkey"))
        .withColumn("slot", F.row_number().over(w).cast("long"))
        .where(F.col("slot") <= RESERVOIR_K)
        .select("source", "slot", "doc_id", "n_chars")
    )
