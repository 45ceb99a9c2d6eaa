"""Data profiling and physical-layout operators.

A 100 TB ingestion pipeline runs these before (and after) every major
load: per-column statistics to catch schema/quality drift at the source
boundary (the reference's field-drift handling, merlin_etl.py:76-80, is
the row-level cousin of this dataset-level check), histograms to choose
partition boundaries, and a Z-order layout pass to make multi-dimensional
scan pruning work on the written files.

Scale shapes:

- profile-columns   one melt (explode to (col, value) pairs) + two keyed
                    shuffles (distinct pre-agg, then per-column rollup).
                    The melt multiplies rows by #profiled-columns — the
                    standard price of a single-pass profiler; partial
                    aggregation reduces each partition to #cols rows
                    before either shuffle's exchange.
- profile-histogram a 1-row global min/max broadcast + a map-side bucket
                    assignment + one 20-group aggregate.  No sort.
- layout-zorder     bit-interleaved Morton codes are a pure projection;
                    bucketing is a shift (top prefix bits), so the whole
                    layout decision is map-side.  At write time the same
                    zvalue feeds repartitionByRange(n, zvalue) to cluster
                    files; the per-bucket bounding boxes this query emits
                    are exactly the min/max file statistics a reader's
                    predicate pushdown would prune on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# profile-columns
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _profile_oracle() -> str:
    parts = [
        f"""SELECT '{c}' AS col_name,
               count(*) AS n_rows,
               count(*) - count({c}) AS n_null,
               count(DISTINCT CAST({c} AS VARCHAR)) AS n_distinct,
               min(CAST({c} AS VARCHAR)) AS min_val,
               max(CAST({c} AS VARCHAR)) AS max_val
        FROM documents"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


@register("profile-columns", oracle=_profile_oracle())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler over ``documents``: row count, null
    count, exact distinct count, lexicographic min/max of every column's
    string form.

    One scan feeds a melt — ``explode`` of a (col_name, value) struct
    array — so adding a column to the profile never adds a scan.  All
    values are profiled through CAST(x AS STRING): min/max compare by
    binary collation identically in Spark and DuckDB, and the cast is
    injective for the int/string fixture columns so distinct counts are
    unchanged.  The exact-distinct agg plans as the two-phase
    (col_name, value) pre-aggregate — high-cardinality first shuffle,
    well distributed; the second shuffle carries #cols partial rows per
    partition."""
    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("kv")
    ).select("kv.col_name", "kv.val")
    return kv.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


# ---------------------------------------------------------------------------
# profile-histogram
# ---------------------------------------------------------------------------

N_HIST_BUCKETS = 20


@register(
    "profile-histogram",
    oracle=f"""
    WITH bounds AS (
      SELECT min(value) AS mn, max(value) AS mx
      FROM events WHERE value IS NOT NULL
    ),
    bucketed AS (
      SELECT CASE WHEN b.mx = b.mn THEN CAST(0 AS BIGINT)
                  ELSE least(CAST(floor((e.value - b.mn) / (b.mx - b.mn)
                                        * {N_HIST_BUCKETS}.0) AS BIGINT),
                             CAST({N_HIST_BUCKETS - 1} AS BIGINT)) END AS bucket,
             e.value, b.mn, b.mx
      FROM events e CROSS JOIN bounds b
      WHERE e.value IS NOT NULL
    )
    SELECT bucket,
           count(*) AS n_events,
           mn + bucket * (mx - mn) / {N_HIST_BUCKETS}.0 AS bucket_lo,
           mn + (bucket + 1) * (mx - mn) / {N_HIST_BUCKETS}.0 AS bucket_hi,
           min(value) AS val_min,
           max(value) AS val_max
    FROM bucketed
    GROUP BY bucket, mn, mx
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of ``events.value`` (20 buckets): the summary
    a range-partitioner or skew diagnosis starts from.

    The global min/max is a 1-row aggregate broadcast against the fact
    scan (the reference's latest-bucket CTE shape, schema.sql top-100
    queries); bucket assignment is a map; the final aggregate has 20
    groups with map-side partials.  floor + integer least() clamping
    mirrors fn-vector-quantize's edge handling (a float-side clamp
    literal parses as DECIMAL in DuckDB); the divide-by-zero guard for a
    constant column keeps the single-bucket degenerate case well-defined.
    Only count/min/max per bucket — no double sums, so every output cell
    is bit-deterministic across engines and partition orders."""
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = F.broadcast(events.agg(F.min("value").alias("mn"), F.max("value").alias("mx")))
    n = N_HIST_BUCKETS
    bucketed = events.crossJoin(bounds).withColumn(
        "bucket",
        F.expr(
            f"CASE WHEN mx = mn THEN CAST(0 AS BIGINT)"
            f" ELSE least(CAST(floor((value - mn) / (mx - mn) * {n}.0) AS BIGINT),"
            f" CAST({n - 1} AS BIGINT)) END"
        ),
    )
    return (
        bucketed.groupBy("bucket", "mn", "mx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("val_min"),
            F.max("value").alias("val_max"),
        )
        .select(
            "bucket",
            "n_events",
            F.expr(f"mn + bucket * (mx - mn) / {n}.0").alias("bucket_lo"),
            F.expr(f"mn + (bucket + 1) * (mx - mn) / {n}.0").alias("bucket_hi"),
            "val_min",
            "val_max",
        )
    )


# ---------------------------------------------------------------------------
# layout-zorder
# ---------------------------------------------------------------------------

Z_BITS = 12  # bits per dimension; 24-bit Morton code
Z_PREFIX_SHIFT = 2 * Z_BITS - 6  # keep the top 6 interleaved bits → 64 buckets


def _morton(x: str, y: str, dialect: str) -> str:
    """Bit-interleave two Z_BITS-wide nonneg ints into a Morton code.
    Same arithmetic, two spellings: Spark uses shiftleft/shiftright
    functions; DuckDB uses << / >> operators."""
    terms = []
    for i in range(Z_BITS):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# floor BEFORE the bigint cast: DuckDB's CAST(DOUBLE AS BIGINT) rounds
# half-away while Spark's unix_timestamp() truncates sub-second parts, so
# a :59.9 event would round into the next hour on one side only.  For
# nonneg x, floor(x/3600) == floor(trunc(x)/3600), so flooring the
# full-precision epoch matches Spark's truncate-then-divide exactly.
_DUCK_HOUR = "CAST(floor(epoch(ts) / 3600.0) AS BIGINT)"


def _scale(v: str, mn: str, mx: str, dialect: str) -> str:
    """Range-bin an integer dim into the Z_BITS grid with EXACT integer
    floor division (nonneg operands, so // and div agree): Delta-style
    Z-ORDER bins each column before interleaving, otherwise real-world
    dims (user ids 0..1500, ~720 distinct hours) never touch the code's
    top bits and every row lands in one bucket."""
    div = "//" if dialect == "duck" else "div"
    return f"(({v} - {mn}) * {1 << Z_BITS}) {div} ({mx} - {mn} + 1)"


@register(
    "layout-zorder",
    oracle=f"""
    WITH hours AS (
      SELECT user_id, {_DUCK_HOUR} AS hr FROM events
    ),
    bounds AS (
      SELECT min(user_id) AS mn_u, max(user_id) AS mx_u,
             min(hr) AS mn_h, max(hr) AS mx_h
      FROM hours
    ),
    coded AS (
      SELECT {_scale('h.user_id', 'b.mn_u', 'b.mx_u', 'duck')} AS x,
             {_scale('h.hr', 'b.mn_h', 'b.mx_h', 'duck')} AS y,
             h.user_id, h.hr
      FROM hours h CROSS JOIN bounds b
    ),
    z AS (
      SELECT user_id, hr, ({_morton('x', 'y', 'duck')}) AS zvalue FROM coded
    )
    SELECT zvalue >> {Z_PREFIX_SHIFT} AS zbucket,
           count(*) AS n_rows,
           min(user_id) AS user_lo, max(user_id) AS user_hi,
           min(hr) AS hour_lo, max(hr) AS hour_hi
    FROM z
    GROUP BY zbucket
    """,
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout planner over events on (user_id,
    hour-of-epoch): range-bin each dimension into a 12-bit grid (exact
    integer floor division off a 1-row min/max broadcast — the binning
    every production Z-ORDER applies so arbitrary dim ranges fill the
    code space), interleave the bits, bucket rows by the code's top 6
    bits, and emit each bucket's bounding box in BOTH original dims.

    This is the layout decision behind multi-dimensional file clustering
    (Delta/Iceberg Z-ORDER, the BTree-on-(block,time) the reference keeps
    in Postgres, schema.sql index DDL): writing bucket-by-bucket
    (``repartitionByRange(n, zvalue)`` at real write time — the prefix
    shift here keeps bucket identity deterministic for the oracle) yields
    files whose min/max statistics are tight in user_id AND time
    simultaneously, so a scan filtered on either dimension prunes ~7/8 of
    files — a time-ordered layout gives pruning on time only.  Everything
    past the 1-row bounds broadcast is a pure projection: no keyed join,
    no window, one partial-agg shuffle of 64-key rows.  The emitted
    bounding boxes double as the pruning metric: each bucket's user/hour
    span is ~1/8 of the global range (test_profiling_layout pins this)."""
    events = load_table(spark, sf_dir, "events")
    hours = events.select(
        "user_id",
        F.expr(
            "CAST(floor(CAST(unix_timestamp(ts) AS BIGINT) / 3600.0) AS BIGINT)"
        ).alias("hr"),
    )
    bounds = F.broadcast(
        hours.agg(
            F.min("user_id").alias("mn_u"),
            F.max("user_id").alias("mx_u"),
            F.min("hr").alias("mn_h"),
            F.max("hr").alias("mx_h"),
        )
    )
    coded = hours.crossJoin(bounds).select(
        "user_id",
        "hr",
        F.expr(_scale("user_id", "mn_u", "mx_u", "spark")).alias("x"),
        F.expr(_scale("hr", "mn_h", "mx_h", "spark")).alias("y"),
    )
    z = coded.select(
        "user_id", "hr", F.expr(_morton("x", "y", "spark")).alias("zvalue")
    )
    return z.groupBy(
        F.expr(f"shiftright(zvalue, {Z_PREFIX_SHIFT})").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("user_id").alias("user_lo"),
        F.max("user_id").alias("user_hi"),
        F.min("hr").alias("hour_lo"),
        F.max("hr").alias("hour_hi"),
    )


# ---------------------------------------------------------------------------
# profile-dataset-card — per-source corpus datasheet
# ---------------------------------------------------------------------------

@register(
    "profile-dataset-card",
    oracle="""
    WITH base AS (
      SELECT source, lang, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             md5(text) AS digest
      FROM documents
    ),
    dg AS (SELECT source, digest, count(*) AS cnt FROM base GROUP BY 1, 2),
    dup AS (
      SELECT source, CAST(sum(cnt) AS BIGINT) AS n_dup_docs
      FROM dg WHERE cnt > 1 GROUP BY source
    ),
    card AS (
      SELECT source, count(*) AS n_docs,
             count(DISTINCT lang) AS n_langs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM base GROUP BY source
    )
    SELECT c.source, c.n_docs, c.n_langs, c.total_chars, c.total_tokens,
           COALESCE(d.n_dup_docs, 0) AS n_dup_docs,
           c.total_chars // c.n_docs AS avg_chars,
           (100 * COALESCE(d.n_dup_docs, 0)) // c.n_docs AS dup_pct
    FROM card c LEFT JOIN dup d ON d.source = c.source
    """,
)
def profile_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus datasheet — the summary block of a dataset card
    (Gebru et al., "Datasheets for Datasets"): document count, language
    spread, exact char/token volume, and the exact-duplicate footprint
    (documents whose content digest repeats within the source), per
    corpus source.

    One scan derives the per-doc signals (token count, md5 digest) as
    column expressions; the duplicate footprint is a (source, digest)
    groupBy — the same 16-byte-key shuffle the exact-dedup tier uses —
    re-aggregated per source; everything else is a single keyed rollup
    with map-side partials.  Ratios are integer floor divisions over
    exact counts (cross-engine determinism; see basket-affinity)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5("text").alias("digest"),
    )
    dg = base.groupBy("source", "digest").agg(F.count(F.lit(1)).alias("cnt"))
    dup = (
        dg.filter(F.col("cnt") > 1)
        .groupBy("source")
        .agg(F.sum("cnt").alias("n_dup_docs"))
    )
    card = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return (
        card.join(dup, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_langs",
            "total_chars",
            "total_tokens",
            F.coalesce("n_dup_docs", F.lit(0)).alias("n_dup_docs"),
            F.expr("total_chars div n_docs").alias("avg_chars"),
            F.expr("(100 * coalesce(n_dup_docs, 0)) div n_docs").alias("dup_pct"),
        )
    )


# ---------------------------------------------------------------------------
# layout-partition-prune — date-partitioned layout + pruned scan
# ---------------------------------------------------------------------------

# the pruned week (fixture events span 2024-01-01 .. 2024-01-30, so this
# selects ~7 of ~30 date partitions)
PRUNE_LO = "2024-01-08"
PRUNE_HI = "2024-01-14"


# content-keyed layout cache (the textfiles.py fixture pattern): keyed on
# the SOURCE file identity (full path + mtime + size), built into a temp
# dir and atomically renamed into place, reused if present — never
# overwritten in place.  Basename-only keying collided across datasets
# that share a leaf name (…/A/sf0.01 vs …/B/sf0.01) and an overwrite
# deletes files under a concurrent reader's lazy scan (review r9 finding).
_PRUNE_CACHE: dict[tuple, str] = {}


def _ensure_pruned_layout(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os
    import shutil
    import uuid

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = (os.path.abspath(src), st.st_mtime_ns, st.st_size)
    cached = _PRUNE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    out = "/tmp/merl_layout_prune/" + hashlib.md5(
        repr(key).encode()
    ).hexdigest()[:16]
    if os.path.isdir(out):
        _PRUNE_CACHE[key] = out
        return out
    tmp = f"{out}.build-{uuid.uuid4().hex}"
    events = load_table(spark, sf_dir, "events")
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(tmp)
    )
    try:
        os.rename(tmp, out)  # atomic publish; loser of a race cleans up
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        # only a lost publish race leaves a usable directory behind; any
        # other OSError (EXDEV, permissions) must surface here, not as a
        # confusing read failure on a nonexistent cache path (ADVICE r9)
        if not os.path.isdir(out):
            raise
    _PRUNE_CACHE[key] = out
    return out


@register(
    "layout-partition-prune",
    oracle=f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{PRUNE_LO}' AND DATE '{PRUNE_HI}'
    GROUP BY 1
    """,
)
def layout_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style date partitioning end-to-end: write events partitioned
    by event_date, read back with a one-week predicate, aggregate.  The
    filter on the partition column never touches file contents — Spark
    prunes at PLANNING time via the catalog/file listing
    (``PartitionFilters`` in the scan node, pinned by
    tests/test_round9_ops.py), so the scan reads ~7 of ~30 partitions.

    This is the layout HALF of the pruning story (layout-zorder is the
    intra-file half): at 100 TB, date-partitioning the event log is the
    difference between scanning 100 TB and scanning the week you asked
    for — the same reason the reference keys its Postgres tables by
    block-time windows (schema.sql index DDL).  The partition column is
    re-emitted as a string on both sides because a Hive partition value
    round-trips as its directory name, not a parquet column.

    The write is itself part of the operator (partitionBy → one file
    set per date, the standard ingest layout); it is content-keyed on
    the source file identity and atomically published, so reruns reuse
    the layout instead of rewriting under a concurrent reader."""
    cache = _ensure_pruned_layout(spark, sf_dir)
    back = spark.read.parquet(cache).filter(
        (F.col("event_date") >= F.lit(PRUNE_LO).cast("date"))
        & (F.col("event_date") <= F.lit(PRUNE_HI).cast("date"))
    )
    return back.groupBy(
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# layout-bucketed-join — co-located join + rollup over pre-bucketed tables
# ---------------------------------------------------------------------------

BKT_N = 16


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple:
    """Materialize orders/customer as BKT_N-bucket catalog tables keyed
    by custkey, content-keyed on the source file identity (the
    textfiles.py cache convention) so reruns reuse instead of rewrite.
    saveAsTable is required — bucket metadata lives in the catalog, not
    the parquet files."""
    import hashlib
    import os

    from merl_etl_spark.operators.skew import write_bucketed

    stats = []
    for t in ("orders", "customer"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(src)
        stats.append((os.path.abspath(src), st.st_mtime_ns, st.st_size))
    tag = hashlib.md5(repr((stats, BKT_N)).encode()).hexdigest()[:12]
    t_o, t_c = f"merl_bkt_orders_{tag}", f"merl_bkt_customer_{tag}"

    # A FRESH session (new in-memory catalog) can inherit a warehouse
    # directory from a previous process — the table is absent from the
    # catalog but its managed LOCATION exists, and saveAsTable fails with
    # LOCATION_ALREADY_EXISTS (verify-run repro).  NOTHING here deletes or
    # drops — a concurrent/previous session may hold lazy plans over those
    # files (the _PRUNE_CACHE r9 lesson) and another live process may be
    # mid-write.  Instead:
    #   - a COMMITTED leftover (has _SUCCESS) is re-attached as an external
    #     bucketed table — the content tag guarantees it was produced from
    #     identical inputs with this exact bucket spec, so re-declaring the
    #     layout is sound and free;
    #   - an UNCOMMITTED leftover (no _SUCCESS: a crashed or in-flight
    #     write) is left untouched and this process writes under a
    #     session-unique tag instead (probing the DISK as well as the
    #     catalog, iterating past pid-reuse leftovers — ADVICE r10).
    # SUPERSEDED tags (VERDICT r10 #6): a sibling merl_bkt_* table or
    # leftover directory bearing a DIFFERENT content tag means the source
    # fixture was regenerated — every consumer of the old tag is by
    # definition reading stale inputs, so those (and only those) are
    # dropped here, right before this process writes the new tag.  The
    # CURRENT tag keeps the strict non-destructive rule above.
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")

    def _drop_superseded(prefix: str, keep_tag: str) -> None:
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith(prefix) and keep_tag not in tbl.name:
                spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
        if os.path.isdir(warehouse):
            for d in os.listdir(warehouse):
                if d.startswith(prefix) and keep_tag not in d:
                    shutil.rmtree(os.path.join(warehouse, d), ignore_errors=True)

    def _ensure(name: str, table_key: str, cols: list[str], bkt_key: str) -> str:
        if spark.catalog.tableExists(name):
            return name
        _drop_superseded(f"merl_bkt_{table_key}_", tag)
        loc = os.path.join(warehouse, name)
        if os.path.isdir(loc):
            if os.path.isfile(os.path.join(loc, "_SUCCESS")):
                src = load_table(spark, sf_dir, table_key).select(*cols)
                schema = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
                )
                spark.sql(
                    f"CREATE TABLE {name} ({schema}) USING PARQUET "
                    f"CLUSTERED BY ({bkt_key}) SORTED BY ({bkt_key}) "
                    f"INTO {BKT_N} BUCKETS LOCATION '{loc}'"
                )
                return name
            # uncommitted leftover at the content-tag location: fall back
            # to a session-unique name, probing BOTH the catalog and the
            # warehouse directory (pid reuse can leave a dir for the
            # pid-suffixed name itself — ADVICE r10 low) and iterating
            # with a counter until a genuinely free location is found
            base, i = f"{name}_{os.getpid():x}", 0
            while True:
                name = base if i == 0 else f"{base}_{i}"
                if spark.catalog.tableExists(name):
                    return name
                if not os.path.isdir(os.path.join(warehouse, name)):
                    break
                i += 1
        write_bucketed(
            load_table(spark, sf_dir, table_key).select(*cols),
            name, [bkt_key], BKT_N, [bkt_key],
        )
        return name

    t_o = _ensure(
        t_o, "orders", ["o_orderkey", "o_custkey", "o_totalprice"], "o_custkey"
    )
    t_c = _ensure(
        t_c, "customer", ["c_custkey", "c_name", "c_mktsegment"], "c_custkey"
    )
    return t_o, t_c


@register(
    "layout-bucketed-join",
    oracle="""
    SELECT c.c_custkey AS custkey,
           max(c.c_mktsegment) AS mktsegment,
           count(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_spend
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketing half of the physical-layout tier (layout-zorder =
    intra-file clustering, layout-partition-prune = directory pruning,
    THIS = co-located joins): orders and customer are persisted as
    BKT_N-bucket catalog tables hashed on custkey, so the join AND the
    per-customer rollup both consume the existing bucket distribution —
    the whole query plans with ZERO shuffle exchanges (pinned by
    tests/test_round9_ops.py::test_bucketed_join_plan_is_exchange_free).
    The rollup groups by the bucket key alone (mktsegment rides along as
    max() — single-valued per customer) precisely so the aggregate can
    reuse the join's output partitioning.

    This is the write-once/join-many trade the reference makes with its
    B-tree indexes (schema.sql:125-130) re-expressed as Spark physics:
    at 100 TB, bucketing the fact and dimension tables on the join key
    turns every subsequent join/rollup on that key from a full shuffle
    into a local merge — the single biggest recurring-shuffle saving a
    warehouse layout can buy.  The merge hint only suppresses the
    broadcast fallback at fixture scale; at production scale SMJ is what
    the planner picks anyway."""
    t_o, t_c = _ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(t_o).hint("merge")
    c = spark.table(t_c)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.max("c_mktsegment").alias("mktsegment"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# layout-shard-skew — byte-balance audit of the hash-sharded write plan
# ---------------------------------------------------------------------------

# output shard count for the write-plan audit.  A parallelism dial, not a
# correctness knob: production would set this from target_file_bytes
# (shards ~ total_bytes / target), the audit below is shape-identical at
# any count.
SHARD_COUNT = 32

# the salted doc→shard hash, single-sourced between layout-shard-skew and
# layout-compaction-plan so the files the compactor plans over are
# provably the files the sharded writer produced — and built on dedup's
# md5_bucket twins (review r11: the hex→int split must live in ONE place
# so a cast-trap fix reaches every consumer in both engines)
from merl_etl_spark.operators.dedup import md5_bucket_duck, md5_bucket_spark

DOC_SHARD_DUCK = md5_bucket_duck("doc_id::VARCHAR || '|shard-seed'", SHARD_COUNT)


def doc_shard_col() -> F.Column:
    """Spark twin of DOC_SHARD_DUCK."""
    return md5_bucket_spark(
        F.concat(F.col("doc_id").cast("string"), F.lit("|shard-seed")),
        SHARD_COUNT,
    )


@register(
    "layout-shard-skew",
    oracle=f"""
    WITH sharded AS (
      SELECT {DOC_SHARD_DUCK} AS shard_id,
             n_chars
      FROM documents WHERE doc_id IS NOT NULL
    ),
    per_shard AS (
      SELECT shard_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM sharded GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM per_shard)
    SELECT p.shard_id, p.n_docs, p.n_chars,
           round(CAST(p.n_chars AS DOUBLE) / CAST(t.total_chars AS DOUBLE)
                 * CAST(1000000 AS DOUBLE), 3) AS share_ppm,
           round((CAST(p.n_chars AS DOUBLE) * CAST({SHARD_COUNT} AS DOUBLE)
                  - CAST(t.total_chars AS DOUBLE))
                 / CAST(t.total_chars AS DOUBLE)
                 * CAST(1000000 AS DOUBLE), 3) AS dev_ppm
    FROM per_shard p, tot t
    """,
)
def layout_shard_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-path shard plan + balance audit: documents are assigned to
    SHARD_COUNT output shards by a salted content-stable hash of doc_id
    (what `df.repartition(n, hash_col)` does at the sink), and each
    shard reports its byte mass against the uniform ideal — the check
    that decides whether the written files will be even-sized or whether
    a hot shard will produce the straggler file every downstream scan
    waits on.  Completes the physical-layout tier: layout-zorder =
    intra-file clustering, layout-partition-prune = directory pruning,
    layout-bucketed-join = shuffle elision, this = file sizing.

    Determinism: per-shard doc/byte masses are exact integer sums; the
    two ppm ratios are IEEE expressions of those integers in identical
    operand order in both engines, rounded once at the output boundary.
    (Not integer ppm arithmetic: n_chars·10^6 overflows int64 once a
    shard holds ~9.2 TB of text, which is precisely the regime this
    audit targets.)

    Scale (100 TB): shard assignment is a projection; the audit is ONE
    map-side-combinable keyed aggregate to SHARD_COUNT rows plus a 1-row
    total broadcast back across them.  No sort, no window, no
    repartition of the corpus itself — the plan is decided from metadata
    mass, the text column is never read."""
    # doc_id IS NOT NULL: same guard as layout-compaction-plan (r11 ADVICE —
    # the two views of "the same files" must agree on mass; a NULL doc_id
    # hashes to a NULL shard here while the compactor silently drops it)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    per_shard = (
        docs.groupBy(doc_shard_col().alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    from merl_etl_spark.lineage import cut_lineage

    # two consumers (output rows + the total) — without the cut Spark
    # re-derives the SHARD_COUNT-row aggregate from a second corpus scan
    per_shard = cut_lineage(per_shard, eager=False)
    tot = per_shard.agg(F.sum("n_chars").alias("total_chars"))
    chars_d = F.col("n_chars").cast("double")
    total_d = F.col("total_chars").cast("double")
    ppm = F.lit(1000000).cast("double")
    return per_shard.crossJoin(F.broadcast(tot)).select(
        "shard_id",
        "n_docs",
        "n_chars",
        F.round(chars_d / total_d * ppm, 3).alias("share_ppm"),
        F.round(
            (chars_d * F.lit(SHARD_COUNT).cast("double") - total_d) / total_d * ppm,
            3,
        ).alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# layout-compaction-plan — greedy small-file merge schedule per source
# ---------------------------------------------------------------------------

# target compacted-output size in characters (the fixture's byte proxy).
# A sizing dial, not a correctness knob — production sets this to the
# table's target file size (e.g. 128 MB) and the plan is shape-identical.
COMPACT_TARGET_CHARS = 2048


@register(
    "layout-compaction-plan",
    oracle=f"""
    WITH files AS (
      SELECT source, {DOC_SHARD_DUCK} AS shard_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
      -- doc_id null-guard: md5(NULL) = NULL shard, and the offset
      -- window below ORDERs BY shard_id where Spark (NULLS FIRST) and
      -- DuckDB (NULLS LAST) disagree — a NULL file would shift every
      -- cum_before in its source differently per engine
      FROM documents WHERE doc_id IS NOT NULL GROUP BY 1, 2
    ),
    planned AS (
      SELECT source, shard_id, n_docs, bytes,
             COALESCE(SUM(bytes) OVER (
               PARTITION BY source ORDER BY shard_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM files
    )
    SELECT source,
           CAST(cum_before // {COMPACT_TARGET_CHARS} AS BIGINT)
             AS merged_file,
           CAST(count(*) AS BIGINT) AS n_input_files,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(bytes) AS BIGINT) AS bytes,
           min(shard_id) AS first_shard, max(shard_id) AS last_shard
    FROM planned GROUP BY 1, 2
    """,
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction schedule (the OPTIMIZE/rewrite planning
    step every lakehouse table needs): the files the sharded writer
    produced — (source, shard) byte masses under the SAME doc→shard
    hash layout-shard-skew audits — are greedily packed, per source in
    shard order, into merge groups of ~COMPACT_TARGET_CHARS by running
    byte offset (first-fit: a file joins the group its starting offset
    falls in, so every group is contiguous and ≤ target + one file).
    The emitted plan row per merged output (input-file count, doc/byte
    mass, shard range) is exactly the work order a rewrite job executes.

    Determinism: file masses are exact integer sums; the running offset
    orders by the unique shard_id, so cum_before and the group id are
    pure integers in both engines.

    Scale (100 TB): the plan runs entirely at FILE-METADATA grain — the
    corpus collapses to (source × shard) in one map-side-combinable
    pass, and the running-offset window partitions by source over ≤
    SHARD_COUNT rows (never document rows).  The rewrite itself would
    stream each group's files; the planner never touches text."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()  # see the oracle's null-guard note
    )
    files = docs.groupBy("source", doc_shard_col().alias("shard_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("bytes"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("shard_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    )
    return (
        planned.groupBy(
            "source",
            F.expr(f"cum_before DIV {COMPACT_TARGET_CHARS}").alias("merged_file"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_input_files"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bytes").alias("bytes"),
            F.min("shard_id").alias("first_shard"),
            F.max("shard_id").alias("last_shard"),
        )
    )


# ---------------------------------------------------------------------------
# layout-partition-advisor — choose-your-partition-key planning table
# ---------------------------------------------------------------------------

# rows-per-value floor below which a candidate value is a "small file"
# risk (it would produce an undersized partition at write time)
ADVISOR_SMALL_ROWS = 50


@register(
    "layout-partition-advisor",
    oracle=f"""
    WITH cand AS (
      SELECT 'documents.source' AS candidate, source AS v FROM documents
        WHERE source IS NOT NULL
      UNION ALL
      SELECT 'documents.lang', lang FROM documents WHERE lang IS NOT NULL
      UNION ALL
      SELECT 'events.event_type', event_type FROM events
        WHERE event_type IS NOT NULL
      UNION ALL
      SELECT 'events.day', strftime(CAST(ts AS DATE), '%Y-%m-%d')
      FROM events WHERE ts IS NOT NULL
    ),
    per_value AS (
      SELECT candidate, v, CAST(count(*) AS BIGINT) AS n
      FROM cand GROUP BY 1, 2
    )
    SELECT candidate,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_rows,
           CAST(min(n) AS BIGINT) AS min_rows,
           CAST(floor(CAST(max(n) AS DOUBLE) * count(*)
                      * CAST(1000000 AS DOUBLE)
                      / CAST(CAST(SUM(n) AS VARCHAR) AS DOUBLE))
             AS BIGINT) AS skew_ppm,
           CAST(count(CASE WHEN n < {ADVISOR_SMALL_ROWS} THEN 1 END)
                AS BIGINT) AS n_small_values
    FROM per_value GROUP BY 1
    """,
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key advisor: for each candidate partition column, the
    cardinality / balance / small-file profile that decides whether it
    can be a physical partition key — value count (too many = small
    files, too few = no pruning), the hottest value's skew relative to
    a uniform spread (max·k/total, in ppm; 1e6 = perfectly balanced),
    and how many values would produce undersized partitions.  This is
    the table an engineer reads BEFORE writing `partitionBy(...)` on a
    100 TB table; layout-partition-prune measures pruning AFTER a choice,
    this ranks the choices.

    Determinism: pure integer counts; the skew ratio is ONE shared
    floor(double) expression (the promo-share rule — and it also keeps
    max·k·1e6 from overflowing int64 at scale).  The oracle's SUM(n) is
    HUGEINT in DuckDB, whose implicit →DOUBLE cast is not correctly
    rounded past 2^53, so it is routed through VARCHAR (the gini/pareto
    rule); Spark's long→double cast is correctly rounded as-is.

    Scale (100 TB): one map-side-combinable count per candidate column
    (the UNION ALL is per-column scans of the same files — column-pruned
    parquet reads, no joins, no windows); the advisor output is
    4 rows."""
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    cand = (
        docs.where(F.col("source").isNotNull())
        .select(F.lit("documents.source").alias("candidate"),
                F.col("source").alias("v"))
        .unionAll(
            docs.where(F.col("lang").isNotNull()).select(
                F.lit("documents.lang"), F.col("lang"))
        )
        .unionAll(
            events.where(F.col("event_type").isNotNull()).select(
                F.lit("events.event_type"), F.col("event_type"))
        )
        .unionAll(
            events.where(F.col("ts").isNotNull()).select(
                F.lit("events.day"),
                F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
        )
    )
    per_value = cand.groupBy("candidate", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return per_value.groupBy("candidate").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").alias("max_rows"),
        F.min("n").alias("min_rows"),
        F.expr(
            "CAST(floor(CAST(max(n) AS DOUBLE) * count(*)"
            " * CAST(1000000 AS DOUBLE) / SUM(n)) AS BIGINT)"
        ).alias("skew_ppm"),
        F.sum(
            F.when(F.col("n") < ADVISOR_SMALL_ROWS, 1).otherwise(0)
        ).cast("long").alias("n_small_values"),
    )


# ---------------------------------------------------------------------------
# layout-skipping-eval — quantify Z-ORDER vs time-linear file skipping
# (round 14: the evaluation half of layout-zorder — same Morton machinery,
# now scored against a literal query grid)
# ---------------------------------------------------------------------------

_SKIP_BUCKETS = 64
_SKIP_BANDS = (0, 3, 6)  # eighth-band indices probed per dimension


def _skip_band_bounds(dim_lo: str, dim_hi: str, band: str, dialect: str) -> tuple[str, str]:
    """Integer bounds of eighth-band ``band`` of [dim_lo, dim_hi]: exact
    floor division (nonneg spans, so // and div agree)."""
    div = "//" if dialect == "duck" else "div"
    span = f"({dim_hi} - {dim_lo} + 1)"
    lo = f"({dim_lo} + ({span} * {band}) {div} 8)"
    hi = f"({dim_lo} + ({span} * ({band} + 1)) {div} 8 - 1)"
    return lo, hi


def _skip_oracle() -> str:
    mlo_u, mhi_u = _skip_band_bounds("b.mn_u", "b.mx_u", "g.ub", "duck")
    mlo_h, mhi_h = _skip_band_bounds("b.mn_h", "b.mx_h", "g.hb", "duck")
    return f"""
    WITH hours AS MATERIALIZED (
      SELECT user_id, {_DUCK_HOUR} AS hr FROM events
    ),
    bounds AS MATERIALIZED (
      SELECT min(user_id) AS mn_u, max(user_id) AS mx_u,
             min(hr) AS mn_h, max(hr) AS mx_h
      FROM hours
    ),
    coded AS (
      SELECT {_scale('h.user_id', 'b.mn_u', 'b.mx_u', 'duck')} AS x,
             {_scale('h.hr', 'b.mn_h', 'b.mx_h', 'duck')} AS y,
             h.user_id, h.hr
      FROM hours h CROSS JOIN bounds b
    ),
    zstats AS MATERIALIZED (
      SELECT ({_morton('x', 'y', 'duck')}) >> {Z_PREFIX_SHIFT} AS bucket,
             count(*) AS n,
             min(user_id) AS user_lo, max(user_id) AS user_hi,
             min(hr) AS hour_lo, max(hr) AS hour_hi
      FROM coded GROUP BY 1
    ),
    linstats AS MATERIALIZED (
      SELECT ((h.hr - b.mn_h) * {_SKIP_BUCKETS}) // (b.mx_h - b.mn_h + 1)
               AS bucket,
             count(*) AS n,
             min(h.user_id) AS user_lo, max(h.user_id) AS user_hi,
             min(h.hr) AS hour_lo, max(h.hr) AS hour_hi
      FROM hours h CROSS JOIN bounds b GROUP BY 1
    ),
    stats AS (
      SELECT 'zorder' AS layout, * FROM zstats
      UNION ALL
      SELECT 'linear' AS layout, * FROM linstats
    ),
    grid AS (
      SELECT CAST(ub * 10 + hb AS BIGINT) AS query_id, ub, hb
      FROM (VALUES {", ".join(f"({u}, {h})" for u in _SKIP_BANDS for h in _SKIP_BANDS)})
        AS v(ub, hb)
    ),
    rects AS (
      SELECT g.query_id,
             {mlo_u} AS q_u_lo, {mhi_u} AS q_u_hi,
             {mlo_h} AS q_h_lo, {mhi_h} AS q_h_hi
      FROM grid g CROSS JOIN bounds b
    )
    SELECT r.query_id, s.layout,
           count(*) AS touched_buckets,
           CAST(SUM(s.n) AS BIGINT) AS touched_rows
    FROM stats s
    JOIN rects r
      ON s.user_lo <= r.q_u_hi AND s.user_hi >= r.q_u_lo
     AND s.hour_lo <= r.q_h_hi AND s.hour_hi >= r.q_h_lo
    GROUP BY 1, 2
    """


@register("layout-skipping-eval", oracle=_skip_oracle())
def layout_skipping_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the Z-ORDER layout against a plain time-linear layout on a
    literal grid of nine rectangular queries (three user bands x three
    hour bands, each an eighth of the global range): for every (query,
    layout), how many of the {_SKIP_BUCKETS} file-buckets' min/max
    bounding boxes intersect the query rectangle — i.e. how many files a
    stats-pruning reader must open — and how many rows those buckets
    hold.  The linear layout prunes only on time (user-band queries
    touch every bucket); Z-ORDER prunes on both dimensions.  This is the
    measurement that justifies a 100-TB re-cluster: the same bucket
    bounding boxes layout-zorder emits, scored as a scan-pruning
    simulation.

    Determinism: all arithmetic is exact integer (band bounds by floor
    division of nonneg spans; intersection by comparisons); output is 18
    keyed rows.

    Scale (100 TB): two aggregates over the fact (64-key each, map-side
    partial), a 1-row bounds broadcast, and a 9-row literal-grid
    broadcast join against 128 bucket-stat rows — everything after the
    two fact passes is constant-size."""
    events = load_table(spark, sf_dir, "events")
    hours = events.select(
        "user_id",
        F.expr(
            "CAST(floor(CAST(unix_timestamp(ts) AS BIGINT) / 3600.0) AS BIGINT)"
        ).alias("hr"),
    )
    bounds = F.broadcast(
        hours.agg(
            F.min("user_id").alias("mn_u"),
            F.max("user_id").alias("mx_u"),
            F.min("hr").alias("mn_h"),
            F.max("hr").alias("mx_h"),
        )
    )
    coded = hours.crossJoin(bounds).select(
        "user_id",
        "hr",
        F.expr(_scale("user_id", "mn_u", "mx_u", "spark")).alias("x"),
        F.expr(_scale("hr", "mn_h", "mx_h", "spark")).alias("y"),
    )
    zstats = (
        coded.select(
            "user_id",
            "hr",
            F.expr(
                f"shiftright({_morton('x', 'y', 'spark')}, {Z_PREFIX_SHIFT})"
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("user_id").alias("user_lo"),
            F.max("user_id").alias("user_hi"),
            F.min("hr").alias("hour_lo"),
            F.max("hr").alias("hour_hi"),
        )
    )
    linstats = (
        hours.crossJoin(bounds)
        .select(
            "user_id",
            "hr",
            F.expr(
                f"((hr - mn_h) * {_SKIP_BUCKETS}) div (mx_h - mn_h + 1)"
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("user_id").alias("user_lo"),
            F.max("user_id").alias("user_hi"),
            F.min("hr").alias("hour_lo"),
            F.max("hr").alias("hour_hi"),
        )
    )
    stats = zstats.withColumn("layout", F.lit("zorder")).unionByName(
        linstats.withColumn("layout", F.lit("linear"))
    )
    grid = spark.createDataFrame(
        [(u, h) for u in _SKIP_BANDS for h in _SKIP_BANDS], "ub long, hb long"
    )
    slo_u, shi_u = _skip_band_bounds("mn_u", "mx_u", "ub", "spark")
    slo_h, shi_h = _skip_band_bounds("mn_h", "mx_h", "hb", "spark")
    rects = grid.crossJoin(bounds).select(
        (F.col("ub") * 10 + F.col("hb")).alias("query_id"),
        F.expr(slo_u).alias("q_u_lo"),
        F.expr(shi_u).alias("q_u_hi"),
        F.expr(slo_h).alias("q_h_lo"),
        F.expr(shi_h).alias("q_h_hi"),
    )
    return (
        stats.join(
            F.broadcast(rects),
            (F.col("user_lo") <= F.col("q_u_hi"))
            & (F.col("user_hi") >= F.col("q_u_lo"))
            & (F.col("hour_lo") <= F.col("q_h_hi"))
            & (F.col("hour_hi") >= F.col("q_h_lo")),
        )
        .groupBy("query_id", "layout")
        .agg(
            F.count(F.lit(1)).alias("touched_buckets"),
            F.sum("n").cast("long").alias("touched_rows"),
        )
    )
