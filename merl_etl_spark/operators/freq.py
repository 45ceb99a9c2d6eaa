"""Frequency-sketch operators: a count-min sketch built as a pure
DataFrame plan and a mergeable Misra-Gries heavy-hitters summary.

The reference's rollups count things exactly in Postgres (holder counts,
tx counts — merlin_etl.py's aggregation SQL); at 100 TB the "how often
does each key occur" question needs bounded-memory sketches long before
the exact groupBy becomes unpayable.  Two classic mergeable frequency
sketches, each expressed Spark-first:

- ``agg-countmin``      — a count-min sketch (Cormode & Muthukrishnan,
                          J. Algorithms 2005) built ENTIRELY from
                          DataFrame ops: the d×w cell grid is an
                          explode + groupBy, point queries are an
                          equi-join + min.  Because the hash functions
                          are md5-derived and engine-portable, the
                          sketch cells — and therefore the ESTIMATES —
                          are bit-identical in Spark and DuckDB, so the
                          driver hash pins the estimates themselves,
                          not just an error contract (the only sketch
                          in the repo with a full-value oracle).
- ``agg-heavy-hitters`` — Misra-Gries summaries per partition via
                          mapInPandas (O(k) memory per partition),
                          merged by summing counters, with the merged
                          error bound tracked exactly (Agarwal et al.,
                          "Mergeable Summaries", PODS 2012).  Counter
                          values depend on partition order, so the
                          oracled columns are the partition-invariant
                          ones: exact counts plus the theorem-backed
                          contract booleans.

Scale notes (100 TB): the count-min build is one map-side explode (d
rows per record) into a groupBy with map-side partial sums — the
shuffle carries at most d×w = 4 096 cells per map task, regardless of
input size, and the probe join broadcasts the 4 096-cell grid.  The
Misra-Gries pass is the textbook distributed shape: O(k) state per
partition, k+1 summary rows per partition shuffled, one keyed merge.
Neither path ever shuffles per-record data by item.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

CM_DEPTH = 4        # count-min rows (independent hash functions)
CM_WIDTH = 1024     # count-min columns per row
MG_K = 64           # Misra-Gries counter budget per partition
TOP_N = 10          # probe set: top-N exact items (deterministic tie-break)


def _cm_bucket(item: Column, r: int) -> Column:
    """Row-r count-min column index for ``item`` — first 8 hex digits of
    an md5 keyed by the row index, mod CM_WIDTH.  The same bytes are
    computable in any engine with md5 (DuckDB twin:
    ``('0x' || substr(md5('cm<r>|' || item), 1, 8))::BIGINT % w``), which
    is what makes the whole sketch cross-engine deterministic."""
    h = F.md5(F.concat(F.lit(f"cm{r}|"), item))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CM_WIDTH


def _cm_oracle_bucket(item_sql: str, r_sql: str) -> str:
    return (
        f"('0x' || substr(md5('cm' || CAST({r_sql} AS VARCHAR) || '|' "
        f"|| {item_sql}), 1, 8))::BIGINT % {CM_WIDTH}"
    )


@register(
    "agg-countmin",
    oracle=f"""
    WITH rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
    cells AS (
      SELECT rs.r,
             {_cm_oracle_bucket("CAST(user_id AS VARCHAR)", "rs.r")} AS col,
             count(*) AS n
      FROM events CROSS JOIN rs
      GROUP BY 1, 2
    ),
    exact AS (SELECT user_id, count(*) AS exact_ct FROM events GROUP BY 1),
    probes AS (
      SELECT user_id, exact_ct FROM exact
      ORDER BY exact_ct DESC, user_id LIMIT {TOP_N}
    )
    SELECT p.user_id AS item, p.exact_ct,
           min(c.n) AS cm_est,
           min(c.n) - p.exact_ct AS overcount
    FROM probes p
    CROSS JOIN rs
    JOIN cells c
      ON c.r = rs.r
     AND c.col = {_cm_oracle_bucket("CAST(p.user_id AS VARCHAR)", "rs.r")}
    GROUP BY 1, 2
    """,
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over ``events.user_id`` as a pure DataFrame plan,
    probed at the top-{TOP_N} exact items.

    Build: each record explodes into CM_DEPTH (row, hashed-column)
    cells; one keyed groupBy with map-side combine reduces them to the
    d×w grid (≤ 4 096 rows total — constant, independent of input
    size).  Probe: the grid is broadcast and the probe items' cells are
    fetched by equi-join; the estimate is the min over the item's d
    cells.  CM guarantees est ≥ exact always (every occurrence lands in
    all d cells); the emitted ``overcount`` column is therefore ≥ 0 and
    — because the md5 hash functions are engine-portable — numerically
    identical in DuckDB, giving the estimates a full value-hash oracle
    rather than a contract-boolean one."""
    events = load_table(spark, sf_dir, "events")
    item = F.col("user_id").cast("string")
    cells = (
        events.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            _cm_bucket(item, r).alias("col"),
                        )
                        for r in range(CM_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    probes = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_ct"))
        .orderBy(F.desc("exact_ct"), F.asc("user_id"))
        .limit(TOP_N)
    )
    probe_cells = probes.select(
        "user_id",
        "exact_ct",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cm_bucket(F.col("user_id").cast("string"), r).alias("col"),
                    )
                    for r in range(CM_DEPTH)
                ]
            )
        ).alias("cell"),
    )
    return (
        probe_cells.join(
            F.broadcast(cells),
            (F.col("cell.r") == cells["r"]) & (F.col("cell.col") == cells["col"]),
        )
        .groupBy(F.col("user_id").alias("item"), "exact_ct")
        .agg(
            F.min("n").alias("cm_est"),
            (F.min("n") - F.col("exact_ct")).alias("overcount"),
        )
    )


def _mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One Misra-Gries summary per partition: at most MG_K counters plus
    one sentinel row (item NULL) carrying the partition's exact total
    decremented mass ``dec``.

    Per batch: merge the batch's exact value_counts into the running
    counters (exact, so counters never overcount), then if more than
    MG_K counters survive, subtract the (K+1)-th largest value from all
    and drop the non-positive — the PODS'12 mergeable-summaries reduce
    step.  Each reduction removes ≥ (K+1)·t mass, so Σ dec ≤ n_p/(K+1)
    per partition and the merged bound Σ_p dec_p ≤ n/(K+1) holds no
    matter how Spark split the input."""
    counters: dict[int, int] = {}
    dec_total = 0
    for pdf in batches:
        for itm, c in pdf["user_id"].value_counts().items():
            counters[int(itm)] = counters.get(int(itm), 0) + int(c)
        if len(counters) > MG_K:
            t = sorted(counters.values(), reverse=True)[MG_K]
            counters = {i: v - t for i, v in counters.items() if v - t > 0}
            dec_total += t
    rows = [(i, v, 0) for i, v in counters.items()]
    rows.append((None, 0, dec_total))
    yield pd.DataFrame(rows, columns=["item", "est", "dec"])


@register(
    "agg-heavy-hitters",
    oracle=f"""
    WITH exact AS (SELECT user_id AS item, count(*) AS exact_ct FROM events GROUP BY 1),
    tot AS (SELECT count(*) AS n_total FROM events)
    SELECT e.item, e.exact_ct, t.n_total,
           TRUE AS mg_le_exact,
           TRUE AS mg_within_err,
           TRUE AS err_bound_ok
    FROM exact e CROSS JOIN tot t
    ORDER BY e.exact_ct DESC, e.item LIMIT {TOP_N}
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Misra-Gries heavy hitters over ``events.user_id``:
    O(MG_K) memory per partition, k+1 summary rows shuffled per
    partition, counters merged by a keyed sum, merged error tracked
    exactly as the sum of per-partition decremented mass.

    Counter VALUES depend on how rows were partitioned, so they can
    never hash-match an oracle; what the theorems guarantee regardless
    of partitioning — and what this query emits — is, for each of the
    top-{TOP_N} exact items:

    - ``mg_le_exact``:    merged est ≤ exact (MG never overcounts);
    - ``mg_within_err``:  exact ≤ merged est + Σ_p dec_p (each
                          partition undercounts any item by ≤ dec_p);
    - ``err_bound_ok``:   Σ_p dec_p · MG_K ≤ n_total (each reduce step
                          removes ≥ (K+1)× its decrement).

    The DuckDB oracle computes the same exact counts and pins the
    booleans at TRUE — a red row means the sketch machinery broke its
    contract.  tests/test_freq_sketches.py additionally checks the
    bounds survive adversarial repartitioning."""
    from merl_etl_spark.pyfiles import ensure_package_on_workers

    ensure_package_on_workers(spark)
    events = load_table(spark, sf_dir, "events")
    summaries = events.select("user_id").mapInPandas(
        _mg_partition, schema="item long, est long, dec long"
    )
    merged = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    totals = F.broadcast(
        summaries.agg(F.sum("dec").alias("total_err"))
    )
    exact = events.groupBy(F.col("user_id").alias("item")).agg(
        F.count(F.lit(1)).alias("exact_ct")
    )
    n_total = F.broadcast(
        events.agg(F.count(F.lit(1)).alias("n_total"))
    )
    top = exact.orderBy(F.desc("exact_ct"), F.asc("item")).limit(TOP_N)
    return (
        top.join(merged, "item", "left")
        .withColumn("est", F.coalesce("est", F.lit(0)))
        .crossJoin(totals)
        .crossJoin(n_total)
        .select(
            "item",
            "exact_ct",
            "n_total",
            (F.col("est") <= F.col("exact_ct")).alias("mg_le_exact"),
            (F.col("exact_ct") <= F.col("est") + F.col("total_err")).alias(
                "mg_within_err"
            ),
            (F.col("total_err") * MG_K <= F.col("n_total")).alias("err_bound_ok"),
        )
    )


# ---------------------------------------------------------------------------
# agg-bitmap-distinct — exact distinct counting via 32-bit word bitmaps
# ---------------------------------------------------------------------------

# ids per bitmap word.  32 (not 64) so the per-bit mask 1 << (id % 32)
# stays far inside int64 in BOTH engines — DuckDB range-checks BIGINT
# shifts and 1 << 63 would error where Spark wraps to the sign bit.
BITMAP_WORD = 32


def bitmap_words(df: DataFrame, group_cols: list, extra_aggs: list = ()) -> DataFrame:
    """Pack nonnegative ``user_id``s into BITMAP_WORD-bit word masks per
    (*group_cols, word) — the ONE definition of the packing shared by
    the three bitmap operators (distinct / intersect / rolling-distinct;
    review r11: the mask formula's cross-engine subtleties — 32-bit
    words for DuckDB's shift range check, truncate-vs-floor on negative
    ids — were restated at three sites and could drift).

    Caller contract: ``df`` is already filtered to non-NULL,
    nonnegative user ids (a NULL has no bit; a negative id diverges
    cross-engine — Spark's DIV/% truncate toward zero so the mask shift
    goes negative and wraps, DuckDB's // floors).  ``word`` uses integer
    DIV, not double division: at production id ranges a double quotient
    can lose integer precision past 2^53."""
    return df.groupBy(
        *group_cols,
        F.expr(f"user_id DIV {BITMAP_WORD}").alias("word"),
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), "
            f"CAST(user_id % {BITMAP_WORD} AS INT)))"
        ).alias("mask"),
        *extra_aggs,
    )


@register(
    "agg-bitmap-distinct",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT user_id // {BITMAP_WORD}) AS BIGINT) AS n_words
    FROM events WHERE user_id IS NOT NULL AND user_id >= 0
    GROUP BY 1
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts per event feed via bitmap words — the
    roaring-bitmap idea expressed as pure DataFrame ops: pack user ids
    into ``BITMAP_WORD``-bit words (word = id DIV 32, mask = 1 << (id %
    32)), bit_or the masks per (feed, word), then sum bit_count over
    the words.  The oracle pins the result against a plain
    COUNT(DISTINCT) — same answer, different physics.

    Why not count(distinct) at 100 TB: a distinct aggregation keeps one
    GROUP BY key per (feed, user) through the shuffle — state linear in
    the distinct count per task with no pre-shuffle reduction beyond
    dedup.  The bitmap form is a TRUE map-side-combinable aggregate:
    partial states are (feed, word, 32-bit mask) rows that bit_or
    together associatively, so each map task emits at most
    |id-range|/32 words regardless of row count, and the final merge is
    integer OR + popcount.  For dense bounded id spaces (user ids,
    block numbers — the reference's holder_address domain after
    dictionary-encoding) this is the standard exact alternative to HLL
    when ±2% isn't acceptable (agg-hll-merge covers the sketched path).

    Determinism: bit_or is order-independent by construction; popcount
    sums are exact integers.  NULL and NEGATIVE user ids are excluded
    on both sides — a NULL has no bit, and a negative id would diverge
    cross-engine (Spark's DIV/% truncate toward zero so the mask shift
    goes negative and wraps, DuckDB's // floors; review r11): the
    operator's contract is a nonnegative surrogate-key domain, which is
    what "dense bounded id space" means."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & (F.col("user_id") >= 0)
    )
    words = bitmap_words(
        ev, ["event_type"], [F.count(F.lit(1)).alias("n_rows")]
    )
    return words.groupBy("event_type").agg(
        F.sum("n_rows").alias("n_events"),
        F.sum(F.bit_count("mask")).alias("n_users"),
        F.count(F.lit(1)).alias("n_words"),
    )


# ---------------------------------------------------------------------------
# agg-bitmap-intersect — exact pairwise audience overlap via bitmap AND
# ---------------------------------------------------------------------------


@register(
    "agg-bitmap-intersect",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT event_type, user_id
      FROM events WHERE user_id IS NOT NULL AND user_id >= 0
        AND event_type IS NOT NULL
    ),
    per_feed AS (SELECT event_type, count(*) AS n_users FROM u GROUP BY 1),
    both_cnt AS (
      SELECT x.event_type AS feed_a, y.event_type AS feed_b,
             count(*) AS n_both
      FROM u x JOIN u y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT a.event_type AS feed_a, b.event_type AS feed_b,
           a.n_users AS n_a, b.n_users AS n_b,
           COALESCE(bc.n_both, 0) AS n_both,
           a.n_users + b.n_users - COALESCE(bc.n_both, 0) AS n_either,
           COALESCE(bc.n_both, 0) * 1000000
             // (a.n_users + b.n_users - COALESCE(bc.n_both, 0)) AS jaccard_ppm,
           COALESCE(bc.n_both, 0) * 1000000
             // CASE WHEN a.n_users < b.n_users THEN a.n_users
                     ELSE b.n_users END AS containment_ppm
    FROM per_feed a
    JOIN per_feed b ON a.event_type < b.event_type
    LEFT JOIN both_cnt bc
      ON bc.feed_a = a.event_type AND bc.feed_b = b.event_type
    """,
)
def agg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise audience overlap between event feeds — intersection,
    union, Jaccard, and containment of the distinct-user sets of every
    feed pair — computed as bitmap physics: pack user ids into
    ``BITMAP_WORD``-bit words per feed (the agg-bitmap-distinct
    representation), then |A∩B| is popcount(mask_a AND mask_b) summed
    over words shared by both feeds and |A∪B| falls out of the
    inclusion–exclusion identity |A|+|B|−|A∩B| (so words where only one
    feed is present never need a join row).  The ratios are emitted as
    exact integer parts-per-million (floor division — both engines floor
    nonnegative integer division identically), never a float division.

    This is the audience-overlap / segment-intersection primitive (and,
    over shingle sets, the exact version of the Jaccard that
    dedup-minhash-lsh estimates).  Why bitmaps at 100 TB: the naive
    DISTINCT-pair self-join (the oracle's formulation) shuffles one row
    per (feed, user) and joins at USER grain; the bitmap form reduces
    map-side to at most |id-range|/32 words per (feed, task) — partial
    masks bit_or together associatively — and the intersection join runs
    at WORD grain, a 32× reduction, with the AND+popcount a pure integer
    map.  Feed-pair fan-out happens on the bounded per-feed word frame,
    not on events.

    Determinism: bit_or/AND/popcount are order-independent integer ops;
    ppm ratios are integer floor divisions.  NULL and negative user ids
    are excluded on both sides (the agg-bitmap-distinct nonnegative
    surrogate-key contract; review r11).  n_either > 0 whenever a pair
    row exists (each feed in per_feed has ≥1 user), so the floor
    divisions cannot hit zero denominators; containment divides by
    min(|A|,|B|) ≥ 1 likewise."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & (F.col("user_id") >= 0)
        & F.col("event_type").isNotNull()
    )
    words = bitmap_words(ev, ["event_type"])
    from merl_etl_spark.lineage import cut_lineage

    # three consumers (per-feed totals + both sides of the pair join) —
    # cut the lineage so the events scan + word rollup runs once
    words = cut_lineage(words, eager=False)
    per_feed = words.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).alias("n_users")
    )
    both = (
        words.alias("x")
        .join(
            words.alias("y"),
            (F.col("x.word") == F.col("y.word"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("feed_a"),
            F.col("y.event_type").alias("feed_b"),
        )
        .agg(
            F.sum(
                F.bit_count(F.col("x.mask").bitwiseAND(F.col("y.mask")))
            ).alias("n_both")
        )
    )
    # feed-pair frame: bounded at |feeds|² rows — broadcast both sides
    pairs = (
        F.broadcast(per_feed.alias("a"))
        .join(
            F.broadcast(
                per_feed.select(
                    F.col("event_type").alias("feed_b_type"),
                    F.col("n_users").alias("n_b"),
                )
            ),
            F.col("a.event_type") < F.col("feed_b_type"),
        )
        .select(
            F.col("a.event_type").alias("feed_a"),
            F.col("feed_b_type").alias("feed_b"),
            F.col("a.n_users").alias("n_a"),
            "n_b",
        )
    )
    n_both = F.coalesce(F.col("n_both"), F.lit(0))
    n_either = F.col("n_a") + F.col("n_b") - n_both
    return (
        pairs.join(F.broadcast(both), ["feed_a", "feed_b"], "left")
        .select(
            "feed_a",
            "feed_b",
            "n_a",
            "n_b",
            n_both.alias("n_both"),
            n_either.alias("n_either"),
            F.expr(
                "coalesce(n_both, 0) * 1000000 DIV (n_a + n_b - coalesce(n_both, 0))"
            ).alias("jaccard_ppm"),
            F.expr(
                "coalesce(n_both, 0) * 1000000 DIV least(n_a, n_b)"
            ).alias("containment_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# agg-rolling-distinct-bitmap — exact rolling DAU/WAU via bitmap OR
# ---------------------------------------------------------------------------

# rolling-distinct window in days (a 7-day WAU against each day's DAU)
ROLL_DAYS = 7


@register(
    "agg-rolling-distinct-bitmap",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id >= 0
    ),
    days AS (SELECT DISTINCT day FROM ev),
    wau AS (
      SELECT d.day, count(DISTINCT e.user_id) AS wau
      FROM days d
      JOIN ev e ON e.day BETWEEN d.day - {ROLL_DAYS - 1} AND d.day
      GROUP BY 1
    ),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ev GROUP BY 1)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           dau.dau, wau.wau,
           CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_ppm
    FROM days d
    JOIN dau ON dau.day = d.day
    JOIN wau ON wau.day = d.day
    """,
)
def agg_rolling_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling distinct actives — DAU and trailing-ROLL_DAYS-day (7) WAU
    per day, plus the DAU/WAU stickiness ratio as integer ppm — via
    bitmap-word physics: per-(day, word) user masks bit_or map-side,
    each mask re-keyed to the ≤ROLL_DAYS future days it contributes to
    (an explode of day offsets on the WORD-grain frame, never on
    events), OR-merged per (target day, word), popcount-summed.

    Why this matters at 100 TB: the naive form —
    ``count(distinct user) OVER (ORDER BY day RANGE 6 PRECEDING)`` —
    is unsupported or single-partition in most engines, and the
    join-based form (the oracle) re-scans each event ROLL_DAYS times
    at USER grain.  The bitmap form reduces events once to
    (day × id-range/32) words, fans out only that bounded frame, and
    every merge is an associative integer OR — the standard exact
    alternative when HLL's ±2% is unacceptable for an SLA metric.
    DAU rides the same pass as a conditional bit_or at offset 0.

    Determinism: bit_or/popcount are order-independent integers;
    stickiness is an integer floor division (wau ≥ dau ≥ 1 on every
    emitted day, so no zero denominator).  NULL/negative user ids are
    excluded both sides (the agg-bitmap-distinct surrogate-key
    contract)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("user_id") >= 0)
    )
    words = bitmap_words(ev, [F.to_date("ts").alias("day")])
    from merl_etl_spark.lineage import cut_lineage

    words = cut_lineage(words, eager=False)  # two consumers: fan-out + days
    days = words.select("day").distinct()
    fanned = words.select(
        F.explode(F.expr(f"sequence(0, {ROLL_DAYS - 1})")).alias("off"),
        "day",
        "word",
        "mask",
    ).select(
        F.expr("date_add(day, off)").alias("day"),
        "word",
        "mask",
        (F.col("off") == 0).alias("is_today"),
    )
    merged = (
        fanned.groupBy("day", "word")
        .agg(
            F.expr("bit_or(mask)").alias("wau_mask"),
            F.expr("bit_or(CASE WHEN is_today THEN mask END)").alias("dau_mask"),
        )
        .join(days, "day")  # trailing windows past the stream end drop out
        .groupBy("day")
        .agg(
            F.sum(F.bit_count(F.coalesce("dau_mask", F.lit(0)))).alias("dau"),
            F.sum(F.bit_count("wau_mask")).alias("wau"),
        )
    )
    return merged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        F.expr("dau * 1000000 DIV wau").alias("stickiness_ppm"),
    )


# ---------------------------------------------------------------------------
# agg-bitmap-rollup — exact distinct counts up a hierarchy, no rescan
# ---------------------------------------------------------------------------


@register(
    "agg-bitmap-rollup",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, CAST(ts AS DATE) AS day, user_id
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id >= 0
        AND event_type IS NOT NULL
    ),
    leaf AS (
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM ev GROUP BY event_type, day
    ),
    mid AS (
      SELECT event_type, CAST(NULL AS VARCHAR) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM ev GROUP BY event_type
    ),
    top AS (
      SELECT CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS VARCHAR) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM ev
    )
    SELECT * FROM leaf UNION ALL SELECT * FROM mid UNION ALL SELECT * FROM top
    """,
)
def agg_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts at every level of the (feed, day)
    hierarchy — leaf, per-feed, grand total — computed from ONE pass
    over the fact table: the (feed, day, word) bitmap masks re-aggregate
    by bit_or at each coarser level, because bitmap OR is a TRUE
    mergeable summary (the property COUNT(DISTINCT) lacks — a distinct
    count cannot be rolled up from finer distinct counts, which is why
    naive rollup cubes rescan the facts per level, and why engines fall
    back to ±2% HLL for mergeable cardinality).  This is agg-hll-merge's
    rollup story with EXACT answers: same one-scan physics, masks
    instead of sketch blobs.

    The oracle computes each level independently with COUNT(DISTINCT) —
    three scans — and must match the one-scan mask rollup bit-for-bit.

    Scale (100 TB): the fact table is read ONCE into (feed, day, word)
    masks (map-side combinable, ≤ idrange/32 words per key); each
    rollup level is a keyed bit_or + popcount over the WORD frame —
    fact bytes never move again.  NULL grouping columns mark the
    rollup levels (the agg-rollup convention).

    Determinism: bit_or/popcount are order-independent integers."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("user_id") >= 0)
        & F.col("event_type").isNotNull()
    )
    words = bitmap_words(
        ev, ["event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")]
    )
    from merl_etl_spark.lineage import cut_lineage

    words = cut_lineage(words, eager=False)  # three rollup consumers
    leaf = words.groupBy("event_type", "day").agg(
        F.sum(F.bit_count("mask")).alias("n_users")
    )
    mid = (
        words.groupBy("event_type", "word")
        .agg(F.expr("bit_or(mask)").alias("m"))
        .groupBy("event_type")
        .agg(F.sum(F.bit_count("m")).alias("n_users"))
        .select("event_type", F.lit(None).cast("string").alias("day"), "n_users")
    )
    top = (
        words.groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("m"))
        .agg(F.sum(F.bit_count("m")).alias("n_users"))
        .select(
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("string").alias("day"),
            "n_users",
        )
    )
    return leaf.unionByName(mid).unionByName(top)
