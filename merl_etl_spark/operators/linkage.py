"""Fuzzy record linkage: blocked approximate matching on string keys.

Entity resolution is the other half of dedup — the reference dedupes on
exact keys only (ON CONFLICT in schema.sql), but a real ingest of the
same entities from two explorers needs *approximate* key matching.  The
standard scalable shape is block-then-compare: an equi-join on a cheap
blocking key confines the quadratic comparison to within-block pairs,
and an edit-distance threshold selects matches.  Same architecture as
the LSH dedup tier (dedup.py) with levenshtein instead of MinHash —
appropriate when keys are short strings (names, symbols) rather than
documents.

Scale: the join is a plain equi-join on the blocking key, so the hazard
is a degenerate block.  The blocking key is therefore REFINED with
length bands (a sound refinement: edit distance ≤ t implies the name
lengths differ by ≤ t, so two width-W (W ≥ t) bands per record guarantee every
qualifying pair still shares a block — proof in
:func:`blocked_fuzzy_pairs`), which multiplies the key cardinality by
the length spread and divides the quadratic in-block work accordingly.
Found by 20× stress: brand-only blocking left ~25 join keys over 400k
rows — 16k-row blocks, billions of in-block comparisons serialized on
two tasks; the band refinement restored both the block bound and the
parallelism with byte-identical output (the oracle is untouched — it
states the SPEC, all within-brand pairs under the threshold).
levenshtein is JVM-side (no Python), O(len²) per pair on ≤30-char
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

EDIT_THRESHOLD = 2


def blocked_fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block_col: str,
    threshold: int = EDIT_THRESHOLD,
) -> DataFrame:
    """All within-block pairs (a < b by key) whose ``name_col`` edit
    distance is ≤ threshold.  Returns (key_a, key_b, name_a, name_b,
    block, edit_dist).

    The physical join key is (block, length band): each record is
    emitted into bands ``floor(len/W)`` and ``floor(len/W)+1`` with
    W = max(threshold, 2) — the minimal sound width (smaller W means
    more, smaller blocks and less quadratic mass).  Soundness: edit distance ≤ t bounds the length
    difference by t ≤ W, so the two records' band floors differ by at
    most 1, and the band sets {f, f+1} of both sides always intersect —
    no qualifying pair is missed.  Each pair is emitted EXACTLY once by
    keeping only the ``band == greatest(f_a, f_b)`` copy (when the
    floors differ that is the single common band; when they are equal
    both bands are common and the rule picks the lower).  The refinement
    changes no results, only the join-key cardinality — which is what
    bounds the quadratic in-block comparison at scale.

    The join is additionally SALTED and forced off broadcast: with a
    broadcast build side, the quadratic compare work runs in the PROBE
    side's task count — for a compact parquet input that is one or two
    file splits, serializing billions of comparisons on two cores (found
    by 20× stress; the AQE-coalescing cousin of dedup.spread_pairs).
    Salting the probe side by key and replicating the build side across
    the SALT slices makes the physical key (block, band, salt), so a hot
    block's comparisons spread over SALT reducers of a shuffle join.

    Candidate mass is bounded BELOW block size by three sound prefilters
    that run before levenshtein, cheapest first (VERDICT r6 task #2 —
    levenshtein on every surviving candidate made ER the slowest family;
    each filter provably never drops a qualifying pair):

    1. exact length gap — every unit edit changes the length by ≤ 1, so
       edit ≤ t ⟹ |len_a − len_b| ≤ t.  Two int ops; removes the band
       slack (width-W bands admit gaps up to 2W−1).
    2. character-histogram L1 — for ANY fixed partition of characters
       into buckets, a substitution moves one char between ≤ 2 buckets
       (L1 change ≤ 2) and an indel changes one bucket by 1, so edit ≤ t
       ⟹ Σ_buckets |cnt_a − cnt_b| ≤ 2t.  Bucket counts are precomputed
       once per RECORD (O(n) regexp passes, never per pair); the pair
       check is four int subtractions.
    3. pigeonhole segments (the PassJoin filter) — split name_a into
       t+1 contiguous segments: t edits touch ≤ t of them, so at least
       one segment is untouched and therefore occurs VERBATIM in name_b
       (shifted by the net indels before it).  Keep a pair only when
       some segment of name_a is a substring of name_b (trivially true,
       hence sound, when len_a < t+1 and a segment is empty).  Segments
       are precomputed per record on the build side.

    Only pairs surviving all three reach the O(len_a·len_b) levenshtein
    DP; on random same-block candidates the chain rejects ~everything
    for ~a tenth of the compare cost, while true near-matches pass all
    three and are unaffected — output is byte-identical."""
    # soundness requires W >= threshold (the band-floor argument below);
    # W was once hardcoded while threshold was a parameter — a caller with
    # threshold > 2 would silently lose pairs (review r6c finding)
    W = max(threshold, 2)
    SALT = 16
    HIST = ["a-g", "h-m", "n-s", "t-z"]  # any char partition is sound
    nseg = threshold + 1
    name = F.col(name_col)
    hist = [
        (F.length(name) - F.length(F.regexp_replace(name, f"[{b}]", "")))
        for b in HIST
    ]
    band_f = (F.length(name) / W).cast("long")
    seg_cols = []
    for i in range(nseg):
        start = (F.length(name) * i / nseg).cast("long") + 1
        end = (F.length(name) * (i + 1) / nseg).cast("long")
        seg_cols.append(name.substr(start, end - start + 1).alias(f"seg{i}_a"))
    a = df.select(
        F.col(key_col).alias("key_a"),
        name.alias("name_a"),
        F.col(block_col).alias("block"),
        F.length(name).alias("ln_a"),
        *[h.alias(f"h{i}_a") for i, h in enumerate(hist)],
        *seg_cols,
        band_f.alias("f_a"),
    ).select(
        "*", F.explode(F.array(F.col("f_a"), F.col("f_a") + 1)).alias("band")
    ).withColumn("salt", F.pmod(F.hash("key_a"), F.lit(SALT)))  # hash: key may be a string
    b = df.select(
        F.col(key_col).alias("key_b"),
        name.alias("name_b"),
        F.col(block_col).alias("block"),
        F.length(name).alias("ln_b"),
        *[h.alias(f"h{i}_b") for i, h in enumerate(hist)],
        band_f.alias("f_b"),
    ).select(
        "*", F.explode(F.array(F.col("f_b"), F.col("f_b") + 1)).alias("band")
    ).select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(SALT)])).alias("salt")
    )
    hist_l1 = sum(
        F.abs(F.col(f"h{i}_a") - F.col(f"h{i}_b")) for i in range(len(HIST))
    )
    seg_hit = F.col("ln_a") < nseg  # an empty segment matches trivially
    for i in range(nseg):
        seg_hit = seg_hit | F.contains(F.col("name_b"), F.col(f"seg{i}_a"))
    return (
        a.hint("shuffle_hash")
        .join(b, ["block", "band", "salt"])
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.col("band") == F.greatest("f_a", "f_b"))
        .filter(F.abs(F.col("ln_a") - F.col("ln_b")) <= threshold)
        .filter(hist_l1 <= 2 * threshold)
        .filter(seg_hit)
        # bounded levenshtein (ADVICE r7 #2): the 3-arg form abandons the
        # O(len²) DP as soon as the running distance exceeds threshold —
        # the dominant win on the surviving candidates, whose lengths the
        # prefilters can't shrink.  SENTINEL HAZARD: above the threshold
        # it returns -1, which a bare `<= threshold` filter would KEEP;
        # the >= 0 conjunct excludes it.  Surviving values are identical
        # to the unbounded form, so oracles are unchanged.
        .withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b", threshold).cast("long"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= threshold))
        .select("key_a", "key_b", "name_a", "name_b", "block", "edit_dist")
    )


@register(
    "link-fuzzy-match",
    oracle=f"""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           a.p_brand AS block,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {EDIT_THRESHOLD}
    """,
)
def link_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching over part names: block on brand (equi-join),
    match within a block when levenshtein ≤ 2 — catches variant spellings
    of the same part without an all-pairs scan."""
    part = load_table(spark, sf_dir, "part")
    return blocked_fuzzy_pairs(part, "p_partkey", "p_name", "p_brand")


# ---------------------------------------------------------------------------
# link-golden-record — survivorship after entity resolution
# ---------------------------------------------------------------------------


def _golden_record_oracle() -> str:
    return f"""
    WITH p AS (
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= {EDIT_THRESHOLD}
    ),
    edges AS (
      SELECT key_a AS x, key_b AS y FROM p
      UNION
      SELECT key_b AS x, key_a AS y FROM p
    ),
    reach AS (
      WITH RECURSIVE r AS (
        SELECT DISTINCT x AS node, x AS lbl FROM edges
        UNION
        SELECT e.x AS node, r.lbl FROM r JOIN edges e ON e.y = r.node
      )
      SELECT node, min(lbl) AS cluster_id FROM r GROUP BY node
    ),
    members AS (
      SELECT pt.p_partkey, pt.p_name, pt.p_retailprice, pt.p_size,
             COALESCE(reach.cluster_id, pt.p_partkey) AS cluster_id
      FROM part pt LEFT JOIN reach ON reach.node = pt.p_partkey
    ),
    g1 AS (
      SELECT cluster_id, count(*) AS n_members,
             min(p_partkey) AS canonical_key,
             max(length(p_name)) AS max_len,
             max(p_retailprice) AS max_retailprice,
             min(p_size) AS min_size
      FROM members GROUP BY cluster_id
    ),
    cname AS (
      SELECT m.cluster_id, min(m.p_name) AS canonical_name
      FROM members m JOIN g1 ON g1.cluster_id = m.cluster_id
      WHERE length(m.p_name) = g1.max_len
      GROUP BY m.cluster_id
    )
    SELECT g1.cluster_id, g1.canonical_key, g1.n_members,
           cname.canonical_name, g1.max_retailprice, g1.min_size
    FROM g1 JOIN cname ON cname.cluster_id = g1.cluster_id
    """


@register("link-golden-record", oracle=_golden_record_oracle())
def link_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record construction — the step AFTER fuzzy
    matching that record-linkage pipelines actually ship: fuzzy pairs →
    connected components → ONE canonical record per real-world entity,
    each attribute consolidated by an explicit survivorship rule
    (name: longest, lexicographic tie-break — completeness wins;
    price: max observed; size: min observed; key: smallest member).
    Every part appears in exactly one entity (singletons are their own
    golden record), so the output IS the deduplicated entity table.

    The longest-name rule is computed in two phases (per-cluster max
    length, then conditional min among names of that length) instead of
    a struct-ordered min_by — cross-engine struct comparison is not a
    contract this repo relies on, while two keyed aggregates are.  Scale
    shape: components ride the blocked pair list (equi-joins only, edge
    list materialized once); survivorship is two partial-agg shuffles on
    cluster_id plus one equi-join back."""
    from merl_etl_spark.operators.dedup import connected_components

    part = load_table(spark, sf_dir, "part")
    pairs = blocked_fuzzy_pairs(part, "p_partkey", "p_name", "p_brand")
    comp = connected_components(
        pairs.select(F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b"))
    ).select(F.col("doc_id").alias("node"), "cluster_id")
    members = (
        part.join(comp, part["p_partkey"] == comp["node"], "left")
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            "p_size",
            F.coalesce("cluster_id", "p_partkey").alias("cluster_id"),
        )
    )
    g1 = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("p_partkey").alias("canonical_key"),
        F.max(F.length("p_name")).alias("max_len"),
        F.max("p_retailprice").alias("max_retailprice"),
        F.min("p_size").alias("min_size"),
    )
    cname = (
        members.join(g1.select("cluster_id", "max_len"), "cluster_id")
        .filter(F.length("p_name") == F.col("max_len"))
        .groupBy("cluster_id")
        .agg(F.min("p_name").alias("canonical_name"))
    )
    return g1.join(cname, "cluster_id").select(
        "cluster_id",
        "canonical_key",
        "n_members",
        "canonical_name",
        "max_retailprice",
        "min_size",
    )
