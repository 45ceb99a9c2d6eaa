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

Scale: any block/band-shaped key leaves candidate mass quadratic in
records-per-key (Σ size²) — measured fatal at a 100×-records corpus.
The round-8 candidate generation is PassJoin (Li/Deng/Feng, ICDE 2011):
the pigeonhole segment itself becomes part of the equi-join key, so
candidate volume is (true matches × bounded multiplicity) + exact-
segment coincidences — corpus-linear emission with no size² term (proof
and plan notes in :func:`blocked_fuzzy_pairs`).  The oracle is
untouched — it states the SPEC, all within-brand pairs under the
threshold.  levenshtein is JVM-side (no Python), bounded 3-arg form,
O(len·t) effective per surviving pair on ≤30-char strings.
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

    ROUND-8 REWRITE — the segment IS the join key.  Rounds 6-7 used the
    physical key (block, length-band, salt) with pigeonhole-segment /
    histogram / length-gap prefilters applied AFTER the join; that key
    refined brand blocks only by the length spread, so candidate mass
    grew as Σ_blocks size² — fine at fixture scale, measured QUADRATIC
    in records-per-block at a 100×-records corpus (2M parts → ~3.6e10
    joined rows before any prefilter; the join stalled for >25 min).
    PassJoin (Li/Deng/Feng, ICDE 2011 — the published
    exact-match-segment algorithm) moves the pigeonhole segment from a
    post-join filter INTO the equi-join key:

    - partitioned side: each record emits its t+1 segments as
      (block, len, seg_idx, seg_text) — 3 rows/record at t=2;
    - probe side: each record emits, for every partitioned length
      L ∈ [len−t, len+t] (the length gap bound) and segment index i,
      the substrings whose start shift lies in the MULTI-MATCH-AWARE
      window (PassJoin §4.2, r15 optimization — guide §3 "shrink the
      big side before shuffling it"):

          shift ∈ [max(−i, Δ−(t−i)), min(i, Δ+(t−i))],  Δ = len − L

      instead of the full ∈ [−t, t].  Bound: at most i of the t edits
      can precede segment i's untouched match (each shifts alignment
      by ≤ 1), so |shift| ≤ i from the left; the ≤ t−i edits after it
      must absorb the remaining length difference, so shift ∈
      Δ ± (t−i) from the right.  19 keys/record at t=2 (was 75),
      array_distinct'd — ~2× fewer distinct probe keys, so both the
      candidate exchange and the verify mass shrink with it.
      Validated exhaustively (0 misses over ~98k within-threshold
      pairs, t ∈ {1,2,3} + 8k long mutated strings) and by the
      brute-force equality pytest;
    - equi-join on (block, L, seg_idx, seg_text) + pair dedup.

    Soundness: edit(a,b) ≤ t touches ≤ t of a's t+1 segments, so one is
    untouched and occurs verbatim in b within ±t of its position — the
    probe side emitted exactly that key.  Records shorter than t+1
    chars have empty segments (the pigeonhole survivor can be empty ⇒
    keyless); they ride a separate block-keyed arm whose quadratic mass
    is bounded by the count of sub-(t+1)-char names.  Candidate volume
    is now (true matches × segment multiplicity) + exact-segment
    coincidences — emission is corpus-LINEAR and no block-size² term
    exists anywhere, which is what survives 100 TB.  The old salting is
    gone with the cause: shuffle_hash on the fine-grained segment key
    spreads the verify work across reducers by construction (hot keys =
    genuinely identical segments, which AQE skew-split handles).

    Verification on the surviving candidates keeps the two sound
    prefilters that are not implied by the key (each provably never
    drops a qualifying pair):

    1. character-histogram L1 — for ANY fixed partition of characters
       into buckets, a substitution moves one char between ≤ 2 buckets
       (L1 change ≤ 2) and an indel changes one bucket by 1, so edit ≤ t
       ⟹ Σ_buckets |cnt_a − cnt_b| ≤ 2t.  Bucket counts are precomputed
       once per RECORD (O(n) regexp passes, never per pair); the pair
       check is four int subtractions.  (The length gap ≤ t is implied
       by the probe's L-window; the segment containment IS the key.)
    2. bounded levenshtein — the 3-arg form abandons the O(len²) DP as
       soon as the running distance exceeds the threshold."""
    # any char partition is sound (see filter 1 below).  An 8-bucket
    # variant was measured and REVERTED (r15): it passes 57% of sf0.1
    # candidates vs 91% for 4 buckets (a 38% cut in levenshtein calls),
    # but benched +0.5 s (5.6 -> 6.1 s, 3 paired samples each) — the
    # bounded early-abandon levenshtein is already cheap per pair, while
    # 4 extra ints per shuffled probe/segment row and 4 more |a-b| per
    # candidate cost more than the skipped DP work saves.
    HIST = ["a-g", "h-m", "n-s", "t-z"]
    nseg = threshold + 1
    name = F.col(name_col)
    hist = [
        (F.length(name) - F.length(F.regexp_replace(name, f"[{b}]", "")))
        for b in HIST
    ]
    from merl_etl_spark.operators.dedup import spread_pairs

    base = df.select(
        F.col(key_col).alias("key"),
        name.alias("name"),
        F.col(block_col).alias("block"),
        F.length(name).alias("ln"),
        *[h.alias(f"h{i}") for i, h in enumerate(hist)],
    )
    # pin the emission parallelism: the probe side does 75 substring
    # extractions + an array_distinct per record BEFORE any exchange, so
    # with a compact parquet input (1-2 file splits) that work would
    # serialize on one core (measured 5.2 s of an 8.7 s query at sf0.1)
    # — the input-split cousin of the broadcast-probe trap.  spread_pairs
    # is the AQE-exempt keyed repartition the dedup tier uses for the
    # same bytes-underestimate-work shape.
    base = spread_pairs(base, "key")

    # ---- partitioned side: the t+1 exact segments (non-empty ⇔ ln ≥ nseg)
    def _start(lexpr: str, i: int) -> str:
        return f"(CAST({lexpr} * {i} / {nseg} AS INT) + 1)"

    def _slen(lexpr: str, i: int) -> str:
        return (
            f"(CAST({lexpr} * {i + 1} / {nseg} AS INT)"
            f" - CAST({lexpr} * {i} / {nseg} AS INT))"
        )

    seg_structs = ", ".join(
        f"struct({i} AS segi, substring(name, {_start('ln', i)}, "
        f"{_slen('ln', i)}) AS seg)"
        for i in range(nseg)
    )
    a = (
        base.filter(F.col("ln") >= nseg)
        .select(
            F.col("key").alias("key_a"),
            F.col("name").alias("name_a"),
            "block",
            F.col("ln").alias("jl"),
            *[F.col(f"h{i}").alias(f"h{i}_a") for i in range(len(HIST))],
            F.explode(F.expr(f"array({seg_structs})")).alias("s"),
        )
        .select("key_a", "name_a", "block", "jl",
                *[f"h{i}_a" for i in range(len(HIST))], "s.segi", "s.seg")
    )

    # ---- probe side: substrings matching any admissible (L, segi, shift)
    probe_entries = []
    for dL in range(-threshold, threshold + 1):
        L = f"(ln + {dL})"
        # multi-match-aware shift window (docstring above): Δ is the
        # probe-minus-partitioned length difference, i.e. −dL here
        delta = -dL
        for i in range(nseg):
            lo = max(-i, delta - (threshold - i))
            hi = min(i, delta + (threshold - i))
            for shift in range(lo, hi + 1):
                spos = f"({_start(L, i)} + {shift})"
                slen = _slen(L, i)
                probe_entries.append(
                    f"IF({L} >= {nseg} AND {slen} > 0 AND {spos} >= 1 "
                    f"AND {spos} + {slen} - 1 <= ln, "
                    f"struct({L} AS jl, {i} AS segi, "
                    f"substring(name, {spos}, {slen}) AS seg), NULL)"
                )
    probe_expr = (
        "array_distinct(filter(array(" + ", ".join(probe_entries)
        + "), x -> x IS NOT NULL))"
    )
    b = (
        # ln >= nseg keeps the two arms DISJOINT: any pair involving a
        # sub-nseg-char record is owned by the short arm (short record on
        # its a-side), so the union below cannot double-emit a pair
        base.filter(F.col("ln") >= nseg)
        .select(
            F.col("key").alias("key_b"),
            F.col("name").alias("name_b"),
            "block",
            F.col("ln").alias("ln_b"),
            *[F.col(f"h{i}").alias(f"h{i}_b") for i in range(len(HIST))],
            F.explode(F.expr(probe_expr)).alias("p"),
        )
        .select("key_b", "name_b", "block", "ln_b",
                *[f"h{i}_b" for i in range(len(HIST))],
                "p.jl", "p.segi", "p.seg")
    )

    hist_l1 = sum(
        F.abs(F.col(f"h{i}_a") - F.col(f"h{i}_b")) for i in range(len(HIST))
    )
    cand = (
        a.hint("shuffle_hash")
        .join(b, ["block", "jl", "segi", "seg"])
        .filter(F.col("key_a") < F.col("key_b"))
    )

    # ---- short-name arm: ln < nseg records have (possibly) empty
    # segments, so the pigeonhole survivor can be keyless; their pair
    # mass is bounded by (#short names)² within a block — sub-(t+1)-char
    # strings, a degenerate sliver of any real corpus.  Both directions
    # are covered by putting the SHORT record on the a-side.
    short_a = base.filter(F.col("ln") < nseg).select(
        F.col("key").alias("key_a"),
        F.col("name").alias("name_a"),
        "block",
        *[F.col(f"h{i}").alias(f"h{i}_a") for i in range(len(HIST))],
        F.col("ln").alias("ln_a"),
    )
    all_b = base.select(
        F.col("key").alias("key_b"),
        F.col("name").alias("name_b"),
        "block",
        *[F.col(f"h{i}").alias(f"h{i}_b") for i in range(len(HIST))],
        F.col("ln").alias("ln_b"),
    )
    short_cand = (
        short_a.join(all_b, "block")
        .filter(F.abs(F.col("ln_a") - F.col("ln_b")) <= threshold)
        .filter(F.col("key_a") != F.col("key_b"))
        .select(
            F.least("key_a", "key_b").alias("key_a2"),
            F.greatest("key_a", "key_b").alias("key_b2"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("name_a"))
            .otherwise(F.col("name_b")).alias("name_a"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("name_b"))
            .otherwise(F.col("name_a")).alias("name_b"),
            "block",
            *[
                F.when(F.col("key_a") < F.col("key_b"), F.col(f"h{i}_a"))
                .otherwise(F.col(f"h{i}_b")).alias(f"h{i}_a2")
                for i in range(len(HIST))
            ],
            *[
                F.when(F.col("key_a") < F.col("key_b"), F.col(f"h{i}_b"))
                .otherwise(F.col(f"h{i}_a")).alias(f"h{i}_b2")
                for i in range(len(HIST))
            ],
        )
        .withColumnsRenamed(
            {"key_a2": "key_a", "key_b2": "key_b",
             **{f"h{i}_a2": f"h{i}_a" for i in range(len(HIST))},
             **{f"h{i}_b2": f"h{i}_b" for i in range(len(HIST))}}
        )
    )

    verify_cols = ["key_a", "key_b", "name_a", "name_b", "block",
                   *[f"h{i}_a" for i in range(len(HIST))],
                   *[f"h{i}_b" for i in range(len(HIST))]]
    merged = cand.select(*verify_cols).unionByName(short_cand.select(*verify_cols))
    return (
        merged
        .filter(hist_l1 <= 2 * threshold)
        # verify BEFORE deduplicating: a candidate pair reached by k
        # segment keys appears k (≤ t+1) times, so filtering first costs
        # ≤ (t+1)× the per-pair check but shrinks the dedup shuffle from
        # the full candidate stream (~2M rows at sf0.1) to the verified
        # matches — the single pair-keyed exchange in the plan
        # bounded levenshtein (ADVICE r7 #2): the 3-arg form abandons the
        # O(len²) DP as soon as the running distance exceeds threshold.
        # SENTINEL HAZARD: above the threshold it returns -1, which a
        # bare `<= threshold` filter would KEEP; the >= 0 conjunct
        # excludes it.  Surviving values are identical to the unbounded
        # form, so oracles are unchanged.
        .withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b", threshold).cast("long"),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= threshold))
        .dropDuplicates(["key_a", "key_b"])
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
    # r14 optimization (guide §2.4): g1 has two consumers (the cname
    # length probe and the final join) — cut the cluster-grain rollup so
    # the members aggregation runs once, not once per consumer
    from merl_etl_spark.lineage import cut_lineage

    g1 = cut_lineage(g1, eager=False)
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
