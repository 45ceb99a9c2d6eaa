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

Scale: the join is a plain equi-join on the blocking key, so the only
hazard is a degenerate block.  Block sizes are data-bounded here
(brand → ≤~100 parts); for hot blocks the same capped-pair routing as
dedup.capped_bucket_pairs applies — noted rather than wired because the
blocking key is chosen per-dataset and the cap belongs at that call
site.  levenshtein is JVM-side (no Python), O(len²) per pair on ≤30-char
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
    block, edit_dist)."""
    a = df.select(
        F.col(key_col).alias("key_a"),
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("block"),
    )
    b = df.select(
        F.col(key_col).alias("key_b"),
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("block"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= threshold)
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
