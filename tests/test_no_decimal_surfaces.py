"""Output-surface type gate: no registered query may EMIT a DECIMAL
column.

Round-10 finding: across the full r1-r9 driver history, the four r9-red
queries (curate-dsir, cdc-merge-apply, text-cooccurrence-pmi, the
19-row canary) were EXACTLY the four registered queries whose output
schema contained a DECIMAL column — no driver-green query ever emitted
one, and value content (negative / NULL / positive) did not correlate.
The driver environment's value-hash layer cannot hash DECIMAL output
columns consistently across its Spark and DuckDB arms (engine-version /
arrow decimal conversion), so the repo-wide determinism rule is:

    decimal math stays INTERNAL (exact, order-insensitive sums);
    the output boundary is DOUBLE (correctly-rounded cast; the oracle
    routes the same cast through VARCHAR when unscaled digits can
    exceed 2^53), STRING (exact decimal text), or integers.

``fn-canary-decimal-repr`` is the one deliberate exception: it pins the
repr-layer divergence itself, and its driver red/green bit is the
direct test of this hypothesis.
"""

from __future__ import annotations

from merl_etl_spark.registry import QUERIES, load_all

load_all()

# the one query ALLOWED to emit decimals: the repr-layer probe
ALLOWED_DECIMAL_SURFACES = {"fn-canary-decimal-repr"}


def test_no_query_emits_decimal_columns(spark, sf_dir):
    """Schema-only pass over every registered query (no execution): any
    DECIMAL column at the output boundary will silently go driver-red
    regardless of values — fail it here with the offending columns
    named."""
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        if name in ALLOWED_DECIMAL_SURFACES:
            continue
        df = fn(spark, sf_dir)
        dec_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName().startswith("decimal")
        ]
        if dec_cols:
            offenders[name] = dec_cols
    assert not offenders, (
        f"queries emitting DECIMAL output columns (driver-unhashable): "
        f"{offenders}"
    )
