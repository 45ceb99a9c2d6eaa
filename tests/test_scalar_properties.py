"""Property-based tests (hypothesis) for the scalar column library —
the invariants the reference's formatting/normalization helpers promise
(scripts/lib_fmt.sh, merlin_etl.py bucketing/parsing), checked over
generated inputs rather than fixtures.

Columns are evaluated in one batch per property via createDataFrame to
keep Spark round-trips cheap.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from merl_etl_spark.functions import scalar as S

pytestmark = pytest.mark.filterwarnings("ignore")

MONEY = st.decimals(
    min_value=Decimal("-99999999999.99"),
    max_value=Decimal("99999999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=50))
def test_commify_strip_roundtrip(spark, values):
    """strip_commas(commify(x)) parses back to exactly x at 2dp
    (lib_fmt.sh:22-39 commify ∘ :15 strip)."""
    df = spark.createDataFrame([(str(v),) for v in values], "x string")
    out = df.select(
        F.col("x").cast("decimal(38,2)").alias("orig"),
        S.strip_commas(S.commify(F.col("x").cast("decimal(38,2)")))
        .cast("decimal(38,2)")
        .alias("roundtrip"),
    ).collect()
    for r in out:
        assert r.roundtrip == r.orig


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**33), min_size=1, max_size=50))
def test_floor_6h_alignment(spark, unix_secs):
    """floor_6h lands exactly on the 00/06/12/18 UTC grid and never moves
    a timestamp forward (merlin_etl.py:190-194)."""
    df = spark.createDataFrame([(s,) for s in unix_secs], "s long")
    out = df.select(
        "s", F.unix_timestamp(S.floor_6h(F.timestamp_seconds("s"))).alias("b")
    ).collect()
    for r in out:
        assert r.b % 21600 == 0
        assert 0 <= r.s - r.b < 21600


ADDR_HEX = st.text(alphabet="0123456789abcdef", min_size=40, max_size=40)


@settings(max_examples=20, deadline=None)
@given(st.lists(ADDR_HEX, min_size=1, max_size=30))
def test_short_addr_shape_and_hex_roundtrip(spark, hexes):
    """short_addr is first-6 + ellipsis + last-4 (lib_fmt.sh:6); unhex of
    the 0x-stripped address round-trips through hex()."""
    df = spark.createDataFrame([("0x" + h,) for h in hexes], "a string")
    out = df.select(
        "a",
        S.short_addr(F.col("a")).alias("short"),
        F.lower(F.hex(S.hex_decode_addr(F.col("a")))).alias("rt"),
    ).collect()
    for r in out:
        assert r.short == r.a[:6] + "…" + r.a[-4:]
        assert r.rt == r.a[2:]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=9.9e14, allow_nan=False), min_size=1, max_size=50))
def test_humanize_suffix_matches_magnitude(spark, values):
    """humanize picks the suffix tier by magnitude (lib_fmt.sh:41-58)."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    out = df.select("v", S.humanize(F.col("v")).alias("h")).collect()
    for r in out:
        v, h = r.v, r.h
        if v >= 1e12:
            assert h.endswith("T")
        elif v >= 1e9:
            assert h.endswith("B")
        elif v >= 1e6:
            assert h.endswith("M")
        elif v >= 1e3:
            assert h.endswith("K")
        else:
            assert not h[-1].isalpha()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=30))
def test_md_escape_covers_all_specials(spark, texts):
    """After md_escape, every MarkdownV2 special char is preceded by a
    backslash (notify_telegram.sh:14)."""
    specials = set("_*[]()~`>#+=|{}.!-")
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select("t", S.md_escape(F.col("t")).alias("e")).collect()
    for r in out:
        e = r.e
        i = 0
        while i < len(e):
            if e[i] == "\\":
                i += 2  # escaped pair
                continue
            assert e[i] not in specials, f"unescaped {e[i]!r} in {e!r}"
            i += 1


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(-(2**40), 2**40).map(str),
            st.text(max_size=8),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_try_int_parses_or_defaults(spark, raws):
    """try_int returns the parsed integer for integer strings and the
    default otherwise, never raising (merlin_etl.py:184-188)."""
    df = spark.createDataFrame([(r,) for r in raws], "r string")
    out = df.select("r", S.try_int(F.col("r"), default=-99).alias("v")).collect()
    for r in out:
        raw = r.r
        try:
            expected = int(raw)
            if not (-(2**63) <= expected < 2**63):
                continue
        except (ValueError, TypeError):
            expected = -99
        # Spark's string→number cast trims EVERY ASCII char <= 0x20
        # (controls included, e.g. '0\x1b' parses as 0), wider than
        # Python's str.strip() — such inputs are out of the contract
        # (hypothesis-found: the old str.strip() model missed \x1b)
        spark_ws = "".join(chr(c) for c in range(0x21))
        trimmed = raw.strip(spark_ws) if raw is not None else raw
        if raw is not None and trimmed != raw and trimmed.lstrip("+-").isdigit():
            continue
        assert r.v == expected, f"try_int({raw!r}) = {r.v}, expected {expected}"
