"""Driver-checkable queries exercising the scalar library (SURVEY.md §2.I).

Each suite runs a projection over fixture tables and is paired with an
ANSI-SQL oracle whose expressions render byte-identically in DuckDB —
decimal-backed formatting, explicit string concatenation, and md5-derived
synthetic addresses keep every output engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from merl_etl_spark.functions import scalar as S
from merl_etl_spark.operators.joins import TS_FMT_DUCK, TS_FMT_SPARK
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table


@register(
    "fn-string-suite",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           '0x' || md5(c_name) AS addr,
           substr('0x' || md5(c_name), 1, 6) || '…' ||
             substr('0x' || md5(c_name), length('0x' || md5(c_name)) - 3, 4) AS addr_short,
           upper(hex(unhex(substr(md5(c_name), 1, 32)))) AS addr_hex_roundtrip,
           printf('<a href="%s/address/%s">%s</a>', 'https://scan.example',
                  '0x' || md5(c_name),
                  substr('0x' || md5(c_name), 1, 6) || '…' ||
                    substr('0x' || md5(c_name), length('0x' || md5(c_name)) - 3, 4)
                  ) AS link
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn-lower, fn-substr-short, fn-hex-decode (roundtrip), fn-html-link.
    A synthetic 0x-address is derived from md5(c_name) so the hex-decode
    path (sql/top100_from_latest_bucket.sql:106-117) is exercised on data
    that has no real addresses."""
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    addr = F.concat(F.lit("0x"), F.md5(F.col("c_name")))
    return customer.select(
        "c_custkey",
        S.lower_addr(F.col("c_name")).alias("name_lower"),
        addr.alias("addr"),
        S.short_addr(addr).alias("addr_short"),
        F.hex(S.hex_decode_addr(addr)).alias("addr_hex_roundtrip"),
        S.html_link("https://scan.example", addr, S.short_addr(addr)).alias("link"),
    )


@register(
    "fn-numeric-suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_raw,
           CAST(CAST(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(18,2))
                * CAST(0.01 AS DECIMAL(4,2)) AS DECIMAL(18,6)) AS DOUBLE) AS price_scaled,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS DECIMAL(38,2)) AS DOUBLE)
             AS price_2dp,
           CAST(GREATEST(CAST(l_extendedprice AS DECIMAL(18,6)),
                         CAST(l_quantity * 1000 AS DECIMAL(18,6))) AS DOUBLE)
             AS bigger_flow,
           COALESCE(TRY_CAST(l_returnflag AS BIGINT), -1) AS flag_int,
           CASE WHEN l_discount >= 0.05 THEN 'high' ELSE 'low' END AS discount_band
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def fn_numeric_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn-pow-scale (exact decimal rescale of integer base units),
    fn-two-dec, fn-greatest, fn-trycast-int, fn-case, fn-cast.
    price_raw plays quantity_raw (integer base units); price_scaled is the
    generated-column scaling (schema.sql:51-52)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    raw = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        raw.alias("price_raw"),
        # decimal math internally; output boundary reduces scale to (18,6)
        # (exact — values have scale 2) then casts once to double, which is
        # bit-identical across engines while the unscaled value is < 2^53.
        (raw.cast(T.DecimalType(38, 18)) / 100)
        .cast(T.DecimalType(18, 6))
        .cast("double")
        .alias("price_scaled"),
        S.two_dec(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("price_2dp"),
        F.greatest(
            F.col("l_extendedprice").cast("decimal(18,6)"),
            (F.col("l_quantity") * 1000).cast("decimal(18,6)"),
        )
        .cast("double")
        .alias("bigger_flow"),
        S.try_int(F.col("l_returnflag"), -1).alias("flag_int"),
        F.when(F.col("l_discount") >= 0.05, F.lit("high"))
        .otherwise("low")
        .alias("discount_band"),
    )


@register(
    "fn-datetime-suite",
    oracle=f"""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M"Z"') AS ts_tochar,
           strftime(to_timestamp(CAST(floor(CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) / 21600.0) AS BIGINT) * 21600),
                    '{TS_FMT_DUCK}') AS bucket_6h,
           strftime(to_timestamp(CAST(floor(CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) / 21600.0) AS BIGINT) * 21600),
                    '%Y/%m/%d-%H:%M') AS trigger_id,
           CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS ts_unix,
           strftime(to_timestamp(CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT)), '{TS_FMT_DUCK}') AS ts_roundtrip,
           strftime(ts - INTERVAL 60 MINUTE, '{TS_FMT_DUCK}') AS ts_minus_60m
    FROM events
    WHERE event_id < 500
    """,
)
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn-tochar-ts, fn-floor-6h, trigger-id format, fn-from-unixtime
    (unix→ts roundtrip), fn-interval-arith.  All rendered as strings so
    the comparison is tz-representation-proof."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    unix = F.unix_timestamp(F.col("ts"))
    return events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm'\"Z\"'").alias("ts_tochar"),
        F.date_format(S.floor_6h(F.col("ts")), TS_FMT_SPARK).alias("bucket_6h"),
        S.trigger_id(S.floor_6h(F.col("ts"))).alias("trigger_id"),
        unix.alias("ts_unix"),
        F.date_format(S.from_unix(unix), TS_FMT_SPARK).alias("ts_roundtrip"),
        F.date_format(
            F.col("ts") - F.expr("INTERVAL 60 MINUTES"), TS_FMT_SPARK
        ).alias("ts_minus_60m"),
    )


@register(
    "fn-format-suite",
    oracle="""
    WITH c AS (
      SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer
      WHERE c_custkey <= 300
    ),
    f AS (
      SELECT *,
             CASE WHEN cents < 0 THEN '-' ELSE '' END ||
               format('{:,}', abs(cents) // 100) || '.' ||
               lpad(CAST(abs(cents) % 100 AS VARCHAR), 2, '0') AS bal_commified
      FROM c
    )
    SELECT c_custkey,
           bal_commified,
           CAST(CAST(replace(bal_commified, ',', '') AS DECIMAL(38,2)) AS DOUBLE)
             AS bal_reparsed,
           CASE
             WHEN abs(c_acctbal) >= 1000000000000.0
               THEN CAST(CAST(round(c_acctbal / 1000000000000.0, 2) AS DECIMAL(38,2)) AS VARCHAR) || 'T'
             WHEN abs(c_acctbal) >= 1000000000.0
               THEN CAST(CAST(round(c_acctbal / 1000000000.0, 2) AS DECIMAL(38,2)) AS VARCHAR) || 'B'
             WHEN abs(c_acctbal) >= 1000000.0
               THEN CAST(CAST(round(c_acctbal / 1000000.0, 2) AS DECIMAL(38,2)) AS VARCHAR) || 'M'
             WHEN abs(c_acctbal) >= 1000.0
               THEN CAST(CAST(round(c_acctbal / 1000.0, 2) AS DECIMAL(38,2)) AS VARCHAR) || 'K'
             ELSE CAST(CAST(round(c_acctbal, 2) AS DECIMAL(38,2)) AS VARCHAR)
           END AS bal_human,
           regexp_replace(c_mktsegment, '([_*\\[\\]()~`>#+=|{}.!\\\\-])', '\\\\\\1', 'g')
             AS seg_md_escaped,
           '{"wallet":' || c_custkey || ',"txs":' || c_nationkey || '}' AS stats_json
    FROM f
    """,
)
def fn_format_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn-commify, fn-commas-strip (reparse roundtrip), fn-humanize,
    fn-md-escape, fn-json-build (scripts/lib_fmt.sh:6-58,
    scripts/notify_telegram.sh:14, merlin_etl.py:151)."""
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    commified = S.commify(F.col("c_acctbal"))
    return customer.select(
        "c_custkey",
        commified.alias("bal_commified"),
        S.strip_commas(commified).cast(T.DecimalType(38, 2)).cast("double").alias("bal_reparsed"),
        S.humanize(F.col("c_acctbal")).alias("bal_human"),
        S.md_escape(F.col("c_mktsegment")).alias("seg_md_escaped"),
        S.json_stats(
            ("wallet", F.col("c_custkey")), ("txs", F.col("c_nationkey"))
        ).alias("stats_json"),
    )


@register(
    "fn-regex-suite",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_words,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_matches(p_name, '^[a-z]+( [a-z]+)*$') AS only_lower_words,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS vowels_masked,
           CAST(len(string_split_regex(p_name, ' +')) AS INT) AS n_tokens
    FROM part
    WHERE p_partkey <= 500
    """,
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar suite over part names: first capture, capture-group
    selection, global replacement, full-string match, and match/token
    counting — the extraction toolkit semi-structured columns need,
    checked cross-engine (Java regex vs DuckDB RE2; the patterns here
    deliberately stay in the common subset — no \\s classes, whose
    engine-specific membership already bit dedup-normalized).  Counting
    uses the SIZE of extract-all rather than emitting the array itself,
    because the driver canonicalization cannot hash array cells
    (fn-vector-quantize precedent).  Pure map — no shuffle."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.size(F.expr(r"regexp_extract_all(p_name, '[a-z]+', 0)")).alias("n_words"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.expr(r"p_name RLIKE '^[a-z]+( [a-z]+)*$'").alias("only_lower_words"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("vowels_masked"),
        F.size(F.split("p_name", " +")).alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# fn-transcendental-canary — driver-environment determinism probe
# ---------------------------------------------------------------------------

# VERDICT r8 #7: curate-dsir went driver-red while locally 3-SF green — an
# environment-sensitive transcendental somewhere in its ln→round→decimal
# path.  This canary pins ONE row per transcendental class the engine
# relies on, so if the driver environment ever diverges from local again,
# the mismatching row names WHICH function/argument-class flipped instead
# of leaving a mystery hash on a 60k-row query.
#
# Classes covered (each expression is portable SQL rendered IDENTICALLY
# into both engines from this single list — they cannot drift apart):
#   ln_int_*    integer-argument ln()  — the text-entropy / new-DSIR class
#   ln_ratio_*  float-ratio ln()       — the class the old DSIR λ used and
#                                        that flipped in the r8 driver env
#   sqrt_*      sqrt()                 — cosine/zscore denominators
#   pow_frac    fractional pow()       — BM25/decay shapes
#   exp_*       exp()                  — inverse-log reconstructions
#   dcast_*     decimal→double casts   — the ts-autocorr class (DuckDB's
#                                        high-scale cast double-rounds)
# All rounded once to the same 6-dp contract the operators use, then
# frozen as DECIMAL(18,6).
_CANARY_CASES: list[tuple[str, str]] = [
    ("ln_int_2", "ln(2)"),
    ("ln_int_7", "ln(7)"),
    ("ln_int_257", "ln(257)"),
    ("ln_int_65537", "ln(65537)"),
    ("ln_int_1000003", "ln(1000003)"),
    ("ln_int_1000000007", "ln(1000000007)"),
    # ratio args go through CAST(... AS DOUBLE): Spark parses a bare
    # `3.0` literal as DECIMAL, so `3.0/7.0` would be scale-truncated
    # decimal division there but double division in DuckDB — the canary
    # itself caught this divergence on first run
    ("ln_ratio_small", "ln(CAST(3 AS DOUBLE) / CAST(7 AS DOUBLE))"),
    ("ln_ratio_counts",
     "ln((CAST(135 AS DOUBLE) * 65792) / (CAST(149 AS DOUBLE) * 65536))"),
    ("ln_ratio_neartie",
     "ln((CAST(903 AS DOUBLE) * 12345) / (CAST(1001 AS DOUBLE) * 11111))"),
    ("sqrt_2", "sqrt(2)"),
    ("sqrt_10", "sqrt(10)"),
    ("sqrt_ratio", "sqrt(CAST(12345 AS DOUBLE) / CAST(999 AS DOUBLE))"),
    ("pow_frac", "pow(CAST(7 AS DOUBLE), CAST(0.5 AS DOUBLE))"),
    ("pow_bm25_shape", "pow(CAST(1.2 AS DOUBLE), CAST(0.75 AS DOUBLE))"),
    ("exp_1", "exp(1)"),
    ("exp_neg_ratio", "exp(CAST(-135 AS DOUBLE) / CAST(256 AS DOUBLE))"),
    # decimal→double cast probes (the ts-autocorr class): DuckDB's direct
    # decimal(38,12)→double is NOT correctly rounded when the unscaled
    # int128 exceeds 2^53 (double-rounding via double(int128)/1e12), so
    # high-scale oracles route through STRING; the direct casts below stay
    # correct only while unscaled < 2^53.  Each probe subtracts the integer
    # part (exact, Sterbenz) and scales by 1e12 so a 1-ulp divergence in
    # the cast shows up as an integer-sized difference instead of hiding
    # under the 6-dp round.
    # each probe subtracts its integer part (exact, Sterbenz), scales the
    # fraction by 1e12 so one cast ulp ≈ one integer unit, rounds to an
    # integer-valued double, then subtracts the EXPECTED integer — a green
    # row is exactly 0.000000 and a divergent environment shows the signed
    # ulp-scaled delta.  Keeping the emitted value near zero matters: the
    # template's double→DECIMAL(18,6) cast is only exact below ~2^53/1e6
    # in DuckDB (it scales by 1e6 in double first — measured +6.4e-5 of
    # garbage at 8.7e11)
    ("dcast_s12_string",
     "round((CAST(CAST(CAST('4597743.398300000000' AS DECIMAL(38,12))"
     " AS STRING) AS DOUBLE) - 4597743)"
     " * CAST(1000000000000 AS DOUBLE), 0) - 398299999535"),
    ("dcast_s6_direct",
     "round((CAST(CAST('5064234.435200' AS DECIMAL(38,6)) AS DOUBLE)"
     " - 5064234) * CAST(1000000000000 AS DOUBLE), 0) - 435200000182"),
    ("dcast_s2_direct",
     "round((CAST(CAST('101908.87' AS DECIMAL(38,2)) AS DOUBLE)"
     " - 101908) * CAST(1000000000000 AS DOUBLE), 0) - 869999999995"),
]


def _canary_sql() -> str:
    """Render the canary as one UNION ALL of literal rows — the SAME text
    is executed by Spark SQL and DuckDB, so the two sides share every
    character of every expression."""
    rows = "\n    UNION ALL ".join(
        f"SELECT '{cid}' AS case_id, "
        f"CAST(round({expr}, 6) AS DECIMAL(18,6)) AS val"
        for cid, expr in _CANARY_CASES
    )
    return rows


@register("fn-transcendental-canary", oracle=_canary_sql())
def fn_transcendental_canary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Environment determinism canary (VERDICT r8 #7): one literal row per
    transcendental class (integer-ln, ratio-ln, sqrt, fractional pow, exp)
    rounded to the operators' 6-dp contract.  Fixture-independent by
    design — it probes the ENGINES, not the data; a red driver row here
    names the exact function/argument class whose libm rounding differs
    between the driver environment and local, which is the diagnosis the
    curate-dsir r8 mystery cost a round to reach.  The dcast_* rows probe
    the decimal→double cast itself (ulp-visible via subtract-and-scale) —
    the class that bit ts-autocorr in r9 development.  Zero shuffles, 19
    rows."""
    return spark.sql(_canary_sql())
