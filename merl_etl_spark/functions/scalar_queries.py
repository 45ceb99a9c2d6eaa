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
# fn-canary-* — driver-environment determinism probes, ONE QUERY PER CLASS
# ---------------------------------------------------------------------------

# VERDICT r8 #7 introduced a single 19-row canary; it went red in the r9
# driver env together with three operator queries, proving an environment
# divergence — but one hash boolean over 19 rows cannot say WHICH row
# diverged.  VERDICT r9 #1: split it into one registered query per class,
# so the driver's per-query hash booleans NAME the divergent class
# directly in CORRECTNESS_r10.
#
# Classes covered (each expression is portable SQL rendered IDENTICALLY
# into both engines from a single list — they cannot drift apart):
#   ln_int_*    integer-argument ln()  — the text-entropy / DSIR class
#   ln_ratio_*  float-ratio ln()       — the class the old DSIR λ used and
#                                        that flipped in the r8 driver env
#   sqrt_*      sqrt()                 — cosine/zscore denominators
#   pow_*       fractional pow()       — BM25/decay shapes
#   exp_*       exp()                  — inverse-log reconstructions
#   dcast_*     decimal→double casts   — the ts-autocorr class (DuckDB's
#                                        high-scale cast double-rounds)
# Transcendental classes are rounded once to the same 6-dp contract the
# operators use, then frozen as DECIMAL(18,6).
#
# Two NON-transcendental classes added for r10 separate "the math
# diverged" from "the value representation/hash layer diverged" — if
# either goes red while holding pure literals, the problem is not libm:
#   drepr_*     pure DECIMAL literals/arithmetic (no doubles anywhere):
#               negative values, zero, NULL, widened precision — the
#               output SHAPE shared by all four r9-red queries
#   fprepr_*    pure DOUBLE literals / exact IEEE integer arithmetic —
#               the raw-passthrough class ten r9-green ts-* queries prove
#               safe; a red here would implicate the hash layer itself
#
# r10 finding that drove the emission types below: a full-registry scan
# showed the four r9-red queries are EXACTLY the four queries whose
# OUTPUT schema contains a DECIMAL column (every driver-green query in
# r1-r9 history emits none) — value content (negative/NULL/positive)
# does not correlate.  So the transcendental classes emit their 6-dp
# values as STRING (exact decimal text, hash-stable regardless of the
# repr layer, still libm-sensitive — a red names the math class), while
# fn-canary-decimal-repr DELIBERATELY keeps a DECIMAL column: it is the
# one query allowed to go red, and its red/green bit directly tests the
# repr-layer hypothesis against the driver env.
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

# Non-transcendental representation probes.  Each entry is (case_id,
# full SELECT-expression WITH its own cast) because unlike the
# transcendental rows these must NOT share the round→DECIMAL template —
# the whole point is to emit the exact output shapes the operators use
# with zero lossy conversions in between.
_CANARY_REPR_CASES: list[tuple[str, str]] = [
    # ---- drepr: pure decimal literals & exact decimal arithmetic ----
    ("drepr_pos", "CAST('1.500000' AS DECIMAL(18,6))"),
    ("drepr_neg", "CAST('-0.847298' AS DECIMAL(18,6))"),
    ("drepr_zero", "CAST('0.000000' AS DECIMAL(18,6))"),
    ("drepr_null", "CAST(NULL AS DECIMAL(18,6))"),
    # negative value produced by decimal SUBTRACTION (the PMI/DSIR shape:
    # engines widen intermediate precision differently, outer cast pins it)
    ("drepr_sub_neg",
     "CAST(CAST('1.000000' AS DECIMAL(18,6))"
     " - CAST('1.847298' AS DECIMAL(18,6)) AS DECIMAL(18,6))"),
    # integer-weighted decimal sum landing negative (the DSIR weight shape)
    ("drepr_mul_neg",
     "CAST(37 * CAST('-0.000113' AS DECIMAL(18,6)) AS DECIMAL(18,6))"),
    ("drepr_smallfrac", "CAST('0.000001' AS DECIMAL(18,6))"),
    ("drepr_wide", "CAST('123456789012.654321' AS DECIMAL(18,6))"),
    # ---- fprepr: pure double literals & exact IEEE arithmetic ----
    ("fprepr_pos", "CAST(1.5 AS DOUBLE)"),
    ("fprepr_neg", "CAST(-0.25 AS DOUBLE)"),
    ("fprepr_zero", "CAST(0 AS DOUBLE)"),
    ("fprepr_null", "CAST(NULL AS DOUBLE)"),
    # 0.1 is the canonical repeating binary fraction: shortest-repr
    # printing vs excess-digit printing WOULD differ here
    ("fprepr_tenth", "CAST(0.1 AS DOUBLE)"),
    # exact IEEE division of integers (the keep_prob / ratio class)
    ("fprepr_div", "CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE)"),
    # small-magnitude ratio (exercises exponent-form printing, 1e-9) and
    # a >2^53 integer (precision-edge reprs)
    ("fprepr_tiny", "CAST(1 AS DOUBLE) / CAST(1000000000 AS DOUBLE)"),
    ("fprepr_big", "CAST(9007199254740992 AS DOUBLE)"),
]

# class prefix → (query id, case prefixes included).  One registered
# query per class: the driver's per-query hash boolean IS the diagnosis.
_CANARY_CLASSES: list[tuple[str, tuple[str, ...]]] = [
    ("fn-canary-ln-int", ("ln_int_",)),
    ("fn-canary-ln-ratio", ("ln_ratio_",)),
    ("fn-canary-sqrt", ("sqrt_",)),
    ("fn-canary-pow", ("pow_",)),
    ("fn-canary-exp", ("exp_",)),
    ("fn-canary-dcast", ("dcast_",)),
]


def _canary_class_sql(prefixes: tuple[str, ...]) -> str:
    """Render one class's rows as a UNION ALL of literal rows — the SAME
    text is executed by Spark SQL and DuckDB, so the two sides share
    every character of every expression."""
    rows = "\n    UNION ALL ".join(
        f"SELECT '{cid}' AS case_id, "
        f"CAST(CAST(round({expr}, 6) AS DECIMAL(18,6)) AS STRING) AS val"
        for cid, expr in _CANARY_CASES
        if cid.startswith(prefixes)
    )
    return rows


def _register_canary_class(qid: str, prefixes: tuple[str, ...]) -> None:
    sql = _canary_class_sql(prefixes)

    @register(qid, oracle=sql)
    def _canary_query(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        return spark.sql(_sql)

    _canary_query.__doc__ = (
        f"Environment determinism canary class {prefixes} (VERDICT r9 #1): "
        "literal rows rounded to the operators' 6-dp contract, rendered "
        "from the same text into both engines.  Fixture-independent — it "
        "probes the ENGINES, not the data; a red driver row here names "
        "this exact function/argument class as the one whose rounding "
        "differs between the driver environment and local.  Zero "
        "shuffles."
    )


for _qid, _prefixes in _CANARY_CLASSES:
    _register_canary_class(_qid, _prefixes)


def _canary_repr_sql(prefix: str) -> str:
    rows = "\n    UNION ALL ".join(
        f"SELECT '{cid}' AS case_id, {expr} AS val"
        for cid, expr in _CANARY_REPR_CASES
        if cid.startswith(prefix)
    )
    return rows


def fn_canary_decimal_repr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representation-layer canary: pure DECIMAL literals and exact
    decimal arithmetic — negative values, zero, NULL, a subtraction-
    widened negative, an integer-weighted product — with NO doubles and
    NO transcendentals anywhere.  All four r9-red queries emitted decimal
    columns holding negative/NULL values; its r10 driver row went red
    EXACTLY as predicted, confirming the divergence is in how the driver
    env materializes/hashes decimals, not in any math — the finding that
    established the no-DECIMAL-surfaces output rule.

    RETIRED from the driver registry in r13 (VERDICT r12 task #5): its
    diagnostic job is done, and keeping a known-red row made the driver
    surface not-green-by-construction.  Coverage after retirement:
    tests/test_no_decimal_surfaces.py pins the boundary rule (no
    registered query may emit DECIMAL) AND still value-compares THIS
    function against `oracle_sql` below in DuckDB (local engines hash
    decimals consistently — only the driver env cannot);
    tests/test_round9_ops.py pins the Spark output analytically."""
    return spark.sql(_canary_repr_sql("drepr_"))


fn_canary_decimal_repr.oracle_sql = _canary_repr_sql("drepr_")


@register("fn-canary-double-repr", oracle=_canary_repr_sql("fprepr_"))
def fn_canary_double_repr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representation-layer canary: pure DOUBLE literals and exact IEEE
    arithmetic (division of small integers, a repeating binary fraction,
    a >2^53 integer, NULL).  This is the raw-passthrough class that ten
    r9-green ts-* queries prove safe in the driver env — it is expected
    to stay green; a red here would implicate the driver's value-hash
    layer itself and invalidate the raw-double migration strategy the
    r10 oracle fixes rely on."""
    return spark.sql(_canary_repr_sql("fprepr_"))


# ---------------------------------------------------------------------------
# fn-array-suite — the higher-order array-function class, oracle-pinned
# ---------------------------------------------------------------------------


@register(
    "fn-array-suite",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS INT) AS n_words,
           list_sort(words)[1] AS first_sorted,
           array_to_string(list_sort(words)[1:3], '-') AS head3,
           CAST(len(list_filter(words, x -> length(x) > 3)) AS INT) AS n_long,
           CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT)
             AS sum_len,
           CAST(list_max(list_transform(words, x -> length(x))) AS BIGINT)
             AS max_len,
           (len(words) <> len(list_distinct(words))) AS has_dup
    FROM w
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order array-function class as a registered suite:
    sort, slice, filter-with-lambda, transform+fold (aggregate), and
    distinct — the exact expression family the engine's hot paths lean
    on (the PQ argmin folds, the RP sign projections, the shingle
    pipelines) — pinned against DuckDB's list_* twins so a semantic
    drift in any of them (sort order of equal elements, slice
    inclusivity, empty-list folds) is caught by hash, not discovered
    inside a 600-line operator.  Same rationale as fn-string-suite /
    fn-numeric-suite: one registered query per function class the
    operators rely on.

    Determinism: all outputs are integers, booleans, or sorted-string
    derivations — no float anywhere; array_sort/list_sort agree on
    total string order, slice(x,1,3) and [1:3] are both 1-based
     3-element-inclusive and clamp identically."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("words"))
    return w.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.element_at(F.array_sort("words"), 1).alias("first_sorted"),
        F.array_join(F.slice(F.array_sort("words"), 1, 3), "-").alias("head3"),
        F.size(F.filter("words", lambda x: F.length(x) > 3)).alias("n_long"),
        F.aggregate(
            "words", F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("sum_len"),
        F.aggregate(
            "words", F.lit(0).cast("long"), lambda a, x: F.greatest(a, F.length(x).cast("long"))
        ).alias("max_len"),
        (F.size("words") != F.size(F.array_distinct("words"))).alias("has_dup"),
    )


# ---------------------------------------------------------------------------
# fn-map-suite — MapType higher-order functions against a relational oracle
# ---------------------------------------------------------------------------

# map_filter keep threshold on the ORIGINAL per-(day, type) count: low
# enough that most cells survive at every SF, high enough that the
# smallest fixture actually drops cells (the filter branch is exercised,
# not vacuous)
MAP_MIN_N = 8


@register(
    "fn-map-suite",
    oracle=f"""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    d AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(n) AS BIGINT) AS max_val
      FROM c GROUP BY 1
    )
    SELECT strftime(c.day, '%Y-%m-%d') AS day, d.n_keys, d.max_val,
           c.event_type AS etype, c.n, 2 * c.n AS doubled
    FROM c JOIN d USING (day)
    WHERE c.n >= {MAP_MIN_N}
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface pin: per day the (event_type → count) map is
    BUILT (map_from_entries over a sorted entry array — collect_list
    order is nondeterministic, the sort makes the fold stable),
    INSPECTED (size/map_keys/map_values → key count and max value),
    TRANSFORMED (transform_values doubling), FILTERED (map_filter on
    the original count), LOOKED UP (element_at for the original count
    back), and EXPLODED to rows.  The oracle computes the same result
    relationally — so what the driver hash pins is that Spark's map
    operators implement exactly the relational semantics a user
    migrating from SQL expects.

    Scale (100 TB): maps are built at (day) grain AFTER the fact table
    collapses to the (day × type) summary in one map-side-combinable
    pass; per-map size is category cardinality, never data volume."""
    events = load_table(spark, sf_dir, "events")
    c = (
        events.where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = c.groupBy("day").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return (
        m.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.size(F.map_keys("m")).cast("long").alias("n_keys"),
            F.array_max(F.map_values("m")).alias("max_val"),
            F.col("m"),
            F.explode(
                F.map_filter(
                    F.transform_values("m", lambda _, v: v * 2),
                    lambda _, v: v >= 2 * MAP_MIN_N,
                )
            ).alias("etype", "doubled"),
        )
        .select(
            "day",
            "n_keys",
            "max_val",
            "etype",
            F.element_at("m", F.col("etype")).alias("n"),
            "doubled",
        )
    )


# ---------------------------------------------------------------------------
# fn-bit-suite — bitwise operator surface over event ids
# ---------------------------------------------------------------------------


@register(
    "fn-bit-suite",
    oracle="""
    WITH b AS (
      SELECT event_id,
             event_id & 255 AS low_byte,
             xor(event_id, COALESCE(user_id, 0)) AS id_xor_user,
             event_id << 3 AS shl3,
             event_id >> 4 AS shr4,
             bit_count(event_id) AS popcnt,
             CASE WHEN event_id & 1 = 1 THEN 1 ELSE 0 END AS bit0
      FROM events WHERE event_id >= 0
    )
    SELECT CAST(popcnt AS BIGINT) AS popcnt,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(bit0) AS BIGINT) AS n_odd,
           CAST(min(low_byte) AS BIGINT) AS min_low_byte,
           CAST(max(low_byte) AS BIGINT) AS max_low_byte,
           CAST(min(id_xor_user) AS BIGINT) AS min_xor,
           CAST(max(shl3) AS BIGINT) AS max_shl3,
           CAST(max(shr4) AS BIGINT) AS max_shr4
    FROM b GROUP BY 1
    """,
)
def fn_bit_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface pin: AND-masking, XOR, shifts, popcount,
    and bit tests over nonnegative event ids, rolled up per popcount so
    the output is bounded — the integer toolbox every hash-partitioning,
    bitmap, and bucketing operator in this engine builds on, checked
    against DuckDB's operators (Spark spells popcount ``bit_count`` and
    XOR ``^``; DuckDB spells XOR ``xor(a, b)`` — the suite pins that
    both mean the same twos-complement arithmetic).  Restricted to
    nonnegative ids: shift/popcount semantics on negatives are the one
    corner engines legitimately disagree on (and every id column in the
    fixture star is nonnegative by construction).

    Scale (100 TB): projection + one map-side-combinable keyed rollup
    at ≤64 popcount groups."""
    events = load_table(spark, sf_dir, "events")
    b = events.where(F.col("event_id") >= 0).select(
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id ^ COALESCE(user_id, 0)").alias("id_xor_user"),
        F.expr("shiftleft(event_id, 3)").alias("shl3"),
        F.expr("shiftright(event_id, 4)").alias("shr4"),
        F.expr("bit_count(event_id)").cast("long").alias("popcnt"),
        F.expr("CASE WHEN event_id & 1 = 1 THEN 1 ELSE 0 END").alias("bit0"),
    )
    return b.groupBy("popcnt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bit0").alias("n_odd"),
        F.min("low_byte").cast("long").alias("min_low_byte"),
        F.max("low_byte").cast("long").alias("max_low_byte"),
        F.min("id_xor_user").cast("long").alias("min_xor"),
        F.max("shl3").cast("long").alias("max_shl3"),
        F.max("shr4").cast("long").alias("max_shr4"),
    )


# ---------------------------------------------------------------------------
# fn-struct-suite — StructType build/access/serialize against a JSON oracle
# ---------------------------------------------------------------------------


@register(
    "fn-struct-suite",
    oracle="""
    SELECT o_orderkey AS okey,
           struct_pack(k := o_orderkey, st := o_orderstatus).k AS field_k,
           struct_pack(k := o_orderkey, st := o_orderstatus).st AS field_st,
           to_json(struct_pack(k := o_orderkey,
                               st := o_orderstatus,
                               pr := o_orderpriority,
                               tags := [o_orderstatus, o_orderpriority]))
             AS js,
           json_extract_string(
             to_json(struct_pack(k := o_orderkey, st := o_orderstatus)),
             '$.st') AS rt_st,
           CAST(json_extract(
             to_json(struct_pack(k := o_orderkey, st := o_orderstatus)),
             '$.k') AS BIGINT) AS rt_k,
           (struct_pack(a := o_orderkey, b := o_orderstatus)
            = struct_pack(a := o_orderkey, b := o_orderstatus)) AS eq_self
    FROM orders
    """,
)
def fn_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface pin: build (named_struct), field access,
    JSON serialization (to_json — including a nested string array),
    JSON round-trip extraction (get_json_object for both string and
    integer fields), and struct equality — pinned against DuckDB's
    struct_pack / to_json / json_extract twins so serialization-format
    drift (key order, string escaping, numeric rendering) is caught by
    hash.  The JSON fields stay integer/string-typed: float rendering
    is the one axis the formats genuinely disagree on, and every
    operator that serializes structs in this engine (sinks, lineage
    tags) does so over int/string fields.

    Scale: pure per-row column expressions — codegen'd, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    s2 = F.expr("named_struct('k', o_orderkey, 'st', o_orderstatus)")
    return orders.select(
        F.col("o_orderkey").alias("okey"),
        F.expr("named_struct('k', o_orderkey, 'st', o_orderstatus).k").alias(
            "field_k"
        ),
        F.expr("named_struct('k', o_orderkey, 'st', o_orderstatus).st").alias(
            "field_st"
        ),
        F.to_json(
            F.expr(
                "named_struct('k', o_orderkey, 'st', o_orderstatus,"
                " 'pr', o_orderpriority,"
                " 'tags', array(o_orderstatus, o_orderpriority))"
            )
        ).alias("js"),
        F.get_json_object(F.to_json(s2), "$.st").alias("rt_st"),
        F.get_json_object(F.to_json(s2), "$.k").cast("long").alias("rt_k"),
        F.expr(
            "named_struct('a', o_orderkey, 'b', o_orderstatus)"
            " = named_struct('a', o_orderkey, 'b', o_orderstatus)"
        ).alias("eq_self"),
    )


# ---------------------------------------------------------------------------
# fn-window-suite — the ranking / navigation window-function surface
# ---------------------------------------------------------------------------

# A fixed literal grid WITH TIES (grp 1: x = 10,10,20,30,30,30) so rank
# vs dense_rank vs percent_rank/cume_dist peer semantics are actually
# exercised, plus a second partition to pin partition isolation.  The
# SAME text runs in both engines (the canary-class pattern).
_WINDOW_SUITE_SQL = """
    WITH grid AS (
      SELECT 1 AS grp, 1 AS id, 10 AS x
      UNION ALL SELECT 1, 2, 10
      UNION ALL SELECT 1, 3, 20
      UNION ALL SELECT 1, 4, 30
      UNION ALL SELECT 1, 5, 30
      UNION ALL SELECT 1, 6, 30
      UNION ALL SELECT 2, 1, 5
      UNION ALL SELECT 2, 2, 7
      UNION ALL SELECT 2, 3, 7
      UNION ALL SELECT 2, 4, 9
    )
    SELECT grp, id, x,
           CAST(row_number() OVER (PARTITION BY grp ORDER BY x, id)
                AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY grp ORDER BY x) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY grp ORDER BY x)
                AS BIGINT) AS drnk,
           percent_rank() OVER (PARTITION BY grp ORDER BY x) AS pct_rank,
           cume_dist() OVER (PARTITION BY grp ORDER BY x) AS cume,
           CAST(ntile(3) OVER (PARTITION BY grp ORDER BY x, id)
                AS BIGINT) AS tile3,
           lag(x, 1, -1) OVER (PARTITION BY grp ORDER BY x, id) AS lag_x,
           lead(x, 1, -1) OVER (PARTITION BY grp ORDER BY x, id) AS lead_x,
           first_value(x) OVER (PARTITION BY grp ORDER BY x, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_x,
           last_value(x) OVER (PARTITION BY grp ORDER BY x, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_x,
           nth_value(x, 2) OVER (PARTITION BY grp ORDER BY x, id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS nth2_x
    FROM grid
"""


@register("fn-window-suite", oracle=_WINDOW_SUITE_SQL)
def fn_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function surface suite: row_number / rank / dense_rank /
    percent_rank / cume_dist / ntile / lag+lead with defaults /
    first_value / last_value / nth_value, evaluated over a fixed literal
    grid WITH TIES so peer-group semantics (rank gaps, dense packing,
    the (r-1)/(n-1) and cume m/n rationals) are pinned, from the SAME
    SQL text in both engines.  percent_rank/cume_dist emit exact IEEE
    rationals (small-integer divisions — identical in any engine);
    everything else is integers.  Rank-family windows order by x alone
    (ties are the point); navigation windows carry the (x, id) total
    order.  Fixture-independent, zero shuffles beyond the 10-row grid."""
    return spark.sql(_WINDOW_SUITE_SQL)


# ---------------------------------------------------------------------------
# fn-agg-suite — the filtered/ordered aggregate surface
# ---------------------------------------------------------------------------

# Literal grid: x UNIQUE within each group (max_by/min_by are
# nondeterministic under argument ties — keep them off tie inputs by
# construction), ODD group sizes (median interpolation never triggers),
# one group whose FILTER matches nothing (NULL sum leg).
_AGG_SUITE_SQL = """
    WITH grid AS (
      SELECT 1 AS grp, 1 AS id, 10 AS x, 'a' AS tag
      UNION ALL SELECT 1, 2, 30, 'b'
      UNION ALL SELECT 1, 3, 20, 'a'
      UNION ALL SELECT 1, 4, 5, 'b'
      UNION ALL SELECT 1, 5, 40, 'a'
      UNION ALL SELECT 2, 6, 7, 'c'
      UNION ALL SELECT 2, 7, 9, 'c'
      UNION ALL SELECT 2, 8, 3, 'd'
    )
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE x >= 10) AS BIGINT) AS n_big,
           CAST(count(DISTINCT tag) AS BIGINT) AS n_tags,
           bool_and(x > 2) AS all_gt2,
           bool_or(x > 25) AS any_gt25,
           CAST(max_by(id, x) AS BIGINT) AS id_of_max_x,
           CAST(min_by(id, x) AS BIGINT) AS id_of_min_x,
           CAST(median(x) AS DOUBLE) AS med_x,
           CAST(sum(x) FILTER (WHERE tag = 'a') AS BIGINT) AS sum_tag_a,
           CAST(avg(x) FILTER (WHERE x >= 10) AS DOUBLE) AS avg_big
    FROM grid GROUP BY 1
"""


@register("fn-agg-suite", oracle=_AGG_SUITE_SQL)
def fn_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function surface suite: FILTER-clause aggregates,
    bool_and/bool_or, max_by/min_by (argument-ordered selection),
    count(DISTINCT), exact-position median, and a NULL-producing
    filtered sum — from the SAME SQL text in both engines over a fixed
    literal grid.  Grid discipline: unique x per group (max_by under
    ties is engine-arbitrary), odd group sizes (median never
    interpolates), avg legs restricted to exact small-integer rationals.
    Fixture-independent; zero shuffles beyond the 8-row grid."""
    return spark.sql(_AGG_SUITE_SQL)
