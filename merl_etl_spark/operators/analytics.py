"""Analytical breadth beyond the reference surface: multi-way star joins,
grouped pricing summaries, pivot, rollup/cube grouping sets, outer/anti
joins, and exact percentiles — the capabilities a user migrating real
workloads onto this engine expects, all with DuckDB oracles.

These double as the engine's TPC-H-style showcase on the fixture star
schema (SURVEY.md §2.H/§2.E 'absent' rows become present here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from merl_etl_spark.operators.aggregates import (
    dec_sum,
    net_revenue_duck,
    net_revenue_spark,
)
from merl_etl_spark.registry import register
from merl_etl_spark.sources.tables import load_table

DEC = "decimal(18,6)"
DEC_SUM = "decimal(38,6)"


@register(
    "analytics-pricing-summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,2)) AS DOUBLE)
             AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,2)) AS DOUBLE)
             AS sum_base_price,
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,12))),
                2) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def analytics_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: multi-aggregate groupBy with exact
    decimal sums and a derived average (double division of exact sums —
    deterministic).  Two-phase HashAggregate; shuffle carries 6 aggregates
    per (flag, status) per partition.

    Output boundary: sum_qty/sum_base_price are 2dp-exact, so the
    DECIMAL(38,2) reduction drops only zeros (DuckDB's truncating cast and
    Spark's HALF_UP cast agree on exact reductions).  sum_disc_price is
    4dp-exact but reducing it to scale 4 leaves only a ~4× margin under
    2^53 at SF1 (unscaled ≈2.2e15) and silently breaks the decimal→double
    bit-equality at SF≥5 (ADVICE r2) — so it is ROUNDed to 2dp instead
    (explicit ROUND, not CAST: DuckDB CAST truncates scale reduction while
    both engines' ROUND are half-away-from-zero for positive sums), which
    keeps the unscaled value < 2^53 up to SF≈300."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    disc_price = (
        F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    ).cast("decimal(38,12)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity")).cast("decimal(38,2)").cast("double").alias("sum_qty"),
        dec_sum(F.col("l_extendedprice"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
        F.count("*").alias("count_order"),
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast(DEC_SUM).cast("double")
            / F.count("*")
        ).alias("avg_qty"),
    )


@register(
    "analytics-shipping-priority",
    oracle="""
    WITH ranked AS (
      SELECT o.o_orderkey,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,6))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,12)))
                  AS DECIMAL(38,12)) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      GROUP BY o.o_orderkey, o.o_orderdate
      ORDER BY revenue DESC, o.o_orderkey ASC
      LIMIT 10
    )
    SELECT o_orderkey,
           CAST(CAST(revenue AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           order_date
    FROM ranked
    """,
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: 3-way star join with selective
    dimension filters, revenue aggregation, deterministic top-10.  The
    customer filter broadcasts; lineitem only shuffles for the final
    aggregation key."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    rev = (
        F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    ).cast("decimal(38,12)")
    # order/limit on the exact decimal; terminal select reduces to the true
    # content scale (4dp — exact) then casts once to double for the output
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("decimal(38,12)").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.col("revenue").cast("decimal(38,4)").cast("double").alias("revenue"),
            "order_date",
        )
    )


@register(
    "analytics-regional-volume",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,2)) AS DOUBLE)
             AS volume,
           count(*) AS n_orders
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
)
def analytics_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style regional volume: 4-way snowflake join.  The region →
    nation → customer dimension chain collapses into broadcasts; only
    orders (the fact) streams."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # nation/region broadcast (tiny); customer⋈orders is left to Catalyst —
    # customer is itself fact-sized at scale, so force-broadcasting the
    # whole dimension chain would hit the broadcast cap where a shuffle
    # join works fine
    dims = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    return (
        o.join(dims, o["o_custkey"] == dims["c_custkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            dec_sum(F.col("o_totalprice")).cast("decimal(38,2)").cast("double").alias("volume"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "agg-pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS click,
           CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS view,
           CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS purchase,
           CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN value ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS signup,
           CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) AS error
    FROM events
    GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event types to columns — the generalized form of the
    reference's conditional in/out sums (§2.E agg-conditional-flow is a
    2-column pivot).  Explicit value list keeps the plan single-pass."""
    events = load_table(spark, sf_dir, "events")
    piv = (
        events.withColumn("v", F.col("value").cast(DEC))
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .sum("v")
    )
    return piv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast(DEC_SUM).cast("double").alias(t)
            for t in ["click", "view", "purchase", "signup", "error"]
        ],
    )


@register(
    "agg-rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping sets (ROLLUP): per-(flag,status), per-flag,
    and grand-total rows in one pass — subtotal semantics the reference
    computed with separate scalar queries (§2.E agg-scalar-rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity")).cast("double").alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "agg-cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-set cube over two dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dec_sum(F.col("l_quantity")).cast("double").alias("sum_qty")
    )


@register(
    "join-outer-anti",
    oracle="""
    SELECT 'outer_null' AS op, count(*) AS n
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'anti' AS op, count(*) AS n
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_outer_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer and anti join parity: customers with no orders counted both
    ways (left-outer null-probe vs left-anti) — must agree."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    outer_null = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .filter(F.col("o_orderkey").isNull())
        .agg(F.count("*").alias("n"))
        .select(F.lit("outer_null").alias("op"), "n")
    )
    anti = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("anti").alias("op"), "n")
    )
    return outer_null.unionAll(anti)


@register(
    "agg-approx-sketches",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n,
           (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
              <= 0.10 * count(DISTINCT user_id)) AS hll_ok,
           (approx_quantile(value, 0.5)
              BETWEEN quantile_cont(value, 0.40) AND quantile_cont(value, 0.60)) AS q50_ok,
           (approx_quantile(value, 0.95)
              BETWEEN quantile_cont(value, 0.88) AND quantile_cont(value, 1.0)) AS q95_ok,
           (approx_quantile(value, 0.99)
              BETWEEN quantile_cont(value, 0.93) AND quantile_cont(value, 1.0)) AS q99_ok
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches: HyperLogLog distinct counts and approximate
    percentiles per event type — the constant-memory path for 100 TB
    cardinality/quantile estimation.

    Sketch ESTIMATES differ across engines (HLL vs HLL++ registers,
    t-digest vs GK percentiles), so the raw estimates can never hash-match
    an oracle.  What CAN (VERDICT r5 "Next round" #3): each engine runs its
    own sketch AND the exact aggregate, then emits the exact values plus
    booleans asserting the sketch landed inside its error contract.
    Every emitted column is engine-agnostic — the driver hash now pins
    both the exact math and the sketch quality gate, replacing the old
    rows-only check.

    Gate widths are chosen so a correct sketch CANNOT flake the hash on a
    new fixture (review r6 finding): the HLL gate is 10% of exact — 5σ
    for Spark's rsd=0.02 HLL++ and ≥6σ for DuckDB's default-precision
    HLL — and the quantile bands are ±10 rank-points with max() as the
    upper tail bound (Spark's GK sketch guarantees rank error ≤ n/1000;
    DuckDB's t-digest has no hard bound but its tail error is far inside
    ten points).  The bands still certify real sketch sanity — a broken
    sketch is off by far more than ten rank-points."""
    events = load_table(spark, sf_dir, "events")
    # ONE sketch and ONE exact-quantile aggregate, each taking the full
    # percentile ARRAY: a scalar call per bound would buffer + sort the
    # group's value set once per percentile (6× the memory and work — a
    # 7 s bench outlier at sf0.1; 1.3 s this way)
    agged = events.groupBy("event_type").agg(
        F.expr("count(DISTINCT user_id)").alias("exact_users"),
        F.count("*").alias("n"),
        F.expr("approx_count_distinct(user_id, 0.02)").alias("__hll"),
        # accuracy 1000 → rank error ≤ n/1000, two orders of magnitude
        # inside the ±10-percentile-point check bands; 10000 cost ~1 s
        # more at sf0.1 for precision the contract never uses
        F.expr("approx_percentile(value, array(0.5, 0.95, 0.99), 1000)").alias("__ap"),
        F.expr(
            "percentile(value, array(0.40, 0.60, 0.88, 0.93, 1.0))"
        ).alias("__ep"),
    )
    q_ok = lambda est, lo, hi: F.expr(  # noqa: E731
        f"element_at(__ap, {est}) BETWEEN element_at(__ep, {lo})"
        f" AND element_at(__ep, {hi})"
    )
    return agged.select(
        "event_type",
        "exact_users",
        "n",
        (F.abs(F.col("__hll") - F.col("exact_users")) <= 0.10 * F.col("exact_users")).alias(
            "hll_ok"
        ),
        q_ok(1, 1, 2).alias("q50_ok"),
        q_ok(2, 3, 5).alias("q95_ok"),
        q_ok(3, 4, 5).alias("q99_ok"),
    )


_HLL_OK = (
    "abs(CAST({est} AS DOUBLE) - CAST({exact} AS DOUBLE))"
    " <= 0.10 * CAST({exact} AS DOUBLE)"
)


@register(
    "agg-hll-merge",
    oracle=f"""
    WITH per AS (
      SELECT event_type AS scope,
             count(*) AS n_rows,
             count(DISTINCT user_id) AS exact_users,
             approx_count_distinct(user_id) AS est
      FROM events GROUP BY event_type
    ),
    total AS (
      SELECT 'ALL' AS scope,
             count(*) AS n_rows,
             count(DISTINCT user_id) AS exact_users,
             approx_count_distinct(user_id) AS est
      FROM events
    )
    SELECT scope, n_rows, exact_users,
           ({_HLL_OK.format(est='est', exact='exact_users')}) AS hll_ok
    FROM per
    UNION ALL
    SELECT scope, n_rows, exact_users,
           ({_HLL_OK.format(est='est', exact='exact_users')}) AS hll_ok
    FROM total
    """,
)
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: build ONE Apache DataSketches HLL sketch
    per event type (``hll_sketch_agg``), then derive the global distinct
    estimate by MERGING the per-type sketches (``hll_union_agg``) —
    never re-scanning raw data for the rollup.  This is the property
    that makes sketches the 100 TB cardinality answer: per-partition /
    per-day sketch partials are unioned at any rollup granularity
    (union is exact over HLL registers, estimate error stays the
    sketch's own bound), so a year's distinct-users needs 365 sketch
    blobs, not a year of raw events.

    As with agg-approx-sketches, sketch ESTIMATES can't hash-match
    across engines, so each engine emits its exact values plus a 10%%
    error-contract boolean (≥5σ for both engines' default precisions:
    Spark lgConfigK=12 → rsd≈1.6%%; DuckDB's HLL similar).  The global
    exact ground-truth column requires its own distinct pass (users
    overlap types — exact global distinct is non-decomposable; that
    non-decomposability is exactly why the merged sketch exists).  The
    driver hash pins per-scope exact math AND both merge-path sanity
    booleans."""
    events = load_table(spark, sf_dir, "events")
    per = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    )
    per_rows = per.select(
        F.col("event_type").alias("scope"),
        "n_rows",
        "exact_users",
        F.expr(
            _HLL_OK.format(est="hll_sketch_estimate(sk)", exact="exact_users")
        ).alias("hll_ok"),
    )
    merged = per.agg(
        F.sum("n_rows").alias("n_rows"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    glob = F.broadcast(
        events.agg(F.countDistinct("user_id").alias("exact_users"))
    )
    total_row = merged.crossJoin(glob).select(
        F.lit("ALL").alias("scope"),
        "n_rows",
        "exact_users",
        F.expr(_HLL_OK.format(est="est", exact="exact_users")).alias("hll_ok"),
    )
    return per_rows.unionByName(total_row)


# ---------------------------------------------------------------------------
# analytics-basket-affinity — market-basket pair mining with exact lift
# ---------------------------------------------------------------------------

BASKET_TOP = 20  # emitted rules: top pairs by support, pair-id tie-break


@register(
    "analytics-basket-affinity",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    pairs AS (
      SELECT a.p_brand AS id_a, b.p_brand AS id_b, count(*) AS pair_ct
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    ),
    singles AS (SELECT p_brand, count(*) AS ct FROM basket GROUP BY 1),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM basket)
    SELECT pr.id_a, pr.id_b, pr.pair_ct,
           sa.ct AS ct_a, sb.ct AS ct_b, t.n_baskets,
           (100 * pr.pair_ct) // sa.ct AS conf_a2b_pct,
           (1000000 * pr.pair_ct * t.n_baskets) // (sa.ct * sb.ct) AS lift_ppm
    FROM pairs pr
    JOIN singles sa ON sa.p_brand = pr.id_a
    JOIN singles sb ON sb.p_brand = pr.id_b
    CROSS JOIN tot t
    ORDER BY pr.pair_ct DESC, pr.id_a, pr.id_b LIMIT {BASKET_TOP}
    """,
)
def analytics_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over order baskets at brand granularity:
    support (co-occurrence count), confidence (support/antecedent) and
    lift (support × baskets / (ct_a × ct_b)) for the top-{BASKET_TOP}
    brand pairs — the classic affinity-analysis primitives.

    The pair expansion rides ``capped_bucket_pairs`` with orders as
    buckets: basket width is bounded by order size (≤17 distinct brands
    at any fixture SF, and bounded by assortment breadth in general), so
    the expansion is O(rows × basket-width), never quadratic in a hot
    key.  Confidence and lift are emitted as integer floor divisions
    (percent / parts-per-million) over exact BIGINT counts — arbitrary
    double quotients round differently across engines at the last ulp
    (the PageRank lesson, graph.py), integer ratios never do.  The raw
    counts ship alongside so a consumer can recompute float precision
    downstream."""
    from merl_etl_spark.operators.dedup import capped_bucket_pairs

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    basket = (
        lineitem.join(part, part["p_partkey"] == lineitem["l_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    pairs = capped_bucket_pairs(basket, ["l_orderkey"], "p_brand")
    support = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("pair_ct"))
    singles = basket.groupBy("p_brand").agg(F.count(F.lit(1)).alias("ct"))
    tot = F.broadcast(
        basket.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    )
    sa = singles.select(F.col("p_brand").alias("id_a"), F.col("ct").alias("ct_a"))
    sb = singles.select(F.col("p_brand").alias("id_b"), F.col("ct").alias("ct_b"))
    return (
        support.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .crossJoin(tot)
        .select(
            "id_a",
            "id_b",
            "pair_ct",
            "ct_a",
            "ct_b",
            "n_baskets",
            F.expr("(100 * pair_ct) div ct_a").alias("conf_a2b_pct"),
            F.expr(
                "(1000000 * pair_ct * n_baskets) div (ct_a * ct_b)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("pair_ct"), F.asc("id_a"), F.asc("id_b"))
        .limit(BASKET_TOP)
    )


# ---------------------------------------------------------------------------
# Deep multi-table analytics: Q8/Q17/Q13-style plan shapes
# ---------------------------------------------------------------------------

MKT_NATION = 3  # supplier nation of interest (by stable key, not name)


@register(
    "analytics-market-share",
    oracle=f"""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,6))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,6)))
                  AS DECIMAL(38,12)) AS volume,
             s.s_nationkey
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_revenue,
           CAST(ROUND(SUM(CASE WHEN s_nationkey = {MKT_NATION}
                               THEN volume ELSE CAST(0 AS DECIMAL(38,12)) END), 2)
                AS DOUBLE) AS nation_revenue,
           CAST(ROUND(SUM(CASE WHEN s_nationkey = {MKT_NATION}
                               THEN volume ELSE CAST(0 AS DECIMAL(38,12)) END), 2)
                AS DOUBLE)
             / NULLIF(CAST(ROUND(SUM(volume), 2) AS DOUBLE), 0) AS mkt_share
    FROM base
    GROUP BY o_year
    """,
)
def analytics_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: the 8-relation snowflake join
    (lineitem → orders → customer → nation → region, plus part and
    supplier dims) with a conditional revenue share per order year — the
    deepest join tree in the registry and the canonical Catalyst
    join-planning showcase.

    Scale shape: the star dims (region 5, nation 25, part/supplier
    sub-percent of fact) broadcast; lineitem→orders is the only
    fact-fact shuffle, keyed on orderkey, and AQE reorders/broadcasts
    by runtime sizes.  The region and part predicates reach the dim
    scans (pushed filters shrink the broadcast sides before the join),
    so the fact table is filtered by broadcast-hash lookups, never
    materializing the unfiltered join.  Determinism: volume is an exact
    DECIMAL(38,12) product; the share divides the two exact decimal
    sums only after casting each to double (deterministic), and revenue
    outputs are ROUNDed to 2 dp (both engines half-away-from-zero for
    positive sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")

    volume = (
        F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    ).cast("decimal(38,12)")
    base = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "s_nationkey",
        )
    )
    nat_vol = F.when(F.col("s_nationkey") == MKT_NATION, F.col("volume")).otherwise(
        F.lit(0).cast("decimal(38,12)")
    )
    # the share divides the ROUNDED sums: the raw DECIMAL(38,12) sums carry
    # unscaled values beyond 2^53, where decimal→double conversion is
    # engine-specific (the ts-linear-trend trap, ARCHITECTURE.md); after
    # ROUND(·, 2) the unscaled value fits a double exactly on both engines.
    # A total that rounds to 0.00 yields NULL on both engines (NULLIF
    # guard, same stance as ts-linear-trend) instead of Spark-NULL vs
    # DuckDB-inf divergence — unreachable on TPC-H volumes, guarded anyway.
    total_dbl = F.round(F.sum("volume"), 2).cast("double")
    nation_dbl = F.round(F.sum(nat_vol), 2).cast("double")
    return base.groupBy("o_year").agg(
        total_dbl.alias("total_revenue"),
        nation_dbl.alias("nation_revenue"),
        F.when(total_dbl != 0, nation_dbl / total_dbl).alias("mkt_share"),
    )


@register(
    "analytics-small-qty-revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(7 AS DOUBLE) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem l
    JOIN pq ON pq.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pq.cnt < pq.sum_qty
    GROUP BY p.p_brand
    """,
)
def analytics_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: rows whose quantity is
    below 20% of their part's average quantity — the classic CORRELATED
    scalar subquery, decorrelated into a per-part aggregate + equi-join
    (what Catalyst's decorrelation produces; written explicitly so the
    plan is pinned rather than optimizer-version-dependent).

    Determinism: the 0.2×avg threshold never divides — the predicate is
    cross-multiplied (``5·qty·cnt < sum_qty``) over exact decimals, so
    there is no float-average tie hazard at the cut; the revenue /7.0
    division happens once on the exact decimal sum.  Scale shape: the
    per-part aggregate is a partial-agg shuffle keyed like the join that
    consumes it (l_partkey), so AQE can plan the probe side without a
    second repartition; part is a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    part = load_table(spark, sf_dir, "part")
    small = (
        li.join(pq, "l_partkey")
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
    )
    return small.groupBy("p_brand").agg(
        # divide exact-decimal sums only after the double cast: decimal
        # division would round differently per engine (DuckDB falls back
        # to DOUBLE on decimal/decimal), while double/double is IEEE-
        # identical everywhere
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_small"),
    )


@register(
    "analytics-customer-distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                         AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY c_count
    """,
)
def analytics_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    with a join-condition filter (not a WHERE — customers with no
    qualifying orders must survive with count 0), then a double
    aggregation (orders per customer → customers per order-count).

    The join-side predicate is the part users get wrong when migrating:
    a WHERE on the right table's column silently turns the outer join
    inner.  Scale shape: count(o_orderkey) ignores the NULLs an outer
    miss produces (never count(*)); both aggregations are partial-agg
    shuffles, the second over a tiny (distinct counts) domain."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    co = (
        customer.join(
            orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "analytics-disjunctive-filter",
    oracle="""
    SELECT p.p_brand,
           CAST(ROUND(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,12))), 2)
             AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 5 AND 30
           AND l.l_quantity BETWEEN 5 AND 40)
       OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 10 AND 40
           AND l.l_discount >= 0.06)
    GROUP BY p.p_brand
    """,
)
def analytics_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate: revenue over an OR of three
    brand/size/quantity conjunction arms — the predicate shape that
    separates engines with real predicate simplification from those that
    evaluate the whole disjunction post-join.  Catalyst extracts the
    common sub-predicates per side: the part-only arm disjunction
    ((brand ∧ size) ∨ (brand ∧ size) ∨ (type ∧ size)) pushes into the
    part scan, and the lineitem-only residue stays on the fact side, so
    both scans shrink BEFORE the join and only joined survivors evaluate
    the full OR.  Revenue is the exact DECIMAL(38,12) product family,
    rounded to 2 dp at the boundary (the >2^53 rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    volume = (
        F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    ).cast("decimal(38,12)")
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(5, 30)
        & F.col("l_quantity").between(5, 40)
    )
    arm3 = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(10, 40)
        & (F.col("l_discount") >= 0.06)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm1 | arm2 | arm3)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(volume), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# analytics-markov-transitions — first-order event-type transition matrix
# ---------------------------------------------------------------------------

@register(
    "analytics-markov-transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS prev_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p,
           row_number() OVER (PARTITION BY prev_type ORDER BY n DESC, next_type) AS rnk
    FROM t
    """,
)
def analytics_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current event type), plus the per-row transition
    rank — the session-flow model behind funnel discovery and next-step
    prediction (the reference's report pipelines stop at per-type counts;
    this is the natural next analytic).

    Determinism: transition probabilities are a single IEEE division of
    two exact BIGINT counts; the rank carries a (n DESC, next_type) total
    order.  Scale (100 TB): lead() is a per-user window (bounded series),
    the transition count is a keyed agg with map-side partials, and the
    matrix itself is |types|^2 rows — tiny — so the final window over it
    is trivially cheap.  One shuffle for the window, one for the agg.
    """
    events = load_table(spark, sf_dir, "events")
    seq = events.select(
        "event_type",
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("next_type"),
    )
    t = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    wr = Window.partitionBy("prev_type").orderBy(F.col("n").desc(), "next_type")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp).cast("double")).alias("p"),
        F.row_number().over(wr).cast("long").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# analytics-rfm-segmentation — recency/frequency/monetary quartiles
# ---------------------------------------------------------------------------

# range-bucket fan-out for the scalable exact-ntile: 15 in-engine
# percentile_approx cutpoints → ≤16 parallel rank partitions per metric
RFM_RANGE_BUCKETS = 16


def _exact_ntile_scalable(
    rfm: DataFrame, metric: str, k: int, key: str = "custkey"
) -> DataFrame:
    """EXACT ntile(k) OVER (ORDER BY metric DESC, key) without a
    global single-partition sort (VERDICT r9 #6; k generalized from the
    hardcoded 4 in round 11 wave 7 — ntile's positional formula below
    holds for any k): range-bucket rows by in-engine percentile_approx
    cutpoints (value-determined, so tied metric values always share a
    bucket), row_number WITHIN each bucket (partitioned window), add
    broadcast per-bucket offsets (bounded ≤RFM_RANGE_BUCKETS-row carry
    — the curate-shuffle-index pattern), then apply ntile's positional
    formula to the reconstructed global rank.  Output is bit-identical
    to the ntile window at any parallelism; pinned at k=4 by
    tests/test_round9_ops.py and at k=10 by tests/test_round11_wave7.py.

    The cutpoints only balance partitions — their ACCURACY never affects
    correctness (a skewed cutpoint just means an uneven bucket), which is
    why approx quantiles are safe in an exact operator.

    INVARIANT (ADVICE r10 medium): the ``ranked`` and ``counts`` branches
    below MUST bucket by the SAME cutpoint values.  percentile_approx is
    not guaranteed deterministic across re-executions (GK-summary merge
    order follows shuffle fetch order), so the cutpoints are computed
    ONCE, collected to the driver (≤RFM_RANGE_BUCKETS-1 scalars), and
    inlined as a literal array — single-valued by construction rather
    than by relying on ReuseExchange deduplicating two identical
    subplans.  Bucketing compares in DOUBLE: collapsing distinct metric
    values to one double only merges buckets (never splits a tie), which
    is correctness-neutral here."""
    # one driver-side evaluation of the cutpoints; rfm is lineage-cut by
    # the caller so this does not re-run the upstream rollup per metric
    probs = [i / RFM_RANGE_BUCKETS for i in range(1, RFM_RANGE_BUCKETS)]
    row = rfm.agg(
        F.percentile_approx(
            F.col(metric).cast("double"), F.array(*[F.lit(p) for p in probs]), 1000
        ).alias("cuts")
    ).collect()[0]
    cut_vals = sorted({float(c) for c in (row["cuts"] or []) if c is not None})
    # DESC ordering: rb = #cutpoints strictly above the value — monotone
    # non-increasing in the sort order, equal values share a bucket
    if cut_vals:
        cuts_arr = F.array(*[F.lit(c) for c in cut_vals])
        rb = F.size(F.filter(cuts_arr, lambda c: c > F.col(metric).cast("double")))
    else:  # empty input: single bucket
        rb = F.lit(0)
    j = rfm.withColumn("rb", rb)
    w_local = Window.partitionBy("rb").orderBy(F.desc(metric), F.asc(key))
    ranked = j.withColumn("lrn", F.row_number().over(w_local))
    counts = j.groupBy("rb").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("rb").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("rb").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "rb",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    g = ranked.join(F.broadcast(offs), "rb").withColumn(
        "grank", F.col("off") + F.col("lrn")
    )
    # ntile(k) positional formula: q = n div k rows per bucket plus one
    # extra row in each of the first r = n mod k buckets
    q, r, rk = F.col("n") / F.lit(k), F.col("n") % k, F.col("grank")
    q = F.floor(q)
    score = F.when(
        rk <= r * (q + 1), F.ceil(rk / (q + 1))
    ).otherwise(r + F.ceil((rk - r * (q + 1)) / q))
    return g.select(key, score.cast("bigint").alias(f"ntile_{metric}"))


@register(
    "analytics-rfm-segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             SUM(o_totalprice) AS monetary_dec
      FROM orders GROUP BY 1
    ),
    scored AS (
      -- every ntile orders by the PRE-CAST exact decimal (ADVICE r9 #3:
      -- ordering the oracle by the double-cast alias while Spark orders
      -- by the exact decimal is a latent >2^53 divergence); the EMITTED
      -- monetary goes through VARCHAR for the same reason — DuckDB's
      -- direct decimal→double cast double-rounds past 2^53 unscaled
      SELECT custkey, last_order, frequency,
             CAST(CAST(monetary_dec AS VARCHAR) AS DOUBLE) AS monetary,
             ntile(4) OVER (ORDER BY last_order DESC, custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary_dec DESC, custkey) AS m_score
      FROM rfm
    )
    SELECT custkey,
           strftime(last_order, '%Y-%m-%d') AS last_order,
           frequency, monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """,
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (last order
    date), frequency (order count), monetary (exact decimal spend),
    each quartile-scored with EXACT ntile(4) semantics under a FULLY
    deterministic order (metric DESC, custkey) so ties — abundant in
    frequency — break identically in both engines, then concatenated
    into the classic 3-digit segment label ('111' = best across all
    three).

    Scale (100 TB): the per-customer rollup is one keyed map-side-
    combinable shuffle.  The quartile scores are computed WITHOUT any
    global single-partition sort (the r9 verdict's one remaining
    scale-killer default): each metric range-buckets by in-engine
    percentile_approx cutpoints, ranks within buckets in parallel, and
    reconstructs the exact global ntile from broadcast bucket offsets —
    see _exact_ntile_scalable.  The only unpartitioned windows left
    are the ≤RFM_RANGE_BUCKETS-row offset carries (bounded by
    construction, allowlisted in test_plan_properties).  recency ranks
    on a seconds-since-epoch ordinal computed with pure TIMESTAMP_NTZ
    timestampdiff (order-identical to the timestamp, numeric for
    percentile_approx, no timezone conversion)."""
    orders = load_table(spark, sf_dir, "orders")
    from merl_etl_spark.lineage import cut_lineage

    # four consumers (base projection + three ntile pipelines) — cut the
    # lineage so the orders scan+rollup runs once
    rfm = cut_lineage(
        orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary_dec"),
        ).withColumn(
            # order-preserving numeric ordinal for the recency metric —
            # pure TIMESTAMP_NTZ arithmetic, no timezone conversion
            "recency_ord",
            F.expr(
                "timestampdiff(SECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', last_order)"
            ),
        ),
        eager=False,
    )
    r = _exact_ntile_scalable(rfm, "recency_ord", 4)
    f = _exact_ntile_scalable(rfm, "frequency", 4)
    m = _exact_ntile_scalable(rfm, "monetary_dec", 4)
    scored = (
        rfm.select(
            "custkey",
            F.date_format("last_order", "yyyy-MM-dd").alias("last_order"),
            "frequency",
            F.col("monetary_dec").cast("double").alias("monetary"),
        )
        .join(r.withColumnRenamed("ntile_recency_ord", "r_score"), "custkey")
        .join(f.withColumnRenamed("ntile_frequency", "f_score"), "custkey")
        .join(m.withColumnRenamed("ntile_monetary_dec", "m_score"), "custkey")
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


# ---------------------------------------------------------------------------
# analytics-path-mining — top event-type paths of length 3
# ---------------------------------------------------------------------------

PATH_TOP = 20


@register(
    "analytics-path-mining",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    p AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS t FROM p)
    SELECT path, n,
           CAST(n AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE) AS share,
           row_number() OVER (ORDER BY n DESC, path) AS rnk
    FROM p
    ORDER BY n DESC, path LIMIT {PATH_TOP}
    """,
)
def analytics_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top PATH_TOP event-type paths of length 3 across all user
    streams — the n-step extension of the markov transition matrix
    (1-step), the shape behind "what do users actually do" journey
    reports and funnel discovery.

    Determinism: path counts are exact integers; share is one IEEE
    division of two exact BIGINTs; the rank carries a total order
    (n DESC, path).  Null-ts / null-type rows are filtered on BOTH
    sides — Spark windows order NULLS FIRST where DuckDB defaults to
    NULLS LAST, and concat_ws skips a NULL leg where SQL '||'
    propagates it (review r9w2 finding; the sharded-EWMA null-ts trap).
    Scale (100 TB): the double-lead is ONE per-user window pass (both
    leads share the sort; the path frame is lineage-cut because two
    consumers — the total and the rank — would otherwise re-run the
    scan+window), the path count is a keyed agg with map-side partials
    bounded by |types|^3 distinct keys (125 here), and the final rank
    window runs over that bounded matrix — allowlisted as such in the
    plan-property gate."""
    from merl_etl_spark.lineage import cut_lineage

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    p = (
        seq.where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = cut_lineage(p, eager=False)
    tot = p.agg(F.sum("n").alias("t"))
    wr = Window.orderBy(F.col("n").desc(), "path")
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            (F.col("n").cast("double") / F.col("t").cast("double")).alias("share"),
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOP)
    )


# ---------------------------------------------------------------------------
# analytics-attribution-lasttouch — conversion attribution via carry-forward
# ---------------------------------------------------------------------------

ATTR_TOUCH_TYPES = ("click", "view")
ATTR_CONVERSION = "purchase"
ATTR_WINDOW_S = 7 * 24 * 3600  # attribution lookback


@register(
    "analytics-attribution-lasttouch",
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type IN {ATTR_TOUCH_TYPES}
                             THEN event_id END IGNORE NULLS)
               OVER w AS touch_id,
             last_value(CASE WHEN event_type IN {ATTR_TOUCH_TYPES}
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN event_type IN {ATTR_TOUCH_TYPES}
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER w AS touch_us
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN epoch_us(ts) - touch_us <= {ATTR_WINDOW_S * 1_000_000}
                THEN touch_id END AS attributed_id,
           CASE WHEN epoch_us(ts) - touch_us <= {ATTR_WINDOW_S * 1_000_000}
                THEN touch_type END AS attributed_type,
           CASE WHEN epoch_us(ts) - touch_us <= {ATTR_WINDOW_S * 1_000_000}
                THEN (epoch_us(ts) - touch_us) // 1000000 END AS gap_s
    FROM s WHERE event_type = '{ATTR_CONVERSION}'
    """,
)
def analytics_attribution_lasttouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is attributed to
    the user's most recent preceding click/view within a 7-day lookback
    (or NULL if none) — the marketing-analytics join the reference's
    per-type counters cannot express.

    Spark-first shape: ONE per-user window pass carries the last touch
    forward (last(..., ignorenulls) over ROWS UNBOUNDED PRECEDING..1
    PRECEDING — the purchase row itself is excluded by the frame, not
    by a self-join), then the purchase filter and lookback test are
    maps.  No self-join, no as-of join machinery: the carry-forward
    frame IS the as-of here because both sides live in the same stream.

    Determinism: the (ts, event_id) total order pins which touch is
    "last" under timestamp ties; the gap is exact integer microseconds
    floored once to whole seconds.  Scale (100 TB): one keyed window
    (user-partitioned — millions of partitions, no skew cliff), then
    narrow maps; output is conversion-cardinality."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*ATTR_TOUCH_TYPES)
    us = F.unix_micros("ts")
    s = events.select(
        "event_id", "user_id", "ts", "event_type",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w).alias("touch_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w).alias("touch_type"),
        F.last(F.when(is_touch, us), ignorenulls=True).over(w).alias("touch_us"),
    )
    in_window = (us - F.col("touch_us")) <= ATTR_WINDOW_S * 1_000_000
    return s.filter(F.col("event_type") == ATTR_CONVERSION).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(in_window, F.col("touch_id")).alias("attributed_id"),
        F.when(in_window, F.col("touch_type")).alias("attributed_type"),
        F.when(in_window, F.expr(f"(unix_micros(ts) - touch_us) DIV 1000000"))
        .alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# analytics-decayed-engagement — recency-weighted per-user activity score
# ---------------------------------------------------------------------------

# exponential-decay half-life in days: an event 7 days older counts half
DECAY_HALFLIFE_D = 7


@register(
    "analytics-decayed-engagement",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    ud AS (
      SELECT user_id, day, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2
    ),
    head AS (SELECT max(day) AS maxd FROM e),
    w AS (
      -- ONE libm pow per DISTINCT day (|days| rows), frozen once at
      -- 6 dp as decimal — the dsir/psi single-round contract; pow is
      -- the r10-green canary class
      SELECT d.day,
             CAST(round(pow(CAST(0.5 AS DOUBLE),
                            CAST(date_diff('day', d.day, head.maxd) AS DOUBLE)
                            / CAST({DECAY_HALFLIFE_D} AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS wday
      FROM (SELECT DISTINCT day FROM e) d, head
    )
    SELECT ud.user_id,
           CAST(SUM(ud.n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS active_days,
           strftime(max(ud.day), '%Y-%m-%d') AS last_day,
           CAST(CAST(SUM(ud.n * w.wday) AS DECIMAL(38,6)) AS DOUBLE)
             AS engagement
    FROM ud JOIN w USING (day)
    GROUP BY 1
    """,
)
def analytics_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score per user: each event
    contributes 0.5^(age_days / half-life) relative to the stream head
    — the standard feature-store 'decayed activity' signal that makes a
    burst last week outrank the same burst last year, alongside the raw
    count and span.

    Determinism — the frozen-decimal pattern on a NEW axis: the ONLY
    libm call (pow, an r10-green canary class) runs once per DISTINCT
    DAY on the bounded |days|-row summary, is rounded ONCE at 6 dp and
    frozen as DECIMAL(18,6); the per-user score is then an exact
    integer-weighted decimal sum (order-independent at any DOP), DOUBLE
    only at the output boundary.  Day ages are integer date diffs.

    Scale (100 TB): one (user, day) keyed aggregate (map-side partials)
    over one scan, the |days|-row weight table broadcast back, one
    user-keyed rollup — no window, no per-event transcendental, no
    state beyond the two keyed aggregates."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", F.to_date("ts").alias("day"))
    ud = e.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("n"))
    head = e.agg(F.max("day").alias("maxd"))
    days = e.select("day").distinct().crossJoin(F.broadcast(head))
    w = days.select(
        "day",
        F.round(
            F.pow(
                F.lit(0.5),
                F.datediff(F.col("maxd"), F.col("day")).cast("double")
                / F.lit(float(DECAY_HALFLIFE_D)),
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("wday"),
    )
    return (
        ud.join(F.broadcast(w), "day")
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("active_days"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
            F.sum(F.col("n") * F.col("wday"))
            .cast("decimal(38,6)")
            .cast("double")
            .alias("engagement"),
        )
    )


# ---------------------------------------------------------------------------
# analytics-new-returning — daily acquisition split of the active base
# ---------------------------------------------------------------------------


@register(
    "analytics-new-returning",
    oracle="""
    WITH e AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    first AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1)
    SELECT strftime(e.day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN e.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN e.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning,
           CAST(SUM(CASE WHEN e.day = f.first_day THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS new_share
    FROM e JOIN first f USING (user_id)
    GROUP BY e.day
    """,
)
def analytics_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split of the active user base: for each
    day, distinct active users, how many were seen for the FIRST time
    that day, how many returned, and the acquisition share — the DAU
    decomposition every growth dashboard leads with (the daily
    complement to analytics-retention-cohort's weekly triangle).

    Determinism: counts are exact integers off one (user, day) distinct
    grain; new_share is a single IEEE division of exact integers.
    Scale (100 TB): the (user, day) dedup and the per-user first-day
    are both map-side-combinable keyed aggregates over ONE scan; the
    first-day frame shuffles at user cardinality to join the activity
    grain (co-partitioned on user_id — one exchange each side), and the
    day rollup is |days|-sized."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = (F.col("day") == F.col("first_day")).cast("int")
    return (
        e.join(first, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(is_new).alias("n_new"),
            F.sum((F.col("day") > F.col("first_day")).cast("int")).alias(
                "n_returning"
            ),
            (F.sum(is_new).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "new_share"
            ),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_new",
            "n_returning",
            "new_share",
        )
    )


# ---------------------------------------------------------------------------
# analytics-order-percentiles — exact per-group percentiles, no group sort
# ---------------------------------------------------------------------------

# range buckets for the exact-percentile rank reconstruction (a parallelism
# dial, not a correctness knob — same role as RFM_RANGE_BUCKETS)
PCTL_RANGE_BUCKETS = 16


@register(
    "analytics-order-percentiles",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS priority, o_totalprice AS val,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT priority,
           max(n) AS n_orders,
           max(CASE WHEN rn = (n + 1) // 2 THEN val END) AS p50,
           max(CASE WHEN rn = (9 * n + 9) // 10 THEN val END) AS p90,
           max(CASE WHEN rn = (99 * n + 99) // 100 THEN val END) AS p99,
           min(val) AS min_price,
           max(val) AS max_price
    FROM r GROUP BY 1
    """,
)
def analytics_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 order values per priority class — percentile_disc
    semantics (the value at rank ceil(p·n) under ASC order; target ranks
    are pure integer ceilings, (p_num·n + p_den − 1) DIV p_den, so both
    engines select the same row) — computed WITHOUT ever sorting a whole
    group in one partition.

    This is the latency-report shape (p50/p95/p99 per endpoint) that
    breaks naive plans at 100 TB: percentile_disc OVER (PARTITION BY
    group) moves each group to ONE partition, and a 5-value group column
    means 5 partitions carrying the whole fact table.  Here the
    _exact_ntile_scalable machinery generalizes to arbitrary ranks:
    range-bucket by driver-collected percentile_approx cutpoints (one
    collect of ≤PCTL_RANGE_BUCKETS-1 doubles, inlined as a literal so
    every consumer sees the SAME cutpoints — the ADVICE r10 single-valued
    invariant), rank within (group, bucket) in parallel, reconstruct the
    global per-group rank from broadcast (group × bucket) offset rows,
    and pick the target ranks with conditional aggregates.  Partition
    grain is group × PCTL_RANGE_BUCKETS; at higher skew the bucket count
    is the dial (and cutpoints can be computed per-group the same way).

    Accuracy of the cutpoints never affects correctness — a skewed
    cutpoint only unbalances buckets (see _exact_ntile_scalable).
    Values pass through as raw parquet doubles (the r10-green double-repr
    class); ranks/counts are exact integers."""
    from merl_etl_spark.lineage import cut_lineage

    base = cut_lineage(
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("val"),
            F.col("o_orderkey").alias("key"),
        ),
        eager=False,
    )
    probs = [i / PCTL_RANGE_BUCKETS for i in range(1, PCTL_RANGE_BUCKETS)]
    row = base.agg(
        F.percentile_approx(
            F.col("val"), F.array(*[F.lit(p) for p in probs]), 1000
        ).alias("cuts")
    ).collect()[0]
    cut_vals = sorted({float(c) for c in (row["cuts"] or []) if c is not None})
    if cut_vals:
        cuts_arr = F.array(*[F.lit(c) for c in cut_vals])
        # ASC: rb = #cutpoints strictly below the value — monotone
        # non-decreasing in the sort order, equal values share a bucket
        rb = F.size(F.filter(cuts_arr, lambda c: c < F.col("val")))
    else:
        rb = F.lit(0)
    j = base.withColumn("rb", rb)
    w_local = Window.partitionBy("priority", "rb").orderBy(
        F.asc("val"), F.asc("key")
    )
    ranked = j.withColumn("lrn", F.row_number().over(w_local))
    counts = j.groupBy("priority", "rb").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("priority")
        .orderBy("rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy("priority")
        .orderBy("rb")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offs = counts.select(
        "priority",
        "rb",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    g = ranked.join(F.broadcast(offs), ["priority", "rb"]).withColumn(
        "grank", F.col("off") + F.col("lrn")
    )
    n, rk = F.col("n"), F.col("grank")
    k50 = F.expr("(n + 1) DIV 2")
    k90 = F.expr("(9 * n + 9) DIV 10")
    k99 = F.expr("(99 * n + 99) DIV 100")
    return g.groupBy("priority").agg(
        F.max("n").alias("n_orders"),
        F.max(F.when(rk == k50, F.col("val"))).alias("p50"),
        F.max(F.when(rk == k90, F.col("val"))).alias("p90"),
        F.max(F.when(rk == k99, F.col("val"))).alias("p99"),
        F.min("val").alias("min_price"),
        F.max("val").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# analytics-cohort-ltv — cumulative cohort revenue (LTV curve)
# ---------------------------------------------------------------------------


@register(
    "analytics-cohort-ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey AS custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_ym
      FROM orders GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_ym, count(*) AS cohort_size FROM firsts GROUP BY 1
    ),
    facts AS (
      SELECT f.cohort_ym,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cohort_ym
               AS age_months,
             o.o_custkey, o.o_totalprice
      FROM orders o JOIN firsts f ON o.o_custkey = f.custkey
    ),
    grain AS (
      SELECT cohort_ym, age_months,
             count(DISTINCT o_custkey) AS n_active,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
      FROM facts GROUP BY 1, 2
    )
    SELECT printf('%04d-%02d', (g.cohort_ym - 1) // 12, ((g.cohort_ym - 1) % 12) + 1)
             AS cohort_month,
           g.age_months, g.n_active, s.cohort_size,
           CAST(CAST(g.rev_dec AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
           CAST(CAST(SUM(g.rev_dec) OVER (PARTITION BY g.cohort_ym
                                          ORDER BY g.age_months)
                     AS DECIMAL(38,2)) AS DOUBLE) AS cum_revenue,
           CAST(CAST(SUM(g.rev_dec) OVER (PARTITION BY g.cohort_ym
                                          ORDER BY g.age_months)
                     AS DOUBLE) / s.cohort_size AS DOUBLE) AS ltv_per_customer
    FROM grain g JOIN sizes s USING (cohort_ym)
    """,
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month, revenue accumulated along cohort age in months — the
    complement of analytics-retention-cohort's activity triangle (who
    still BUYS is retention; what they've SPENT so far is LTV).
    Calendar math is pure integer year·12+month ordinals on both sides —
    no months_between/age() builtins, whose fractional-month semantics
    differ across engines.

    Scale (100 TB): the first-order frame is one keyed map-side-
    combinable shuffle on custkey; the fact join is custkey-equi (AQE
    broadcasts the cohort side when small, shuffles co-partitioned when
    not); the (cohort × age) grain is calendar-bounded (~years² / 2
    rows), so the cumulative window partitions by cohort over ≤ a few
    hundred rows per cohort — never a fact-grain window.  Revenue sums
    are exact decimals, cumulated BEFORE the one boundary cast per
    output column (2dp-exact reduction, DOUBLE out; ltv divides the
    exact cum by the integer cohort size in IEEE double — both engines
    evaluate the same two operands)."""
    orders = load_table(spark, sf_dir, "orders")
    ym = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    firsts = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(ym(F.col("o_orderdate"))).alias("cohort_ym")
    )
    from merl_etl_spark.lineage import cut_lineage

    firsts = cut_lineage(firsts, eager=False)  # two consumers: sizes + join
    sizes = firsts.groupBy("cohort_ym").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    facts = orders.join(
        firsts, orders["o_custkey"] == firsts["custkey"]
    ).select(
        "cohort_ym",
        (ym(F.col("o_orderdate")) - F.col("cohort_ym"))
        .cast("long")
        .alias("age_months"),
        "o_custkey",
        "o_totalprice",
    )
    grain = facts.groupBy("cohort_ym", "age_months").agg(
        F.count_distinct("o_custkey").alias("n_active"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
    )
    w_cum = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("rev_dec").over(w_cum).cast(DEC_SUM)
    return (
        grain.join(F.broadcast(sizes), "cohort_ym")
        .select(
            F.format_string(
                "%04d-%02d",
                ((F.col("cohort_ym") - 1) / 12).cast("bigint"),
                ((F.col("cohort_ym") - 1) % 12 + 1).cast("int"),
            ).alias("cohort_month"),
            "age_months",
            "n_active",
            "cohort_size",
            F.col("rev_dec").cast("decimal(38,2)").cast("double").alias("revenue"),
            cum.cast("decimal(38,2)").cast("double").alias("cum_revenue"),
            (cum.cast("double") / F.col("cohort_size")).alias("ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# analytics-revenue-concentration — exact decile Lorenz/Pareto table
# ---------------------------------------------------------------------------


@register(
    "analytics-revenue-concentration",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spend_dec
      FROM orders GROUP BY 1
    ),
    tiled AS (
      SELECT custkey, spend_dec,
             ntile(10) OVER (ORDER BY spend_dec DESC, custkey) AS decile
      FROM spend
    ),
    grain AS (
      SELECT decile, count(*) AS n_customers,
             SUM(spend_dec) AS rev_dec
      FROM tiled GROUP BY 1
    ),
    tot AS (SELECT SUM(rev_dec) AS total_dec FROM grain)
    SELECT CAST(decile AS BIGINT) AS decile, n_customers,
           CAST(CAST(rev_dec AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
           CAST(CAST(rev_dec AS DECIMAL(38,2)) AS DOUBLE)
             / CAST(CAST((SELECT total_dec FROM tot) AS DECIMAL(38,2)) AS DOUBLE)
             AS share,
           CAST(CAST(SUM(rev_dec) OVER (ORDER BY decile) AS DECIMAL(38,2)) AS DOUBLE)
             / CAST(CAST((SELECT total_dec FROM tot) AS DECIMAL(38,2)) AS DOUBLE)
             AS cum_share
    FROM grain
    """,
)
def analytics_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto/Lorenz) table: customers decile-
    ranked by exact decimal lifetime spend — EXACT ntile(10) via the
    generalized rank-reconstruction machinery (_exact_ntile_scalable,
    the k-parameterized form of the r10 RFM rewrite: driver-collected
    literal cutpoints → parallel in-bucket ranks → broadcast offsets →
    ntile's positional formula) — then per-decile customer counts,
    revenue, revenue share, and the cumulative Lorenz share.  The
    "does 10% of the base carry 60% of revenue" question, answered
    without ever sorting the customer base in one partition.

    Determinism: the decile is integer-exact at any parallelism (ntile
    parity pinned in pytest); revenue reduces to a 2dp-exact decimal
    before ONE boundary cast; shares divide two exact-decimal-derived
    doubles in IEEE (the dq-distribution-drift share pattern); the
    Lorenz accumulation happens in exact decimal on the 10-row decile
    summary BEFORE its boundary cast.

    Scale (100 TB): the spend rollup is one keyed map-side-combinable
    shuffle; the ntile machinery adds one ≤RFM_RANGE_BUCKETS-row
    offset-carry window; the decile summary is 10 rows (its cumulative
    window is bounded by construction — allowlisted)."""
    from merl_etl_spark.lineage import cut_lineage

    spend = cut_lineage(
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("spend_dec")),
        eager=False,
    )
    tiles = _exact_ntile_scalable(spend, "spend_dec", 10)
    grain = (
        spend.join(tiles, "custkey")
        .groupBy(F.col("ntile_spend_dec").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_dec").alias("rev_dec"),
        )
    )
    grain = cut_lineage(grain, eager=False)  # 10-row summary, two consumers
    tot = F.broadcast(grain.agg(F.sum("rev_dec").alias("total_dec")))
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    total_d = F.col("total_dec").cast("decimal(38,2)").cast("double")
    return (
        grain.crossJoin(tot)
        .select(
            "decile",
            "n_customers",
            F.col("rev_dec").cast("decimal(38,2)").cast("double").alias("revenue"),
            (
                F.col("rev_dec").cast("decimal(38,2)").cast("double") / total_d
            ).alias("share"),
            (
                F.sum("rev_dec")
                .over(w_cum)
                .cast("decimal(38,2)")
                .cast("double")
                / total_d
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# analytics-ab-test — deterministic assignment + pooled two-proportion z
# ---------------------------------------------------------------------------

# the four exact-integer inputs of the test, computed once by a single
# conditional aggregate over the per-user frame
_AB_COUNT_COLS = """
      CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      CAST(SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT)
        AS conv_a,
      CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      CAST(SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT)
        AS conv_b
"""

# conversion = "heavy purchaser" (>= this many purchase events): a binary
# "ever purchased" is unanimously true in every fixture (and in most real
# engagement logs), which degenerates the test to z = 0/0; a count
# threshold near the per-user median keeps both arms' rates interior at
# every scale factor while staying exact-integer
AB_CONV_MIN_PURCHASES = 15

# arm assignment = dedup's md5_bucket twins (the single-sourced hex→int
# split) over the salted user id, modulo 2
from merl_etl_spark.operators.dedup import md5_bucket_duck, md5_bucket_spark

AB_BUCKET_DUCK = md5_bucket_duck("user_id::VARCHAR || '|ab-seed'", 2)

# the z statistic over those integers — ONE shared formula string so the
# Spark plan and the oracle cannot drift (operand order is the IEEE
# determinism contract; bare decimal literals avoided because DuckDB
# types them DECIMAL, so 1 is always CAST to DOUBLE explicitly)
_AB_Z_EXPR = (
    "(rate_a - rate_b) / sqrt(pool * (CAST(1 AS DOUBLE) - pool)"
    " * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)"
    "    + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE)))"
)


@register(
    "analytics-ab-test",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       >= {AB_CONV_MIN_PURCHASES} THEN 1 ELSE 0 END
               AS converted
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    v AS (
      SELECT CASE WHEN {AB_BUCKET_DUCK} = 0
                  THEN 'A' ELSE 'B' END AS variant,
             converted
      FROM u
    ),
    s AS (SELECT {_AB_COUNT_COLS} FROM v),
    r AS (
      SELECT n_a, conv_a, n_b, conv_b,
             CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
             CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
             CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
               AS pool
      FROM s
    )
    SELECT n_a, conv_a, n_b, conv_b, rate_a, rate_b,
           round(rate_a - rate_b, 9) AS abs_lift,
           round({_AB_Z_EXPR}, 6) AS z_score,
           abs(round({_AB_Z_EXPR}, 6)) >= CAST(1.96 AS DOUBLE) AS significant
    FROM r
    """,
)
def analytics_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are deterministically assigned to
    variant A or B by a salted content hash (the sample-hash-split rule —
    reruns and backfills route every user to the same arm, never
    random()), conversion is "heavy purchaser" (AB_CONV_MIN_PURCHASES —
    see the constant's note on why a binary ever-purchased degenerates),
    and the verdict is the pooled two-proportion z-test every
    experimentation platform runs.

    Determinism: the four test inputs (exposures and conversions per arm)
    are exact integers off one per-user conditional aggregate; the rates
    are single IEEE divisions of those integers; z shares ONE formula
    string between the Spark plan and the oracle (identical operand
    order — sqrt is in the driver-green libm class per the r10 canary
    split) and is rounded once at the output boundary.  The significance
    flag compares the ROUNDED z against 1.96 so the boundary itself is
    deterministic.  Degenerate arms (zero or unanimous conversion, empty
    arm) would yield NULL/Inf z rather than a wrong verdict.

    Scale (100 TB): the per-user reduce is one map-side-combinable keyed
    aggregate over a single scan of the event log; everything after it
    operates on ONE row.  No window, no join, no skew surface — variant
    hashing is a projection."""
    events = load_table(spark, sf_dir, "events")
    u = (
        events.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int"))
                >= AB_CONV_MIN_PURCHASES
            )
            .cast("int")
            .alias("converted")
        )
    )
    bucket = md5_bucket_spark(
        F.concat(F.col("user_id").cast("string"), F.lit("|ab-seed")), 2
    )
    v = u.select(
        F.when(bucket == 0, "A").otherwise("B").alias("variant"), "converted"
    )
    s = v.selectExpr(f"struct({_AB_COUNT_COLS}) AS s").select("s.*")
    r = s.selectExpr(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        "CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a",
        "CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b",
        "CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pool",
    )
    return r.selectExpr(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        "rate_a",
        "rate_b",
        "round(rate_a - rate_b, 9) AS abs_lift",
        f"round({_AB_Z_EXPR}, 6) AS z_score",
        f"abs(round({_AB_Z_EXPR}, 6)) >= CAST(1.96 AS DOUBLE) AS significant",
    )


# ---------------------------------------------------------------------------
# analytics-powerlaw-fit — log-log OLS over bit-width length bands
# ---------------------------------------------------------------------------

# the OLS slope/intercept over the band summary, shared verbatim between
# the Spark plan and the oracle.  All inputs are exact (integer band
# moments; band ln-counts frozen at 6 dp decimal and cast to double once
# at the sum boundary), so the fit is a fixed IEEE expression tree.
_PL_SLOPE = (
    "(CAST(m AS DOUBLE) * sxy_d - CAST(sx AS DOUBLE) * sy_d)"
    " / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_PL_INTERCEPT = "(sy_d - slope * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE)"


@register(
    "analytics-powerlaw-fit",
    oracle=f"""
    WITH grain AS (
      SELECT CAST(length(bin(n_chars)) AS INT) AS band,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents WHERE n_chars > 0 GROUP BY 1
    ),
    g AS (
      SELECT band, n_docs,
             CAST(round(ln(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS ln_dec
      FROM grain
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(SUM(band) AS BIGINT) AS sx,
             CAST(SUM(band * band) AS BIGINT) AS sxx,
             CAST(SUM(ln_dec) AS DOUBLE) AS sy_d,
             CAST(SUM(band * ln_dec) AS DOUBLE) AS sxy_d
      FROM g
    ),
    fit AS (
      SELECT m, {_PL_SLOPE} AS slope, sy_d, sx FROM s
    ),
    fit2 AS (SELECT slope, {_PL_INTERCEPT} AS intercept FROM fit)
    SELECT g.band, g.n_docs, CAST(g.ln_dec AS DOUBLE) AS ln_count,
           round(f.slope, 9) AS slope, round(f.intercept, 9) AS intercept
    FROM g, fit2 f
    """,
)
def analytics_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law diagnostic of the document-length distribution: doc
    counts per log2 length band with the OLS line fitted through
    (band, ln count) — the Zipf/heavy-tail check every corpus intake
    runs (a straight log-log line with slope ≈ −α says lengths are
    power-law distributed, which drives packing efficiency, shard-size
    variance, and truncation-budget decisions downstream).

    Determinism: the log2 band is length(bin(n_chars)) — integer
    bit-width, no floating log at row grain; per-BAND ln(count) is
    computed once on the ≤64-row summary and frozen at 6 dp decimal
    (the curate-dsir rule), so the OLS moments are exact integer/decimal
    sums cast to double once, and slope/intercept are ONE shared IEEE
    formula rounded at the boundary.

    Scale (100 TB): the corpus collapses to ≤64 band rows in one
    map-side-combinable pass (the fit never sees documents or ranks —
    the classical rank-size regression would demand a global sort; the
    binned form is the scale-correct estimator), and the fit is a 1-row
    aggregate broadcast back across the bands."""
    docs = load_table(spark, sf_dir, "documents")
    grain = (
        docs.where(F.col("n_chars") > 0)
        .groupBy(
            F.expr("CAST(length(bin(n_chars)) AS INT)").alias("band")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    g = grain.withColumn(
        "ln_dec",
        F.expr("CAST(round(ln(CAST(n_docs AS DOUBLE)), 6) AS DECIMAL(18,6))"),
    )
    from merl_etl_spark.lineage import cut_lineage

    # two consumers (fit moments + output rows) of the ≤64-row summary
    g = cut_lineage(g, eager=False)
    s = g.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("band").cast("bigint").alias("sx"),
        F.sum(F.col("band") * F.col("band")).cast("bigint").alias("sxx"),
        F.sum("ln_dec").cast("double").alias("sy_d"),
        F.sum(F.col("band") * F.col("ln_dec")).cast("double").alias("sxy_d"),
    )
    fit = s.selectExpr("m", f"{_PL_SLOPE} AS slope", "sy_d", "sx").selectExpr(
        "slope", f"{_PL_INTERCEPT} AS intercept"
    )
    return g.crossJoin(F.broadcast(fit)).select(
        "band",
        "n_docs",
        F.col("ln_dec").cast("double").alias("ln_count"),
        F.round("slope", 9).alias("slope"),
        F.round("intercept", 9).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# analytics-shipping-delay — order-to-ship latency distribution
# ---------------------------------------------------------------------------


@register(
    "analytics-shipping-delay",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
    )
    SELECT priority,
           CAST(delay_d // 7 AS BIGINT) AS week_band,
           CAST(count(*) AS BIGINT) AS n_lines,
           min(delay_d) AS min_days,
           max(delay_d) AS max_days
    FROM d WHERE delay_d >= 0 GROUP BY 1, 2
    """,
)
def analytics_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution: days between order placement
    and each line's ship date, banded by week per order priority — the
    fulfillment-SLA histogram (does 1-URGENT actually ship faster, and
    how heavy is the tail?).  The operational-latency complement to
    ts-interarrival-hist's event-cadence bands.

    Determinism: day differences of DATE casts are exact integers (both
    fixture timestamp columns are midnight date-grain, so the cast is
    lossless); week banding is floor division of nonnegative ints; the
    census collapses order-independently.

    Scale (100 TB): the orders⨝lineitem equi-join is the engine's
    standard co-partitioned fact join (AQE broadcasts the order side if
    filtered small); everything after is a map-side-combinable rollup
    at (priority × week) grain."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    d = (
        orders.where(F.col("o_orderdate").isNotNull())
        .join(
            lineitem.where(F.col("l_shipdate").isNotNull()),
            orders["o_orderkey"] == lineitem["l_orderkey"],
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).cast("long").alias("delay_d"),
        )
        .where(F.col("delay_d") >= 0)
    )
    return d.groupBy(
        "priority", F.expr("delay_d DIV 7").alias("week_band")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("delay_d").alias("min_days"),
        F.max("delay_d").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# analytics-revenue-bridge — price/volume decomposition between periods
# ---------------------------------------------------------------------------

# the two comparison periods (full calendar years in the fixture's
# shipdate range).  A reporting dial: production parameterizes these.
BRIDGE_Y1 = 1996
BRIDGE_Y2 = 1997


@register(
    "analytics-revenue-bridge",
    oracle=f"""
    WITH y AS (
      SELECT p.p_brand AS brand,
             year(l.l_shipdate) AS yr,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6))
               AS q,
             CAST(SUM({net_revenue_duck('l.')}) AS DECIMAL(38,12)) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(l.l_shipdate) IN ({BRIDGE_Y1}, {BRIDGE_Y2})
      GROUP BY 1, 2
    ),
    w AS (
      SELECT brand,
             CAST(COALESCE(max(CASE WHEN yr = {BRIDGE_Y1} THEN q END), 0)
                  AS DECIMAL(38,6)) AS q1,
             CAST(COALESCE(max(CASE WHEN yr = {BRIDGE_Y2} THEN q END), 0)
                  AS DECIMAL(38,6)) AS q2,
             CAST(COALESCE(max(CASE WHEN yr = {BRIDGE_Y1} THEN r END), 0)
                  AS DECIMAL(38,12)) AS r1,
             CAST(COALESCE(max(CASE WHEN yr = {BRIDGE_Y2} THEN r END), 0)
                  AS DECIMAL(38,12)) AS r2
      FROM y GROUP BY 1
    )
    SELECT brand,
           round(CAST(r1 AS DOUBLE), 2) AS rev_y1,
           round(CAST(r2 AS DOUBLE), 2) AS rev_y2,
           round(CAST(r2 - r1 AS DOUBLE), 2) AS delta,
           round(CAST(q1 AS DOUBLE), 2) AS qty_y1,
           round(CAST(q2 AS DOUBLE), 2) AS qty_y2,
           CASE WHEN q1 > 0 AND q2 > 0 THEN
             round((CAST(q2 AS DOUBLE) - CAST(q1 AS DOUBLE))
                   * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)), 2)
             END AS volume_effect,
           CASE WHEN q1 > 0 AND q2 > 0 THEN
             round((CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
                    - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
                   * CAST(q2 AS DOUBLE), 2)
             END AS price_effect
    FROM w
    """,
)
def analytics_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge per part brand: ΔR decomposed into
    a volume effect ΔQ·p₁ and a price effect Δp·Q₂ (the exact two-term
    split: p₁ΔQ + Q₂Δp = ΔR when both periods trade) — the
    finance-review "waterfall" that says whether a brand's revenue move
    came from selling MORE or from selling DEARER.  Brands absent from
    a period report the raw deltas with NULL effects (new/discontinued
    lines have no meaningful unit-price comparison).

    Determinism: period revenue/quantity are exact decimal sums
    (discount product pinned at (19,12) — the dq-reconciliation scale
    discipline); the unit prices and effects are IEEE expressions of
    those exact decimals in identical operand order, each output
    rounded ONCE.

    Scale (100 TB): the year filter prunes at the scan; one equi-join
    against the part dimension (broadcastable); ONE map-side-combinable
    aggregate at (brand × 2) grain; the pivot and bridge arithmetic run
    on the bounded brand-grain summary."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(BRIDGE_Y1, BRIDGE_Y2)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = net_revenue_spark()
    y = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("q"),
            F.sum(rev).cast("decimal(38,12)").alias("r"),
        )
    )
    w = y.groupBy("brand").agg(
        F.coalesce(
            F.max(F.when(F.col("yr") == BRIDGE_Y1, F.col("q"))), F.lit(0)
        )
        .cast("decimal(38,6)")
        .alias("q1"),
        F.coalesce(
            F.max(F.when(F.col("yr") == BRIDGE_Y2, F.col("q"))), F.lit(0)
        )
        .cast("decimal(38,6)")
        .alias("q2"),
        F.coalesce(
            F.max(F.when(F.col("yr") == BRIDGE_Y1, F.col("r"))), F.lit(0)
        )
        .cast("decimal(38,12)")
        .alias("r1"),
        F.coalesce(
            F.max(F.when(F.col("yr") == BRIDGE_Y2, F.col("r"))), F.lit(0)
        )
        .cast("decimal(38,12)")
        .alias("r2"),
    )
    return w.selectExpr(
        "brand",
        "round(CAST(r1 AS DOUBLE), 2) AS rev_y1",
        "round(CAST(r2 AS DOUBLE), 2) AS rev_y2",
        "round(CAST(r2 - r1 AS DOUBLE), 2) AS delta",
        "round(CAST(q1 AS DOUBLE), 2) AS qty_y1",
        "round(CAST(q2 AS DOUBLE), 2) AS qty_y2",
        "CASE WHEN q1 > 0 AND q2 > 0 THEN"
        " round((CAST(q2 AS DOUBLE) - CAST(q1 AS DOUBLE))"
        "       * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)), 2)"
        " END AS volume_effect",
        "CASE WHEN q1 > 0 AND q2 > 0 THEN"
        " round((CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)"
        "        - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))"
        "       * CAST(q2 AS DOUBLE), 2)"
        " END AS price_effect",
    )


# ---------------------------------------------------------------------------
# analytics-returned-revenue — Q10-style lost revenue from returned items
# ---------------------------------------------------------------------------


@register(
    "analytics-returned-revenue",
    oracle=f"""
    WITH ret AS (
      SELECT o.o_custkey,
             CAST(SUM({net_revenue_duck('l.')}) AS DECIMAL(38,12)) AS lost,
             CAST(count(*) AS BIGINT) AS n_ret_lines
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1
    )
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(r.n_ret_lines) AS BIGINT) AS n_ret_lines,
           round(CAST(SUM(r.lost) AS DOUBLE), 2) AS lost_revenue,
           round(CAST(max(r.lost) AS DOUBLE), 2) AS worst_customer_loss
    FROM ret r
    JOIN customer c ON c.c_custkey = r.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    """,
)
def analytics_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item revenue report: revenue lost to
    'R'-flagged lineitems, rolled up customer → nation — the churn-risk
    report (which markets are returning the most, and how concentrated
    the loss is in single accounts via the worst-customer column).

    Determinism: lost revenue is the exact decimal discount product
    (pinned (19,12) — the shared dq-reconciliation scale discipline)
    summed order-insensitively; boundary rounds once per column.

    Scale (100 TB): the returnflag filter pushes to the lineitem scan;
    the fact collapses to customer grain BEFORE touching dimensions
    (map-side combinable, customer-cardinality output); nation
    broadcasts; customer⋈summary is an equi-join Catalyst plans as SMJ
    or broadcast by actual size."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lost = net_revenue_spark()
    ret = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(lost).cast("decimal(38,12)").alias("lost"),
            F.count(F.lit(1)).alias("n_ret_lines"),
        )
    )
    return (
        ret.join(c, ret["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_ret_lines").cast("long").alias("n_ret_lines"),
            F.round(F.sum("lost").cast("double"), 2).alias("lost_revenue"),
            F.round(F.max("lost").cast("double"), 2).alias(
                "worst_customer_loss"
            ),
        )
    )


# ---------------------------------------------------------------------------
# analytics-promo-share — Q14-style monthly promotion revenue share
# ---------------------------------------------------------------------------


@register(
    "analytics-promo-share",
    oracle=f"""
    WITH m AS (
      SELECT strftime(CAST(l.l_shipdate AS DATE), '%Y-%m') AS month,
             CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_promo_lines,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN {net_revenue_duck('l.')} ELSE 0 END)
                  AS DECIMAL(38,12)) AS promo_rev,
             CAST(SUM({net_revenue_duck('l.')}) AS DECIMAL(38,12)) AS total_rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate IS NOT NULL
      GROUP BY 1
    )
    SELECT month, n_promo_lines, n_lines,
           round(CAST(promo_rev AS DOUBLE), 2) AS promo_revenue,
           round(CAST(total_rev AS DOUBLE), 2) AS total_revenue,
           CAST(floor(CAST(promo_rev AS DOUBLE) * CAST(1000000 AS DOUBLE)
                      / CAST(total_rev AS DOUBLE)) AS BIGINT) AS promo_ppm
    FROM m
    """,
)
def analytics_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion effect: the share of monthly revenue
    carried by PROMO-type parts — the marketing readout that says
    whether a promotion moved spend or just relabeled it.  Emitted per
    ship month with line counts and both revenue legs, so the ratio's
    numerator and denominator are auditable.

    Determinism: both revenue legs are exact decimal sums (the pinned
    (19,12) discount-product scale); the ppm share is ONE shared
    floor(double) expression of those exact decimals — identical
    operands through identical IEEE ops in both engines.  (A decimal
    floor-division here is the dialect trap: Spark's decimal DIV and
    DuckDB's decimal // disagree by one ulp on this data.)  The
    display revenues round once.

    Scale (100 TB): month × promo-flag is ONE map-side-combinable
    aggregate over the lineitem scan with the part dimension broadcast;
    output is month cardinality."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull()
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = net_revenue_spark()
    is_promo = F.col("p_type") == "PROMO"
    m = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.when(is_promo, 1).otherwise(0)).cast("long").alias(
                "n_promo_lines"
            ),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(is_promo, rev).otherwise(F.lit(0)))
            .cast("decimal(38,12)")
            .alias("promo_rev"),
            F.sum(rev).cast("decimal(38,12)").alias("total_rev"),
        )
    )
    return m.selectExpr(
        "month",
        "n_promo_lines",
        "n_lines",
        "round(CAST(promo_rev AS DOUBLE), 2) AS promo_revenue",
        "round(CAST(total_rev AS DOUBLE), 2) AS total_revenue",
        "CAST(floor(CAST(promo_rev AS DOUBLE) * CAST(1000000 AS DOUBLE)"
        "           / CAST(total_rev AS DOUBLE)) AS BIGINT) AS promo_ppm",
    )


# ---------------------------------------------------------------------------
# analytics-monthly-growth — MoM / YoY growth over exact month revenue
# ---------------------------------------------------------------------------


@register(
    "analytics-monthly-growth",
    oracle="""
    WITH m AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  AS DECIMAL(38,6)) AS DOUBLE) AS revenue
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY 1
    ),
    w AS (
      SELECT month, n_orders, revenue,
             lag(revenue, 1) OVER (ORDER BY month) AS prev_m,
             lag(revenue, 12) OVER (ORDER BY month) AS prev_y
      FROM m
    )
    SELECT month, n_orders, revenue,
           CASE WHEN prev_m > CAST(0 AS DOUBLE)
                THEN CAST(floor((revenue - prev_m) * CAST(1000000 AS DOUBLE)
                                / prev_m) AS BIGINT) END AS mom_ppm,
           CASE WHEN prev_y > CAST(0 AS DOUBLE)
                THEN CAST(floor((revenue - prev_y) * CAST(1000000 AS DOUBLE)
                                / prev_y) AS BIGINT) END AS yoy_ppm
    FROM w
    """,
)
def analytics_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monthly growth table every revenue dashboard opens with:
    order revenue per calendar month with month-over-month and
    year-over-year deltas in ppm — lag(1) and lag(12) over the month
    series, NULL where no comparison period exists.

    Determinism: month revenue is an exact decimal sum cast once to
    double (unscaled < 2^53 far past these SFs); both growth ratios are
    ONE shared floor(double) expression over those exact-valued doubles
    (the promo-share rule — decimal floor-division is an ulp trap).

    Scale (100 TB): the fact collapses to month grain in one map-side-
    combinable pass; the lag window is UNPARTITIONED but runs over the
    month-cardinality summary (~84 rows for the 7-year fixture, ~a few
    hundred for any realistic retention window) — the dq-volume-anomaly
    bounded-summary class, pinned in the plan-gate allowlist."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull()
    )
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("revenue"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("month")
    g = m.select(
        "month",
        "n_orders",
        "revenue",
        F.lag("revenue", 1).over(w).alias("prev_m"),
        F.lag("revenue", 12).over(w).alias("prev_y"),
    )
    return g.selectExpr(
        "month",
        "n_orders",
        "revenue",
        "CASE WHEN prev_m > CAST(0 AS DOUBLE)"
        " THEN CAST(floor((revenue - prev_m) * CAST(1000000 AS DOUBLE)"
        "                 / prev_m) AS BIGINT) END AS mom_ppm",
        "CASE WHEN prev_y > CAST(0 AS DOUBLE)"
        " THEN CAST(floor((revenue - prev_y) * CAST(1000000 AS DOUBLE)"
        "                 / prev_y) AS BIGINT) END AS yoy_ppm",
    )


# ---------------------------------------------------------------------------
# analytics-important-stock — TPC-H Q11 shape: per-nation value concentration
# ---------------------------------------------------------------------------


@register(
    "analytics-important-stock",
    oracle=f"""
    WITH v AS (
      SELECT n.n_name AS nation, l.l_partkey AS partkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(SUM({net_revenue_duck('l.')}) AS DECIMAL(38,12)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT nation,
             CAST(SUM(val) AS DECIMAL(38,12)) AS nation_val,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM v GROUP BY 1
    )
    SELECT v.nation, v.partkey, v.n_lines,
           CAST(round(v.val, 2) AS DOUBLE) AS part_value,
           CAST(floor(CAST(v.val AS DOUBLE) * CAST(1000000 AS DOUBLE)
                      / CAST(t.nation_val AS DOUBLE)) AS BIGINT) AS share_ppm,
           2 * (1000000 // t.n_parts) AS cutoff_ppm
    FROM v JOIN tot t ON t.nation = v.nation
    WHERE CAST(floor(CAST(v.val AS DOUBLE) * CAST(1000000 AS DOUBLE)
                     / CAST(t.nation_val AS DOUBLE)) AS BIGINT)
          >= 2 * (1000000 // t.n_parts)
    """,
)
def analytics_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape over the fixture's tables (no partsupp): which
    parts concentrate a nation's supply value — per-(nation, part) net
    revenue vs the nation total, keeping parts whose value share is at
    least TWICE the uniform share (Q11's `value > fraction * total`
    HAVING, with the fraction derived from the nation's own part count
    the way Q11 scales its 0.0001/SF — a fixed ppm would keep everything
    at small SF and nothing at large).

    Determinism: both value legs are exact decimal sums at the pinned
    (19,12) net-revenue scale; the share and the comparison are ONE
    shared floor(double) expression of those exact decimals (the
    promo-share dialect rule — decimal DIV vs // differ by an ulp); the
    cutoff is pure integer arithmetic (`//` and Spark `DIV` agree on
    positive integers).  part_value rounds AT DECIMAL GRAIN —
    round(decimal, 2), half-away in both engines — before the exact
    double cast.  Two traps found here this round: round(CAST(x AS
    DOUBLE), 2) resolves a .xx5 sum via the shortest-repr path in Spark
    but binary arithmetic in DuckDB (off by a cent), and DuckDB's
    decimal→decimal CAST TRUNCATES where Spark's rounds half-up.

    Scale (100 TB): one lineitem scan aggregated to (nation, part) grain
    map-side; supplier joins on the fact's supp key (AQE picks
    broadcast at test SF, sort-merge when supplier outgrows the
    threshold — no hint pinning a 1e9-row broadcast); nation is a
    25-row broadcast; `tot` is a rollup OF the first aggregate (never a
    second fact scan), rejoined at summary grain."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = net_revenue_spark()
    v = (
        li.join(supplier, li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .groupBy("nation", F.col("l_partkey").alias("partkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(rev).cast("decimal(38,12)").alias("val"),
        )
    )
    from merl_etl_spark.lineage import cut_lineage

    v = cut_lineage(v, eager=False)  # two consumers: totals + body
    tot = v.groupBy("nation").agg(
        F.sum("val").cast("decimal(38,12)").alias("nation_val"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    joined = v.join(F.broadcast(tot), "nation")
    share = F.expr(
        "CAST(floor(CAST(val AS DOUBLE) * CAST(1000000 AS DOUBLE)"
        " / CAST(nation_val AS DOUBLE)) AS BIGINT)"
    )
    cutoff = F.expr("2 * (1000000 DIV n_parts)")
    return (
        joined.select(
            "nation",
            "partkey",
            "n_lines",
            F.round(F.col("val"), 2).cast("double").alias("part_value"),
            share.alias("share_ppm"),
            cutoff.cast("long").alias("cutoff_ppm"),
        )
        .where(F.col("share_ppm") >= F.col("cutoff_ppm"))
    )


# ---------------------------------------------------------------------------
# analytics-gini-concentration — exact per-nation Gini of customer spend
# ---------------------------------------------------------------------------

# coarse band width in cents ($1000) — the two-level rank decomposition's
# outer grain; a scale dial, not a correctness knob (the decomposition is
# exact for ANY width).
GINI_COARSE_CENTS = 100_000

# The per-customer spend base, single-sourced for the concentration
# family (gini + pareto-8020): (nation, cents) with cents exact integer
# money.  The oracle twin is _SPEND_CTES below.
_SPEND_CTES = """cust AS (
      SELECT n.n_name AS nation,
             CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(38,0)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, o.o_custkey
    )"""


def customer_spend_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SPEND_CTES' ``cust``: one row per (nation,
    customer) with total spend in exact integer cents."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("nation", "o_custkey")
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100"
                " AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("cents")
        )
    )


@register(
    "analytics-gini-concentration",
    oracle=f"""
    WITH {_SPEND_CTES},
    fine AS (
      SELECT nation, cents // {GINI_COARSE_CENTS} AS coarse, cents,
             CAST(count(*) AS BIGINT) AS n_b
      FROM cust GROUP BY 1, 2, 3
    ),
    coarse AS (
      SELECT nation, coarse, CAST(SUM(n_b) AS BIGINT) AS n_c
      FROM fine GROUP BY 1, 2
    ),
    coarse_cum AS (
      SELECT nation, coarse,
             COALESCE(SUM(n_c) OVER (
               PARTITION BY nation ORDER BY coarse
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS c_coarse_prev
      FROM coarse
    ),
    ranked AS (
      SELECT f.nation, f.cents, f.n_b,
             cc.c_coarse_prev
             + COALESCE(SUM(f.n_b) OVER (
                 PARTITION BY f.nation, f.coarse ORDER BY f.cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS c_prev
      FROM fine f
      JOIN coarse_cum cc ON cc.nation = f.nation AND cc.coarse = f.coarse
    ),
    sums AS (
      SELECT nation,
             CAST(SUM(n_b) AS BIGINT) AS n,
             SUM(CAST(n_b AS HUGEINT) * cents) AS t,
             SUM(CAST(cents AS HUGEINT)
                 * (2 * CAST(c_prev AS HUGEINT) * n_b
                    + CAST(n_b AS HUGEINT) * (n_b + 1))) AS s2
      FROM ranked GROUP BY 1
    )
    SELECT nation, n AS n_customers,
           CAST(t AS VARCHAR) AS total_cents,
           CAST(floor((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(CAST(t AS VARCHAR) AS DOUBLE))
                       - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE))
                      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS gini_ppm
    FROM sums
    """,
)
def analytics_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer spend per nation — the revenue-
    concentration scalar next to analytics-revenue-concentration's
    top-k shares (Gini reads the WHOLE Lorenz curve: 0 = everyone spends
    alike, →1 = a few customers carry the nation).

    Exact-at-scale rank decomposition (the budget-select two-pass idea
    applied to G = (2·Σrᵢxᵢ)/(n·Σx) − (n+1)/n): within a tie-band all x
    are equal, so Σrᵢxᵢ needs only each band's count and its EXCLUSIVE
    preceding count — computed in two levels (coarse $1000 bands per
    nation, then exact-cents bands within each coarse band) so no window
    ever sorts more than one coarse band's distinct values.  Σ2rx is
    accumulated as 2·Σrx to stay integral (n_b(n_b+1) is always even).

    Determinism: spend is exact integer cents (double→DECIMAL(18,2) is
    exact on 2-dp money); every sum is integer/HUGEINT/DECIMAL(38,0);
    total_cents is emitted as STRING (can exceed 2^53 at scale) and the
    s2 ppm is ONE shared floor(double) expression with the oracle's
    HUGEINT→double casts routed through VARCHAR (DuckDB's direct cast
    is not correctly rounded past 2^53).

    Scale (100 TB): one fact aggregate to customer grain (keyed by
    custkey), one map to (nation, band) grain; both windows are keyed —
    nation × coarse-band at the outer level, coarse-band contents at the
    inner — so the 25-nation skew never concentrates a full nation's
    customers into one sort."""
    cust = customer_spend_cents(spark, sf_dir)
    fine = cust.groupBy(
        "nation",
        F.expr(f"cents DIV {GINI_COARSE_CENTS}").alias("coarse"),
        "cents",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    from merl_etl_spark.lineage import cut_lineage

    fine = cut_lineage(fine, eager=False)  # two consumers: coarse + ranked
    coarse = fine.groupBy("nation", "coarse").agg(
        F.sum("n_b").cast("long").alias("n_c")
    )
    w_coarse = (
        Window.partitionBy("nation")
        .orderBy("coarse")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    coarse_cum = coarse.select(
        "nation",
        "coarse",
        F.coalesce(F.sum("n_c").over(w_coarse), F.lit(0)).alias("c_coarse_prev"),
    )
    w_fine = (
        Window.partitionBy("nation", "coarse")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        fine.join(coarse_cum, ["nation", "coarse"])
        .select(
            "nation",
            "cents",
            "n_b",
            (
                F.col("c_coarse_prev")
                + F.coalesce(F.sum("n_b").over(w_fine), F.lit(0))
            ).alias("c_prev"),
        )
    )
    sums = ranked.groupBy("nation").agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum(F.expr("CAST(n_b AS DECIMAL(38,0)) * cents")).alias("t"),
        F.sum(
            F.expr(
                "CAST(cents AS DECIMAL(38,0))"
                " * (2 * CAST(c_prev AS DECIMAL(19,0)) * n_b"
                "    + CAST(n_b AS DECIMAL(19,0)) * (n_b + 1))"
            )
        ).alias("s2"),
    )
    return sums.selectExpr(
        "nation",
        "n AS n_customers",
        "CAST(CAST(t AS DECIMAL(38,0)) AS STRING) AS total_cents",
        """CAST(floor((CAST(s2 AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
                       - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE))
                      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS gini_ppm""",
    )


# ---------------------------------------------------------------------------
# analytics-pareto-8020 — how many top customers cover 80% of spend
# ---------------------------------------------------------------------------


@register(
    "analytics-pareto-8020",
    oracle=f"""
    WITH {_SPEND_CTES},
    ranked AS (
      -- fixture-scale naive form: per-customer cumulative from the top
      -- (the operator uses the band decomposition); custkey order
      -- inside a tied cents band does not affect the crossing count
      SELECT nation, cents,
             row_number() OVER (PARTITION BY nation
                                ORDER BY cents DESC) AS rn,
             SUM(CAST(cents AS HUGEINT)) OVER (
               PARTITION BY nation ORDER BY cents DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cust
    ),
    tot AS (
      SELECT nation,
             CAST(count(*) AS BIGINT) AS n_customers,
             SUM(CAST(cents AS HUGEINT)) AS total
      FROM cust GROUP BY 1
    ),
    crossing AS (
      SELECT r.nation,
             CAST(min(r.rn) AS BIGINT) AS n_top,
             min(r.cum) FILTER (WHERE 10 * r.cum >= 8 * t.total) AS covered
      FROM ranked r JOIN tot t USING (nation)
      WHERE 10 * r.cum >= 8 * t.total
      GROUP BY 1
    )
    SELECT t.nation, t.n_customers, c.n_top,
           CAST(c.n_top * 1000000 // t.n_customers AS BIGINT) AS top_ppm,
           CAST(floor(CAST(CAST(c.covered AS VARCHAR) AS DOUBLE)
                      * CAST(1000000 AS DOUBLE)
                      / CAST(CAST(t.total AS VARCHAR) AS DOUBLE))
                AS BIGINT) AS covered_ppm
    FROM tot t JOIN crossing c USING (nation)
    """,
)
def analytics_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 readout per nation: the SMALLEST number of top-spending
    customers whose combined spend reaches 80% of the nation total, as a
    count, a share of the customer base (ppm), and the exact coverage at
    the crossing — the "how concentrated is revenue, in heads" companion
    to the Gini scalar (same spend base, single-sourced).

    Exact-at-scale crossing (the gini tie-band decomposition run from
    the TOP): per (nation, cents) band, the EXCLUSIVE prefix count and
    spend above the band (two keyed windows — coarse $1000 bands, then
    exact cents within); the crossing band is the one whose inclusive
    prefix first reaches 8·total ≤ 10·cum (pure integer-decimal
    comparison, no division), and the heads needed inside it are
    j = ⌈(8·total − 10·prev)/(10·cents)⌉ via integral-decimal DIV
    (exact: scale-0 operands — the fractional-decimal DIV/// ulp trap
    does not apply).  Ties need no order: every customer in the band
    spends the same.

    Determinism: integer cents; HUGEINT/DECIMAL(38,0) widening;
    covered_ppm is ONE shared floor(double) with VARCHAR-routed oracle
    casts past 2^53; top_ppm is positive-integer floor division.

    Scale (100 TB): same shape as analytics-gini-concentration — fact
    aggregate to customer grain, then band-grain windows only."""
    cust = customer_spend_cents(spark, sf_dir)
    fine = cust.groupBy(
        "nation",
        F.expr(f"cents DIV {GINI_COARSE_CENTS}").alias("coarse"),
        "cents",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    from merl_etl_spark.lineage import cut_lineage

    fine = cut_lineage(fine, eager=False)  # consumers: coarse + ranked + tot
    coarse = fine.groupBy("nation", "coarse").agg(
        F.sum("n_b").cast("long").alias("n_c"),
        F.sum(F.expr("CAST(n_b AS DECIMAL(38,0)) * cents")).alias("t_c"),
    )
    w_coarse = (
        Window.partitionBy("nation")
        .orderBy(F.col("coarse").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    coarse_cum = coarse.select(
        "nation",
        "coarse",
        F.coalesce(F.sum("n_c").over(w_coarse), F.lit(0)).alias("c_above"),
        F.coalesce(
            F.sum("t_c").over(w_coarse), F.lit(0).cast("decimal(38,0)")
        ).alias("t_above"),
    )
    w_fine = (
        Window.partitionBy("nation", "coarse")
        .orderBy(F.col("cents").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = fine.join(coarse_cum, ["nation", "coarse"]).select(
        "nation",
        "cents",
        "n_b",
        (
            F.col("c_above")
            + F.coalesce(F.sum("n_b").over(w_fine), F.lit(0))
        ).alias("c_prev"),
        (
            F.col("t_above")
            + F.coalesce(
                F.sum(F.expr("CAST(n_b AS DECIMAL(38,0)) * cents")).over(w_fine),
                F.lit(0).cast("decimal(38,0)"),
            )
        ).alias("t_prev"),
    )
    tot = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0))")).alias("total"),
    )
    crossing = (
        ranked.join(F.broadcast(tot), "nation")
        .where(
            # inclusive prefix reaches 80% AND exclusive prefix does not:
            # THE crossing band (pure decimal-integer comparisons)
            (
                F.expr("10 * (t_prev + CAST(n_b AS DECIMAL(38,0)) * cents)")
                >= F.expr("8 * total")
            )
            & (F.expr("10 * t_prev") < F.expr("8 * total"))
        )
        .selectExpr(
            "nation",
            "n_customers",
            "total",
            # heads needed inside the band: ceil((8T - 10·prev) / (10x))
            # as integral-decimal DIV (scale-0 operands -> exact)
            "c_prev + CAST((8 * total - 10 * t_prev + 10 * cents - 1)"
            " DIV (10 * cents) AS BIGINT) AS n_top",
            "t_prev + CAST((8 * total - 10 * t_prev + 10 * cents - 1)"
            " DIV (10 * cents) AS DECIMAL(38,0))"
            " * cents AS covered",
        )
    )
    return crossing.selectExpr(
        "nation",
        "n_customers",
        "n_top",
        "CAST(n_top * 1000000 DIV n_customers AS BIGINT) AS top_ppm",
        """CAST(floor(CAST(covered AS DOUBLE) * CAST(1000000 AS DOUBLE)
                      / CAST(total AS DOUBLE)) AS BIGINT) AS covered_ppm""",
    )


# ---------------------------------------------------------------------------
# analytics-lorenz-deciles — the Lorenz curve behind the Gini scalar
# ---------------------------------------------------------------------------


@register(
    "analytics-lorenz-deciles",
    oracle=f"""
    WITH {_SPEND_CTES},
    numbered AS (
      SELECT nation, cents,
             row_number() OVER (PARTITION BY nation ORDER BY cents) AS rn
      FROM cust
    ),
    ranked AS (
      -- fixture-scale naive form: per-customer ascending cumulative
      SELECT nation, cents, rn,
             SUM(CAST(cents AS HUGEINT)) OVER (
               PARTITION BY nation ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM numbered
    ),
    tot AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(cents AS HUGEINT)) AS total
      FROM cust GROUP BY 1
    ),
    deciles AS (
      SELECT t.nation, d.decile, t.n, t.total,
             -- bottom m = ceil(decile * n / 10) customers
             CAST((d.decile * t.n + 9) // 10 AS BIGINT) AS m
      FROM tot t CROSS JOIN (
        SELECT unnest(generate_series(1, 10)) AS decile
      ) d
    )
    SELECT dd.nation, CAST(dd.decile AS BIGINT) AS decile, dd.m,
           CAST(floor(CAST(CAST(r.cum AS VARCHAR) AS DOUBLE)
                      * CAST(1000000 AS DOUBLE)
                      / CAST(CAST(dd.total AS VARCHAR) AS DOUBLE))
                AS BIGINT) AS cum_share_ppm
    FROM deciles dd JOIN ranked r
      ON r.nation = dd.nation AND r.rn = dd.m
    """,
)
def analytics_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve at decile resolution per nation: for each k/10 of
    the customer base (poorest first), the share of total spend that
    bottom slice carries — the CURVE whose area the Gini scalar
    summarizes (analytics-gini-concentration), emitted as 10 exact
    points so a dashboard can draw inequality instead of quoting it.

    Exact-at-scale: ascending tie-band decomposition (the pareto-8020
    machinery mirrored): per (nation, cents) band, the exclusive prefix
    count c_prev and spend t_prev below it (coarse $1000 bands, then
    exact cents — all windows keyed and band-bounded); the bottom-m
    cumulative spend is t_prev + (m − c_prev)·cents at the band
    containing ascending rank m (ties interchangeable — all band
    members spend the same), with m = ⌈k·n/10⌉ joined from a literal
    10-row decile grid.

    Determinism: integer cents; DECIMAL(38,0)/HUGEINT widening; the
    share is ONE shared floor(double) with VARCHAR-routed oracle casts
    past 2^53; m is positive-integer ceil by (a+9) floor-div 10.

    Scale (100 TB): the fact collapses to customer grain once (shared
    customer_spend_cents); everything after runs at band grain × a
    10-row broadcast grid."""
    cust = customer_spend_cents(spark, sf_dir)
    fine = cust.groupBy(
        "nation",
        F.expr(f"cents DIV {GINI_COARSE_CENTS}").alias("coarse"),
        "cents",
    ).agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    from merl_etl_spark.lineage import cut_lineage

    fine = cut_lineage(fine, eager=False)  # consumers: coarse + ranked + tot
    coarse = fine.groupBy("nation", "coarse").agg(
        F.sum("n_b").cast("long").alias("n_c"),
        F.sum(F.expr("CAST(n_b AS DECIMAL(38,0)) * cents")).alias("t_c"),
    )
    w_coarse = (
        Window.partitionBy("nation")
        .orderBy("coarse")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    coarse_cum = coarse.select(
        "nation",
        "coarse",
        F.coalesce(F.sum("n_c").over(w_coarse), F.lit(0)).alias("c_below"),
        F.coalesce(
            F.sum("t_c").over(w_coarse), F.lit(0).cast("decimal(38,0)")
        ).alias("t_below"),
    )
    w_fine = (
        Window.partitionBy("nation", "coarse")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = fine.join(coarse_cum, ["nation", "coarse"]).select(
        "nation",
        "cents",
        "n_b",
        (
            F.col("c_below")
            + F.coalesce(F.sum("n_b").over(w_fine), F.lit(0))
        ).alias("c_prev"),
        (
            F.col("t_below")
            + F.coalesce(
                F.sum(F.expr("CAST(n_b AS DECIMAL(38,0)) * cents")).over(w_fine),
                F.lit(0).cast("decimal(38,0)"),
            )
        ).alias("t_prev"),
    )
    tot = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0))")).alias("total"),
    )
    grid = spark.range(1, 11).select(F.col("id").alias("decile"))
    deciles = tot.crossJoin(F.broadcast(grid)).select(
        "nation",
        "decile",
        "n",
        "total",
        F.expr("CAST((decile * n + 9) DIV 10 AS BIGINT)").alias("m"),
    )
    # the band containing ascending rank m: c_prev < m <= c_prev + n_b
    # (the 10-rows-per-nation decile grid broadcasts; bands never do)
    return (
        ranked.join(F.broadcast(deciles), "nation")
        .where(
            (F.col("c_prev") < F.col("m"))
            & (F.col("m") <= F.col("c_prev") + F.col("n_b"))
        )
        .selectExpr(
            "nation",
            "CAST(decile AS BIGINT) AS decile",
            "m",
            """CAST(floor(CAST(t_prev + CAST(m - c_prev AS DECIMAL(38,0))
                               * cents AS DOUBLE)
                          * CAST(1000000 AS DOUBLE)
                          / CAST(total AS DOUBLE)) AS BIGINT)
               AS cum_share_ppm""",
        )
    )


# ---------------------------------------------------------------------------
# round-14 wave 2: the TPC-H exists-semi and two-way conditional shapes
# (Q4 / Q12 analogs — the fixture lineitem has no commit/receipt dates or
# ship modes, so lateness is defined against the order date and the ship
# mode dimension becomes the measured delay bucket; the PLAN shapes —
# correlated-EXISTS-as-semi-join and a large/large join feeding a two-way
# conditional count — are the point)
# ---------------------------------------------------------------------------


@register(
    "analytics-order-priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def analytics_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: orders placed in one quarter
    that had at least one LATE line (shipped >90 days after the order
    date — the fixture's stand-in for receipt>commit), counted per
    priority class.  The correlated EXISTS is expressed as a LEFT SEMI
    join whose condition mixes the equi key with the cross-table date
    predicate — Spark keeps the equi key as the shuffle hash key and
    evaluates the date comparison as a post-join filter, so this stays a
    hash join, never a nested loop.

    Scale (100 TB): the quarter filter prunes orders before the join
    (predicate pushdown to the parquet scan); the semi join shuffles on
    orderkey only and short-circuits per matching order (no fan-out);
    the final agg is 5 groups.  Reference shape: merlin_etl.py has no
    multi-table SQL — this is §2.H-beyond-reference breadth."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "analytics-ship-delay-priority",
    oracle="""
    SELECT CASE
             WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN '00-30'
             WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 60 THEN '31-60'
             WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN '61-90'
             ELSE '90+'
           END AS delay_bucket,
           count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def analytics_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style shipping check: one year of lineitems joined to
    their orders, bucketed by measured ship delay (the fixture's stand-in
    for ship mode), with a two-way conditional count splitting
    urgent/high priorities from the rest — the classic
    sum(CASE)-twice-over-one-join shape.

    Determinism: counts only.  count(CASE WHEN..THEN 1 END) on the
    DuckDB side because SUM(int) there is HUGEINT (dtype gate), while
    Spark's F.count(when(..)) is long on both.

    Scale (100 TB): the shipdate year prunes at the scan; one shuffle
    join on orderkey (both sides large — sort-merge under AQE); 4 output
    groups via map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff("l_shipdate", "o_orderdate")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "delay_bucket",
            F.when(delay <= 30, "00-30")
            .when(delay <= 60, "31-60")
            .when(delay <= 90, "61-90")
            .otherwise("90+"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# round-14 wave 3: the TPC-H bidirectional-pair and profit-star shapes
# (Q7 / Q9 analogs — the fixture has no partsupp, so Q9's supply cost is a
# deterministic fraction of p_retailprice; the plan shapes — a 5-way star
# with a symmetric nation-pair disjunction, and a part-filtered profit
# star grouped by (nation, year) — are the point)
# ---------------------------------------------------------------------------

_TRAFFIC_NATIONS = ("NATION_3", "NATION_7")


def _profit_amount_spark() -> "F.Column":
    """Per-line profit rev−cost with PINNED decimal scales (the
    net_revenue rule): cost = p_retailprice · l_quantity · 0.1 (the
    fixture's synthetic supply cost — no partsupp table), every
    intermediate held at explicit width so Spark's and DuckDB's decimal
    growth rules cannot diverge.  2dp·int·1dp = 3dp exact, so the
    (·,18)→(19,12) reductions drop only zeros."""
    cost = (
        (
            F.col("p_retailprice").cast("decimal(12,6)")
            * F.col("l_quantity").cast("decimal(12,6)")
        ).cast("decimal(19,12)")
        * F.lit("0.1").cast("decimal(7,6)")
    ).cast("decimal(19,12)")
    return (net_revenue_spark() - cost).cast("decimal(38,12)")


def _profit_amount_duck(li: str = "l.", p: str = "p.") -> str:
    """DuckDB twin of _profit_amount_spark."""
    return (
        f"CAST({net_revenue_duck(li)}"
        f" - CAST(CAST(CAST({p}p_retailprice AS DECIMAL(12,6))"
        f"        * CAST({li}l_quantity AS DECIMAL(12,6)) AS DECIMAL(19,12))"
        f"   * CAST(0.1 AS DECIMAL(7,6)) AS DECIMAL(19,12))"
        f" AS DECIMAL(38,12))"
    )


@register(
    "analytics-nation-traffic",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM({net_revenue_duck('l.')}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = '{_TRAFFIC_NATIONS[0]}' AND cn.n_name = '{_TRAFFIC_NATIONS[1]}')
       OR (sn.n_name = '{_TRAFFIC_NATIONS[1]}' AND cn.n_name = '{_TRAFFIC_NATIONS[0]}')
    GROUP BY 1, 2, 3
    """,
)
def analytics_nation_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: discounted revenue flowing between
    one nation PAIR in both directions, by supplier nation × customer
    nation × ship year.  Five-way star with a symmetric disjunctive
    filter across the two nation dimensions.

    Scale (100 TB): both nation joins BROADCAST (25 rows) so the
    nation-name filter is applied while the data is still
    fact-partitioned; the only shuffles are lineitem⋈orders and
    orders⋈customer on their keys.  Filtering the broadcast nation lists
    to the pair BEFORE joining (inner join on the 2-row dimension) prunes
    ~92% of fact rows at the earliest possible stage instead of post-hoc.
    Revenue is the shared exact-decimal net_revenue pair, rounded at
    decimal grain then emitted as double."""
    a, b = _TRAFFIC_NATIONS
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(a, b)
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.round(F.sum(net_revenue_spark()), 2).cast("double").alias("revenue"))


@register(
    "analytics-product-profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM({_profit_amount_duck()}), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def analytics_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit: for every part whose name
    matches a token, line profit (revenue minus a synthetic supply cost —
    the fixture has no partsupp) aggregated by supplier nation × order
    year.  The classic profit star: fact table joined to four dimensions
    with a selective pattern filter on one of them.

    Scale (100 TB): the p_name LIKE filter reduces part BEFORE its join
    (Catalyst pushes it below the join; the filtered dimension then
    qualifies for AQE broadcast at runtime sizes), nation broadcasts
    explicitly, and the two fact-side shuffles (partkey, orderkey) carry
    only matching lines.  Profit math is a single shared exact-decimal
    expression pair (_profit_amount_spark/_duck)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(
        F.round(F.sum(_profit_amount_spark()), 2).cast("double").alias("sum_profit")
    )


# ---------------------------------------------------------------------------
# round-14 wave 4: the TPC-H exists+anti and scalar-threshold-anti shapes
# (Q21 / Q22 analogs — lateness is ship>order+90d as in wave 2, and Q22's
# country-code phone prefix becomes the nation dimension; the plan shapes —
# one fact scanned three ways with EXISTS and NOT EXISTS against itself,
# and an exact scalar threshold feeding an anti join — are the point)
# ---------------------------------------------------------------------------

_WAITING_LATE_DAYS = 90
_IDLE_CUTOFF = "1999-01-01"


@register(
    "analytics-supplier-waiting",
    oracle=f"""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL {_WAITING_LATE_DAYS} DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL {_WAITING_LATE_DAYS} DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def analytics_supplier_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers-who-kept-orders-waiting: for finished
    orders, count each supplier's late lines where at least one OTHER
    supplier shared the order (EXISTS) but no other supplier was also
    late (NOT EXISTS) — i.e. this supplier alone held the order up.  The
    fact table is consumed three ways: as the probe, as the EXISTS
    witness (left-semi), and as the NOT-EXISTS witness (left-anti), both
    witness joins keyed on orderkey with the supplier-differs predicate
    evaluated post-hash.

    Scale (100 TB): the orderstatus filter prunes orders at the scan;
    all three lineitem passes shuffle on the SAME key (orderkey), so AQE
    reuses the exchange; the semi/anti joins short-circuit per order.
    No driver-side anything; output ≤ |supplier| rows, totally ordered
    (numwait DESC, unique name) under TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_WAITING_LATE_DAYS} DAY")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("w_orderkey"), F.col("l_suppkey").alias("w_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    sole_blocker = (
        late.join(
            l2,
            (F.col("w_orderkey") == F.col("l_orderkey"))
            & (F.col("w_suppkey") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("x_orderkey") == F.col("l_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_blocker.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@register(
    "analytics-idle-customers",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s,
             count(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           count(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,2))
                AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey, stats
    WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * stats.cnt > stats.s
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_IDLE_CUTOFF} 00:00:00'
      )
    GROUP BY 1
    """,
)
def analytics_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style global-sales-opportunity: customers whose balance
    beats the mean positive balance but who placed no order since the
    cutoff, counted and totalled per nation (the fixture's stand-in for
    the phone country code).  Scalar-aggregate threshold + anti join.

    Determinism: the mean comparison is rewritten exactly —
    ``bal > sum/cnt  ⟺  bal·cnt > sum`` (cnt > 0) — so no double
    division ever happens; both engines compare exact decimals and no
    boundary customer can flip on a ulp.

    Scale (100 TB): the 1-row (sum, cnt) aggregate broadcasts (the
    BNLJ-walker's 1-row-global-aggregate marker); the anti join shuffles
    on custkey against date-pruned orders; output is ≤25 nations."""
    cust = load_table(spark, sf_dir, "customer")
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        dec_sum(F.col("c_acctbal")).alias("s"),
        F.count(F.lit(1)).alias("cnt"),
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _IDLE_CUTOFF)
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = cust.crossJoin(F.broadcast(stats)).filter(
        F.col("c_acctbal").cast(DEC) * F.col("cnt") > F.col("s")
    )
    idle = rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        idle.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# round-14 wave 5: the TPC-H distinct-count-grid and having-semi shapes
# (Q16 / Q18 analogs — supplier relationships come from lineitem rather
# than the absent partsupp table, and the excluded-supplier complaint
# filter becomes the negative-balance flag; the plan shapes — a grouped
# COUNT(DISTINCT) over an anti-joined fact, and a HAVING-qualified
# aggregate feeding a semi join back into the detail — are the point)
# ---------------------------------------------------------------------------

_BREADTH_SIZES = (1, 5, 9, 14, 23, 36, 45, 49)
_LARGE_ORDER_QTY = 300


@register(
    "analytics-parts-supplier-breadth",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN ({", ".join(str(s) for s in _BREADTH_SIZES)})
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def analytics_parts_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier breadth: how many DISTINCT suppliers have
    shipped each (brand, type, size) combination, excluding one brand,
    one type, and suppliers in the bad-standing list (negative balance —
    the fixture's stand-in for the complaints filter).  The NOT IN is an
    anti join against a tiny derived dimension.

    Scale (100 TB): part filters prune before the fact join (and the
    filtered part side qualifies for AQE broadcast); the bad-supplier
    list broadcasts for the anti join; COUNT(DISTINCT suppkey) expands
    to the two-phase distinct aggregate — partial distinct per
    partition, then one shuffle on the group keys.  Output is the small
    brand×type×size grid."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(*_BREADTH_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "analytics-large-orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,0))
                AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > {_LARGE_ORDER_QTY}
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def analytics_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers: orders whose total line
    quantity clears a threshold (the HAVING-qualified aggregate), semi-
    joined back into the order/customer/lineitem detail, re-aggregated
    per order, top 100 by total price.  The two-pass shape — aggregate
    to find qualifying keys, then rejoin the detail — is the classic
    Q18 plan.

    Determinism: quantities are integral, so the exact decimal sum is
    emitted as BIGINT; orderdate formats as a string; ordering is total
    (totalprice DESC then unique orderkey).

    Scale (100 TB): both lineitem passes and the order join shuffle on
    orderkey (AQE exchange reuse); the qualifying-key set is tiny
    (~0.2% of orders) so the IN becomes a broadcastable semi join at
    runtime; top-100 runs as TakeOrderedAndProject — no global sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum(F.col("l_quantity")).alias("q"))
        .filter(F.col("q") > _LARGE_ORDER_QTY)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(
            dec_sum(F.col("l_quantity"))
            .cast("decimal(38,0)")
            .cast("long")
            .alias("total_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# round-14 wave 6: the TPC-H max-of-aggregate, min-per-group-tie-keep, and
# nested-agg-threshold-semi shapes (Q15 / Q2 / Q20 analogs — there is no
# partsupp or revenue view in the fixture, so supplier cost is the minimum
# observed line price and "available quantity" is the supplier's shipped
# share of a part; the plan shapes — aggregate ⟶ global-max join-back,
# two-level min with tie-keeping equality join-back, and an aggregate
# threshold chain feeding a semi join — are the point)
# ---------------------------------------------------------------------------

_TOP_SUPP_QUARTER = ("1996-01-01", "1996-04-01")
_MIN_COST_SIZE = 15
_MIN_COST_TYPE = "STANDARD"
_EXCESS_YEAR = ("1997-01-01", "1998-01-01")
_EXCESS_NATION = "NATION_5"


@register(
    "analytics-top-supplier",
    oracle=f"""
    WITH revenue AS MATERIALIZED (
      SELECT l_suppkey, SUM({net_revenue_duck()}) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_TOP_SUPP_QUARTER[0]} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_TOP_SUPP_QUARTER[1]} 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(CAST(ROUND(r.total, 2) AS DECIMAL(38,2)) AS DOUBLE)
             AS total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total = (SELECT max(total) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def analytics_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: quarterly net revenue per supplier,
    keeping every supplier that achieves the global maximum (the
    aggregate ⟶ scalar-max ⟶ equality-join-back shape Q15 writes as a
    view + subquery).  Revenue totals are exact decimals end to end, so
    the max-equality cannot be split by a double ulp and ties survive
    identically in both engines.

    Scale (100 TB): the quarter filter prunes the fact scan; one shuffle
    on suppkey at supplier cardinality; the 1-row max aggregate
    broadcasts back over the per-supplier totals (the BNLJ walker's
    1-row-global-aggregate marker); supplier names broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TOP_SUPP_QUARTER[0])
        & (F.col("l_shipdate") < _TOP_SUPP_QUARTER[1])
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(net_revenue_spark()).alias("total"))
    best = rev.agg(F.max("total").alias("best"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total") == F.col("best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total"), 2)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "analytics-min-cost-supplier",
    oracle=f"""
    WITH cost AS MATERIALIZED (
      SELECT l.l_partkey, l.l_suppkey,
             min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cost_cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size = {_MIN_COST_SIZE} AND p.p_type = '{_MIN_COST_TYPE}'
      GROUP BY 1, 2
    ), floor_cost AS MATERIALIZED (
      SELECT l_partkey, min(cost_cents) AS min_cents
      FROM cost GROUP BY 1
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation,
           c.l_partkey AS p_partkey, p.p_brand, c.cost_cents
    FROM cost c
    JOIN floor_cost f
      ON f.l_partkey = c.l_partkey AND c.cost_cents = f.min_cents
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_acctbal DESC, s.s_name, p_partkey
    LIMIT 100
    """,
)
def analytics_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier: for every part in one
    size/type slice, the supplier(s) whose observed unit price equals the
    part's minimum (two-level aggregate, then a tie-KEEPING equality
    join-back — the correlated MIN subquery shape), decorated with
    supplier standing and nation, top-100 by account balance.

    Determinism: prices compare as integer cents (round(price*100) is
    exactly representable; no cross-engine double-min drift); ordering
    (acctbal DESC, name, partkey) is total because each (supplier, part)
    pair appears once post-aggregate.

    Scale (100 TB): the part slice filters ~1/300 of parts and
    broadcasts; the fact shuffles once on partkey for both aggregation
    levels (same key — AQE reuses the exchange for the join-back);
    supplier and nation broadcast; TakeOrderedAndProject caps output."""
    part_f = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_size") == _MIN_COST_SIZE)
            & (F.col("p_type") == _MIN_COST_TYPE)
        )
        .select("p_partkey", "p_brand")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    cost = (
        li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey", "p_brand")
        .agg(F.min("cents").alias("cost_cents"))
    )
    floor_cost = cost.groupBy(F.col("l_partkey").alias("f_partkey")).agg(
        F.min("cost_cents").alias("min_cents")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cost.join(
            floor_cost,
            (F.col("l_partkey") == F.col("f_partkey"))
            & (F.col("cost_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            "cost_cents",
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "analytics-excess-suppliers",
    oracle=f"""
    WITH shipped AS MATERIALIZED (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_EXCESS_YEAR[0]} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_EXCESS_YEAR[1]} 00:00:00'
      GROUP BY 1, 2
    ), part_total AS MATERIALIZED (
      SELECT l_partkey, CAST(SUM(sq) AS DECIMAL(38,6)) AS tq
      FROM shipped GROUP BY 1
    )
    SELECT s.s_name, count(*) AS dominated_parts
    FROM shipped sh
    JOIN part_total pt ON pt.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE 2 * sh.sq > pt.tq
      AND n.n_name = '{_EXCESS_NATION}'
    GROUP BY 1
    ORDER BY 1
    """,
)
def analytics_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style excess-share suppliers: suppliers in one nation
    who shipped MORE THAN HALF of a part's total quantity in a year (the
    nested aggregate-over-aggregate threshold Q20 writes as availqty >
    0.5·sum), with how many parts each dominates.  The chain — keyed
    aggregate, re-aggregate on a prefix of the same key, threshold join
    — is the shape; the half-share test is 2·sq > tq on EXACT decimal
    sums (dec_sum — not an integer cast, which would silently truncate
    vs round differently across engines on a non-integral quantity), no
    division anywhere.

    Scale (100 TB): the year prunes the scan; both aggregates and the
    threshold join shuffle on partkey(-prefixed) keys; the nation filter
    reduces supplier to a broadcastable slice; output ≤ |supplier|."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _EXCESS_YEAR[0])
        & (F.col("l_shipdate") < _EXCESS_YEAR[1])
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        dec_sum(F.col("l_quantity")).alias("sq")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum("sq").cast("decimal(38,6)").alias("tq")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _EXCESS_NATION
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
    return (
        shipped.join(part_total, F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.lit(2) * F.col("sq") > F.col("tq"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("dominated_parts"))
        .orderBy("s_name")
    )
