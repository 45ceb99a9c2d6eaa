"""Round-14 wave tests — semantic replays (pure Python/numpy) plus
production-plan drives for the r14 operators.

Wave 1: mm-png-decode — the real PNG codec (zlib inflate + CRC +
Sub/Up/Average/Paeth unfiltering) on the driver surface through the
production ``frame_sample_plan`` mapInPandas seam, pinned to a golden
frame table the DuckDB oracle restates as literals.
"""

from __future__ import annotations

import hashlib

import pytest

from merl_etl_spark.operators.media_codecs import (
    PngFormatError,
    png_scanline_frames,
)
from merl_etl_spark.operators.multimodal import (
    _PNG_GOLDEN,
    _PNG_SPECS,
    _png_fixture_rows,
    mm_png_decode,
)


def test_png_golden_replay_pure_python():
    """Re-derive the pinned golden table from the codec alone: encode the
    deterministic fixtures, decode them back, stride-2 sample, digest.
    A codec regression (filter recurrences, CRC, inflate) fails here
    before the driver or the oracle ever see it."""
    got = []
    for doc_id, payload in _png_fixture_rows():
        frames = png_scanline_frames(payload)
        w, h, ch, _ = _PNG_SPECS[doc_id]
        assert len(frames) == h
        assert all(len(f) == w * ch for f in frames)
        for fid in range(0, len(frames), 2):
            got.append(
                (doc_id, fid, len(frames[fid]), hashlib.md5(frames[fid]).hexdigest())
            )
    assert got == _PNG_GOLDEN


def test_png_fixtures_cover_every_filter_and_colour_type():
    """The fixture grid must keep exercising all five difference filters
    and all three supported colour types — someone trimming _PNG_SPECS
    would silently shrink what the driver-surface query proves."""
    channels = {ch for _, _, ch, _ in _PNG_SPECS}
    assert channels == {1, 3, 4}
    filters: set[int] = set()
    for _, h, _, choice in _PNG_SPECS:
        rows = choice if choice is not None else list(range(5))
        filters.update(rows[i % len(rows)] for i in range(h))
    assert filters == {0, 1, 2, 3, 4}


def test_png_corrupt_payload_raises():
    _, payload = _png_fixture_rows()[0]
    bad = bytearray(payload)
    bad[40] ^= 0xFF  # inside the IDAT chunk: CRC or inflate must fail
    with pytest.raises(PngFormatError):
        png_scanline_frames(bytes(bad))


def test_mm_png_decode_production_plan(spark, sf_dir):
    """Drive the REGISTERED query (the real mapInPandas plan, decoder in
    the task closure) and compare against the golden table."""
    rows = sorted(
        (r.doc_id, r.frame_id, r.frame_bytes, r.frame_md5)
        for r in mm_png_decode(spark, sf_dir).collect()
    )
    assert rows == _PNG_GOLDEN


# ---------------------------------------------------------------------------
# wave 2: Q4/Q12-shaped analytics — pandas replays of the production plans
# ---------------------------------------------------------------------------


def test_order_priority_pandas_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import analytics_order_priority

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = o[
        (o.o_orderdate >= pd.Timestamp("1996-07-01"))
        & (o.o_orderdate < pd.Timestamp("1996-10-01"))
    ]
    m = li.merge(
        o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    late_keys = set(
        m.loc[m.l_shipdate > m.o_orderdate + pd.Timedelta(days=90), "o_orderkey"]
    )
    expect = (
        o[o.o_orderkey.isin(late_keys)].groupby("o_orderpriority").size().to_dict()
    )
    got = {
        r.o_orderpriority: r.order_count
        for r in analytics_order_priority(spark, sf_dir).collect()
    }
    assert got == expect
    # the correlated EXISTS must compile to a semi hash join, never a
    # nested loop (the global BNLJ gate would also catch this)
    plan = analytics_order_priority(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ship_delay_priority_pandas_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import analytics_ship_delay_priority

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = li[
        (li.l_shipdate >= pd.Timestamp("1997-01-01"))
        & (li.l_shipdate < pd.Timestamp("1998-01-01"))
    ]
    m = li.merge(
        o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    delay = (m.l_shipdate - m.o_orderdate).dt.days
    m["delay_bucket"] = pd.cut(
        delay,
        bins=[-10**9, 30, 60, 90, 10**9],
        labels=["00-30", "31-60", "61-90", "90+"],
    ).astype(str)
    m["hi"] = m.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    expect = {
        b: (int(g.hi.sum()), int((~g.hi).sum()))
        for b, g in m.groupby("delay_bucket")
    }
    got = {
        r.delay_bucket: (r.high_line_count, r.low_line_count)
        for r in analytics_ship_delay_priority(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# wave 3: Q7/Q9-shaped stars — decimal-exact pandas replays (Decimal math,
# ROUND_HALF_UP quantize at 2dp — Python round() is banker's and would
# diverge on ties)
# ---------------------------------------------------------------------------


def _d(x) -> "Decimal":
    from decimal import Decimal

    return Decimal(repr(float(x)))


def test_nation_traffic_decimal_replay(spark, sf_dir):
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _TRAFFIC_NATIONS,
        analytics_nation_traffic,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_custkey"]]
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")[["s_suppkey", "s_nationkey"]]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey", "c_nationkey"]]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    m = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n.rename(columns={"n_name": "supp_nation"}), left_on="s_nationkey", right_on="n_nationkey")
        .merge(
            n.rename(columns={"n_name": "cust_nation", "n_nationkey": "cn_key"}),
            left_on="c_nationkey",
            right_on="cn_key",
        )
    )
    a, b = _TRAFFIC_NATIONS
    m = m[
        ((m.supp_nation == a) & (m.cust_nation == b))
        | ((m.supp_nation == b) & (m.cust_nation == a))
    ]
    acc: dict = {}
    for r in m.itertuples():
        key = (r.supp_nation, r.cust_nation, r.l_shipdate.year)
        rev = _d(r.l_extendedprice) * (1 - _d(r.l_discount))
        acc[key] = acc.get(key, Decimal(0)) + rev
    expect = {
        k: float(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        for k, v in acc.items()
    }
    got = {
        (r.supp_nation, r.cust_nation, r.l_year): r.revenue
        for r in analytics_nation_traffic(spark, sf_dir).collect()
    }
    assert got == expect


def test_product_profit_decimal_replay(spark, sf_dir):
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from merl_etl_spark.operators.analytics import analytics_product_profit

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    p = p[p.p_name.str.contains("red")][["p_partkey", "p_retailprice"]]
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")[["s_suppkey", "s_nationkey"]]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_orderdate"]]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    m = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(n, left_on="s_nationkey", right_on="n_nationkey")
    )
    acc: dict = {}
    for r in m.itertuples():
        key = (r.n_name, r.o_orderdate.year)
        amount = _d(r.l_extendedprice) * (1 - _d(r.l_discount)) - _d(
            r.p_retailprice
        ) * _d(r.l_quantity) * Decimal("0.1")
        acc[key] = acc.get(key, Decimal(0)) + amount
    expect = {
        k: float(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
        for k, v in acc.items()
    }
    got = {
        (r.nation, r.o_year): r.sum_profit
        for r in analytics_product_profit(spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# wave 4: Q21/Q22-shaped exists/anti plans — pandas replays
# ---------------------------------------------------------------------------


def test_supplier_waiting_pandas_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _WAITING_LATE_DAYS,
        analytics_supplier_waiting,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    o = o[o.o_orderstatus == "F"][["o_orderkey", "o_orderdate"]]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["late"] = m.l_shipdate > m.o_orderdate + pd.Timedelta(days=_WAITING_LATE_DAYS)
    by_order = m.groupby("l_orderkey")
    n_supp = by_order.l_suppkey.nunique()
    late_supp = m[m.late].groupby("l_orderkey").l_suppkey.nunique()
    counts: dict = {}
    for r in m[m.late].itertuples():
        multi = n_supp[r.l_orderkey] > 1
        sole = late_supp[r.l_orderkey] == 1
        if multi and sole:
            counts[r.l_suppkey] = counts.get(r.l_suppkey, 0) + 1
    names = dict(zip(s.s_suppkey, s.s_name))
    expect = sorted(
        ((names[k], v) for k, v in counts.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:100]
    got = [
        (r.s_name, r.numwait)
        for r in analytics_supplier_waiting(spark, sf_dir).collect()
    ]
    assert got == expect


def test_idle_customers_pandas_replay(spark, sf_dir):
    from decimal import Decimal

    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _IDLE_CUTOFF,
        analytics_idle_customers,
    )

    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    pos = [_d(x) for x in c.c_acctbal if x > 0]
    s, cnt = sum(pos), len(pos)
    active = set(o.loc[o.o_orderdate >= pd.Timestamp(_IDLE_CUTOFF), "o_custkey"])
    sel = c[
        c.apply(lambda r: _d(r.c_acctbal) * cnt > s, axis=1)
        & ~c.c_custkey.isin(active)
    ].merge(n, left_on="c_nationkey", right_on="n_nationkey")
    expect = {
        name: (len(g), float(sum(_d(x) for x in g.c_acctbal)))
        for name, g in sel.groupby("n_name")
    }
    got = {
        r.nation: (r.numcust, r.totacctbal)
        for r in analytics_idle_customers(spark, sf_dir).collect()
    }
    assert got == expect
    assert isinstance(s, Decimal)  # the threshold compare stayed exact


# ---------------------------------------------------------------------------
# wave 5: Q16/Q18-shaped distinct-grid and having-semi — pandas replays
# ---------------------------------------------------------------------------


def test_parts_supplier_breadth_pandas_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _BREADTH_SIZES,
        analytics_parts_supplier_breadth,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    bad = set(s.loc[s.s_acctbal < 0, "s_suppkey"])
    p = p[
        (p.p_brand != "Brand#3")
        & (p.p_type != "PROMO")
        & p.p_size.isin(_BREADTH_SIZES)
    ]
    m = li[~li.l_suppkey.isin(bad)].merge(
        p, left_on="l_partkey", right_on="p_partkey"
    )
    expect = {
        key: g.l_suppkey.nunique()
        for key, g in m.groupby(["p_brand", "p_type", "p_size"])
    }
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in analytics_parts_supplier_breadth(spark, sf_dir).collect()
    }
    assert got == expect


def test_large_orders_decimal_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _LARGE_ORDER_QTY,
        analytics_large_orders,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    qty = {}
    for r in li.itertuples():
        qty[r.l_orderkey] = qty.get(r.l_orderkey, 0) + _d(r.l_quantity)
    big = {k for k, v in qty.items() if v > _LARGE_ORDER_QTY}
    m = o[o.o_orderkey.isin(big)].merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    rows = sorted(
        (
            (
                r.c_name,
                r.c_custkey,
                r.o_orderkey,
                pd.Timestamp(r.o_orderdate).strftime("%Y-%m-%d"),
                _d(r.o_totalprice),
                int(qty[r.o_orderkey]),
            )
            for r in m.itertuples()
        ),
        key=lambda t: (-t[4], t[2]),
    )[:100]
    expect = [(a, b, c_, d, float(e), f) for a, b, c_, d, e, f in rows]
    got = [
        (r.c_name, r.c_custkey, r.o_orderkey, r.o_orderdate, float(r.o_totalprice), r.total_qty)
        for r in analytics_large_orders(spark, sf_dir).collect()
    ]
    assert got == expect
