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


# ---------------------------------------------------------------------------
# wave 6: Q15/Q2/Q20-shaped join-backs — pandas replays
# ---------------------------------------------------------------------------


def test_top_supplier_decimal_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _TOP_SUPP_QUARTER,
        analytics_top_supplier,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    li = li[
        (li.l_shipdate >= pd.Timestamp(_TOP_SUPP_QUARTER[0]))
        & (li.l_shipdate < pd.Timestamp(_TOP_SUPP_QUARTER[1]))
    ]
    rev: dict = {}
    for r in li.itertuples():
        rev[r.l_suppkey] = rev.get(r.l_suppkey, 0) + _d(r.l_extendedprice) * (
            1 - _d(r.l_discount)
        )
    best = max(rev.values())
    names = dict(zip(s.s_suppkey, s.s_name))
    expect = sorted(
        (k, names[k], float(round(v, 2))) for k, v in rev.items() if v == best
    )
    got = [
        (r.s_suppkey, r.s_name, r.total_revenue)
        for r in analytics_top_supplier(spark, sf_dir).collect()
    ]
    assert got == expect


def test_min_cost_supplier_pandas_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _MIN_COST_SIZE,
        _MIN_COST_TYPE,
        analytics_min_cost_supplier,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    p = p[(p.p_size == _MIN_COST_SIZE) & (p.p_type == _MIN_COST_TYPE)]
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    m["cents"] = (m.l_extendedprice * 100).round().astype("int64")
    cost = (
        m.groupby(["l_partkey", "l_suppkey", "p_brand"])
        .cents.min()
        .reset_index(name="cost_cents")
    )
    floor = cost.groupby("l_partkey").cost_cents.min().rename("min_cents")
    keep = cost.join(floor, on="l_partkey")
    keep = keep[keep.cost_cents == keep.min_cents]
    keep = keep.merge(s, left_on="l_suppkey", right_on="s_suppkey").merge(
        n, left_on="s_nationkey", right_on="n_nationkey"
    )
    rows = sorted(
        (
            (r.s_acctbal, r.s_name, r.n_name, r.l_partkey, r.p_brand, r.cost_cents)
            for r in keep.itertuples()
        ),
        key=lambda t: (-t[0], t[1], t[3]),
    )[:100]
    got = [
        (r.s_acctbal, r.s_name, r.nation, r.p_partkey, r.p_brand, r.cost_cents)
        for r in analytics_min_cost_supplier(spark, sf_dir).collect()
    ]
    assert got == rows


def test_excess_suppliers_pandas_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.analytics import (
        _EXCESS_NATION,
        _EXCESS_YEAR,
        analytics_excess_suppliers,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    li = li[
        (li.l_shipdate >= pd.Timestamp(_EXCESS_YEAR[0]))
        & (li.l_shipdate < pd.Timestamp(_EXCESS_YEAR[1]))
    ]
    li["q"] = li.l_quantity.astype("int64")
    sp = li.groupby(["l_suppkey", "l_partkey"]).q.sum().reset_index(name="sq")
    tot = sp.groupby("l_partkey").sq.sum().rename("tq")
    sp = sp.join(tot, on="l_partkey")
    dom = sp[2 * sp.sq > sp.tq]
    nkey = n.loc[n.n_name == _EXCESS_NATION, "n_nationkey"].iloc[0]
    in_nation = s[s.s_nationkey == nkey]
    dom = dom.merge(in_nation, left_on="l_suppkey", right_on="s_suppkey")
    expect = sorted(
        (name, len(g)) for name, g in dom.groupby("s_name")
    )
    got = [
        (r.s_name, r.dominated_parts)
        for r in analytics_excess_suppliers(spark, sf_dir).collect()
    ]
    assert got == expect


# ---------------------------------------------------------------------------
# wave 7: layout skipping score + integer pitch tracker — pure replays
# ---------------------------------------------------------------------------


def test_pcm_autocorr_pure_python_replay(spark, sf_dir):
    """Per-doc plain-Python loops (no numpy) must reproduce the
    batch-vectorized production kernel exactly — argmax tie rule,
    zero-padding neutrality, and the ASCII filter included."""
    import pandas as pd

    from merl_etl_spark.operators.multimodal import (
        PITCH_MAX_LAG,
        PITCH_MIN_LAG,
        PITCH_PREFIX,
        mm_pcm_autocorr_pitch,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    expect = {}
    for r in docs.itertuples():
        if r.text is None:
            continue
        b = r.text.encode("utf-8", "surrogatepass")
        if len(b) != len(r.text) or not b:
            continue  # the ASCII byte==char filter
        s = [x - 128 for x in b[:PITCH_PREFIX]]
        m = len(s)
        best_ac, best_lag = None, None
        for k in range(PITCH_MIN_LAG, PITCH_MAX_LAG + 1):
            v = sum(s[i] * s[i + k] for i in range(max(m - k, 0)))
            if best_ac is None or v > best_ac:
                best_ac, best_lag = v, k
        zc = sum(1 for i in range(m - 1) if s[i] * s[i + 1] < 0)
        expect[r.doc_id] = (m, best_lag, best_ac, zc)
    got = {
        r.doc_id: (r.n_used, r.best_lag, r.best_ac, r.zero_crossings)
        for r in mm_pcm_autocorr_pitch(spark, sf_dir).collect()
    }
    assert got == expect


def test_layout_skipping_eval_pandas_replay(spark, sf_dir):
    import pandas as pd

    from merl_etl_spark.operators.profiling import (
        _SKIP_BANDS,
        _SKIP_BUCKETS,
        Z_BITS,
        Z_PREFIX_SHIFT,
        layout_skipping_eval,
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    u = ev.user_id.to_numpy()
    hr = (ev.ts.astype("datetime64[ns]").astype("int64") // 10**9) // 3600
    mn_u, mx_u, mn_h, mx_h = u.min(), u.max(), hr.min(), hr.max()

    def scale(v, mn, mx):
        return ((v - mn) * (1 << Z_BITS)) // (mx - mn + 1)

    def morton(x, y):
        z = 0
        for i in range(Z_BITS):
            z += (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
        return z

    import numpy as np

    x, y = scale(u, mn_u, mx_u), scale(hr.to_numpy(), mn_h, mx_h)
    zb = np.array([morton(a, b) for a, b in zip(x, y)]) >> Z_PREFIX_SHIFT
    lb = ((hr.to_numpy() - mn_h) * _SKIP_BUCKETS) // (mx_h - mn_h + 1)

    def stats(bucket):
        df = pd.DataFrame({"b": bucket, "u": u, "h": hr.to_numpy()})
        g = df.groupby("b")
        return pd.DataFrame(
            {
                "n": g.size(),
                "ulo": g.u.min(),
                "uhi": g.u.max(),
                "hlo": g.h.min(),
                "hhi": g.h.max(),
            }
        )

    layouts = {"zorder": stats(zb), "linear": stats(lb)}
    span_u, span_h = mx_u - mn_u + 1, mx_h - mn_h + 1
    expect = {}
    for ub in _SKIP_BANDS:
        for hb in _SKIP_BANDS:
            qulo, quhi = mn_u + span_u * ub // 8, mn_u + span_u * (ub + 1) // 8 - 1
            qhlo, qhhi = mn_h + span_h * hb // 8, mn_h + span_h * (hb + 1) // 8 - 1
            for name, st in layouts.items():
                hit = st[
                    (st.ulo <= quhi) & (st.uhi >= qulo)
                    & (st.hlo <= qhhi) & (st.hhi >= qhlo)
                ]
                if len(hit):
                    expect[(ub * 10 + hb, name)] = (len(hit), int(hit.n.sum()))
    got = {
        (r.query_id, r.layout): (r.touched_buckets, r.touched_rows)
        for r in layout_skipping_eval(spark, sf_dir).collect()
    }
    assert got == expect
    # the layout story itself: pure user-band queries (hb spans only an
    # eighth) — z-order must not touch MORE buckets than linear overall
    z_total = sum(v[0] for (q, n), v in got.items() if n == "zorder")
    l_total = sum(v[0] for (q, n), v in got.items() if n == "linear")
    assert z_total <= l_total


# ---------------------------------------------------------------------------
# wave 8: TextRank keywords — pure-Python fixed-point replay
# ---------------------------------------------------------------------------


def test_textrank_pure_python_replay(spark, sf_dir):
    """Plain-dict TextRank (tokenize, vocab cap, adjacency edges,
    3 integer fixed-point pagerank rounds) must reproduce the production
    composition exactly — including the vocab tiebreak, self-loop drop,
    and DIV floor arithmetic."""
    import pandas as pd

    from merl_etl_spark.operators.graph import DAMPING_PCT, ITERATIONS, SCALE
    from merl_etl_spark.operators.text_analysis import (
        TR_TOP,
        TR_VOCAB,
        text_textrank_keywords,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    df_count: dict = {}
    adj: dict = {}
    for r in docs.itertuples():
        if r.text is None:
            continue
        w = r.text.split(" ")
        for t in set(w):
            if t:
                df_count[t] = df_count.get(t, 0) + 1
        for a, b in zip(w[:-1], w[1:]):
            if a and b and a != b:
                key = (min(a, b), max(a, b))
                adj[key] = adj.get(key, 0) + 1
    vocab = set(
        t for t, _ in sorted(df_count.items(), key=lambda kv: (-kv[1], kv[0]))[:TR_VOCAB]
    )
    edges: dict = {}
    for (x, y), c in adj.items():
        if x in vocab and y in vocab:
            edges[(x, y)] = edges.get((x, y), 0) + c
            edges[(y, x)] = edges.get((y, x), 0) + c
    outw: dict = {}
    for (s, _), c in edges.items():
        outw[s] = outw.get(s, 0) + c
    nodes = sorted(outw)
    n = len(nodes)
    rank = {v: SCALE // n for v in nodes}
    base = ((100 - DAMPING_PCT) * SCALE) // (100 * n)
    for _ in range(ITERATIONS):
        sums = {v: 0 for v in nodes}
        for (s, d), c in edges.items():
            sums[d] += (rank[s] * c) // outw[s]
        rank = {v: base + (DAMPING_PCT * sums[v]) // 100 for v in nodes}
    expect = sorted(
        ((k, r / float(SCALE)) for k, r in rank.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:TR_TOP]
    got = [
        (r.keyword, r.pagerank)
        for r in text_textrank_keywords(spark, sf_dir).collect()
    ]
    assert got == expect


def test_autocorr_batch_hypothesis_property():
    """Hypothesis: the PRODUCTION batch kernel (autocorr_pitch_batch —
    the exact function pcm_autocorr_plan ships to executors) agrees with
    a per-doc pure-Python reference on arbitrary byte payloads,
    including empties, len<min-lag shorts, and constant runs (tie
    cases)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from merl_etl_spark.operators.multimodal import (
        PITCH_MAX_LAG,
        PITCH_MIN_LAG,
        PITCH_PREFIX,
        autocorr_pitch_batch,
    )

    def reference(payload: bytes):
        s = [x - 128 for x in payload[:PITCH_PREFIX]]
        m = len(s)
        best_ac, best_lag = None, None
        for k in range(PITCH_MIN_LAG, PITCH_MAX_LAG + 1):
            v = sum(s[i] * s[i + k] for i in range(max(m - k, 0)))
            if best_ac is None or v > best_ac:
                best_ac, best_lag = v, k
        zc = sum(1 for i in range(m - 1) if s[i] * s[i + 1] < 0)
        return (m, best_lag, best_ac, zc)

    payload_st = st.one_of(
        st.binary(max_size=PITCH_PREFIX + 40),
        st.builds(
            lambda b, n: b * n,
            st.binary(min_size=1, max_size=4),
            st.integers(min_value=1, max_value=80),
        ),  # periodic/constant runs exercise the first-max tie rule
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(payload_st, min_size=1, max_size=8))
    def prop(payloads):
        out = autocorr_pitch_batch(payloads, list(range(len(payloads))))
        got = (
            {}
            if out is None
            else {
                int(r.doc_id): (r.n_used, r.best_lag, r.best_ac, r.zero_crossings)
                for r in out.itertuples()
            }
        )
        expect = {
            i: reference(p) for i, p in enumerate(payloads) if len(p) > 0
        }
        assert got == expect

    prop()
