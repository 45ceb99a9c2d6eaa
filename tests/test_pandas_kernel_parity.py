"""The numpy-kernel top-k must agree with the expression-based top-k:
identical neighbor sets per query, similarities equal to the kernel's
6-dp rounding grid (the kernel rounds before ranking so its full result
is driver-hash-comparable; the expression form stays unrounded)."""

from __future__ import annotations

import pytest

from merl_etl_spark.registry import QUERIES, load_all

load_all()


def test_pandas_topk_matches_expression_topk(spark, sf_dir):
    expr = {
        (r.query_id, r.rnk): (r.neighbor_id, r.cos_sim)
        for r in QUERIES["sim-topk-cosine"](spark, sf_dir).collect()
    }
    kern = {
        (r.query_id, r.rnk): (r.neighbor_id, r.cos_sim)
        for r in QUERIES["sim-topk-pandas"](spark, sf_dir).collect()
    }
    assert set(expr) == set(kern)
    for key, (nid, sim) in expr.items():
        knid, ksim = kern[key]
        assert knid == nid, f"{key}: neighbor {knid} != {nid}"
        # kernel rounds to 6 dp before ranking; half-ulp slack on the grid
        assert ksim == pytest.approx(sim, abs=5.1e-7)
