"""bench.py must only name registered queries — a typo here would crash
the driver's per-round bench run."""

from __future__ import annotations


def test_headline_queries_are_registered():
    import bench
    from merl_etl_spark import registry

    registry.load_all()
    missing = [q for q in bench.HEADLINE if q not in registry.QUERIES]
    assert not missing, f"bench HEADLINE names unregistered queries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate HEADLINE entries"
