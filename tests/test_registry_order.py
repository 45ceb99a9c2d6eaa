"""Registration-order invariant: the external driver oracles only the
first ~50 registered queries per round, so every query in the urgent
sweep tiers — churned since its last driver-green round, never checked,
or green only in round 2 — must land within that budget.  The order is
applied explicitly by registry._apply_sweep_priority (round 4); this
test pins both the mechanism and the budget."""

from __future__ import annotations

from merl_etl_spark.registry import QUERIES, SWEEP_DEFER, SWEEP_PRIORITY, load_all

load_all()

DRIVER_BUDGET = 50


def test_sweep_priority_entries_exist():
    # Membership first, so a renamed/removed query fails with its own
    # diagnostic instead of a ValueError from list.index (ADVICE r3 #5).
    missing = [q for q in SWEEP_PRIORITY + SWEEP_DEFER if q not in QUERIES]
    assert not missing, f"sweep lists name unregistered queries: {missing}"


def test_deferred_block_sits_just_past_the_budget():
    """The documented budget-triage overflow must register immediately
    after the prioritized block (first in line for the next round's
    sweep), and never overlap SWEEP_PRIORITY."""
    assert not set(SWEEP_DEFER) & set(SWEEP_PRIORITY)
    order = list(QUERIES)
    start = len([q for q in SWEEP_PRIORITY if q in QUERIES])
    assert order[start : start + len(SWEEP_DEFER)] == SWEEP_DEFER


def test_priority_queries_register_inside_driver_budget():
    order = list(QUERIES)
    late = {
        q: order.index(q) + 1
        for q in SWEEP_PRIORITY
        if q in QUERIES and order.index(q) >= DRIVER_BUDGET
    }
    assert not late, f"queries past the driver's ~{DRIVER_BUDGET}-query budget: {late}"


def test_priority_queries_lead_the_registry():
    # The prioritized block must be a strict prefix in listed order — a
    # silent reorder would quietly push churned queries out of the sweep.
    present = [q for q in SWEEP_PRIORITY if q in QUERIES]
    assert list(QUERIES)[: len(present)] == present
