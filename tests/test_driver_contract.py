"""Driver-contract invariants: the 50-slot graded gate must not drift by
accident (the driver grades the FIRST 50 of queries() in order), every
registered query must carry an oracle or be an explicit rows-only
exception, and the modules must import without a SparkContext."""

from __future__ import annotations

import __spark_entry__ as E

#: rows-only by design: inherently engine-specific approximations
ROWS_ONLY = {"x_approx_distinct"}


def test_gate_window_is_exactly_the_pinned_fifty():
    gate = list(E.queries())
    assert len(gate) == 50
    assert gate == E.GATE_ORDER  # insertion order IS the graded order


def test_every_query_has_an_oracle_or_is_declared_rows_only():
    qs = {**E.queries(), **E.extra_queries()}
    oracles = {**E.oracle_sql(), **E.extra_oracle_sql()}
    missing = set(qs) - set(oracles) - ROWS_ONLY
    assert not missing, f"queries without an oracle: {sorted(missing)}"
    stray = set(oracles) - set(qs)
    assert not stray, f"oracles without a query: {sorted(stray)}"


def test_gate_and_extras_do_not_overlap():
    gate, extras = set(E.queries()), set(E.extra_queries())
    assert not (gate & extras)
    assert len(gate | extras) >= 123  # the round-6 surface floor
