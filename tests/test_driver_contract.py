"""Driver-contract invariants: the 50-slot graded gate must not drift by
accident (the driver grades the FIRST 50 of queries() in order), every
registered query must carry an oracle or be an explicit rows-only
exception, and the modules must import without a SparkContext."""

from __future__ import annotations

import __spark_entry__ as E

#: rows-only by design: none left — round 9 graded the last one
#: (x_approx_distinct now asserts HLL bounded error against DuckDB's exact
#: distinct).  Keeping the empty set keeps the contract honest: deleting an
#: oracle now FAILS this test instead of silently degrading a gate.
ROWS_ONLY: set[str] = set()


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


def test_sign_bucket_oracle_floor_holds_at_graded_scales():
    """The five sign-bucket oracles hardcode BUCKET_DIMS-bit buckets;
    adaptive_bucket_dims only matches them while every graded corpus stays
    under TARGET_BUCKET_OCCUPANCY * 2**BUCKET_DIMS vectors.  A larger
    fixture must fail HERE, loudly, not as five silent hash mismatches."""
    import duckdb

    from kafka_journal_spark.functions.similarity import (
        BUCKET_DIMS,
        TARGET_BUCKET_OCCUPANCY,
    )

    cap = TARGET_BUCKET_OCCUPANCY * (1 << BUCKET_DIMS)
    for sf in ("sf0.001", "sf0.01"):
        n = duckdb.sql(
            f"SELECT count(*) FROM '/root/testdata/{sf}/embeddings.parquet'"
        ).fetchone()[0]
        assert n <= cap, (
            f"{sf} has {n} embeddings > {cap}: adaptive_bucket_dims will "
            "exceed the BUCKET_DIMS floor and diverge from the static "
            "sign-bucket oracles — regenerate the oracles or raise the floor"
        )
