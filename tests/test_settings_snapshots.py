"""Tests for the Settings KV, schema migration, and snapshot semantics."""

from __future__ import annotations

from kafka_journal_spark.operators.snapshots import (
    BUFFER_SIZE,
    SNAP_EVERY,
    SnapshotSelectionCriteria,
    load_snapshot,
    snapshots_table,
)
from kafka_journal_spark.sources.settings import (
    SCHEMA_VERSION_KEY,
    Settings,
    migrate_store,
)

SF = "/root/testdata/sf0.001"


def test_settings_crud(spark, tmp_path):
    s = Settings(spark, str(tmp_path))
    assert s.get("a") is None
    s.set("a", "1")
    s.set("b", "2")
    assert s.all() == {"a": "1", "b": "2"}
    s.set("a", "3")
    assert s.get("a") == "3"
    s.remove("b")
    assert s.all() == {"a": "3"}


def test_migrations_ordered_idempotent(spark, tmp_path):
    applied = []

    migs = [
        lambda sp, r: applied.append("m0"),
        lambda sp, r: applied.append("m1"),
    ]
    v = migrate_store(spark, str(tmp_path), migs)
    assert v == 1 and applied == ["m0", "m1"]
    # re-run: no-op
    v = migrate_store(spark, str(tmp_path), migs)
    assert v == 1 and applied == ["m0", "m1"]
    # new migration appended: only the suffix runs
    migs.append(lambda sp, r: applied.append("m2"))
    v = migrate_store(spark, str(tmp_path), migs)
    assert v == 2 and applied == ["m0", "m1", "m2"]
    assert Settings(spark, str(tmp_path)).get(SCHEMA_VERSION_KEY) == "2"


def test_ring_buffer_retention(spark):
    t = snapshots_table(spark, SF)
    rows = t.collect()
    # at most BUFFER_SIZE slots per journal, each slot occupied once
    per_key = {}
    for r in rows:
        per_key.setdefault((r.topic, r.id), []).append((r.buffer_nr, r.seq_nr))
    for key, slots in per_key.items():
        nrs = [b for b, _ in slots]
        assert len(nrs) == len(set(nrs)) and len(nrs) <= BUFFER_SIZE, key
        for b, seq in slots:
            assert seq % SNAP_EVERY == 0


def test_load_respects_criteria(spark):
    latest = {r.id: r.seq_nr for r in load_snapshot(spark, SF).collect()}
    bounded = {
        r.id: r.seq_nr
        for r in load_snapshot(spark, SF, SnapshotSelectionCriteria(max_seq_nr=20)).collect()
    }
    for k, seq in bounded.items():
        assert seq <= 20
        assert latest[k] >= seq
    # the newest snapshot always survives ring overwrites
    for k, seq in latest.items():
        assert seq == max(
            s for s in range(SNAP_EVERY, seq + 1, SNAP_EVERY)
        )
