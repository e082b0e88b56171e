"""Config-driven read-integrity modes (reference ``Journal.scala:458-480``:
config chooses raise-vs-tolerate on seq_nr duplicates;
``EventualCassandra.scala:132-191``: orphan-event correlation toggle)."""

from __future__ import annotations

import pytest
from conftest import append, make_actions, purge

from kafka_journal_spark.operators.read import (
    apply_seq_nr_uniqueness,
    recovery_merge,
)
from kafka_journal_spark.sources.statestore import JournalConfig, JournalStore
from kafka_journal_spark.streaming.replicator import replicate_batch


@pytest.fixture()
def dup_store(spark, tmp_path):
    """A store whose journal holds a crash-replayed duplicate: seq 2 of key
    'a' delivered at two offsets."""
    store = JournalStore(spark, str(tmp_path / "dup"))
    acts = make_actions(
        spark,
        [append("a", 1), append("a", 2), append("a", 2), append("b", 1)],
    )
    replicate_batch(acts, store)
    return store


def test_ignore_keeps_first_delivery(dup_store):
    rows = dup_store.read().collect()  # default mode
    per = {(r.id, r.seq_nr): r.offset for r in rows}
    assert set(per) == {("a", 1), ("a", 2), ("b", 1)}
    assert per[("a", 2)] == 1  # first offset wins, replay dropped


def test_quarantine_excludes_every_copy(dup_store):
    cfg = JournalConfig(seq_nr_uniqueness="quarantine")
    rows = dup_store.read(config=cfg).collect()
    assert {(r.id, r.seq_nr) for r in rows} == {("a", 1), ("b", 1)}


def test_raise_fails_the_read(dup_store):
    cfg = JournalConfig(seq_nr_uniqueness="raise")
    with pytest.raises(Exception, match="duplicate seq_nr"):
        dup_store.read(config=cfg).collect()


def test_raise_is_silent_without_duplicates(spark, tmp_path):
    store = JournalStore(spark, str(tmp_path / "clean"))
    replicate_batch(make_actions(spark, [append("a", 1), append("a", 2)]), store)
    cfg = JournalConfig(seq_nr_uniqueness="raise")
    assert sorted(r.seq_nr for r in store.read(config=cfg).collect()) == [1, 2]


def test_unknown_mode_rejected(spark):
    df = make_actions(spark, [append("a", 1)])
    with pytest.raises(ValueError, match="seq_nr_uniqueness"):
        apply_seq_nr_uniqueness(df, "explode")


def test_correlation_toggle_exposes_orphans(spark, tmp_path):
    store = JournalStore(spark, str(tmp_path / "corr"))
    replicate_batch(make_actions(spark, [append("a", 1), append("a", 2)]), store)
    # purge rotates the incarnation; the pre-purge rows become orphans
    replicate_batch(
        make_actions(spark, [purge("a"), append("a", 1)], offset_base=10), store
    )

    on = [(r.seq_nr, r.offset) for r in store.read().collect()]
    assert on == [(1, 11)]  # correlation hides the orphaned incarnation

    cfg = JournalConfig(correlate_events_with_meta=False)
    off = {(r.seq_nr, r.offset) for r in store.read(config=cfg).collect()}
    # raw rows visible; the ignore-dedup then keeps the first offset per
    # seq_nr, which IS the orphan — exactly what recovery tooling wants
    assert off == {(1, 0), (2, 1)}


def test_recovery_merge_modes(spark):
    # offsets 0,1,2 -> split=1: the tail re-delivers seq 2 at offset 2
    acts = make_actions(spark, [append("a", 1), append("a", 2), append("a", 2)])

    default = {(r.seq_nr, r.offset) for r in recovery_merge(acts).collect()}
    assert default == {(1, 0), (2, 1)}

    quarantined = {
        (r.seq_nr, r.offset)
        for r in recovery_merge(acts, seq_nr_uniqueness="quarantine").collect()
    }
    assert quarantined == {(1, 0)}

    with pytest.raises(Exception, match="duplicate seq_nr"):
        recovery_merge(acts, seq_nr_uniqueness="raise").collect()


def test_same_offset_physical_replays_collapse_in_all_modes(spark):
    """A crash between journal append and pointer upsert re-appends rows
    with IDENTICAL offsets on replay.  Those are physical copies, not
    integrity violations (integrity_violations counts DISTINCT offsets):
    every mode must return each event once — 'quarantine' and 'raise'
    used to pass them straight through, doubling every event."""
    from kafka_journal_spark.operators.read import (
        apply_seq_nr_uniqueness,
        integrity_violations,
    )

    rows = [
        ("t", "a", 1, 0), ("t", "a", 1, 0),  # physical replay copies
        ("t", "a", 2, 1),
    ]
    df = spark.createDataFrame(rows, "topic string, id string, seq_nr long, offset long")
    assert integrity_violations(df).count() == 0  # not violations
    for mode in ("ignore", "quarantine", "raise"):
        got = sorted(
            (r.seq_nr, r.offset)
            for r in apply_seq_nr_uniqueness(df, mode).collect()
        )
        assert got == [(1, 0), (2, 1)], (mode, got)

    # a GENUINE violation (distinct offsets) still quarantines/raises
    bad = spark.createDataFrame(
        rows + [("t", "a", 1, 5)],
        "topic string, id string, seq_nr long, offset long",
    )
    assert integrity_violations(bad).count() == 1
    q = sorted(r.seq_nr for r in apply_seq_nr_uniqueness(bad, "quarantine").collect())
    assert q == [2]
    import pytest as _pytest

    with _pytest.raises(Exception, match="JournalError"):
        apply_seq_nr_uniqueness(bad, "raise").collect()
