"""Merge-on-read metajournal deltas + incremental catalog publication —
the write-path economics pins.

The reference upserts ONE Cassandra row per key per batch
(``MetaJournalStatements.scala:315-634``); the parquet equivalent must not
secretly rewrite a band's worth of neighbor keys per trigger.  These tests
pin the file-level contract: a 1-key batch APPENDS O(1) files and rewrites
NOTHING, the maintenance fold collapses deltas without changing any read,
and a catalog republication touches only the topics that were written.
"""

from __future__ import annotations

import glob
import os

import pytest
from conftest import append, delete, make_actions, purge
from pyspark.sql import functions as F

from kafka_journal_spark.sources.statestore import JournalStore
from kafka_journal_spark.streaming.replicator import replicate_batch


def _file_inventory(root: str) -> dict[str, float]:
    """path -> mtime for every parquet file under root (identity check:
    an untouched file keeps both its name and its mtime)."""
    out = {}
    for r, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def _read_state(store):
    return {
        (r.topic, r.id): (r.seq_nr, r.delete_to, r.record_id)
        for r in store.metajournal().collect()
    }


def test_one_key_batch_appends_one_file_rewrites_no_base(spark, tmp_path):
    store = JournalStore(spark, str(tmp_path / "s"))
    keys = [f"key-{i:03d}" for i in range(40)]
    replicate_batch(make_actions(spark, [append(k, 1) for k in keys]), store)
    assert store.fold_metajournal() != []  # deltas -> pure base
    meta = store._path("metajournal")
    before = _file_inventory(meta)

    replicate_batch(
        make_actions(spark, [append("key-000", 2)], offset_base=1000), store
    )
    after = _file_inventory(meta)

    # every pre-existing base file survives IDENTICALLY (no band rewrite)
    assert all(after.get(p) == mt for p, mt in before.items()), [
        p for p, mt in before.items() if after.get(p) != mt
    ]
    # and the append cost exactly one new delta file
    new = sorted(set(after) - set(before))
    assert len(new) == 1, new

    got = {r.id: r.seq_nr for r in store.metajournal().collect()}
    assert got["key-000"] == 2
    assert all(got[k] == 1 for k in keys[1:])


def test_fold_preserves_reads_and_drops_tombstones(spark, tmp_path):
    store = JournalStore(spark, str(tmp_path / "s"))
    replicate_batch(
        make_actions(spark, [append("a", 1), append("b", 1), append("c", 1)]),
        store,
    )
    replicate_batch(
        make_actions(
            spark,
            [append("a", 2), delete("b", 1), purge("c")],
            offset_base=100,
        ),
        store,
    )
    assert store._dirty_bands() != []
    before_state = _read_state(store)
    before_rows = {
        (r.id, r.seq_nr, r.offset) for r in store.read().collect()
    }
    assert ("journal", "c") not in before_state  # purge tombstoned the head

    folded = store.fold_metajournal()
    assert folded != []
    assert store._dirty_bands() == []
    assert _read_state(store) == before_state
    assert {
        (r.id, r.seq_nr, r.offset) for r in store.read().collect()
    } == before_rows
    # tombstones are physically gone: the raw files hold exactly the live
    # rows, once each, with no delta bookkeeping left
    raw = store._metajournal_phys()
    assert raw.filter(F.col("deleted").isNotNull()).count() == 0
    assert raw.filter(F.col("delta_seq").isNotNull()).count() == 0
    assert raw.count() == len(before_state)


def test_meta_health_reports_band_files_and_dirty(spark, tmp_path):
    store = JournalStore(spark, str(tmp_path / "s"))
    replicate_batch(make_actions(spark, [append("k", 1)]), store)
    h = {r.band: (r.n_files, r.dirty) for r in store.meta_health().collect()}
    assert h and all(d for _, d in h.values())
    store.fold_metajournal()
    h2 = {r.band: (r.n_files, r.dirty) for r in store.meta_health().collect()}
    assert h2 and not any(d for _, d in h2.values())


def test_fold_min_files_size_tiers(spark, tmp_path):
    """min_files gates the fold per band: below the threshold nothing is
    rewritten and the band stays dirty (still resolving on read)."""
    store = JournalStore(spark, str(tmp_path / "s"))
    replicate_batch(make_actions(spark, [append("k", 1)]), store)
    assert store.fold_metajournal(min_files=100) == []
    assert store._dirty_bands() != []
    assert {r.id: r.seq_nr for r in store.metajournal().collect()} == {"k": 1}
    assert store.fold_metajournal(min_files=1) != []
    assert store._dirty_bands() == []


def test_resolver_fast_path_skips_merge_when_folded(spark, tmp_path):
    """A fully folded store's metajournal() plans WITHOUT the
    last-write-wins resolution (the max_by hash-aggregate) — the
    merge-on-read tax is zero once deltas are folded (and O(dirty bands)
    before)."""
    store = JournalStore(spark, str(tmp_path / "s"))
    replicate_batch(make_actions(spark, [append("k", 1)]), store)
    dirty_plan = store.metajournal()._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in dirty_plan
    store.fold_metajournal()
    clean_plan = store.metajournal()._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in clean_plan and "HashAggregate" not in clean_plan


def _table_location(spark, table: str) -> str:
    row = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter(F.col("col_name") == "Location")
        .collect()
    )
    loc = row[0].data_type
    return loc[len("file:"):] if loc.startswith("file:") else loc


def test_second_instance_reads_deltas_and_folds(spark, tmp_path):
    """The delta bookkeeping (dirty bands, write stamps) lives in store
    ROOT tokens, not instance memory: a FRESH JournalStore over the same
    root resolves another instance's un-folded deltas, can fold them, and
    the first instance keeps reading correctly afterwards."""
    root = str(tmp_path / "s")
    a = JournalStore(spark, root)
    replicate_batch(make_actions(spark, [append("k", 1)]), a)
    replicate_batch(make_actions(spark, [append("k", 2)], offset_base=10), a)

    b = JournalStore(spark, root)
    assert b._dirty_bands() != []
    assert {r.id: r.seq_nr for r in b.metajournal().collect()} == {"k": 2}
    assert b.fold_metajournal() != []
    # A sees B's fold through the on-disk token — clean fast path, same rows
    assert a._dirty_bands() == []
    assert {r.id: r.seq_nr for r in a.metajournal().collect()} == {"k": 2}


def test_partial_catalog_publication_scopes_to_dirty_topics(spark, tmp_path):
    try:
        store = JournalStore(spark, str(tmp_path / "s"), catalog="t_partial")
        replicate_batch(
            make_actions(spark, [append("a1", 1), append("b1", 1, topic="other")]),
            store,
        )
        store.publish_catalog()
        assert store._catalog_live
        locs = {
            t: _table_location(spark, f"t_partial_{t}")
            for t in ("journal", "metajournal")
        }
        before = {t: _file_inventory(loc) for t, loc in locs.items()}

        # write to topic "journal" only -> catalog stale, "other" untouched
        replicate_batch(
            make_actions(spark, [append("a1", 2)], offset_base=100), store
        )
        assert not store._catalog_live
        assert store._dirty_catalog_topics() == ["journal"]
        store.publish_catalog()
        assert store._catalog_live

        for t, loc in locs.items():
            after = _file_inventory(loc)
            untouched = {
                p: mt for p, mt in before[t].items() if "topic=other" in p
            }
            assert untouched and all(
                after.get(p) == mt for p, mt in untouched.items()
            ), (t, untouched)

        # the catalog read path serves the merged state
        got = {
            (r.topic, r.id, r.seq_nr) for r in store.read().collect()
        }
        assert got == {
            ("journal", "a1", 1),
            ("journal", "a1", 2),
            ("other", "b1", 1),
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS t_partial_journal")
        spark.sql("DROP TABLE IF EXISTS t_partial_metajournal")


def test_partial_publication_drops_emptied_topic_partition(spark, tmp_path):
    """A topic whose rows all vanish (purge, then compaction) loses its
    catalog partition on the next publication instead of serving stale
    rows forever."""
    try:
        store = JournalStore(spark, str(tmp_path / "s"), catalog="t_gone")
        replicate_batch(
            make_actions(spark, [append("a", 1), append("b", 1, topic="other")]),
            store,
        )
        store.publish_catalog()
        replicate_batch(
            make_actions(spark, [purge("a")], offset_base=100), store
        )
        store.compact(["journal"])  # physically drops the purged rows
        store.publish_catalog()
        assert store._catalog_live
        assert store.read().filter(F.col("topic") == "journal").count() == 0
        assert {
            (r.id, r.seq_nr)
            for r in store.read().filter(F.col("topic") == "other").collect()
        } == {("b", 1)}
    finally:
        spark.sql("DROP TABLE IF EXISTS t_gone_journal")
        spark.sql("DROP TABLE IF EXISTS t_gone_metajournal")


def test_concurrent_write_survives_publication_dirty_reset(spark, tmp_path):
    """The publish-during-write race (round-8 advice): a writer pre-marks
    its topic dirty, a concurrent publication consumes the dirty token and
    scans BEFORE the writer's data lands, then the data lands.  The
    post-write mark must (a) keep that publication stale and (b) leave the
    topic dirty so the NEXT publication republishes it with the data —
    the old clear-at-the-end design erased the topic from the dirty set
    and the next publication no-op'd itself live over a stale catalog."""
    try:
        store = JournalStore(spark, str(tmp_path / "s"), catalog="t_race")
        replicate_batch(make_actions(spark, [append("a", 1)]), store)
        store.publish_catalog()
        assert store._catalog_live

        # interleave by hand: pre-mark fires, publication runs, THEN the
        # data lands and the post-mark fires (the exact window a
        # scheduler-thread publish_catalog hits against the replicator)
        rows = store.journal().filter(F.col("seq_nr") == 1).withColumn(
            "seq_nr", F.lit(2).cast("long")
        ).localCheckpoint(eager=True)
        store._mark_stale(["journal"])               # writer: pre-mark
        store.publish_catalog()                      # concurrent publication
        store._commit_append(                        # writer: data lands
            "journal",
            lambda: rows.write.mode("append")
            .partitionBy("topic")
            .parquet(store._path("journal")),
        )
        store._mark_stale(["journal"])               # writer: post-mark

        # the publication that raced the write must grade stale, and the
        # topic must still be dirty for the next one
        assert not store._catalog_live
        assert store._dirty_catalog_topics() == ["journal"]

        store.publish_catalog()
        assert store._catalog_live
        assert {
            (r.id, r.seq_nr) for r in store.read().collect()
        } == {("a", 1), ("a", 2)}
    finally:
        spark.sql("DROP TABLE IF EXISTS t_race_journal")
        spark.sql("DROP TABLE IF EXISTS t_race_metajournal")


def test_stale_catalog_with_empty_dirty_set_escalates_to_full_republish(
    spark, tmp_path
):
    """A stale epoch with an EMPTY dirty token is the lost-mark signature
    (crash between the publication's dirty reset and its epoch stamp):
    the next publication must treat the scope as unknown and republish
    everything rather than no-op itself live."""
    try:
        store = JournalStore(spark, str(tmp_path / "s"), catalog="t_lost")
        replicate_batch(make_actions(spark, [append("a", 1)]), store)
        store.publish_catalog()
        replicate_batch(
            make_actions(spark, [append("a", 2)], offset_base=100), store
        )
        # simulate the lost mark: epoch moved (write above) but the dirty
        # token was wiped without the epoch stamp
        import json

        store._write_token("_catalog_dirty", json.dumps([]))
        assert not store._catalog_live

        store.publish_catalog()
        assert store._catalog_live
        assert {(r.id, r.seq_nr) for r in store.read().collect()} == {
            ("a", 1),
            ("a", 2),
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lost_journal")
        spark.sql("DROP TABLE IF EXISTS t_lost_metajournal")


def test_wide_batch_takes_band_complete_path_and_leaves_no_debt(spark, tmp_path):
    """A batch touching >= half of all bands is a bulk load: it must land
    band-complete (no delta files, no dirty flags, zero merge-on-read debt
    for later batches) while producing exactly the same visible state the
    delta path would."""
    store = JournalStore(spark, str(tmp_path / "w"), meta_bands=4)
    keys = [f"key-{i:03d}" for i in range(64)]  # 64 segments -> all 4 bands
    replicate_batch(make_actions(spark, [append(k, 1) for k in keys]), store)

    assert store._dirty_bands() == []  # bulk load left the store folded
    meta = store._path("metajournal")
    # pure base: no file carries the delta bookkeeping columns
    phys = spark.read.parquet(meta)
    assert "delta_seq" not in phys.columns
    assert {r.id: r.seq_nr for r in store.metajournal().collect()} == {
        k: 1 for k in keys
    }

    # a second bulk batch merges idempotently (update half, keep half)
    replicate_batch(
        make_actions(spark, [append(k, 2) for k in keys[:32]], offset_base=1000),
        store,
    )
    assert store._dirty_bands() == []
    got = {r.id: r.seq_nr for r in store.metajournal().collect()}
    assert got == {k: (2 if k in set(keys[:32]) else 1) for k in keys}

    # a narrow batch afterwards still takes the delta path
    replicate_batch(
        make_actions(spark, [append("key-000", 3)], offset_base=2000), store
    )
    assert store._dirty_bands() != []
    got = {r.id: r.seq_nr for r in store.metajournal().collect()}["key-000"]
    assert got == 3
