"""P8 end-to-end: the TTL job produces Purge actions that ride the normal
replication pipeline (PurgeExpired.scala semantics — expiry is not a direct
delete), and the purged journals disappear from the store."""

from __future__ import annotations

import datetime as dt

from conftest import append, make_actions

from kafka_journal_spark.sources.statestore import JournalStore
from kafka_journal_spark.streaming.replicator import replicate_batch


def test_expiry_purges_ride_the_pipeline(spark, tmp_path):
    store = JournalStore(spark, str(tmp_path / "ttl"))
    # two journals; journal "a" is expired (by whatever policy selected it)
    replicate_batch(
        make_actions(
            spark,
            [append("a", 1), append("a", 2), append("b", 1)],
        ),
        store,
    )
    assert {r.id for r in store.read().collect()} == {"a", "b"}

    # the TTL job emits purge control actions for the expired ids; they are
    # replicated exactly like client-produced purges (same fold, same
    # incarnation rotation) — nothing special-cased in the store
    expired_ids = ["a"]
    purge_actions = make_actions(
        spark,
        [dict(id=i, action_type="purge") for i in expired_ids],
        offset_base=10,
    )
    replicate_batch(purge_actions, store)

    assert {r.id for r in store.read().collect()} == {"b"}
    assert store.pointer("journal", "a") is None
    assert store.pointer("journal", "b") == 1
    # compaction physically removes the orphaned rows of "a"
    store.compact()
    remaining = {r.id for r in store.journal().collect()}
    assert remaining == {"b"}
