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


def test_sub_day_ttl_is_second_granular(spark, tmp_path):
    """A 12 h TTL must come due the same afternoon (ExpiryService.scala:53-76
    does seconds-level DURATION math) — day-granular rounding would either
    drop it to 0 or push it to the next date rollover."""
    from pyspark.sql import functions as F

    store = JournalStore(spark, str(tmp_path / "ttl12h"))
    acts = make_actions(
        spark,
        [
            dict(append("a", 1), expire_after_secs=12 * 3600),   # due 12:00:01
            dict(append("b", 1), expire_after_secs=20 * 3600),   # due 20:00:02
            append("c", 1),                                      # no TTL
        ],
    ).withColumn(
        "expire_after_secs",
        F.when(F.col("id") == "a", F.lit(12 * 3600))
        .when(F.col("id") == "b", F.lit(20 * 3600))
        .cast("long"),
    )
    replicate_batch(acts, store)

    heads = {r.id: r for r in store.metajournal().collect()}
    # conftest timestamps start 2024-01-01 00:00:00 + offset seconds
    assert heads["a"].expire_after_secs == 12 * 3600
    assert str(heads["a"].expire_on_ts) == "2024-01-01 12:00:00"
    assert str(heads["a"].expire_on) == "2024-01-01"
    assert str(heads["b"].expire_on_ts) == "2024-01-01 20:00:01"
    assert heads["c"].expire_after_secs is None

    # same-date, sub-day cutoff: 15:00 catches "a" but not "b"
    cut = F.lit("2024-01-01 15:00:00").cast("timestamp")
    due = (
        store.metajournal()
        .filter(F.col("expire_on") <= F.to_date(cut))
        .filter(F.col("expire_on_ts") <= cut)
    )
    assert [r.id for r in due.collect()] == ["a"]


def test_client_ttl_to_store_purge_end_to_end(spark, tmp_path):
    """The full TTL loop: a client append with expire_after_secs rides the
    log, replication lands it on the metajournal head, and run_ttl_purge
    purges due journals through the normal pipeline — idempotently."""
    from kafka_journal_spark.api import JournalClient

    c = JournalClient(spark, str(tmp_path / "ttl_e2e"))
    c.append("journal", "short", ["s1"], expire_after_secs=12 * 3600)
    c.append("journal", "long", ["l1"], expire_after_secs=10 * 86400)
    c.append("journal", "forever", ["f1"])
    c.replicate()

    heads = {r.id: r.expire_after_secs for r in c.store.metajournal().collect()}
    assert heads["short"] == 12 * 3600 and heads["long"] == 10 * 86400
    assert heads["forever"] is None

    # one day later: only the 12 h journal is due
    import datetime as dt

    now = (dt.datetime.utcnow() + dt.timedelta(days=1)).isoformat(sep=" ", timespec="seconds")
    assert c.ttl_purge(now) == 1
    assert {r.id for r in c.store.read().collect()} == {"long", "forever"}
    assert c.store.pointer("journal", "short") is None
    # purged head row is gone -> the job is idempotent
    assert c.ttl_purge(now) == 0
    # the purge rode the LOG: later appends get non-colliding offsets and
    # are not fenced out by the advanced pointer
    c.append("journal", "short", ["s2"])
    c.replicate()
    assert c.read("journal", "short") == [(1, "s2")]


def test_mass_expiry_is_one_log_write(spark, tmp_path):
    """A mass-expiry day must cost ONE log append + ONE replicate, not a
    per-key driver loop: every due journal's Purge action rides a single
    emitted batch with consecutive offsets."""
    from kafka_journal_spark.api import JournalClient

    c = JournalClient(spark, str(tmp_path / "ttl_mass"))
    n = 25
    for i in range(n):
        c.append("journal", f"k{i:03d}", [f"v{i}"], expire_after_secs=3600)
    c.append("journal", "keeper", ["kv"])
    c.replicate()

    emits = []
    orig_emit = c._emit

    def counting_emit(rows):
        emits.append(rows)
        return orig_emit(rows)

    c._emit = counting_emit
    import datetime as dt

    now = (dt.datetime.utcnow() + dt.timedelta(days=1)).isoformat(
        sep=" ", timespec="seconds"
    )
    assert c.ttl_purge(now) == n
    # one emitted batch carrying every due purge, offsets consecutive
    assert len(emits) == 1
    batch = emits[0]
    assert len(batch) == n
    assert all(r["action_type"] == "purge" for r in batch)
    offs = [r["offset"] for r in batch]
    assert offs == list(range(min(offs), min(offs) + n))
    # the store converged: only the TTL-free journal remains
    assert {r.id for r in c.store.read().collect()} == {"keeper"}
    # idempotent — and the second call performs no log write at all
    assert c.ttl_purge(now) == 0
    assert len(emits) == 1
