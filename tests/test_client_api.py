"""The reference README flow (README.md:20-31) through JournalClient:
append -> read (before AND after replication must agree) -> delete ->
purge -> fresh journal."""

from __future__ import annotations

from kafka_journal_spark.api import JournalClient


def test_reference_readme_flow(spark, tmp_path):
    c = JournalClient(spark, str(tmp_path / "client"))

    # append two batches
    c.append("orders", "order-1", ["created"])
    c.append("orders", "order-1", ["paid", "shipped"])
    assert c.pointer("orders", "order-1") == 3

    # read-your-writes: nothing replicated yet, reads see the Kafka tail
    assert c.read("orders", "order-1") == [(1, "created"), (2, "paid"), (3, "shipped")]

    # replicate; the read result must not change (ConsistencySpec)
    c.replicate()
    assert c.read("orders", "order-1") == [(1, "created"), (2, "paid"), (3, "shipped")]
    assert c.pointer("orders", "order-1") == 3

    # half-replicated: a new append rides the tail, read stitches both
    c.append("orders", "order-1", ["delivered"])
    assert c.read("orders", "order-1") == [
        (1, "created"), (2, "paid"), (3, "shipped"), (4, "delivered"),
    ]

    # prefix delete (clamped) — visible immediately, also after replication
    c.delete_to("orders", "order-1", 2)
    assert c.read("orders", "order-1") == [(3, "shipped"), (4, "delivered")]
    c.replicate()
    assert c.read("orders", "order-1") == [(3, "shipped"), (4, "delivered")]
    assert c.pointer("orders", "order-1") == 4

    # read(from) lower bound
    assert c.read("orders", "order-1", from_seq_nr=4) == [(4, "delivered")]

    # purge erases; pointer None; fresh journal restarts at seq 1
    c.purge("orders", "order-1")
    assert c.read("orders", "order-1") == []
    assert c.pointer("orders", "order-1") is None
    c.append("orders", "order-1", ["reborn"])
    assert c.read("orders", "order-1") == [(1, "reborn")]
    c.replicate()
    assert c.read("orders", "order-1") == [(1, "reborn")]


def test_delete_on_absent_journal_is_noop(spark, tmp_path):
    c = JournalClient(spark, str(tmp_path / "client2"))
    assert c.delete_to("orders", "ghost", 5) is None
    assert c.read("orders", "ghost") == []


def test_keys_are_isolated(spark, tmp_path):
    c = JournalClient(spark, str(tmp_path / "client3"))
    c.append("t", "a", ["a1"])
    c.append("t", "b", ["b1", "b2"])
    c.purge("t", "a")
    c.replicate()
    assert c.read("t", "a") == []
    assert c.read("t", "b") == [(1, "b1"), (2, "b2")]


def test_binary_payload_append_and_read(spark, tmp_path):
    # bytes payloads ride the binary path end-to-end: un-replicated tail
    # read, then replicated-store read after replicate()
    c = JournalClient(spark, str(tmp_path / "client4"))
    blobs = [b"\x00\x01\xff", b"\xde\xad\xbe\xef"]
    c.append("t", "m", blobs, headers={"trace": "t-1"})
    assert c.read("t", "m") == [(1, blobs[0]), (2, blobs[1])]
    c.replicate()
    assert c.read("t", "m") == [(1, blobs[0]), (2, blobs[1])]
    # text and binary journals coexist; a text read is unaffected
    c.append("t", "n", ["plain"])
    assert c.read("t", "n") == [(1, "plain")]
    # mixed batches are rejected (whole-batch binary rule)
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        c.append("t", "m", ["text", b"bytes"])


def test_read_many_matches_single_reads(spark, tmp_path):
    """The bulk path must equal N per-key reads — one pruned scan instead of
    N driver collects — across replicated prefix, un-replicated tail,
    deletes, an un-replicated purge, and a missing key."""
    from pyspark.sql import functions as F

    from kafka_journal_spark.api import JournalClient

    c = JournalClient(spark, str(tmp_path / "bulk"))
    c.append("journal", "a", ["a1", "a2"])
    c.append("journal", "b", ["b1"])
    c.delete_to("journal", "a", 1)
    c.append("journal", "c", ["c1", "c2", "c3"])
    c.replicate()  # everything so far is the replicated prefix
    c.append("journal", "a", ["a3"])  # un-replicated tail append
    c.purge("journal", "b")  # un-replicated purge
    c.append("journal", "b", ["B1"])  # fresh append after the purge

    keys = ["a", "b", "c", "missing"]
    bulk = {
        (r.id, r.seq_nr): r.payload_txt
        for r in c.read_many("journal", keys).collect()
    }
    singles = {}
    for k in keys:
        for seq, payload in c.read("journal", k):
            singles[(k, seq)] = payload
    assert bulk == singles
    assert ("a", 1) not in bulk and ("b", 1) in bulk  # delete applied; purge+fresh

    # one plan, pruned: the store journal scan carries the id In-filter
    plan = (
        c.read_many("journal", keys)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(id, [" in plan, plan


def test_pointer_many_matches_scalar_pointers(spark, tmp_path):
    """The bulk pointer plan must agree with the per-entity pointer() on
    every head kind: plain append, un-replicated append tail, delete-only,
    delete-raised floor, purged (absent), and never-seen keys."""
    c = JournalClient(spark, str(tmp_path / "pm"))
    c.append("t", "a", ["a1", "a2"])
    c.append("t", "b", ["b1"])
    c.append("t", "d", ["d1"])
    c.replicate()
    c.append("t", "a", ["a3"])          # un-replicated append
    c.delete_to("t", "b", 1)            # un-replicated delete (floor stays 1)
    c.purge("t", "d")                   # un-replicated purge
    c.append("t", "e", ["e1", "e2"])    # never replicated at all

    got = {r.id: r.seq_nr for r in c.pointer_many("t").collect()}
    want = {
        k: c.pointer("t", k)
        for k in ("a", "b", "d", "e", "zz")
        if c.pointer("t", k) is not None
    }
    assert got == want == {"a": 3, "b": 1, "e": 2}

    # key-pruned variant returns exactly the requested live keys
    got2 = {r.id: r.seq_nr for r in c.pointer_many("t", ["a", "d", "zz"]).collect()}
    assert got2 == {"a": 3}
