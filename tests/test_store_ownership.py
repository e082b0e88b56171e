"""Cross-process write-ownership lease on the store root — the structural
one-writer rule the reference gets from its topology (one TopicReplicator
per topic, ``Replicator.scala:120-170``; a distributed lock for schema work,
``cassandra/.../CassandraSync.scala``).  Two writer PROCESSES on one root
would silently re-create the append-vs-maintenance orphan drop the
in-process mutation lock closed (r9 verdict, "What's missing" #3) — so the
second writer fails LOUDLY, readers stay lock-free, and a crashed owner's
lease is taken over (dead pid detected immediately on the same host;
heartbeat TTL for foreign hosts)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest
from conftest import append, make_actions

from kafka_journal_spark.sources.statestore import (
    JournalStore,
    StoreOwnershipError,
)
from kafka_journal_spark.streaming.replicator import replicate_batch


def _foreign_lock(root: str, *, pid: int, host: str | None = None,
                  age_s: float = 0.0) -> None:
    """Fabricate another process's lease (distinct token by construction)."""
    import socket

    path = os.path.join(root, "_owner.lock")
    with open(path, "w") as f:
        json.dump(
            {"pid": pid, "host": host or socket.gethostname(),
             "token": "not-this-process"},
            f,
        )
    if age_s:
        old = time.time_ns() - int(age_s * 1e9)
        os.utime(path, ns=(old, old))


def _dead_pid() -> int:
    """A pid that provably ran and exited (reaped — os.kill(pid,0) fails)."""
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_second_writer_raises_reader_unaffected(spark, tmp_path):
    root = str(tmp_path / "s")
    store = JournalStore(spark, root)
    replicate_batch(make_actions(spark, [append("a", 1)]), store)
    want = {(r.id, r.seq_nr) for r in store.read().collect()}

    # another LIVE process owns the root now (alive pid, same host)
    store.release_ownership()
    _foreign_lock(root, pid=os.getpid())

    second = JournalStore(spark, root)
    with pytest.raises(StoreOwnershipError, match="owned for writing"):
        replicate_batch(
            make_actions(spark, [append("a", 2)], offset_base=5), second
        )
    with pytest.raises(StoreOwnershipError):
        second.compact()
    # the failed writer changed nothing a reader can see
    assert {(r.id, r.seq_nr) for r in second.read().collect()} == want
    assert second.pointers().count() == 1


def test_real_second_process_is_refused(spark, tmp_path):
    """An actual second PROCESS (not a fabricated lock): the child opens
    the same root and must get StoreOwnershipError from the lease check
    (no Spark needed — the guard is pure filesystem)."""
    root = str(tmp_path / "s")
    store = JournalStore(spark, root)
    replicate_batch(make_actions(spark, [append("a", 1)]), store)
    code = (
        "import sys\n"
        "from kafka_journal_spark.sources.statestore import ("
        "JournalStore, StoreOwnershipError)\n"
        f"s = JournalStore(None, {root!r})\n"
        "try:\n"
        "    s._assert_ownership()\n"
        "except StoreOwnershipError:\n"
        "    sys.exit(0)\n"
        "sys.exit(1)\n"
    )
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    r = subprocess.run([sys.executable, "-c", code], env=env, timeout=60)
    assert r.returncode == 0, "second process was not refused"


def test_takeover_after_owner_death(spark, tmp_path):
    root = str(tmp_path / "s")
    store = JournalStore(spark, root)
    replicate_batch(make_actions(spark, [append("a", 1)]), store)
    store.release_ownership()
    _foreign_lock(root, pid=_dead_pid())  # owner crashed
    # next mutation takes the lease over and proceeds
    replicate_batch(make_actions(spark, [append("a", 2)], offset_base=5), store)
    assert {(r.id, r.seq_nr) for r in store.read().collect()} == {
        ("a", 1),
        ("a", 2),
    }
    with open(os.path.join(root, "_owner.lock")) as f:
        doc = json.load(f)
    assert doc["pid"] == os.getpid()


def test_foreign_host_ttl(spark, tmp_path):
    """No pid liveness across hosts: a fresh foreign-host lease is
    honored, an expired one is taken over."""
    root = str(tmp_path / "s")
    store = JournalStore(spark, root, owner_ttl_s=300.0)
    replicate_batch(make_actions(spark, [append("a", 1)]), store)
    store.release_ownership()

    _foreign_lock(root, pid=1, host="other-host")  # fresh heartbeat
    with pytest.raises(StoreOwnershipError):
        store.compact()

    store.owner_ttl_s = 0.2
    _foreign_lock(root, pid=1, host="other-host", age_s=5.0)  # expired
    store.compact()  # takeover
    with open(os.path.join(root, "_owner.lock")) as f:
        assert json.load(f)["pid"] == os.getpid()


def test_release_and_reacquire(spark, tmp_path):
    root = str(tmp_path / "s")
    store = JournalStore(spark, root)
    replicate_batch(make_actions(spark, [append("a", 1)]), store)
    assert os.path.exists(os.path.join(root, "_owner.lock"))
    store.release_ownership()
    assert not os.path.exists(os.path.join(root, "_owner.lock"))
    # release only drops OUR lease, never a foreign one
    _foreign_lock(root, pid=1, host="other-host")
    store.release_ownership()
    assert os.path.exists(os.path.join(root, "_owner.lock"))
