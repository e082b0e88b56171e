"""Standing-trigger streaming soak: the replicator running under
``trigger(processingTime=...)`` against a GROWING source, with reads
racing the triggers — the live form of the reference's ConsistencySpec
(``pekko/tests/.../ConsistencySpec``; standing cadence
``TopicReplicator.scala:280-284``).  Every graded scenario elsewhere runs
under ``availableNow`` or explicit ``replicate_batch`` loops; this file is
the one place the pipeline is exercised in its native continuously-running
form.

Two properties:
- every read observed MID-STREAM (``clamp_to_head=True``) is a
  prefix-consistent journal state: per key, the visible seq_nrs are a
  contiguous run bounded by what was fed, and pointers never regress;
- after the feed stops and the stream drains, the store equals a one-shot
  materialization of the same action log.
"""

from __future__ import annotations

import os
import time

from conftest import ACTIONS_DDL, append, delete, make_actions
from pyspark.sql import functions as F

from kafka_journal_spark.sources.statestore import JournalConfig, JournalStore
from kafka_journal_spark.streaming.replicator import (
    replicate_batch,
    run_parquet_replicator,
)

KEYS = [f"k{i}" for i in range(4)]


def _feed_round(spark, src: str, rnd: int) -> list[dict]:
    """One micro-batch's worth of actions: every key appends its next
    seq_nr; round 5 also deletes key k0's prefix."""
    acts = [append(k, rnd + 1) for k in KEYS]
    if rnd == 5:
        acts.append(delete("k0", 3))
    make_actions(spark, acts, offset_base=rnd * 10).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    return acts


def _assert_prefix_consistent(rows, fed_max: int) -> None:
    by_key: dict[str, list[int]] = {}
    for r in rows:
        by_key.setdefault(r.id, []).append(r.seq_nr)
    for k, seqs in by_key.items():
        seqs.sort()
        # contiguous run, never beyond what was fed
        assert seqs == list(range(seqs[0], seqs[0] + len(seqs))), (k, seqs)
        assert seqs[-1] <= fed_max, (k, seqs, fed_max)


def test_standing_trigger_soak_with_concurrent_reads(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    store = JournalStore(spark, str(tmp_path / "store"))
    # seed one batch so the source dir exists before the stream starts
    fed = _feed_round(spark, src, 0)

    q = run_parquet_replicator(
        spark,
        src,
        store,
        ACTIONS_DDL,
        max_files_per_trigger=1,
        processing_time="200 milliseconds",
    )
    cfg = JournalConfig(clamp_to_head=True)
    n_rounds = 12
    pointer_hist: list[int] = []
    try:
        for rnd in range(1, n_rounds):
            fed += _feed_round(spark, src, rnd)
            # reads racing the trigger: visible state must be a
            # prefix-consistent cut of the fed log, pointers monotone
            rows = store.read(config=cfg).select("id", "seq_nr").collect()
            _assert_prefix_consistent(rows, fed_max=rnd + 1)
            ptr = store.pointers().agg(F.max("offset")).first()[0]
            if ptr is not None:
                assert not pointer_hist or ptr >= pointer_hist[-1], (
                    ptr,
                    pointer_hist,
                )
                pointer_hist.append(ptr)
        # drain: wait until the standing query has replicated everything
        deadline = time.time() + 120
        want = {(a["id"], a["seq_nr_from"]) for a in fed if "seq_nr_from" in a}
        while time.time() < deadline:
            got = {
                (r.id, r.seq_nr)
                for r in store.read(config=cfg).select("id", "seq_nr").collect()
            }
            if {w for w in want if w[0] != "k0"} <= got:
                break
            time.sleep(0.5)
        progress = q.recentProgress
    finally:
        q.stop()
    # the soak must have exercised real standing triggers, >= 10 of them
    def _bid(p):
        return p["batchId"] if isinstance(p, dict) else p.batchId

    assert len({_bid(p) for p in progress}) >= 10, len(progress)

    # final parity with a one-shot materialization of the same log
    one = JournalStore(spark, str(tmp_path / "one"))
    # rebuild the exact fed action frame (offsets as fed)
    allacts = []
    offset = 0
    for rnd in range(n_rounds):
        acts = [append(k, rnd + 1) for k in KEYS]
        if rnd == 5:
            acts.append(delete("k0", 3))
        allacts.append((acts, rnd * 10))
    frames = [make_actions(spark, a, offset_base=b) for a, b in allacts]
    big = frames[0]
    for f in frames[1:]:
        big = big.unionByName(f)
    replicate_batch(big, one)

    got_stream = {
        (r.id, r.seq_nr) for r in store.read().select("id", "seq_nr").collect()
    }
    got_one = {
        (r.id, r.seq_nr) for r in one.read().select("id", "seq_nr").collect()
    }
    assert got_stream == got_one
    meta_stream = {
        (r.id, r.seq_nr, r.delete_to) for r in store.metajournal().collect()
    }
    meta_one = {
        (r.id, r.seq_nr, r.delete_to) for r in one.metajournal().collect()
    }
    assert meta_stream == meta_one
