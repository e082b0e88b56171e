"""P1 lifecycle: topic discovery with start/stop diffing
(Replicator.scala:43-170) over two file-source topics, one appearing
mid-run — both must materialize through their own streaming queries."""

from __future__ import annotations

import os

from conftest import ACTIONS_DDL, append, delete, make_actions

from kafka_journal_spark.operators.replicate import materialize_journal
from kafka_journal_spark.streaming.registry import ReplicatorRegistry


def _write_topic(df, root, topic, batch):
    # stage OUTSIDE the watched topic dir, then move finished parquet files
    # in atomically — writing inside it would let the file source list
    # half-written parts
    import shutil

    stage = os.path.join(root, f"_stage-{topic}-b{batch}")
    df.write.mode("append").parquet(stage)
    os.makedirs(os.path.join(root, topic), exist_ok=True)
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(stage, f), os.path.join(root, topic, f"{batch}-{f}"))
    shutil.rmtree(stage)


def test_registry_discovers_starts_and_stops(spark, tmp_path):
    src = str(tmp_path / "src")
    stores = str(tmp_path / "stores")
    os.makedirs(src)

    t1_b1 = make_actions(
        spark, [append("a", 1, topic="t1"), append("a", 2, topic="t1")]
    )
    _write_topic(t1_b1, src, "t1", 1)

    reg = ReplicatorRegistry(spark, src, stores, ACTIONS_DDL)
    assert reg.sync() == {"started": ["t1"], "stopped": [], "failed": []}
    reg.process_all_available()
    assert {r.seq_nr for r in reg.stores["t1"].read().collect()} == {1, 2}

    # topic t2 appears mid-run; next discovery round starts it, t1 untouched
    t2_b1 = make_actions(
        spark,
        [append("x", 1, topic="t2"), append("x", 2, topic="t2"), delete("x", 1, topic="t2")],
        offset_base=0,
    )
    _write_topic(t2_b1, src, "t2", 1)
    assert reg.sync() == {"started": ["t2"], "stopped": [], "failed": []}

    # and t1 keeps replicating new batches concurrently
    t1_b2 = make_actions(spark, [append("a", 3, topic="t1")], offset_base=10)
    _write_topic(t1_b2, src, "t1", 2)
    reg.process_all_available()

    got_t1 = {r.seq_nr for r in reg.stores["t1"].read().collect()}
    got_t2 = {r.seq_nr for r in reg.stores["t2"].read().collect()}
    assert got_t1 == {1, 2, 3}
    # one-shot materialization is the oracle for the streamed t2 store
    expect_t2 = {r.seq_nr for r in materialize_journal(t2_b1).collect()}
    assert got_t2 == expect_t2 == {2}

    # a topic vanishing from discovery stops ONLY its replicator
    reg.topic_filter = lambda t: t != "t2"
    assert reg.sync() == {"started": [], "stopped": ["t2"], "failed": []}
    assert reg.running_topics() == {"t1"}

    # t1 still alive after the stop round
    t1_b3 = make_actions(spark, [append("a", 4, topic="t1")], offset_base=20)
    _write_topic(t1_b3, src, "t1", 3)
    reg.process_all_available()
    assert {r.seq_nr for r in reg.stores["t1"].read().collect()} == {1, 2, 3, 4}

    # re-discovery restarts from checkpoint + pointers (replicator restart)
    reg.topic_filter = lambda t: True
    assert reg.sync() == {"started": ["t2"], "stopped": [], "failed": []}
    reg.process_all_available()
    assert {r.seq_nr for r in reg.stores["t2"].read().collect()} == {2}

    reg.stop_all()
    assert reg.running_topics() == set()


def test_registry_restarts_a_dead_query(spark, tmp_path):
    """A per-topic query that dies (failed or stopped out-of-band) must be
    reaped and RESTARTED on the next sync round — the reference
    supervisor's behavior.  Pre-fix, the dead query stayed registered
    forever: running_topics() kept reporting it, sync() never diffed it
    back in, and the topic silently stopped replicating."""
    src = str(tmp_path / "src")
    stores = str(tmp_path / "stores")
    os.makedirs(src)
    _write_topic(
        make_actions(spark, [append("a", 1, topic="t1")]), src, "t1", 1
    )
    reg = ReplicatorRegistry(spark, src, stores, ACTIONS_DDL)
    try:
        assert reg.sync()["started"] == ["t1"]
        reg.process_all_available()
        assert {r.seq_nr for r in reg.stores["t1"].read().collect()} == {1}

        # simulate death: the query terminates out-of-band
        reg._queries["t1"].stop()
        reg._queries["t1"].awaitTermination()
        assert "t1" in reg.running_topics()  # stale pre-sync view

        res = reg.sync()
        assert res["failed"] == ["t1"]
        assert res["started"] == ["t1"]  # restarted from its checkpoint

        # replication continues: a new batch lands through the new query
        _write_topic(
            make_actions(spark, [append("a", 2, topic="t1")], offset_base=1),
            src, "t1", 2,
        )
        reg.process_all_available()
        assert {r.seq_nr for r in reg.stores["t1"].read().collect()} == {1, 2}
    finally:
        reg.stop_all()
