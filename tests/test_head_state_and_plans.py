"""Tests for the HeadInfo state stream (applyInPandasWithState) and the
R2 recovery planner."""

from __future__ import annotations

import pytest
from conftest import ACTIONS_DDL, append, delete, make_actions, mark, purge

from kafka_journal_spark.folds import HeadInfo, head_info
from kafka_journal_spark.plans.recovery import plan_recovery, read_with_plan
from kafka_journal_spark.sources.statestore import JournalStore
from kafka_journal_spark.streaming.replicator import replicate_batch
from kafka_journal_spark.streaming.head_state import head_info_stream


def test_head_info_stream_matches_pure_fold(spark, tmp_path):
    acts = [
        append("a", 1), append("a", 2), delete("a", 1),
        append("b", 1), purge("b"), append("b", 2),
        mark("c"),
    ]
    src = tmp_path / "src"
    make_actions(spark, acts).write.parquet(str(src))
    stream = spark.readStream.schema(ACTIONS_DDL).parquet(str(src))
    q = (
        head_info_stream(stream)
        .writeStream.format("memory")
        .queryName("heads")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.id: (r.kind, r.offset, r.seq_nr, r.delete_to)
        for r in spark.sql("SELECT * FROM heads").collect()
    }
    # expected from the pure fold over each key's actions
    df = make_actions(spark, acts)
    from kafka_journal_spark.folds import ActionRec

    by_key = {}
    for r in df.collect():
        by_key.setdefault(r.id, []).append(
            ActionRec(r.action_type, r.offset, r.seq_nr_from, r.seq_nr_to, r.delete_to)
        )
    for key, recs in by_key.items():
        h = head_info(recs)
        assert got[key] == (h.kind, h.offset, h.seq_nr, h.delete_to), key


def test_head_info_stream_carries_state_across_batches(spark, tmp_path):
    src = tmp_path / "src2"
    out_dir = str(tmp_path / "out2")
    store_ckpt = str(tmp_path / "ckpt2")
    make_actions(spark, [append("a", 1), append("a", 2)]).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(ACTIONS_DDL).parquet(str(src))

    def run():
        q = (
            head_info_stream(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.withColumn("batch_id", __import__("pyspark").sql.functions.lit(bid))
                .write.mode("append")
                .parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", store_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # second batch: a delete arrives — folded ON TOP of restored state
    make_actions(spark, [delete("a", 2)], offset_base=2).write.mode("append").parquet(str(src))
    run()
    rows = spark.read.parquet(out_dir).orderBy("batch_id").collect()
    last = rows[-1]
    assert (last.kind, last.seq_nr, last.delete_to) == ("append", 2, 2)
    # the first batch's summary must also have been emitted
    assert (rows[0].kind, rows[0].seq_nr, rows[0].delete_to) == ("append", 2, None)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (absent in this container)",
)
def test_head_info_stream_tws_matches_pure_fold(spark, tmp_path):
    # same assertions as the applyInPandasWithState variant, on the
    # Spark 4 transformWithStateInPandas API
    from kafka_journal_spark.streaming.head_state import head_info_stream_tws

    acts = [
        append("a", 1), append("a", 2), delete("a", 1),
        append("b", 1), purge("b"), append("b", 2),
    ]
    src = tmp_path / "tws-src"
    make_actions(spark, acts).write.parquet(str(src))
    stream = spark.readStream.schema(ACTIONS_DDL).parquet(str(src))
    q = (
        head_info_stream_tws(stream)
        .writeStream.format("memory")
        .queryName("heads_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tws-ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.id: (r.kind, r.offset, r.seq_nr, r.delete_to)
        for r in spark.sql("SELECT * FROM heads_tws").collect()
    }
    from kafka_journal_spark.folds import ActionRec

    by_key = {}
    for r in make_actions(spark, acts).collect():
        by_key.setdefault(r.id, []).append(
            ActionRec(r.action_type, r.offset, r.seq_nr_from, r.seq_nr_to, r.delete_to)
        )
    for key, recs in by_key.items():
        h = head_info(recs)
        assert got[key] == (h.kind, h.offset, h.seq_nr, h.delete_to), key


def test_plan_selection():
    assert plan_recovery(HeadInfo()) == plan_recovery(HeadInfo(kind="empty"))
    p = plan_recovery(HeadInfo(kind="empty"), 3)
    assert (p.read_store, p.read_kafka, p.from_seq_nr) == (True, False, 3)
    p = plan_recovery(HeadInfo(kind="append", offset=7, seq_nr=5, delete_to=2), 1)
    assert (p.read_store, p.read_kafka, p.from_seq_nr, p.kafka_from_offset) == (True, True, 3, 7)
    p = plan_recovery(HeadInfo(kind="delete", delete_to=4), 2)
    assert (p.read_store, p.read_kafka, p.from_seq_nr) == (True, False, 5)
    p = plan_recovery(HeadInfo(kind="purge"))
    assert (p.read_store, p.read_kafka) == (False, False)


def test_read_with_plan_end_to_end(spark, tmp_path):
    # replicated prefix: a(1..2); kafka tail: delete(1), a(3)
    store = JournalStore(spark, str(tmp_path / "plan-store"))
    replicate_batch(make_actions(spark, [append("a", 1), append("a", 2)]), store)
    tail = make_actions(spark, [delete("a", 1), append("a", 3)], offset_base=2)
    from kafka_journal_spark.folds import ActionRec

    recs = [
        ActionRec(r.action_type, r.offset, r.seq_nr_from, r.seq_nr_to, r.delete_to)
        for r in tail.collect()
    ]
    head = head_info(recs)
    out = read_with_plan(store, tail, "journal", "a", head)
    assert sorted((r.seq_nr, r.offset) for r in out.collect()) == [(2, 1), (3, 3)]
    # purge head -> empty
    out2 = read_with_plan(store, tail, "journal", "a", HeadInfo(kind="purge"))
    assert out2.count() == 0


def test_head_info_stream_auto_selects_by_dependency(spark, tmp_path):
    """head_info_stream_auto picks TWS exactly when google.protobuf is
    importable (or when forced), and the fallback branch is the tested
    applyInPandasWithState fold — same output either way."""
    from kafka_journal_spark.streaming.head_state import (
        head_info_stream_auto,
        tws_available,
    )

    src = tmp_path / "autosrc"
    make_actions(spark, [append("a", 1), delete("a", 1)]).write.parquet(str(src))
    stream = spark.readStream.schema(ACTIONS_DDL).parquet(str(src))

    # forced fallback must be plannable and run regardless of environment
    q = (
        head_info_stream_auto(stream, prefer_tws=False)
        .writeStream.format("memory")
        .queryName("auto_heads")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "auto_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.id: (r.kind, r.seq_nr, r.delete_to)
        for r in spark.sql("SELECT * FROM auto_heads").collect()
    }
    # delete-after-append keeps the Append kind (only the watermark moves)
    assert got == {"a": ("append", 1, 1)}

    # default selection matches the detected dependency; the TWS branch
    # must at least BUILD (plan) when the dependency is present
    if tws_available():
        df = head_info_stream_auto(stream)
        assert df.schema.simpleString().startswith("struct<topic:string,id:string")
    else:
        # auto == fallback here: building the default must not require protobuf
        df = head_info_stream_auto(stream)
        assert df.schema.simpleString().startswith("struct<topic:string,id:string")
