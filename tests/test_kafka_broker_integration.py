"""End-to-end append -> replicate -> recover against a REAL Kafka broker.

Gated on ``KAFKA_BOOTSTRAP`` (e.g. ``localhost:9092``): the sandbox has no
broker, so these skip there — the reference runs the same scenario through
testcontainers (pekko tests IntegrationSuite.scala:23-24).  Wherever a
broker (and the spark-sql-kafka connector) is available they run unchanged:
the option builders under test are the exact maps golden-tested in
test_kafka_options.py.

Run with e.g.::

    KAFKA_BOOTSTRAP=localhost:9092 \
    PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 pyspark-shell" \
    python -m pytest tests/test_kafka_broker_integration.py
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from conftest import append, delete, make_actions
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="no broker: set KAFKA_BOOTSTRAP=<host:port> to run"
)


def _require_kafka_source(spark):
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "_probe").load()
    except Exception as e:  # connector missing -> skip, broker errors -> fail
        if "Failed to find data source: kafka" in str(e):
            pytest.skip("spark-sql-kafka connector not on the classpath")


def test_append_replicate_recover_roundtrip(spark):
    from kafka_journal_spark.codecs import (
        decode_kafka_to_actions,
        encode_actions_to_kafka,
    )
    from kafka_journal_spark.operators.actions import ACTION_COLUMNS
    from kafka_journal_spark.sources.kafka import (
        read_partition_bounded,
        read_topic_stream,
        write_actions,
    )
    from kafka_journal_spark.sources.statestore import JournalStore
    from kafka_journal_spark.streaming.replicator import replicate_batch

    _require_kafka_source(spark)
    topic = f"kjs-it-{uuid.uuid4().hex[:8]}"
    acts = make_actions(
        spark,
        [append("a", 1), append("a", 2), append("b", 1), delete("a", 1)],
    ).withColumn("topic", F.lit(topic))

    # S1: idempotent keyed produce through the hardened option map
    write_actions(encode_actions_to_kafka(acts), BOOTSTRAP, topic)

    # S2/S3 + R4: group-less assigned-partition bounded read-back
    # (startingOffsets -2 = earliest, endingOffsets -1 = latest fence)
    raw = read_partition_bounded(spark, BOOTSTRAP, topic, 0, -2, -1)
    decoded = decode_kafka_to_actions(raw).select(*ACTION_COLUMNS)
    got = {
        (r.id, r.action_type, r.seq_nr_from, r.seq_nr_to)
        for r in decoded.collect()
    }
    # delete seq-range columns depend on builder defaults — normalize them
    # to None so the remaining fields are compared EXACTLY (an `or len==4`
    # escape would let any 4 distinct tuples pass)
    norm = {
        (i, a, lo, hi) if a == "append" else (i, a, None, None)
        for (i, a, lo, hi) in got
    }
    assert norm == {
        ("a", "append", 1, 1),
        ("a", "append", 2, 2),
        ("b", "append", 1, 1),
        ("a", "delete", None, None),
    }

    # S4/P2-P7: the replicator stream (subscribe + checkpoint) into a store
    d = tempfile.mkdtemp(prefix="kjs-broker-it-")
    store = JournalStore(spark, f"{d}/store")
    stream = read_topic_stream(spark, BOOTSTRAP, topic)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: replicate_batch(
                decode_kafka_to_actions(df).select(*ACTION_COLUMNS), store
            )
        )
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # R1/R5/R6: recovery read over the replicated store
    rows = {(r.id, r.seq_nr) for r in store.read(topic=topic).collect()}
    assert rows == {("a", 2), ("b", 1)}  # delete(a,1) clamps a's prefix
    assert store.pointer(topic, "a") == 2
