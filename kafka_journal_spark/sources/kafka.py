"""Kafka source/sink builders (SURVEY.md §2.1 S1-S4).

No broker exists in the test container, so these builders produce fully
configured readers/writers (the Kafka-envelope DataFrames they consume and
produce are exercised through codecs.py + the replicator); on a real cluster
they run unchanged via spark-sql-kafka.

The producer hardening mirrors the reference's enforced invariants
(``Journals.scala:355-372``): idempotence on, acks=all, retries, and a keyed
produce (key = journal id) so a key's actions stay in one partition — the
ordering guarantee every fold in this engine relies on.

The replicator consumer mirrors ``TopicReplicator.scala:249-293`` /
``TopicConsumer.scala``: subscribe (or pattern for topic discovery, P1),
earliest reset; offset commits are replaced by Structured Streaming
checkpoints (S4).  The per-key recovery reader mirrors
``ConsumeActionRecords.scala:13-58``: an assigned-partition bounded batch
read with explicit offsets — the Mark-equivalent fence (SURVEY.md §3.1) is
the ``endingOffsets`` bound.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

#: producer options enforced by the reference (Journals.scala:355-372)
PRODUCER_HARDENING = {
    "kafka.enable.idempotence": "true",
    "kafka.acks": "all",
    "kafka.retries": "10",
    "kafka.send.buffer.bytes": str(1024 * 1024),
}


def write_actions(kafka_records: DataFrame, bootstrap: str, topic: str) -> None:
    """S1: idempotent keyed produce of encoded actions (codecs.encode_actions_to_kafka)."""
    w = (
        kafka_records.selectExpr("key", "value", "headers")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("includeHeaders", "true")
    )
    for k, v in PRODUCER_HARDENING.items():
        w = w.option(k, v)
    w.save()


def read_topic_stream(spark: SparkSession, bootstrap: str, topics: str) -> DataFrame:
    """S4: the replicator's subscribed stream (earliest, checkpoint-committed).
    ``topics`` may be a comma list or a regex via subscribePattern semantics
    (pass ``pattern:<regex>`` for topic discovery, P1)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("startingOffsets", "earliest")
        .option("includeHeaders", "true")
        .option("failOnDataLoss", "false")
    )
    if topics.startswith("pattern:"):
        r = r.option("subscribePattern", topics[len("pattern:") :])
    else:
        r = r.option("subscribe", topics)
    return r.load()


def read_partition_bounded(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    partition: int,
    from_offset: int,
    end_offset: int,
) -> DataFrame:
    """S2/S3 + R4: assigned-partition bounded batch read for one key's
    recovery — ``[from_offset, end_offset)``; the end bound is the fence
    (read end offsets first, then read up to them: nothing appended after
    the fence can appear, which is all Mark ever guaranteed)."""
    assign = json.dumps({topic: [partition]})
    starting = json.dumps({topic: {str(partition): from_offset}})
    ending = json.dumps({topic: {str(partition): end_offset}})
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("assign", assign)
        .option("startingOffsets", starting)
        .option("endingOffsets", ending)
        .option("includeHeaders", "true")
        .load()
    )
