"""Kafka source/sink builders (SURVEY.md §2.1 S1-S4).

No broker exists in the test container, so these builders produce fully
configured readers/writers (the Kafka-envelope DataFrames they consume and
produce are exercised through codecs.py + the replicator); on a real cluster
they run unchanged via spark-sql-kafka.  The option maps are pure functions
(golden-value tested against the reference's enforced invariants) and the
reader/writer builders consume them verbatim.

The producer hardening mirrors the reference's enforced invariants
(``Journals.scala:355-372``): idempotence on, non-none acks, retries floored
at 10, client id defaulting to ``journal``, send buffer floored at 1 MB, and
a keyed produce (key = journal id) so a key's actions stay in one partition —
the ordering guarantee every fold in this engine relies on.

The replicator consumer mirrors ``TopicReplicator.scala:249-293`` /
``TopicConsumer.scala``: subscribe (or pattern for topic discovery, P1),
earliest reset, per-topic group id ``replicator-<topic>``, host-suffixed
client id; offset commits are replaced by Structured Streaming checkpoints
(S4) — the reference likewise disables auto-commit (``autoCommit = false``)
and commits explicitly.  The per-key recovery reader mirrors
``ConsumeActionRecords.scala:13-58`` + ``Journals.scala:420-426`` (group-less,
commit-less consumer): an assigned-partition bounded batch read with explicit
offsets — the Mark-equivalent fence (SURVEY.md §3.1) is the
``endingOffsets`` bound.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def producer_options(bootstrap: str, client_id: str = "journal") -> dict[str, str]:
    """S1 producer config (Journals.scala:355-372 ``Producer.make``):
    ``idempotence = true``, ``acks`` coerced away from None (we pin the
    strongest, all), ``retries max 10``, ``clientId getOrElse "journal"``,
    ``sendBufferBytes max 1000000``."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "kafka.enable.idempotence": "true",
        "kafka.acks": "all",
        "kafka.retries": "10",
        "kafka.client.id": client_id,
        "kafka.send.buffer.bytes": "1000000",
        "includeHeaders": "true",
    }


def replicator_stream_options(
    bootstrap: str,
    topics: str,
    group_prefix: str = "replicator",
    host: str | None = None,
) -> dict[str, str]:
    """S4/P1 replicator consumer config (TopicReplicator.scala:249-293
    ``ConsumerOf.make``): ``groupId = "<prefix>-<topic>"`` (single-topic
    subscribe only — pattern subscriptions let the engine assign), client id
    ``replicator`` suffixed with the host name, earliest reset.  The
    reference sets ``autoCommit = false`` and commits through its own loop;
    Structured Streaming enforces exactly that (auto-commit is forbidden,
    progress lives in the checkpoint)."""
    client_id = group_prefix if host is None else f"{group_prefix}-{host}"
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "startingOffsets": "earliest",
        "includeHeaders": "true",
        "failOnDataLoss": "false",
        "kafka.client.id": client_id,
    }
    if topics.startswith("pattern:"):
        opts["subscribePattern"] = topics[len("pattern:") :]
    else:
        opts["subscribe"] = topics
        if "," not in topics:
            opts["kafka.group.id"] = f"{group_prefix}-{topics}"
    return opts


def bounded_read_options(
    bootstrap: str,
    topic: str,
    partition: int,
    from_offset: int,
    end_offset: int,
) -> dict[str, str]:
    """S2/S3 + R4 recovery reader config (Journals.scala:420-426: group-less
    ``groupId = None``, ``autoCommit = false`` consumer;
    ConsumeActionRecords.scala:13-58 assigned-partition seek): a bounded
    batch ``[from_offset, end_offset)`` — the end bound is the fence."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "assign": json.dumps({topic: [partition]}),
        "startingOffsets": json.dumps({topic: {str(partition): from_offset}}),
        "endingOffsets": json.dumps({topic: {str(partition): end_offset}}),
        "includeHeaders": "true",
    }


#: kept for backwards compatibility with earlier callers/tests
PRODUCER_HARDENING = {
    k: v
    for k, v in producer_options("_").items()
    if k.startswith("kafka.") and k != "kafka.bootstrap.servers"
}


def write_actions(kafka_records: DataFrame, bootstrap: str, topic: str) -> None:
    """S1: idempotent keyed produce of encoded actions (codecs.encode_actions_to_kafka)."""
    w = kafka_records.selectExpr("key", "value", "headers").write.format("kafka")
    for k, v in producer_options(bootstrap).items():
        w = w.option(k, v)
    w.option("topic", topic).save()


def read_topic_stream(spark: SparkSession, bootstrap: str, topics: str) -> DataFrame:
    """S4: the replicator's subscribed stream (earliest, checkpoint-committed).
    ``topics`` may be a comma list or a regex via subscribePattern semantics
    (pass ``pattern:<regex>`` for topic discovery, P1)."""
    r = spark.readStream.format("kafka")
    for k, v in replicator_stream_options(bootstrap, topics).items():
        r = r.option(k, v)
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
    r = spark.read.format("kafka")
    for k, v in bounded_read_options(
        bootstrap, topic, partition, from_offset, end_offset
    ).items():
        r = r.option(k, v)
    return r.load()
