"""Golden-value tests for the Kafka option plumbing: the exact option maps
the builders hand to spark-sql-kafka, pinned against the reference's
enforced invariants (Journals.scala:355-372 producer hardening,
TopicReplicator.scala:249-293 replicator consumer, Journals.scala:420-426
group-less recovery consumer)."""

from __future__ import annotations

import json

from kafka_journal_spark.sources.kafka import (
    bounded_read_options,
    producer_options,
    replicator_stream_options,
)


def test_producer_options_golden():
    assert producer_options("broker:9092") == {
        "kafka.bootstrap.servers": "broker:9092",
        "kafka.enable.idempotence": "true",  # idempotence = true
        "kafka.acks": "all",  # acks coerced away from None
        "kafka.retries": "10",  # retries max 10
        "kafka.client.id": "journal",  # clientId getOrElse "journal"
        "kafka.send.buffer.bytes": "1000000",  # sendBufferBytes max 1000000
        "includeHeaders": "true",
    }
    assert producer_options("b", client_id="svc")["kafka.client.id"] == "svc"


def test_replicator_stream_options_single_topic_golden():
    assert replicator_stream_options("broker:9092", "journal", host="host1") == {
        "kafka.bootstrap.servers": "broker:9092",
        "startingOffsets": "earliest",  # AutoOffsetReset.Earliest
        "includeHeaders": "true",
        "failOnDataLoss": "false",
        "kafka.client.id": "replicator-host1",  # clientId-hostName
        "subscribe": "journal",
        "kafka.group.id": "replicator-journal",  # "<prefix>-<topic>"
    }


def test_replicator_stream_options_multi_and_pattern():
    multi = replicator_stream_options("b", "t1,t2")
    assert multi["subscribe"] == "t1,t2"
    assert "kafka.group.id" not in multi  # per-topic groups don't apply
    pat = replicator_stream_options("b", "pattern:journal-.*")
    assert pat["subscribePattern"] == "journal-.*"
    assert "subscribe" not in pat and "kafka.group.id" not in pat
    assert pat["kafka.client.id"] == "replicator"


def test_bounded_read_options_golden():
    opts = bounded_read_options("broker:9092", "journal", 3, 100, 250)
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "assign": '{"journal": [3]}',
        "startingOffsets": '{"journal": {"3": 100}}',
        "endingOffsets": '{"journal": {"3": 250}}',
        "includeHeaders": "true",
    }
    # no group, no commit: a bounded assigned read carries neither option
    assert "kafka.group.id" not in opts
    assert json.loads(opts["endingOffsets"])["journal"]["3"] == 250
