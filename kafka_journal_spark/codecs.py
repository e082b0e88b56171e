"""Wire-format codecs: the Kafka record envelope shared by writer, reader
and replicator (SURVEY.md §2.6).

The reference serializes:
- the **action header** as JSON under the Kafka record-header key
  ``journal.action`` (``ActionHeader.scala:17``), a one-of wrapper
  ``{"append": {...}} | {"delete": {...}} | {"purge": {...}} | {"mark": {...}}``
  (``ActionHeader.scala:19-95``) — readable without touching the value blob
  ("Don't deserialize unrelated records", ``Notes for Next Developer.md:45``);
- the **events blob** as the record value: for text/JSON payloads a JSON
  document ``{"events": [{"seqNr": .., "tags": [..], "payloadType": ..,
  "payload": ..}], "metadata": {..}}`` (``PayloadAndType.scala:49-120``,
  ``Events.scala:131``).

We reproduce those JSON shapes with ``to_json``/``from_json`` — JVM-side,
no Python in the hot path.  The binary scodec envelope of the reference is a
Scala-ecosystem artifact; our canonical encoding is the JSON document (we
keep ``payload_type`` so a binary-codec reader could be added as a UDF).

``kafka_df`` here means the exact shape ``spark.read.format("kafka")``
produces: key/value binary, headers array<struct<key:string,value:binary>>,
topic/partition/offset/timestamp — so these codecs plug into a real broker
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_HEADER_KEY = "journal.action"

# the one-of action header document (ActionHeader.scala:19-95)
ACTION_HEADER_SCHEMA = T.StructType(
    [
        T.StructField(
            "append",
            T.StructType(
                [
                    T.StructField(
                        "range",
                        T.StructType(
                            [
                                T.StructField("from", T.LongType()),
                                T.StructField("to", T.LongType()),
                            ]
                        ),
                    ),
                    T.StructField("origin", T.StringType()),
                    T.StructField("version", T.StringType()),
                    T.StructField("payloadType", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "delete",
            T.StructType(
                [
                    T.StructField("to", T.LongType()),
                    T.StructField("origin", T.StringType()),
                    T.StructField("version", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "purge",
            T.StructType(
                [
                    T.StructField("origin", T.StringType()),
                    T.StructField("version", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "mark",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("origin", T.StringType()),
                    T.StructField("version", T.StringType()),
                ]
            ),
        ),
    ]
)

# the events blob document (PayloadAndType.scala:49-120)
EVENTS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField(
            "events",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("seqNr", T.LongType()),
                        T.StructField("tags", T.ArrayType(T.StringType())),
                        T.StructField("payloadType", T.StringType()),
                        T.StructField("payload", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "metadata",
            T.StructType([T.StructField("expireAfterMs", T.LongType())]),
        ),
    ]
)


def action_header_json(df: DataFrame) -> Column:
    """Encode action columns into the one-of header JSON (E3 forward)."""
    is_append = F.col("action_type") == "append"
    is_delete = F.col("action_type") == "delete"
    is_purge = F.col("action_type") == "purge"
    append_doc = F.struct(
        F.struct(
            F.col("seq_nr_from").alias("from"), F.col("seq_nr_to").alias("to")
        ).alias("range"),
        F.col("origin"),
        F.col("version"),
        F.col("payload_type").alias("payloadType"),
    )
    delete_doc = F.struct(F.col("delete_to").alias("to"), F.col("origin"), F.col("version"))
    purge_doc = F.struct(F.col("origin"), F.col("version"))
    mark_doc = F.struct(F.col("mark_id").alias("id"), F.col("origin"), F.col("version"))
    return F.when(is_append, F.to_json(F.struct(append_doc.alias("append")))).when(
        is_delete, F.to_json(F.struct(delete_doc.alias("delete")))
    ).when(is_purge, F.to_json(F.struct(purge_doc.alias("purge")))).otherwise(
        F.to_json(F.struct(mark_doc.alias("mark")))
    )


def events_payload_json(df: DataFrame) -> Column:
    """Encode an append's events into the value-blob JSON (E1 forward).

    Works from either a ``payloads`` array (multi-event batch) or the single
    ``payload`` column; tags default to empty.
    """
    tags = (
        F.coalesce(F.col("tags"), F.array().cast("array<string>"))
        if "tags" in df.columns
        else F.array().cast("array<string>")
    )
    if "payloads" in df.columns:
        events = F.zip_with(
            F.sequence("seq_nr_from", "seq_nr_to"),
            F.col("payloads"),
            lambda s, p: F.struct(
                s.alias("seqNr"),
                tags.alias("tags"),
                F.col("payload_type").alias("payloadType"),
                p.alias("payload"),
            ),
        )
    else:
        events = F.array(
            F.struct(
                F.col("seq_nr_from").alias("seqNr"),
                tags.alias("tags"),
                F.col("payload_type").alias("payloadType"),
                F.col("payload").alias("payload"),
            )
        )
    doc = F.struct(
        events.alias("events"),
        F.struct(F.lit(None).cast("long").alias("expireAfterMs")).alias("metadata"),
    )
    return F.to_json(doc)


def encode_actions_to_kafka(actions: DataFrame) -> DataFrame:
    """actions -> Kafka-record-shaped DataFrame (S1 sink shape).

    key = journal id (keyed produce pins a key to one partition, exactly the
    reference's ordering guarantee), value = events JSON blob (appends only),
    headers = [(journal.action, header JSON)].
    """
    is_append = F.col("action_type") == "append"
    return actions.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
        F.col("id").cast("binary").alias("key"),
        F.when(is_append, events_payload_json(actions).cast("binary")).alias("value"),
        F.array(
            F.struct(
                F.lit(KAFKA_HEADER_KEY).alias("key"),
                action_header_json(actions).cast("binary").alias("value"),
            )
        ).alias("headers"),
    )


def decode_kafka_to_actions(kafka_df: DataFrame) -> DataFrame:
    """Kafka-record-shaped DataFrame -> actions (E2/E3 reverse).

    Header-only dispatch: the action type and seq range come from the
    ``journal.action`` header; the value blob is only parsed for appends
    (the reference's "don't deserialize unrelated records" rule — projecting
    the header before touching ``value`` lets Spark prune the blob column
    for non-append rows).
    """
    # F.get tolerates records without the journal.action header (foreign
    # producers on the topic); those rows are skipped, as the reference's
    # ConsRecordToActionRecord does by returning None
    hdr = F.get(F.filter(F.col("headers"), lambda h: h["key"] == KAFKA_HEADER_KEY), 0)[
        "value"
    ].cast("string")
    df = (
        kafka_df.withColumn("_hdr_raw", hdr)
        .filter(F.col("_hdr_raw").isNotNull())
        .withColumn("_hdr", F.from_json(F.col("_hdr_raw"), ACTION_HEADER_SCHEMA))
    )
    action_type = (
        F.when(F.col("_hdr.append").isNotNull(), "append")
        .when(F.col("_hdr.delete").isNotNull(), "delete")
        .when(F.col("_hdr.purge").isNotNull(), "purge")
        .otherwise("mark")
    )
    df = df.withColumn("_type", action_type)
    blob = F.from_json(F.col("value").cast("string"), EVENTS_PAYLOAD_SCHEMA)
    df = df.withColumn("_blob", F.when(F.col("_type") == "append", blob))
    return df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("key").cast("string").alias("id"),
        F.col("_type").alias("action_type"),
        F.col("timestamp"),
        F.coalesce(
            F.col("_hdr.append.origin"),
            F.col("_hdr.delete.origin"),
            F.col("_hdr.purge.origin"),
            F.col("_hdr.mark.origin"),
        ).alias("origin"),
        F.coalesce(
            F.col("_hdr.append.version"),
            F.col("_hdr.delete.version"),
            F.col("_hdr.purge.version"),
            F.col("_hdr.mark.version"),
        ).alias("version"),
        F.col("_hdr.append.range.from").alias("seq_nr_from"),
        F.col("_hdr.append.range.to").alias("seq_nr_to"),
        F.col("_hdr.append.payloadType").alias("payload_type"),
        F.when(F.col("_type") == "append", F.col("_blob.events")[0]["payload"]).alias(
            "payload"
        ),
        F.when(F.col("_type") == "append", F.col("_blob.events")[0]["tags"]).alias(
            "tags"
        ),
        F.when(
            F.col("_type") == "append",
            F.transform(F.col("_blob.events"), lambda e: e["payload"]),
        ).alias("payloads"),
        F.col("_hdr.delete.to").alias("delete_to"),
        F.col("_hdr.mark.id").alias("mark_id"),
    )
