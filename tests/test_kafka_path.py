"""Full Kafka-path composition: actions encoded to the Kafka envelope,
streamed (file-source stand-in for a broker), decoded header-first, and
replicated — the store must equal direct batch materialization.  This is
the exact production wiring: readStream(kafka) -> decode -> foreachBatch
replicate."""

from __future__ import annotations

from conftest import append, delete, make_actions, purge

from kafka_journal_spark.codecs import decode_kafka_to_actions, encode_actions_to_kafka
from kafka_journal_spark.operators.replicate import materialize_journal
from kafka_journal_spark.sources.statestore import JournalStore
from kafka_journal_spark.streaming.replicator import replicate_batch

KAFKA_DDL = (
    "topic string, partition int, offset long, timestamp timestamp, "
    "key binary, value binary, headers array<struct<key:string,value:binary>>"
)


def test_envelope_stream_to_store(spark, tmp_path):
    acts = [
        append("a", 1), append("a", 2), delete("a", 1),
        append("b", 1), purge("b"), append("b", 2), append("a", 3),
    ]
    actions_df = make_actions(spark, acts)
    # producer side: encode to the Kafka envelope, land in the "broker"
    encoded = encode_actions_to_kafka(actions_df)
    broker = str(tmp_path / "broker")
    encoded.write.parquet(broker)

    # replicator side: stream the envelope, decode, replicate
    store = JournalStore(spark, str(tmp_path / "store"))
    stream = spark.readStream.schema(KAFKA_DDL).parquet(broker)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: replicate_batch(decode_kafka_to_actions(df), store)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r.id, r.seq_nr, r.payload_txt)
        for r in store.read().select("id", "seq_nr", "payload_txt").collect()
    )
    want = sorted(
        (r.id, r.seq_nr, r.payload_txt)
        for r in materialize_journal(actions_df)
        .select("id", "seq_nr", "payload_txt")
        .collect()
    )
    assert got == want and len(got) > 0


def test_wide_columns_survive_kafka_to_store(spark, tmp_path):
    """Binary payloads, user headers and payload metadata must survive the
    full wire: encode -> Kafka shape -> decode -> replicate -> store.read()
    (JournalStatements.scala:34-52 column parity)."""
    from pyspark.sql import functions as F

    acts = make_actions(spark, [append("a", 1), append("a", 2), delete("a", 1)])
    wide = (
        acts.withColumn(
            "payload_bin",
            F.when(F.col("action_type") == "append", F.unhex(F.md5("payload"))),
        )
        .withColumn(
            "payload_type",
            F.when(F.col("action_type") == "append", F.lit("binary")),
        )
        .withColumn(
            "headers",
            F.when(
                F.col("action_type") == "append",
                F.create_map(F.lit("trace"), F.concat(F.lit("t-"), F.col("offset"))),
            ),
        )
    )
    store = JournalStore(spark, str(tmp_path / "wide-store"))
    replicate_batch(decode_kafka_to_actions(encode_actions_to_kafka(wide)), store)
    rows = {r.seq_nr: r for r in store.read().collect()}
    # only seq 2 survives delete(to=1)
    assert set(rows) == {2}
    orig = {r.seq_nr_from: r for r in wide.filter("action_type = 'append'").collect()}
    r = rows[2]
    assert bytes(r.payload_bin) == bytes(orig[2].payload_bin)
    assert r.payload_txt is None and r.payload_type == "binary"
    assert dict(r.headers) == {"trace": f"t-{orig[2].offset}"}
    assert r.metadata == "{}"
