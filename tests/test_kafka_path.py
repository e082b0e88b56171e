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
