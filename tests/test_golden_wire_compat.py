"""CROSS-IMPLEMENTATION wire compatibility: decode the reference's own
committed golden fixture bytes — not self-generated lookalikes — and
reproduce the exact values its specs assert.

Fixture provenance (reference test resources, consumed by
``EventsToBytesSpec.scala`` / ``ActionHeaderJsonSpec.scala``):
``journal/src/test/resources/com/evolution/kafka/journal/``
  - ``v{0,1}-events-{empty,binary,text,json,*-many,empty-binary-text-json}.bin``
    — the versioned scodec events envelope (Events.scala:14-36);
  - ``Append-*/Delete-*/Mark-*/Purge-*.json`` — the ``journal.action``
    Kafka-header one-of document (ActionHeader.scala:19-95);
  - ``Payload-*.json`` / ``Payload-binary*.bin`` — the record-value blob in
    JSON / binary form (PayloadAndType.scala:49-120).

Until this file existed, envelope compatibility was self-attested
(roundtrip through our own codec).  Here the bytes were written by the
reference's scodec/play-json serializers; decoding them to the spec's
expected values — and re-encoding v1 envelopes BYTE-IDENTICAL — is the
interop proof.
"""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference/journal/src/test/resources/com/evolution/kafka/journal"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture resources not present"
)


def _read(name: str) -> bytes:
    with open(os.path.join(REF, name), "rb") as f:
        return f.read()


def _tags(seq_nr: int) -> set[str]:
    # EventsToBytesSpec.event: tags = (0 to seqNr).map(_.toString).toSet —
    # Scala Set iteration order is arbitrary, so compare as sets
    return {str(i) for i in range(seq_nr + 1)}


#: EventsToBytesSpec's example values: name -> [(seqNr, payloadType, payload)]
EVENTS_EXAMPLES = {
    "empty": [(1, None, None)],
    "binary": [(1, "binary", b"binary")],
    "text": [(1, "text", b"text")],
    "json": [(1, "json", b'"json"')],
    "empty-many": [(1, None, None), (2, None, None), (3, None, None)],
    "binary-many": [(1, "binary", b"1"), (2, "binary", b"2"), (3, "binary", b"3")],
    "text-many": [(1, "text", b"1"), (2, "text", b"2"), (3, "text", b"3")],
    "json-many": [(1, "json", b'"1"'), (2, "json", b'"2"'), (3, "json", b'"3"')],
    "empty-binary-text-json": [
        (1, None, None),
        (2, "binary", b"binary"),
        (3, "text", b"text"),
        (4, "json", b'"json"'),
    ],
}

#: names whose V1 file carries PayloadMetadata(1 day, {"key": "value"})
#: (the spec's first list); the rest serialize PayloadMetadata.empty
V1_WITH_METADATA = {
    "json", "empty-many", "binary-many", "text-many", "json-many",
    "empty-binary-text-json",
}
PAYLOAD_METADATA = {"expireAfter": "1 day", "data": {"key": "value"}}


@pytest.mark.parametrize("name", sorted(EVENTS_EXAMPLES))
@pytest.mark.parametrize("version", [0, 1])
def test_events_envelope_decodes_reference_bytes(name: str, version: int):
    """fromBytes parity: our decoder reproduces EventsToBytesSpec's expected
    Events values from the reference's exact committed bytes (both the v1
    format and the v0 fallback)."""
    from kafka_journal_spark.codecs import unpack_events_binary

    raw = _read(f"v{version}-events-{name}.bin")
    out = unpack_events_binary(raw)
    assert out is not None
    got = [
        (e["seqNr"], set(e["tags"]), e["payloadType"], e["payload"])
        for e in out["events"]
    ]
    want = [(s, _tags(s), t, p) for (s, t, p) in EVENTS_EXAMPLES[name]]
    assert got == want
    if version == 1 and name in V1_WITH_METADATA:
        assert json.loads(out["metadata"]) == PAYLOAD_METADATA
    else:
        assert json.loads(out["metadata"]) == {}


@pytest.mark.parametrize("name", sorted(EVENTS_EXAMPLES))
def test_events_envelope_reencodes_v1_byte_identical(name: str):
    """toBytes parity: packing the decoded events reproduces the reference's
    v1 file byte-for-byte — our writer's output is indistinguishable from
    the reference's scodec encoder."""
    from kafka_journal_spark.codecs import pack_events_binary, unpack_events_binary

    raw = _read(f"v1-events-{name}.bin")
    out = unpack_events_binary(raw)
    assert pack_events_binary(out["events"], out["metadata"]) == raw


# --------------------------------------------------------------------------
# ActionHeader one-of JSON (ActionHeaderJsonSpec examples)
# --------------------------------------------------------------------------


def _parse_headers(spark, names):
    from pyspark.sql import functions as F

    from kafka_journal_spark.codecs import ACTION_HEADER_SCHEMA

    rows = [(n, _read(n).decode("utf-8")) for n in names]
    df = spark.createDataFrame(rows, "name string, raw string")
    out = df.select(
        "name", "raw", F.from_json("raw", ACTION_HEADER_SCHEMA).alias("h")
    )
    return {r.name: r for r in out.collect()}


def test_append_headers_decode_reference_fixtures(spark):
    """All 16 committed Append-*.json variants (origin × payloadType ×
    metadata incl. the legacy format) parse through ACTION_HEADER_SCHEMA to
    the spec's appendExample values: range 1..5, version none."""
    names = [
        f"Append-{o}-{p}-{m}.json"
        for o in ("origin", "None")
        for p in ("Binary", "Json")
        for m in ("metadata", "none", "legacy")
    ]
    got = _parse_headers(spark_or_skip(spark), names)
    for n, r in got.items():
        h = r.h
        assert h.append is not None and h.delete is None, n
        assert (h.append.range["from"], h.append.range["to"]) == (1, 5), n
        assert h.append.version is None, n
        assert h.append.payloadType == ("binary" if "-Binary-" in n else "json"), n
        assert h.append.origin == ("origin" if n.startswith("Append-origin") else None), n
        # HeaderMetadata rides untyped: spot-check via raw JSON
        data = json.loads(r.raw)["append"].get("metadata", {}).get("data")
        assert data == ({"key": "value"} if "-metadata.json" in n else None), n


def test_delete_purge_mark_headers_decode_reference_fixtures(spark):
    names = [
        "Delete-None.json", "Delete-origin.json",
        "Purge-None.json", "Purge-origin.json",
        "Mark-None.json", "Mark-origin.json",
    ]
    got = _parse_headers(spark_or_skip(spark), names)
    for n, r in got.items():
        h = r.h
        origin = "origin" if "-origin" in n else None
        if n.startswith("Delete"):
            assert h.delete["to"] == 3 and h.delete.version == "0.0.1", n
            assert h.delete.origin == origin, n
        elif n.startswith("Purge"):
            assert h.purge is not None and h.purge.version is None, n
            assert h.purge.origin == origin, n
        else:
            assert h.mark.id == "id" and h.mark.version is None, n
            assert h.mark.origin == origin, n


def spark_or_skip(spark):
    return spark


# --------------------------------------------------------------------------
# Record-value payload documents (Payload-*.json / Payload-binary*.bin)
# --------------------------------------------------------------------------


def test_payload_json_documents_decode_reference_fixtures(spark):
    """The committed JSON value blobs parse through EVENTS_PAYLOAD_SCHEMA —
    including PayloadMetadata.expireAfter as the reference's duration
    string ("1 day" → 86400 s via duration_to_secs)."""
    from pyspark.sql import functions as F

    from kafka_journal_spark.codecs import EVENTS_PAYLOAD_SCHEMA, duration_to_secs

    names = [
        "Payload-text.json", "Payload-json.json", "Payload-empty.json",
        "Payload-text-many.json",
    ]
    rows = [(n, _read(n).decode("utf-8")) for n in names]
    df = spark.createDataFrame(rows, "name string, raw string")
    out = {
        r.name: r
        for r in df.select(
            "name",
            F.from_json("raw", EVENTS_PAYLOAD_SCHEMA).alias("b"),
        )
        .select(
            "name",
            "b",
            duration_to_secs(F.col("b.metadata.expireAfter")).alias("ttl_secs"),
        )
        .collect()
    }

    e = out["Payload-text.json"].b.events
    assert [(x.seqNr, set(x.tags), x.payloadType, x.payload) for x in e] == [
        (1, {"0", "1"}, "text", ' {"key":"value"} ')
    ]
    assert out["Payload-text.json"].ttl_secs is None

    e = out["Payload-json.json"].b.events
    # payloadType json with a JSON-string payload — from_json surfaces the
    # nested value as its JSON text
    assert (e[0].seqNr, set(e[0].tags), e[0].payloadType) == (1, {"0", "1"}, "json")

    e = out["Payload-empty.json"].b.events
    assert [(x.seqNr, x.payloadType, x.payload) for x in e] == [(1, None, None)]

    r = out["Payload-text-many.json"]
    assert [(x.seqNr, x.payloadType, x.payload) for x in r.b.events] == [
        (1, "text", "1"),
        (2, "text", "2"),
    ]
    # "1 day" — the exact committed duration string
    assert r.ttl_secs == 86400


def test_payload_binary_envelopes_decode_reference_fixtures():
    from kafka_journal_spark.codecs import unpack_events_binary

    one = unpack_events_binary(_read("Payload-binary.bin"))
    assert [
        (e["seqNr"], set(e["tags"]), e["payloadType"], e["payload"])
        for e in one["events"]
    ] == [(1, {"0", "1"}, "binary", b"payload")]
    assert json.loads(one["metadata"]) == {}

    many = unpack_events_binary(_read("Payload-binary-many.bin"))
    assert [(e["seqNr"], e["payloadType"], e["payload"]) for e in many["events"]] == [
        (1, "binary", b"1"),
        (2, "binary", b"2"),
    ]


# --------------------------------------------------------------------------
# duration_to_secs: the FiniteDuration wire forms the reference can emit
# --------------------------------------------------------------------------


def test_duration_to_secs_parses_reference_wire_forms(spark):
    from pyspark.sql import functions as F

    from kafka_journal_spark.codecs import duration_to_secs

    cases = [
        ("1 day", 86400),
        ("2 days", 172800),
        ("12 hours", 43200),
        ("1 hour", 3600),
        ("5 minutes", 300),
        ("90000 seconds", 90000),
        ("43200000 milliseconds", 43200),
        ("1500 ms", 1),
        ("86400000", 86400),  # bare number => millis (Reads fromNumber)
        ("500", 0),
        ("weird stuff", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, raw string"
    )
    got = {
        r.i: r.secs
        for r in df.select("i", duration_to_secs(F.col("raw")).alias("secs")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, cases[i]
