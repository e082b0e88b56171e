"""JVM-expression envelope codec vs the Python kernel (its executable spec).

The binary envelope (Events.scala:14-36 scodec layout) has two
implementations: the Arrow-batched pandas UDFs whose kernel is
``pack_events_binary``/``unpack_events_binary`` (golden-pinned against
reference bytes in test_golden_wire_compat.py), and the pure-expression
form (`events_bin_encode_expr`/`events_bin_decode_expr`) that keeps the
hot path JVM-side.  These tests hold the two implementations bit-for-bit
equal — randomized structure sweep plus hand-picked edges — and pin the
corruption contract: a blob the kernel rejects must yield a NULL row,
never a failed task.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_journal_spark import codecs as C

EVENTS_DF_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("events", T.ArrayType(C.EVENT_BIN_STRUCT)),
        T.StructField("metadata", T.StringType()),
        T.StructField("pybytes", T.BinaryType()),
    ]
)


def _norm_events(evs):
    return [
        (
            e["seqNr"],
            list(e["tags"]),
            e["payloadType"],
            bytes(e["payload"]) if e["payload"] is not None else None,
        )
        for e in evs
    ]


def _random_case(rng: random.Random):
    """One randomized (events, metadata) batch covering every layout arm."""
    n = rng.randint(1, 5)
    events = []
    for k in range(n):
        ptype = rng.choice(["binary", "json", "text", None])
        payload = (
            None
            if ptype is None and rng.random() < 0.5
            else bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 40)))
        )
        if payload is None:
            ptype = None
        tags = [
            rng.choice(["", "a", "tag-β", "日本語", "x" * 30])
            for _ in range(rng.randint(0, 4))
        ]
        events.append(
            {
                "seqNr": rng.choice([k + 1, 0, -5, 2**62, rng.getrandbits(40)]),
                "tags": tags,
                "payloadType": ptype,
                "payload": payload,
            }
        )
    metadata = rng.choice(["{}", "", '{"expireAfter":"7 seconds"}', '{"k":"ü"}'])
    return events, metadata


def _build_df(spark, cases):
    rows = []
    for i, (evs, md) in enumerate(cases):
        py = C.pack_events_binary([dict(e) for e in evs], md)
        rows.append((i, [tuple(e[f] for f in ("seqNr", "tags", "payloadType", "payload")) for e in evs], md, py))
    return spark.createDataFrame(rows, EVENTS_DF_SCHEMA)


def test_encode_byte_parity_random(spark):
    rng = random.Random(0xC0DEC)
    cases = [_random_case(rng) for _ in range(60)]
    df = _build_df(spark, cases)
    out = df.select(
        "i",
        "pybytes",
        C.events_bin_encode_expr(F.col("events"), F.col("metadata")).alias("jvm"),
    ).collect()
    for r in out:
        assert bytes(r.jvm) == bytes(r.pybytes), f"case {r.i}"


def test_decode_value_parity_random(spark):
    rng = random.Random(0xDEC0DE)
    cases = [_random_case(rng) for _ in range(60)]
    df = _build_df(spark, cases)
    out = df.select("i", "pybytes", C.events_bin_decode_expr(F.col("pybytes")).alias("d")).collect()
    for r in out:
        py = C.unpack_events_binary(bytes(r.pybytes))
        d = r.d.asDict(recursive=True)
        assert _norm_events(d["events"]) == _norm_events(py["events"]), f"case {r.i}"
        assert d["metadata"] == py["metadata"], f"case {r.i}"


def test_decode_version0_and_legacy_prefixes(spark):
    """choice(version1, version0, default) fallbacks (Events.scala:21-30):
    0x00 => events, '{}' metadata; any other byte => legacy skip-one."""
    body = C.pack_events_binary([{"seqNr": 3, "tags": ["t"], "payloadType": "text", "payload": b"p"}], "IGNORED")
    v0 = b"\x00" + body[1 : body.index(b"IGNORED")]
    legacy = b"\x7f" + body[1 : body.index(b"IGNORED")]
    df = spark.createDataFrame([(0, v0), (1, legacy)], "i int, blob binary")
    out = {r.i: r.d.asDict(recursive=True) for r in df.select("i", C.events_bin_decode_expr(F.col("blob")).alias("d")).collect()}
    for i, blob in ((0, v0), (1, legacy)):
        py = C.unpack_events_binary(blob)
        assert _norm_events(out[i]["events"]) == _norm_events(py["events"])
        assert out[i]["metadata"] == py["metadata"] == "{}"


def test_decode_corrupt_blobs_null_not_crash(spark):
    """The standing probe: corrupt/foreign blobs are tolerated per-row."""
    rng = random.Random(0xBAD)
    blobs = [
        None,
        b"",
        b"\x00",
        b"\x01\x00\x00",
        b"\x01\x00\x00\x00\x05" + b"\x00" * 4,  # claims 5 events, has none
        b"\x01\x00\x00\x00\x01\x00\x00\x00\x11" + b"\x00" * 17 + b"\xff\xfe",  # bad utf8 tail
        b"\x01\xff\xff\xff\xff",  # negative count
    ] + [bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 64))) for _ in range(40)]
    n_structured = 7  # blobs[:7] are the hand-built structural cases
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "i int, blob binary"
    )
    out = df.select("i", C.events_bin_decode_expr(F.col("blob")).alias("d")).collect()
    for r in out:
        blob = blobs[r.i]
        try:
            py = C.unpack_events_binary(blob)
        except Exception:
            py = None
        if py is not None and r.d is not None:
            # when both sides decode, they must agree
            d = r.d.asDict(recursive=True)
            assert _norm_events(d["events"]) == _norm_events(py["events"]), r.i
            assert d["metadata"] == py["metadata"], r.i
        if py is None:
            # kernel rejects => expression must too (never garbage rows)
            assert r.d is None, f"blob {r.i}: jvm decoded what the kernel rejects"
        if r.i < n_structured:
            # on the curated structural cases the twins must agree on
            # ACCEPTANCE in both directions (the negative-count blob used
            # to split them: kernel empty-events vs expression NULL).  For
            # arbitrary random garbage only the direction above is pinned:
            # the expression's count bound (>= 21 bytes/event) may reject
            # lying size-prefixes the lax kernel happens to walk through —
            # strictness, never fabrication.
            assert (py is None) == (r.d is None), (
                f"blob {r.i}: acceptance divergence (kernel={'rej' if py is None else 'acc'},"
                f" expr={'rej' if r.d is None else 'acc'})"
            )


def test_wire_roundtrip_impl_equivalence(spark, monkeypatch):
    """encode_actions_to_kafka/decode_kafka_to_actions produce identical
    bytes and rows under both codec implementations on a mixed batch
    (binary appends + control records)."""
    from conftest import append, delete, make_actions, mark

    acts = make_actions(
        spark, [append("a", 1), append("a", 2), delete("a", 1), mark("a")]
    )
    bin_acts = acts.withColumn(
        "payload_bin",
        F.when(F.col("action_type") == "append", F.unhex(F.md5("payload"))),
    ).withColumn(
        "payload_type",
        F.when(F.col("action_type") == "append", F.lit("binary")),
    )
    results = {}
    impls = ("jvm", "arrow", "hybrid", "mapinarrow")
    for impl in impls:
        monkeypatch.setattr(C, "BIN_CODEC_IMPL", impl)
        enc = C.encode_actions_to_kafka(bin_acts)
        dec = C.decode_kafka_to_actions(enc)
        results[impl] = sorted(
            (
                r.id,
                r.action_type,
                r.seq_nr_from,
                bytes(r.payload_bin) if r.payload_bin is not None else None,
                r.metadata,
            )
            for r in dec.collect()
        )
        results[impl + "_bytes"] = sorted(
            (r.offset, bytes(r.value) if r.value is not None else None)
            for r in enc.collect()
        )
    for impl in impls[1:]:
        assert results["jvm"] == results[impl], impl
        assert results["jvm_bytes"] == results[impl + "_bytes"], impl
