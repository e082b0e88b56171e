"""Parity pin for the batch-vectorized envelope decoder.

``decode_events_binary_batch`` (the ``mapinarrow`` impl's kernel) must
agree with the per-row ``unpack_events_binary`` reference on EVERY blob:
valid envelopes decode to identical rows; blobs the kernel rejects
(short buffers, negative counts/sizes, reads off the buffer end,
malformed UTF-8 in tags/metadata) yield null events AND null metadata.

The sweep covers the hand-built structural cases, random valid
envelopes (mixed payload types, unicode tags/metadata, 0..4 events),
pure random garbage, and — the adversarial class — VALID envelopes with
random bit flips, which exercise the lax-walk paths (lying size
prefixes whose reads stay in-bounds, clipped tag/payload slices).

No SparkSession needed: this pins the kernel pair directly; the Spark
wiring is pinned by test_bin_codec_jvm.py::test_wire_roundtrip_impl_
equivalence (the ``mapinarrow`` leg).
"""

from __future__ import annotations

import random

from kafka_journal_spark.codecs import (
    decode_events_binary_batch,
    pack_events_binary,
    unpack_events_binary,
)


def _rand_valid(rng: random.Random) -> bytes:
    evs = []
    for _ in range(rng.randint(0, 4)):
        pt = rng.choice(["binary", "json", "text", None])
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 24)))
        evs.append(
            {
                "seqNr": rng.randint(-(2**62), 2**62),
                "tags": [f"tag{t}" for t in range(rng.randint(0, 3))]
                + (["ünïcødé"] if rng.random() < 0.3 else []),
                "payloadType": pt,
                "payload": payload if pt else None,
            }
        )
    md = rng.choice(["{}", '{"a":1}', "", '{"x":"ü"}'])
    return pack_events_binary(evs, md)


def _blob_corpus() -> list:
    rng = random.Random(0xC0FFEE)
    blobs: list = [
        None,
        b"",
        b"\x00",
        b"\x01\x00\x00",
        b"\x01\x00\x00\x00\x05" + b"\x00" * 4,  # claims 5 events, has none
        b"\x01\x00\x00\x00\x01\x00\x00\x00\x11" + b"\x00" * 17 + b"\xff\xfe",
        b"\x01\xff\xff\xff\xff",  # negative count
        b"\x00\x00\x00\x00\x00",  # version 0, zero events
        b"\x02\x00\x00\x00\x00v2-tail-is-not-metadata",
    ]
    blobs += [_rand_valid(rng) for _ in range(300)]
    blobs += [
        bytes(rng.getrandbits(8) for _ in range(rng.randint(1, 80)))
        for _ in range(300)
    ]
    for _ in range(300):  # bit-flipped valid envelopes: the lax-walk class
        b = bytearray(_rand_valid(rng))
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        blobs.append(bytes(b))
    return blobs


def test_batch_decoder_matches_kernel_on_mutation_sweep():
    blobs = _blob_corpus()
    ev_arr, md_arr = decode_events_binary_batch(blobs)
    ev_py, md_py = ev_arr.to_pylist(), md_arr.to_pylist()
    assert len(ev_py) == len(blobs)
    for i, b in enumerate(blobs):
        try:
            ref = unpack_events_binary(b)
        except Exception:
            ref = None
        if ref is None:
            assert ev_py[i] is None and md_py[i] is None, (i, b, ev_py[i])
        else:
            want = [
                {
                    "seqNr": e["seqNr"],
                    "tags": e["tags"],
                    "payloadType": e["payloadType"],
                    "payload": e["payload"],
                }
                for e in ref["events"]
            ]
            assert ev_py[i] == want, (i, b)
            assert md_py[i] == ref["metadata"], (i, b)


def test_batch_decoder_empty_and_degenerate_batches():
    ev, md = decode_events_binary_batch([])
    assert len(ev) == 0 and len(md) == 0
    ev, md = decode_events_binary_batch([None, b"", b"\x01"])
    assert ev.to_pylist() == [None, None, None]
    assert md.to_pylist() == [None, None, None]
    # single minimal valid envelope: version 1, zero events, metadata tail
    ev, md = decode_events_binary_batch([b"\x01\x00\x00\x00\x00" + b'{"k":2}'])
    assert ev.to_pylist() == [[]]
    assert md.to_pylist() == ['{"k":2}']


def test_json_only_envelope_decode_matches_full_dispatch(spark):
    """The r12 short-circuit: when encode_actions_to_kafka provably wrote
    no binary envelope (no payload_bin/payloads_bin column), the decoder
    skips the Arrow blob decoder (typed-NULL _blob_bin) — the decoded
    actions must be IDENTICAL to the full-dispatch path, including the
    degenerate row whose HEADER claims payloadType='binary' without a bin
    column (the Arrow kernel's corrupt-blob tolerance returns NULL for the
    JSON byte stream, which is exactly the short-circuit's literal)."""
    from conftest import append, delete, make_actions, purge
    from pyspark.sql import functions as F

    from kafka_journal_spark.codecs import (
        decode_kafka_to_actions,
        encode_actions_to_kafka,
    )

    acts = make_actions(
        spark,
        [
            append("a", 1),
            dict(append("a", 2), payload_type="json"),
            delete("a", 1),
            purge("b"),
            # the degenerate shape: header says binary, but the encoder
            # had no bin column and wrote the JSON document anyway
            dict(append("c", 1), payload_type="binary"),
        ],
    )
    enc = encode_actions_to_kafka(acts)
    assert getattr(enc, "_kjs_json_only_envelope", False)

    dec_fast = decode_kafka_to_actions(enc)
    assert "ArrowEvalPython" not in dec_fast._jdf.queryExecution().executedPlan().toString()

    enc_full = encode_actions_to_kafka(acts)
    del enc_full._kjs_json_only_envelope
    dec_full = decode_kafka_to_actions(enc_full)
    assert "ArrowEvalPython" in dec_full._jdf.queryExecution().executedPlan().toString()

    def rows(df):
        out = df.withColumn("tags", F.to_json("tags")).withColumn(
            "headers", F.to_json("headers")
        )
        return sorted(map(tuple, out.collect()))

    assert rows(dec_fast) == rows(dec_full)

    # and a frame carrying REAL binary envelopes must keep the full path
    bin_acts = acts.withColumn(
        "payload_bin",
        F.when(F.col("action_type") == "append", F.unhex(F.md5("payload"))),
    )
    enc_bin = encode_actions_to_kafka(bin_acts)
    assert not getattr(enc_bin, "_kjs_json_only_envelope", False)
