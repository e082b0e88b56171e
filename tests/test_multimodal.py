"""Multimodal plumbing tests: schemas, mapInPandas fan-out, stub gating."""

from __future__ import annotations

import pytest

from kafka_journal_spark.functions.multimodal import (
    _decode_stub,
    extract_features,
    media_stats,
    synth_media,
)

SF = "/root/testdata/sf0.001"


def test_media_schema_and_blob(spark):
    m = synth_media(spark, SF, n=10)
    rows = m.collect()
    assert len(rows) == 10
    r = rows[0]
    assert isinstance(bytes(r.blob), bytes) and len(bytes(r.blob)) > 0
    assert r.mime.split("/")[0] in ("image", "audio", "video")


def test_feature_fanout_and_determinism(spark):
    m = synth_media(spark, SF, n=12)
    f1 = sorted(map(tuple, extract_features(m, frames_per_item=3).collect()))
    f2 = sorted(map(tuple, extract_features(m, frames_per_item=3).collect()))
    assert f1 == f2
    assert len(f1) == 12 * 3
    # frame hashes of different frames differ (real fan-out, not copies)
    by_media = {}
    for media_id, frame_idx, feat_hash, _ in f1:
        by_media.setdefault(media_id, set()).add(feat_hash)
    assert any(len(v) > 1 for v in by_media.values())


def test_decode_stub_rejects_unknown_mime():
    with pytest.raises(NotImplementedError):
        _decode_stub(b"x", "application/octet-stream")


def test_stats_never_reads_blob(spark):
    # the stats query consumes the n_bytes METADATA column, so the blob
    # derivation (encode) must be pruned clean out of the physical plan —
    # the pre-fix sum(length(blob)) silently forced every blob into the
    # read, the exact anti-pattern this test exists to catch
    plan = media_stats(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "encode(" not in plan, plan
    assert "blob" not in plan, plan
    df = media_stats(spark, SF)
    rows = {r.mime: r.n_items for r in df.collect()}
    assert sum(rows.values()) == 64 and set(rows) == {"image/png", "audio/wav", "video/mp4"}


def test_wav_decode_real_header_and_pcm(spark):
    """The WAV kernel must parse a genuine RIFF container: rate/frame-count
    come from the header, samples from little-endian PCM16 frames.  Expected
    features computed here in pure Python from the generator's closed form —
    independent of both the kernel and the SQL oracle."""
    import math

    from kafka_journal_spark.functions.multimodal import (
        _wav_samples,
        decode_wav_features,
        synth_wav_media,
    )

    media = synth_wav_media(spark, SF, n=8)
    # blobs are real WAV files: RIFF magic + fmt chunk
    blob = bytes(media.limit(1).collect()[0].blob)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"

    got = {r.media_id: r for r in decode_wav_features(media).collect()}
    assert set(got) == set(range(8))
    for mid in range(8):
        s = _wav_samples(mid)
        r = got[mid]
        assert r.sample_rate == 8000
        assert r.n_samples == len(s)
        assert r.amp_max == max(s) and r.amp_min == min(s)
        assert abs(r.amp_mean - sum(s) / len(s)) < 1e-9
        assert abs(r.rms - math.sqrt(sum(x * x for x in s) / len(s))) < 1e-9


def test_bmp_decode_is_real_and_orientation_sensitive(spark):
    """The BMP kernel parses real files (magic + headers) and its features
    match the pixel closed form computed scalar-side; flipping the row
    order in the file changes the position-weighted checksum — so the
    decoder genuinely undoes the bottom-up storage, it doesn't cancel out
    against the encoder."""
    import struct

    from kafka_journal_spark.functions.multimodal import (
        _bmp_dims,
        _bmp_pixel,
        decode_bmp_features,
        synth_bmp_media,
    )

    media = synth_bmp_media(spark, SF, n=8)
    rows = {r.media_id: bytes(r.blob) for r in media.collect()}
    assert all(b[:2] == b"BM" for b in rows.values())

    got = {r.media_id: r for r in decode_bmp_features(media).collect()}
    assert set(got) == set(range(8))
    for mid in range(8):
        w, h = _bmp_dims(mid)
        px = [_bmp_pixel(mid, x, y) for y in range(h) for x in range(w)]
        want_ck = sum(
            (3 * r + 5 * g + 7 * b) * (i + 1) for i, (r, g, b) in enumerate(px)
        )
        r = got[mid]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.checksum == want_ck
        assert abs(r.mean_r - sum(p[0] for p in px) / len(px)) < 1e-9

    # corrupt one blob: swap the first and last pixel rows in the file.
    # Channel means are unchanged, but the checksum must move.
    mid = 3
    blob = rows[mid]
    (offset,) = struct.unpack_from("<I", blob, 10)
    w, h = _bmp_dims(mid)
    stride = ((3 * w + 3) // 4) * 4
    body = bytearray(blob[offset:])
    first, last = bytes(body[:stride]), bytes(body[(h - 1) * stride:])
    body[:stride], body[(h - 1) * stride:] = last, first
    flipped = blob[:offset] + bytes(body)
    pdf = spark.createDataFrame(
        [(int(mid), "image/bmp", bytearray(flipped))],
        "media_id long, mime string, blob binary",
    )
    r2 = decode_bmp_features(pdf).collect()[0]
    assert abs(r2.mean_r - got[mid].mean_r) < 1e-9  # mass preserved
    assert r2.checksum != got[mid].checksum  # position detected


def test_decode_quarantine_mode_isolates_corrupt_blobs(spark):
    """At 100 TB one corrupt object must not kill the job: quarantine mode
    emits malformed blobs with null features + the error text, leaves good
    rows bit-identical to strict mode, and strict mode still raises."""
    import pytest as _pytest

    from kafka_journal_spark.functions.multimodal import (
        decode_bmp_features,
        synth_bmp_media,
    )

    good = synth_bmp_media(spark, SF, n=4)
    blobs = {r.media_id: bytes(r.blob) for r in good.collect()}
    rows = [(int(k), "image/bmp", bytearray(v)) for k, v in blobs.items()]
    rows.append((100, "image/bmp", bytearray(b"JUNKJUNKJUNK")))
    rows.append((101, "image/bmp", bytearray(blobs[0][:30])))  # truncated header
    mixed = spark.createDataFrame(rows, "media_id long, mime string, blob binary")

    got = {r.media_id: r for r in decode_bmp_features(mixed, on_error="quarantine").collect()}
    assert len(got) == 6
    assert got[100].decode_error and got[100].checksum is None
    assert got[101].decode_error and got[101].width is None
    strict = {r.media_id: r for r in decode_bmp_features(good).collect()}
    for mid in blobs:
        assert got[mid].decode_error is None
        assert got[mid].checksum == strict[mid].checksum

    with _pytest.raises(Exception, match="struct.error|ValueError|PythonException"):
        decode_bmp_features(mixed).collect()  # strict mode fails the job


def test_png_decode_real_filters_and_crc(spark):
    """The PNG kernel inflates real DEFLATE streams and reverses every
    filter type (the corpus cycles them per row); features match the pixel
    closed form computed scalar-side; a flipped bit breaks a chunk CRC and
    must raise (or quarantine), never silently skew stats."""
    import zlib

    import pytest

    from kafka_journal_spark.functions.multimodal import (
        PNG_SIG,
        _png_dims,
        _png_pixel,
        decode_png_features,
        synth_png_media,
    )

    media = synth_png_media(spark, SF, n=12)
    rows = {r.media_id: bytes(r.blob) for r in media.collect()}
    assert all(b[:8] == PNG_SIG for b in rows.values())
    # every filter type 0..4 appears in the corpus (heights reach >= 5)
    assert any(_png_dims(m)[1] >= 5 for m in rows)

    got = {r.media_id: r for r in decode_png_features(media).collect()}
    for mid in range(12):
        w, h = _png_dims(mid)
        px = [_png_pixel(mid, x, y) for y in range(h) for x in range(w)]
        want_ck = sum(
            (3 * r + 5 * g + 7 * b) * (i + 1) for i, (r, g, b) in enumerate(px)
        )
        r = got[mid]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.checksum == want_ck
        assert abs(r.mean_g - sum(p[1] for p in px) / len(px)) < 1e-9

    # flip one byte inside the IDAT payload -> CRC mismatch must surface
    blob = bytearray(rows[2])
    idat_at = blob.find(b"IDAT")
    blob[idat_at + 6] ^= 0xFF
    bad = spark.createDataFrame(
        [(2, "image/png", bytes(blob)), (3, "image/png", rows[3])],
        "media_id long, mime string, blob binary",
    )
    with pytest.raises(Exception, match="CRC"):
        decode_png_features(bad).collect()
    q = {r.media_id: r for r in decode_png_features(bad, on_error="quarantine").collect()}
    assert q[2].decode_error and "CRC" in q[2].decode_error
    assert q[2].checksum is None and q[3].decode_error is None

    # a truncated DEFLATE stream (valid CRC, short data) must also surface:
    # rebuild the IDAT chunk with a clipped-but-recompressed payload
    import struct

    w, h = _png_dims(5)
    src = rows[5]
    at = src.find(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", src, at)
    full = zlib.decompress(src[at + 8 : at + 8 + ln])
    clipped = zlib.compress(full[: len(full) - (1 + 3 * w)])  # drop last row
    chunk = (
        struct.pack(">I", len(clipped))
        + b"IDAT"
        + clipped
        + struct.pack(">I", zlib.crc32(b"IDAT" + clipped) & 0xFFFFFFFF)
    )
    trunc = src[:at] + chunk + src[at + 12 + ln :]
    bad2 = spark.createDataFrame(
        [(5, "image/png", trunc)], "media_id long, mime string, blob binary"
    )
    q2 = decode_png_features(bad2, on_error="quarantine").collect()[0]
    assert q2.decode_error and "size" in q2.decode_error
