"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus the mapInPandas plumbing for decode / feature-extract /
resize / frame-sample stages.

Three formats decode for REAL with stdlib-only parsers — WAV (RIFF/PCM16
via ``wave``), BMP (struct/numpy), and PNG (zlib DEFLATE + per-row filter
reversal) — each graded by a closed-form oracle independent of both codec
halves.  JPEG/MP4 genuinely need external codec libraries the container
lacks, so their kernels stay deterministic fakes behind ``_decode_stub``
(clearly marked; swap in PIL / pyav on a real cluster).  Everything
Spark-side is real and tested either way: schemas, Arrow batch shapes,
partitioning, and the UDF signatures — the part that has to be right at
100 TB.

Scale notes:
- blobs ride ``BinaryType`` columns: Arrow-batched into pandas, zero-copy
  where possible; batch size bounded via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory holds
  ``batch x blob`` comfortably.
- metadata (mime, width, height, duration) lives in plain columns so
  filters prune *before* any blob is decoded — decode only what survives
  the predicate.
- mapInPandas (not a scalar UDF) lets one input row fan out to N feature
  rows (frame sampling) without an explode of materialized blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _docs_cached(spark, path):
    # footer-schema cache for the immutable documents corpus (guide §6) —
    # schema is per-path metadata; the data is read from parquet every run
    from kafka_journal_spark.sources.tables import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, path)


def _media_ids(spark, sf_dir, n):
    """The ``media_id`` seed relation the three synth generators fan out
    from.  r12 negative result: round-robin-spreading these ids out of the
    monolithic docs row group (spread_unsplittable, the d_pii_scrub fix)
    was MEASURED 2.0-2.1x SLOWER for all three decoders — fanning 64 blobs
    across 32 mapInPandas tasks pays a fresh Python-worker/Arrow handshake
    per task that dwarfs the kernels, exactly the per-task-init cost guide
    §4.5 amortizes by keeping batches together.  The one-task form stays;
    at real scale a media corpus arrives in many row groups and
    parallelizes at the scan."""
    import os

    docs = _docs_cached(spark, os.path.join(sf_dir, "documents.parquet"))
    return docs.filter(F.col("doc_id") < n).select(F.col("doc_id").alias("media_id"))


MEDIA_SCHEMA = (
    "media_id long, mime string, width int, height int, duration_ms long, blob binary"
)

FEATURE_SCHEMA = (
    "media_id long, frame_idx int, feat_hash string, brightness double"
)


def synth_media(
    spark: SparkSession, sf_dir: str, n: int = 64, ascii_blob: bool = False
) -> DataFrame:
    """Deterministic fake media table derived from the documents corpus:
    blob = utf-8 text bytes, metadata derived from doc stats (stands in for
    a real object-store-backed media table).  ``ascii_blob=True`` swaps the
    blob for the 32 ASCII bytes of ``md5(text)`` — byte offsets == char
    offsets, which lets a SQL oracle reproduce the decode kernel's byte
    slices exactly (the row selection is a deterministic ``doc_id < n``
    filter, never ``limit``)."""
    import os

    docs = _docs_cached(spark, os.path.join(sf_dir, "documents.parquet")).filter(
        F.col("doc_id") < n
    )
    blob = (
        F.encode(F.md5("text"), "utf-8") if ascii_blob else F.encode("text", "utf-8")
    )
    # n_bytes is a METADATA column carrying the blob's size (as a real
    # object-store-backed media table would): stats queries read it
    # instead of measuring the blob, so the blob column prunes out of
    # their scan
    n_bytes = (
        F.lit(32).cast("long") if ascii_blob else F.octet_length("text").cast("long")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        n_bytes.alias("n_bytes"),
        blob.alias("blob"),
    )


def _decode_stub(blob: bytes, mime: str) -> bytes:
    """STUB: deterministic fake decode.  On a real cluster replace with
    PIL.Image.open / torchaudio.load / av.open.  Raises for unknown mimes
    exactly as a real decoder would."""
    if mime.split("/")[0] not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for mime {mime!r}")
    return blob  # identity "decode"


def extract_features(media: DataFrame, frames_per_item: int = 2) -> DataFrame:
    """Decode + frame-sample + featurize via mapInPandas: one media row ->
    ``frames_per_item`` feature rows.  The kernel is the stub; the batch
    iteration, fan-out and output schema are the real contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                decoded = _decode_stub(bytes(r.blob), r.mime)
                for f_idx in range(frames_per_item):
                    # deterministic per-frame slice of the decoded payload
                    lo = (len(decoded) * f_idx) // frames_per_item
                    hi = (len(decoded) * (f_idx + 1)) // frames_per_item
                    frame = decoded[lo:hi]
                    out.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": f_idx,
                            "feat_hash": hashlib.md5(frame).hexdigest(),
                            "brightness": (sum(frame) / len(frame)) if frame else 0.0,
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "feat_hash", "brightness"])

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# real audio decode: WAV (RIFF/PCM16) via the stdlib ``wave`` module — the
# one format the container can genuinely decode.  The mapInPandas fan-out,
# schema and blob pruning are shared with the stub kernels above; this
# kernel actually parses the container header and unpacks PCM frames.
# ---------------------------------------------------------------------------

WAV_RATE = 8_000

WAV_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, duration_ms double, "
    "amp_mean double, amp_max int, amp_min int, rms double"
)


def _wav_samples(doc_id: int) -> list[int]:
    """Deterministic PCM16 content: the SQL oracle recomputes features from
    this closed-form generator, NOT by replaying the decoder — a decode bug
    (endianness, header offset, frame width) shows up as a value mismatch."""
    n = 160 + doc_id % 96
    return [((doc_id * 2654435761 + i * 40503) % 65536) - 32768 for i in range(n)]


def synth_wav_media(spark: SparkSession, sf_dir: str, n: int = 64) -> DataFrame:
    """Media table whose blobs are REAL single-channel 16-bit PCM WAV files
    (RIFF header + frames), built per row with the stdlib ``wave`` writer —
    a deterministic stand-in for an object-store-backed audio corpus."""
    import io
    import os
    import struct
    import wave

    docs = _media_ids(spark, sf_dir, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                samples = _wav_samples(int(mid))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_RATE)
                    w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
                blobs.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "mime": "audio/wav", "blob": blobs}
            )

    return docs.mapInPandas(gen, schema="media_id long, mime string, blob binary")


def _quarantine_kernel(decode_one, cols, quarantine):
    """mapInPandas kernel shared by the three media decoders — ONE place
    owns the quarantine contract (``on_error='quarantine'`` yields a
    null-feature row plus ``decode_error`` instead of failing the task;
    ``'raise'`` propagates, failing loudly), so a change to quarantine
    semantics cannot silently miss a decoder."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                try:
                    rec = decode_one(bytes(r.blob))
                    if quarantine:
                        rec["decode_error"] = None
                except Exception as e:  # noqa: BLE001 — the quarantine contract
                    if not quarantine:
                        raise
                    rec = {c: None for c in cols[1:]}
                    rec["decode_error"] = f"{type(e).__name__}: {e}"
                rec["media_id"] = r.media_id
                out.append(rec)
            yield pd.DataFrame(out, columns=cols)

    return kernel


def decode_wav_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL decode through the mapInPandas fan-out: parse the RIFF header
    with ``wave``, unpack little-endian PCM16 frames, and compute audio
    features.  Everything (rate, frame count) comes from the parsed header —
    nothing is assumed from the generator.

    ``on_error``: ``'raise'`` fails the job on the first malformed blob
    (strict ingestion); ``'quarantine'`` emits the row with null features
    and the error text in ``decode_error`` instead — at 100 TB one corrupt
    object must not kill a 10-hour job, and the quarantine rows ARE the
    corruption report."""
    import io
    import math
    import wave

    import numpy as np

    quarantine = on_error == "quarantine"
    schema = WAV_FEATURE_SCHEMA + (", decode_error string" if quarantine else "")
    cols = [
        "media_id", "sample_rate", "n_samples", "duration_ms",
        "amp_mean", "amp_max", "amp_min", "rms",
    ] + (["decode_error"] if quarantine else [])

    def _decode_one(blob: bytes) -> dict:
        with wave.open(io.BytesIO(blob), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise ValueError("unsupported WAV layout")
            rate = w.getframerate()
            nf = w.getnframes()
            # vectorized frame decode: one frombuffer per blob, no
            # per-sample Python arithmetic.  Sums are exact int64
            # (PCM16: |sum| < 2^15 * nf, |sum of squares| < 2^30 * nf —
            # no overflow for any realistic clip), so the float results
            # are bit-identical to the scalar form.
            samples = np.frombuffer(w.readframes(nf), dtype="<i2")
            if samples.size != nf:
                # header promised nf frames; a truncated data chunk must
                # surface (or quarantine), never silently skew the stats
                raise ValueError(
                    f"truncated data chunk: header {nf} frames, got {samples.size}"
                )
        s64 = samples.astype(np.int64)
        return {
            "sample_rate": rate,
            "n_samples": nf,
            "duration_ms": nf * 1000.0 / rate,
            "amp_mean": int(s64.sum()) / nf,
            "amp_max": int(samples.max()),
            "amp_min": int(samples.min()),
            "rms": math.sqrt(int((s64 * s64).sum()) / nf),
        }

    return media.mapInPandas(
        _quarantine_kernel(_decode_one, cols, quarantine), schema=schema
    )


# ---------------------------------------------------------------------------
# real image decode: BMP (Windows BITMAPINFOHEADER, 24-bit uncompressed,
# bottom-up, 4-byte row stride) — the second real container format, parsed
# entirely with struct/numpy (no image libraries).  Wrong stride math, a
# missed row flip, or a BGR/RGB mixup each shows up as a value mismatch
# against the position-weighted closed-form oracle.
# ---------------------------------------------------------------------------

BMP_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_pixels int, "
    "mean_r double, mean_g double, mean_b double, luma_mean double, "
    "checksum long"
)


def _bmp_dims(media_id: int) -> tuple[int, int]:
    """Width 8..16 (so the 4-byte row stride padding is 0..3 bytes across
    the corpus — the padding path is genuinely exercised), height 6..10."""
    return 8 + media_id % 9, 6 + media_id % 5


def _bmp_pixel(media_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic (r, g, b) at logical position (x, y), y=0 = TOP row.
    The SQL oracle recomputes features from THIS closed form — never from
    the BMP bytes — so it is independent of both codec halves."""
    base = media_id * 7 + y * 13 + x * 29
    return (base + 173) % 256, (base + 91) % 256, base % 256


def synth_bmp_media(spark: SparkSession, sf_dir: str, n: int = 64) -> DataFrame:
    """Media table whose blobs are REAL 24-bit BMP files: BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR rows padded to 4-byte stride — built
    per row with struct/numpy (deterministic stand-in for an object-store
    image corpus)."""
    import os
    import struct

    import numpy as np

    docs = _media_ids(spark, sf_dir, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = _bmp_dims(mid)
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                base = (mid * 7 + y * 13 + x * 29).astype(np.int64)
                img = np.empty((h, w, 3), dtype=np.uint8)  # BGR on disk
                img[..., 0] = base % 256
                img[..., 1] = (base + 91) % 256
                img[..., 2] = (base + 173) % 256
                stride = ((3 * w + 3) // 4) * 4
                rows = np.zeros((h, stride), dtype=np.uint8)
                rows[:, : 3 * w] = img.reshape(h, 3 * w)
                pixel_data = rows[::-1].tobytes()  # bottom-up row order
                file_header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 54
                )
                info_header = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                    2835, 2835, 0, 0,
                )
                blobs.append(file_header + info_header + pixel_data)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "mime": "image/bmp", "blob": blobs}
            )

    return docs.mapInPandas(gen, schema="media_id long, mime string, blob binary")


def decode_bmp_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL decode: parse the BMP headers with struct (magic, data offset,
    dimensions, bpp, compression all read from the file, never assumed),
    undo the bottom-up row order and stride padding with numpy slicing, and
    compute channel statistics plus a position-weighted checksum
    ``sum((3r + 5g + 7b) * (x + y*w + 1))`` that catches orientation and
    stride bugs the channel means would miss.  Exact int64 sums; one
    ``frombuffer`` per blob, no per-pixel Python.

    ``on_error='quarantine'`` emits malformed blobs with null features and
    the error text in ``decode_error`` instead of failing the job (see
    :func:`decode_wav_features`)."""
    import struct

    import numpy as np

    quarantine = on_error == "quarantine"
    schema = BMP_FEATURE_SCHEMA + (", decode_error string" if quarantine else "")
    cols = [
        "media_id", "width", "height", "n_pixels",
        "mean_r", "mean_g", "mean_b", "luma_mean", "checksum",
    ] + (["decode_error"] if quarantine else [])

    def _decode_one(raw: bytes) -> dict:
        magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", raw, 0)
        if magic != b"BM":
            raise ValueError("not a BMP")
        (hdr_sz, w, h, _planes, bpp, comp) = struct.unpack_from("<IiiHHI", raw, 14)
        if not (hdr_sz >= 40 and bpp == 24 and comp == 0):
            raise ValueError("unsupported BMP variant")
        if h <= 0:
            raise ValueError("top-down BMPs not produced by this corpus")
        stride = ((3 * w + 3) // 4) * 4
        if len(raw) < offset + stride * h:
            raise ValueError("truncated pixel data")
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=stride * h, offset=offset
        ).reshape(h, stride)
        img = rows[::-1, : 3 * w].reshape(h, w, 3).astype(np.int64)
        b, g, rr = img[..., 0], img[..., 1], img[..., 2]
        n = w * h
        pos = (
            np.arange(w, dtype=np.int64)[None, :]
            + np.arange(h, dtype=np.int64)[:, None] * w
            + 1
        )
        return {
            "width": w,
            "height": h,
            "n_pixels": n,
            "mean_r": int(rr.sum()) / n,
            "mean_g": int(g.sum()) / n,
            "mean_b": int(b.sum()) / n,
            "luma_mean": int((299 * rr + 587 * g + 114 * b).sum()) / (1000.0 * n),
            "checksum": int(((3 * rr + 5 * g + 7 * b) * pos).sum()),
        }

    return media.mapInPandas(
        _quarantine_kernel(_decode_one, cols, quarantine), schema=schema
    )


# ---------------------------------------------------------------------------
# real image decode #2: PNG (8-bit truecolor, non-interlaced) — DEFLATE via
# stdlib ``zlib`` plus per-row filter reversal (None/Sub/Up/Average/Paeth)
# with numpy, no image libraries.  The synthetic corpus cycles the filter
# type per row so every reconstruction path is genuinely exercised; chunk
# CRCs are verified on decode.  JPEG/MP4 stay descoped (their codecs need
# external libraries); the closed-form oracle is independent of BOTH codec
# halves, exactly like BMP/WAV.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

PNG_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_pixels int, "
    "mean_r double, mean_g double, mean_b double, luma_mean double, "
    "checksum long"
)


def _png_dims(media_id: int) -> tuple[int, int]:
    """Width 5..16, height 4..10 — small enough that every row-filter type
    cycles through within one image, with non-trivial row strides."""
    return 5 + media_id % 12, 4 + media_id % 7


def _png_pixel(media_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic (r, g, b) at (x, y) — the SAME closed form as the BMP
    corpus (the oracle recomputes from THIS, never from PNG bytes)."""
    base = media_id * 7 + y * 13 + x * 29
    return (base + 173) % 256, (base + 91) % 256, base % 256


def _paeth(a, b, c):
    """Paeth predictor, vectorized over numpy int16 arrays."""
    import numpy as np

    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def synth_png_media(spark: SparkSession, sf_dir: str, n: int = 64) -> DataFrame:
    """Media table whose blobs are REAL PNG files: signature + IHDR (8-bit
    truecolor) + one zlib IDAT + IEND, CRC32 per chunk.  Scanline filters
    cycle ``y % 5`` across None/Sub/Up/Average/Paeth, so the decoder's
    reconstruction of every filter type is load-bearing."""
    import os
    import struct
    import zlib

    import numpy as np

    docs = _media_ids(spark, sf_dir, n)

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = _png_dims(mid)
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                base = (mid * 7 + y * 13 + x * 29).astype(np.int64)
                img = np.empty((h, w, 3), dtype=np.uint8)  # RGB scanlines
                img[..., 0] = (base + 173) % 256
                img[..., 1] = (base + 91) % 256
                img[..., 2] = base % 256
                raw = img.reshape(h, w * 3)
                bpp = 3
                lines = []
                for yy in range(h):
                    row = raw[yy]
                    prior = raw[yy - 1] if yy > 0 else np.zeros(w * 3, np.uint8)
                    left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
                    upleft = np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]])
                    t = yy % 5
                    if t == 0:
                        filt = row
                    elif t == 1:  # Sub
                        filt = row - left  # uint8 wrap == mod-256 arithmetic
                    elif t == 2:  # Up
                        filt = row - prior
                    elif t == 3:  # Average
                        avg = (
                            (left.astype(np.uint16) + prior.astype(np.uint16)) // 2
                        ).astype(np.uint8)
                        filt = row - avg
                    else:  # Paeth
                        filt = row - _paeth(left, prior, upleft)
                    lines.append(bytes([t]) + filt.tobytes())
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                blobs.append(
                    PNG_SIG
                    + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
                    + _chunk(b"IEND", b"")
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "mime": "image/png", "blob": blobs}
            )

    return docs.mapInPandas(gen, schema="media_id long, mime string, blob binary")


def decode_png_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """REAL decode: walk the chunk stream verifying each CRC32, require the
    exact 8-bit/truecolor/non-interlaced IHDR this corpus produces, inflate
    the concatenated IDAT with stdlib zlib, reverse the per-row filter
    (None/Up fully vectorized; Sub/Average/Paeth carry a left-to-right
    data dependence, so they scan the <= 3*w bytes of one row — O(pixels)
    total per blob), then compute the SAME channel statistics and
    position-weighted checksum as the BMP kernel.  A wrong filter
    reconstruction, a missed CRC, or a channel-order mixup each breaks the
    closed-form oracle parity.

    ``on_error='quarantine'`` emits malformed blobs with null features and
    the error text in ``decode_error`` (see :func:`decode_wav_features`)."""
    import struct
    import zlib

    import numpy as np

    quarantine = on_error == "quarantine"
    schema = PNG_FEATURE_SCHEMA + (", decode_error string" if quarantine else "")
    cols = [
        "media_id", "width", "height", "n_pixels",
        "mean_r", "mean_g", "mean_b", "luma_mean", "checksum",
    ] + (["decode_error"] if quarantine else [])

    def _decode_one(raw: bytes) -> dict:
        if raw[:8] != PNG_SIG:
            raise ValueError("not a PNG")
        pos, ihdr, idat = 8, None, []
        while pos < len(raw):
            if pos + 8 > len(raw):
                raise ValueError("truncated chunk header")
            (length,) = struct.unpack_from(">I", raw, pos)
            ctype = raw[pos + 4 : pos + 8]
            data = raw[pos + 8 : pos + 8 + length]
            if len(data) != length or pos + 12 + length > len(raw):
                raise ValueError("truncated chunk data")
            (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"CRC mismatch in {ctype!r}")
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        w, h, depth, ctype_i, comp, filt, interlace = ihdr
        if (depth, ctype_i, comp, filt, interlace) != (8, 2, 0, 0, 0):
            raise ValueError("unsupported PNG variant")
        stream = zlib.decompress(b"".join(idat))
        stride = 1 + 3 * w
        if len(stream) != stride * h:
            raise ValueError(
                f"decompressed size {len(stream)} != expected {stride * h}"
            )
        rows = np.frombuffer(stream, dtype=np.uint8).reshape(h, stride)
        img = np.zeros((h, 3 * w), dtype=np.uint8)
        bpp = 3
        for yy in range(h):
            t, filt_row = int(rows[yy, 0]), rows[yy, 1:]
            prior = img[yy - 1] if yy > 0 else np.zeros(3 * w, np.uint8)
            if t == 0:
                img[yy] = filt_row
            elif t == 2:  # Up: no intra-row dependence, vector add
                img[yy] = filt_row + prior
            elif t in (1, 3, 4):
                out = img[yy]
                for xx in range(3 * w):
                    left = int(out[xx - bpp]) if xx >= bpp else 0
                    up = int(prior[xx])
                    ul = int(prior[xx - bpp]) if xx >= bpp else 0
                    if t == 1:
                        pred = left
                    elif t == 3:
                        pred = (left + up) // 2
                    else:
                        p = left + up - ul
                        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                        pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                    out[xx] = (int(filt_row[xx]) + pred) & 0xFF
            else:
                raise ValueError(f"unknown filter type {t}")
        px = img.reshape(h, w, 3).astype(np.int64)
        rr, g, b = px[..., 0], px[..., 1], px[..., 2]
        n = w * h
        pos_w = (
            np.arange(w, dtype=np.int64)[None, :]
            + np.arange(h, dtype=np.int64)[:, None] * w
            + 1
        )
        return {
            "width": int(w),
            "height": int(h),
            "n_pixels": n,
            "mean_r": int(rr.sum()) / n,
            "mean_g": int(g.sum()) / n,
            "mean_b": int(b.sum()) / n,
            "luma_mean": int((299 * rr + 587 * g + 114 * b).sum()) / (1000.0 * n),
            "checksum": int(((3 * rr + 5 * g + 7 * b) * pos_w).sum()),
        }

    return media.mapInPandas(
        _quarantine_kernel(_decode_one, cols, quarantine), schema=schema
    )


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation — reads the ``n_bytes`` size column, never
    the blob itself, so against a real media table the blob column prunes
    out of the scan (the earlier form summed ``length(blob)``, which
    silently forced every blob into the read — the exact anti-pattern the
    docstring told reviewers to check against)."""
    m = synth_media(spark, sf_dir).select("mime", "width", "n_bytes")
    return (
        m.groupBy("mime")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.avg("width").alias("avg_width"),
        )
    )


# ---------------------------------------------------------------------------
# oracle-checked query surface (the mapInPandas plumbing itself is under
# test: fan-out arity, batch iteration, schema, and the deterministic
# per-frame byte slices — DuckDB reproduces the kernel at the string level)
# ---------------------------------------------------------------------------


def _mm_queries():
    from kafka_journal_spark.functions.numeric import round6

    def m_media_stats(spark, sf_dir):
        s = media_stats(spark, sf_dir)
        return s.select(
            "mime",
            "n_items",
            F.col("total_bytes").cast("long").alias("total_bytes"),
            round6(F.col("avg_width")).alias("avg_width"),
        )

    def m_features(spark, sf_dir):
        media = synth_media(spark, sf_dir, ascii_blob=True)
        feats = extract_features(media, frames_per_item=2)
        return feats.select(
            "media_id", "frame_idx", "feat_hash", round6(F.col("brightness")).alias("brightness")
        )

    def m_wav_decode(spark, sf_dir):
        media = synth_wav_media(spark, sf_dir)
        feats = decode_wav_features(media)
        return feats.select(
            "media_id",
            "sample_rate",
            "n_samples",
            round6(F.col("duration_ms")).alias("duration_ms"),
            round6(F.col("amp_mean")).alias("amp_mean"),
            "amp_max",
            "amp_min",
            round6(F.col("rms")).alias("rms"),
        )

    def m_bmp_decode(spark, sf_dir):
        media = synth_bmp_media(spark, sf_dir)
        feats = decode_bmp_features(media)
        return feats.select(
            "media_id",
            "width",
            "height",
            "n_pixels",
            round6(F.col("mean_r")).alias("mean_r"),
            round6(F.col("mean_g")).alias("mean_g"),
            round6(F.col("mean_b")).alias("mean_b"),
            round6(F.col("luma_mean")).alias("luma_mean"),
            "checksum",
        )

    def m_png_decode(spark, sf_dir):
        media = synth_png_media(spark, sf_dir)
        feats = decode_png_features(media)
        return feats.select(
            "media_id",
            "width",
            "height",
            "n_pixels",
            round6(F.col("mean_r")).alias("mean_r"),
            round6(F.col("mean_g")).alias("mean_g"),
            round6(F.col("mean_b")).alias("mean_b"),
            round6(F.col("luma_mean")).alias("luma_mean"),
            "checksum",
        )

    return {
        "m_media_stats": m_media_stats,
        "m_features": m_features,
        "m_wav_decode": m_wav_decode,
        "m_bmp_decode": m_bmp_decode,
        "m_png_decode": m_png_decode,
    }


MULTIMODAL_QUERIES = _mm_queries()

#: the 32-byte md5-hex blob splits into two 16-char frames; brightness is the
#: mean ASCII value — ratios of small ints are bit-identical across engines
MULTIMODAL_ORACLES: dict[str, str] = {
    "m_media_stats": """
        WITH m AS (
          SELECT doc_id,
                 CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS mime,
                 CAST(n_chars % 640 + 16 AS INTEGER) AS width,
                 octet_length(encode(text)) AS blob_bytes
          FROM documents WHERE doc_id < 64
        )
        SELECT mime, COUNT(*) AS n_items,
               CAST(SUM(blob_bytes) AS BIGINT) AS total_bytes,
               (FLOOR(AVG(width) * 1000000.0 + 0.5) / 1000000.0) AS avg_width
        FROM m GROUP BY mime
    """,
    "m_features": """
        WITH m AS (
          SELECT doc_id AS media_id, md5(text) AS payload
          FROM documents WHERE doc_id < 64
        ),
        f AS (
          SELECT media_id, payload, CAST(unnest([0, 1]) AS INTEGER) AS frame_idx
          FROM m
        ),
        s AS (
          SELECT media_id, frame_idx,
                 substring(payload, 16 * frame_idx + 1, 16) AS frame
          FROM f
        )
        SELECT media_id, frame_idx, md5(frame) AS feat_hash,
               (FLOOR((list_aggregate(list_transform(string_split(frame, ''),
                                                     c -> ascii(c)), 'sum')
                       / 16.0) * 1000000.0 + 0.5) / 1000000.0) AS brightness
        FROM s
    """,
    # recomputes the features from the PCM generator's closed form — never
    # touches WAV bytes, so it is independent of the decoder under test
    "m_wav_decode": """
        WITH m AS (
          SELECT doc_id AS media_id, CAST(160 + doc_id % 96 AS INTEGER) AS n
          FROM documents WHERE doc_id < 64
        ),
        s AS (SELECT media_id, n, unnest(range(n)) AS i FROM m),
        v AS (
          SELECT media_id, n,
                 ((media_id * 2654435761 + i * 40503) % 65536) - 32768 AS smp
          FROM s
        )
        SELECT media_id,
               CAST(8000 AS INTEGER) AS sample_rate,
               n AS n_samples,
               (FLOOR((n * 1000.0 / 8000) * 1000000.0 + 0.5) / 1000000.0) AS duration_ms,
               (FLOOR((CAST(SUM(smp) AS DOUBLE) / n) * 1000000.0 + 0.5) / 1000000.0) AS amp_mean,
               CAST(MAX(smp) AS INTEGER) AS amp_max,
               CAST(MIN(smp) AS INTEGER) AS amp_min,
               (FLOOR(sqrt(CAST(SUM(CAST(smp AS BIGINT) * smp) AS DOUBLE) / n) * 1000000.0 + 0.5) / 1000000.0) AS rms
        FROM v GROUP BY media_id, n
    """,
    # recomputes image features from the pixel closed form (_bmp_pixel) —
    # never touches BMP bytes, so stride/orientation/BGR decode bugs cannot
    # cancel out between encoder and decoder
    "m_bmp_decode": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 CAST(8 + doc_id % 9 AS INTEGER) AS w,
                 CAST(6 + doc_id % 5 AS INTEGER) AS h
          FROM documents WHERE doc_id < 64
        ),
        px AS (
          SELECT media_id, w, h,
                 CAST(i % w AS BIGINT) AS x, CAST(i // w AS BIGINT) AS y
          FROM (SELECT media_id, w, h, unnest(range(w * h)) AS i FROM m)
        ),
        v AS (
          SELECT media_id, w, h, x, y,
                 (media_id * 7 + y * 13 + x * 29 + 173) % 256 AS r,
                 (media_id * 7 + y * 13 + x * 29 + 91) % 256 AS g,
                 (media_id * 7 + y * 13 + x * 29) % 256 AS b
          FROM px
        )
        SELECT media_id, w AS width, h AS height,
               CAST(w * h AS INTEGER) AS n_pixels,
               (FLOOR((CAST(SUM(r) AS DOUBLE) / (w * h)) * 1000000.0 + 0.5) / 1000000.0) AS mean_r,
               (FLOOR((CAST(SUM(g) AS DOUBLE) / (w * h)) * 1000000.0 + 0.5) / 1000000.0) AS mean_g,
               (FLOOR((CAST(SUM(b) AS DOUBLE) / (w * h)) * 1000000.0 + 0.5) / 1000000.0) AS mean_b,
               (FLOOR((CAST(SUM(299 * r + 587 * g + 114 * b) AS DOUBLE)
                       / (1000.0 * w * h)) * 1000000.0 + 0.5) / 1000000.0) AS luma_mean,
               CAST(SUM((3 * r + 5 * g + 7 * b) * (x + y * w + 1)) AS BIGINT) AS checksum
        FROM v GROUP BY media_id, w, h
    """,
    # same closed-form independence as m_bmp_decode: recomputes from the
    # pixel generator (_png_pixel == _bmp_pixel closed form, PNG dims), so
    # filter-reconstruction/CRC/channel-order bugs cannot cancel out
    # between the PNG encoder and decoder
    "m_png_decode": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 CAST(5 + doc_id % 12 AS INTEGER) AS w,
                 CAST(4 + doc_id % 7 AS INTEGER) AS h
          FROM documents WHERE doc_id < 64
        ),
        px AS (
          SELECT media_id, w, h,
                 CAST(i % w AS BIGINT) AS x, CAST(i // w AS BIGINT) AS y
          FROM (SELECT media_id, w, h, unnest(range(w * h)) AS i FROM m)
        ),
        v AS (
          SELECT media_id, w, h, x, y,
                 (media_id * 7 + y * 13 + x * 29 + 173) % 256 AS r,
                 (media_id * 7 + y * 13 + x * 29 + 91) % 256 AS g,
                 (media_id * 7 + y * 13 + x * 29) % 256 AS b
          FROM px
        )
        SELECT media_id, w AS width, h AS height,
               CAST(w * h AS INTEGER) AS n_pixels,
               (FLOOR((CAST(SUM(r) AS DOUBLE) / (w * h)) * 1000000.0 + 0.5) / 1000000.0) AS mean_r,
               (FLOOR((CAST(SUM(g) AS DOUBLE) / (w * h)) * 1000000.0 + 0.5) / 1000000.0) AS mean_g,
               (FLOOR((CAST(SUM(b) AS DOUBLE) / (w * h)) * 1000000.0 + 0.5) / 1000000.0) AS mean_b,
               (FLOOR((CAST(SUM(299 * r + 587 * g + 114 * b) AS DOUBLE)
                       / (1000.0 * w * h)) * 1000000.0 + 0.5) / 1000000.0) AS luma_mean,
               CAST(SUM((3 * r + 5 * g + 7 * b) * (x + y * w + 1)) AS BIGINT) AS checksum
        FROM v GROUP BY media_id, w, h
    """,
}
