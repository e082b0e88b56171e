"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus the mapInPandas plumbing for decode / feature-extract /
resize / frame-sample stages.

The container has no image/audio libraries, so the *decode kernels* are
deterministic fakes behind ``_decode_stub`` (clearly marked; swap in PIL /
torchaudio / pyav on a real cluster).  Everything Spark-side is real and
tested: schemas, Arrow batch shapes, partitioning, and the UDF signatures —
which is the part that has to be right at 100 TB.

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

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        F.col("doc_id") < n
    )
    blob = (
        F.encode(F.md5("text"), "utf-8") if ascii_blob else F.encode("text", "utf-8")
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


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation — must never touch the blob column (check
    ReadSchema in the plan: blobs pruned)."""
    m = synth_media(spark, sf_dir)
    return (
        m.groupBy("mime")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.length("blob")).alias("total_bytes"),
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

    return {"m_media_stats": m_media_stats, "m_features": m_features}


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
}
