"""Parquet table loaders for the driver's synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

At cluster scale these readers are where partition pruning / column pruning
start: we always go through ``spark.read.parquet`` so Catalyst sees a
relation it can push filters into (check ``PushedFilters`` in
``.explain("formatted")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_cached_schema(spark, os.path.join(sf_dir, f"{name}.parquet"))


#: per-process footer-schema cache (path -> StructType).  Schema is table
#: METADATA, not data: a real deployment reads through a catalog / table
#: format where the schema is recorded once (guide §6 — manifest metadata
#: beats per-query footer inference), while bare `spark.read.parquet`
#: re-reads the footer on every DataFrame construction (~85 ms/table here,
#: paid by every query build).  Results are still computed from the
#: parquet data on every run — only the schema read is amortized.  Keyed
#: by absolute path; the corpus paths this is used for are immutable
#: within a process (driver sf dirs, per-test tmp dirs are unique).
_SCHEMA_CACHE: dict[str, object] = {}


def read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    p = os.path.abspath(path)
    schema = _SCHEMA_CACHE.get(p)
    if schema is None:
        df = spark.read.parquet(p)
        _SCHEMA_CACHE[p] = df.schema
        return df
    return spark.read.schema(schema).parquet(p)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view (for spark.sql use)."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
