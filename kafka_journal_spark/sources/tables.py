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


#: per-process footer-schema cache (path -> (dir signature, StructType)).
#: Schema is table METADATA, not data: a real deployment reads through a
#: catalog / table format where the schema is recorded once (guide §6 —
#: manifest metadata beats per-query footer inference), while bare
#: `spark.read.parquet` re-reads the footer on every DataFrame construction
#: (~85 ms/table here, paid by every query build).  Results are still
#: computed from the parquet data on every run — only the schema read is
#: amortized.  r12 (r11 advice): the entry is keyed by a recursive
#: (relpath, mtime_ns, size) signature of the dataset, so overwriting a
#: parquet path in-process (write.mode('overwrite') with a changed schema)
#: re-infers instead of silently serving the stale schema.  The signature
#: walk costs ~4 us for the single-file corpus tables vs the ~85 ms it
#: saves; dirs beyond SIG_MAX_ENTRIES files skip caching entirely (at that
#: scale a real deployment has a catalog).
_SCHEMA_CACHE: dict[str, tuple[tuple, object]] = {}

SIG_MAX_ENTRIES = 256


def dir_signature(path: str, max_entries: int = SIG_MAX_ENTRIES) -> tuple | None:
    """(relpath, mtime_ns, size) for every file under ``path`` (sorted), or
    None when the tree is too large to stat cheaply / vanished mid-walk.
    The mutation-safe cache key shared by every footer/metadata cache in
    the engine (this module, operators/actions.load_events, similarity's
    corpus stats)."""
    out = []
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return ((os.path.basename(path), st.st_mtime_ns, st.st_size),)
        for root, _dirs, files in os.walk(path):
            rel = os.path.relpath(root, path)
            for f in files:
                fst = os.stat(os.path.join(root, f))
                out.append((os.path.join(rel, f), fst.st_mtime_ns, fst.st_size))
                if len(out) > max_entries:
                    return None
    except OSError:
        return None
    return tuple(sorted(out))


#: memoized BASE DataFrames: (applicationId, path) -> (signature, df).
#: A DataFrame is an immutable logical plan — handing the same object to
#: every consumer caches no data (each run still scans parquet); it only
#: amortizes the driver-side relation construction (file listing RPC +
#: analysis, ~46 ms even with an explicit schema) that every query build
#: re-paid per table.  The signature key makes it exactly as mutation-safe
#: as the schema cache: any file change under the dataset rebuilds the
#: relation (and its captured file index).  Keyed by applicationId so a
#: fresh SparkContext (new test session) never sees a stale frame.
_DF_CACHE: dict[tuple[str, str], tuple[tuple, DataFrame]] = {}


def read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    p = os.path.abspath(path)
    sig = dir_signature(p)
    if sig is None:
        return spark.read.parquet(p)
    key = (spark.sparkContext.applicationId, p)
    cached = _DF_CACHE.get(key)
    if cached is not None and cached[0] == sig:
        return cached[1]
    schema_hit = _SCHEMA_CACHE.get(p)
    if schema_hit is not None and schema_hit[0] == sig:
        df = spark.read.schema(schema_hit[1]).parquet(p)
    else:
        df = spark.read.parquet(p)
        _SCHEMA_CACHE[p] = (sig, df.schema)
    _DF_CACHE[key] = (sig, df)
    return df


#: per-path (signature, (total row groups, total rows)) — metadata, same
#: class and same mutation-safe key as the footer-schema cache above
_ROWGROUP_CACHE: dict[str, tuple[tuple, tuple[int, int]]] = {}


def _parquet_layout(path: str, sig: tuple | None) -> tuple[int, int] | None:
    """(total row groups, total rows) under ``path`` (footer metadata), or
    None when unreadable / the dir exceeds the signature walk cap."""
    if sig is None:
        return None
    cached = _ROWGROUP_CACHE.get(path)
    if cached is not None and cached[0] == sig:
        return cached[1]
    try:
        import pyarrow.parquet as pq

        rgs = rows = 0
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        m = pq.ParquetFile(os.path.join(root, f)).metadata
                        rgs += m.num_row_groups
                        rows += m.num_rows
        else:
            m = pq.ParquetFile(path).metadata
            rgs, rows = m.num_row_groups, m.num_rows
    except Exception:
        return None
    _ROWGROUP_CACHE[path] = (sig, (rgs, rows))
    return rgs, rows


def spread_unsplittable(
    spark: SparkSession, df: DataFrame, path: str, min_rows: int = 100_000
) -> DataFrame:
    """Round-robin-spread a scan whose parquet layout CANNOT split (guide
    §2.5: "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    A row group is Spark's split atom: a monolithic file defeats both
    ``files.maxPartitionBytes`` and the session's ``minPartitionNum``
    floor — every row lands in the one task holding the row group's start
    offset, serializing CPU-dense downstream work onto a single core.
    The repartition fires ONLY when the dataset's total row-group count
    is below the session parallelism AND the table is big enough for the
    spread to matter (``min_rows``, from footer metadata): at production
    scale (row groups ~128 MB) any table worth spreading has orders of
    magnitude more row groups than cores and this is a no-op — it is
    split-repair for degenerate layouts, not a local[n] tune.  Filters
    still push through the repartition to the scan."""
    p = os.path.abspath(path)
    layout = _parquet_layout(p, dir_signature(p))
    if layout is None:
        return df
    rgs, n_rows = layout
    par = spark.sparkContext.defaultParallelism
    if rgs >= par or n_rows < min_rows:
        return df
    return df.repartition(par)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view (for spark.sql use)."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
