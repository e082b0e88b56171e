"""The journal store: parquet-backed materialization of the three state
tables, with the read-side semantics of the reference's Cassandra schema.

Layout (mirrors SURVEY.md §1.3, designed for 100 TB):
- ``journal/``     — append-only event rows, written per micro-batch,
  physically partitioned by ``topic``.  Rows carry ``meta_record_id`` — the
  journal *incarnation* that produced them (reference ``RecordId.scala:19-36``).
  A purge simply rotates the incarnation: old rows become orphans that the
  read path filters out (exactly the reference's orphan-event correlation,
  ``EventualCassandra.scala:132-168``) and a compaction pass physically drops
  later.  No in-place mutation of bulk data, ever — at scale, deletes are
  metadata operations (tombstones in metajournal), not rewrites.
- ``metajournal/`` — per-key heads (O(#keys)).  The LOGICAL bucket stays
  the Java-hashCode-compatible ``segment`` (``SegmentNr.scala:146-150``);
  the PHYSICAL partition is ``seg_band = segment % meta_bands`` (default
  256) because parquet directories, unlike Cassandra partition keys, cost
  a filesystem op each — a wide batch fanning into ~10k segment dirs
  measured 51 s of pure directory churn at sf1.  Writes are INCREMENTAL:
  a micro-batch rewrites only the band partitions its keys hash into
  (dynamic partition overwrite) — the Spark shape of the reference's
  point upserts (``MetaJournalStatements.scala:315-634``) at band
  granularity; raise ``meta_bands`` toward the segment count for
  huge-key-count, small-batch deployments.
- ``pointers/``    — per-(topic,partition) replicated offsets, partitioned
  by ``topic``, ditto (a batch rewrites only its topics' partitions).

The read path (``read()``) joins journal to metajournal (broadcast only
under a key filter — an unfiltered head table is O(#keys) and AQE picks the
join strategy for it) and applies: incarnation match, delete_to watermark,
seq_nr lower bound, plus the R5 defensive dedup (first offset per
(id, seq_nr) wins) that also makes crash-replayed appends harmless.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JournalConfig:
    """The reference journal's read-integrity config surface
    (``Journal.scala:458-480`` — config chooses raise-vs-tolerate on seq_nr
    duplicates; ``EventualCassandra.scala:132-191`` — orphan-event
    correlation toggle):

    - ``seq_nr_uniqueness``: ``'ignore'`` (keep first delivery — default),
      ``'quarantine'`` (exclude every copy of a duplicated seq_nr;
      ``integrity_violations`` surfaces them), or ``'raise'`` (fail the
      read, the reference's strict ``JournalError`` mode).
    - ``correlate_events_with_meta``: when True (default, reference
      behavior), journal rows are matched against the head's current
      ``record_id`` incarnation so purge-orphaned rows are invisible;
      False exposes raw rows (the reference's correlation-off mode for
      recovery tooling).
    """

    seq_nr_uniqueness: str = "ignore"
    correlate_events_with_meta: bool = True

#: full journal row (JournalStatements.scala:34-52: payload twin columns,
#: per-record user headers map, payload metadata JSON)
JOURNAL_SCHEMA_DDL = (
    "id string, topic string, segment long, seq_nr long, partition int, "
    "offset long, timestamp timestamp, origin string, version string, "
    "meta_record_id string, payload_type string, payload_txt string, "
    "payload_bin binary, tags array<string>, headers map<string,string>, "
    "metadata string"
)
#: head row incl. expiry columns (MetaJournalStatements.scala:24-57):
#: ``expire_after_secs`` keeps the reference DURATION's sub-day precision
#: (ExpiryService.scala:53-76 does seconds-level math), ``expire_on_ts`` is
#: the exact due time, and the derived ``expire_on`` DATE is kept for
#: partition pruning / the date-bucketed secondary index
META_SCHEMA_DDL = (
    "topic string, segment long, id string, partition int, offset long, "
    "segment_size int, seq_nr long, delete_to long, created timestamp, "
    "created_date date, updated timestamp, record_id string, "
    "expire_after_secs long, expire_on_ts timestamp, expire_on date"
)
POINTERS_SCHEMA_DDL = (
    "topic string, partition int, offset long, created timestamp, updated timestamp"
)


def _repair_dir(final: str) -> None:
    """Restore a table whose last swap crashed between rename-aside and
    promote: the live dir is missing but its ``.bak`` survives.  Bak names
    embed a monotonic nanosecond timestamp and the tie-break is CONTENT
    modification time (rename preserves it), so the NEWEST state is
    restored even if an old-format (uuid-named) bak from a prior version
    lingers — a lexicographic sort alone would let a hex name outrank a
    numeric timestamp and resurrect ancient state.  When the live dir
    exists, lingering ``.bak`` dirs are garbage from a crashed post-promote
    cleanup — dropped here so a later mid-swap crash cannot resurrect
    state from many swaps ago."""
    import glob

    baks = glob.glob(f"{final}.*.bak")
    if not os.path.exists(final) and baks:
        def _age(p: str) -> tuple:
            try:
                mt = max(
                    (os.path.getmtime(os.path.join(root, f)) for root, _, fs in os.walk(p) for f in fs),
                    default=os.path.getmtime(p),
                )
            except OSError:
                mt = 0.0
            return (mt, p)

        baks.sort(key=_age)
        os.replace(baks.pop(), final)
    if os.path.exists(final):
        for b in baks:
            shutil.rmtree(b, ignore_errors=True)


def _repair_partition_baks(root: str) -> None:
    """Per-partition swap recovery: the incremental ``compact()`` swaps
    individual ``topic=X`` directories with the same rename-aside protocol
    as whole-table swaps (bak name ``topic=X.<ns>.bak``), so a crash
    mid-swap is repaired dir-by-dir on the next open.  ``rsplit`` from the
    right keeps topics containing dots safe."""
    import glob

    finals = {
        b.rsplit(".", 2)[0] for b in glob.glob(os.path.join(root, "*=*.*.bak"))
    }
    for final in finals:
        _repair_dir(final)


def safe_dir_swap(
    spark: SparkSession,
    final: str,
    df: DataFrame,
    *,
    coalesce: int | None = None,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    max_records: int = 4_000_000,
) -> None:
    """Crash-safe full-table replacement: write tmp, rename the live dir
    ASIDE (never rmtree first), promote tmp, then drop the ``.bak``.  A crash
    at any point leaves either the old table live or recoverable from
    ``.bak`` (``_repair_dir`` restores it on the next open) — there is no
    window where the data exists nowhere on disk.

    The write parallelism is size-aware, not hard-coded: ``sort_cols``
    triggers a range repartition that AQE coalesces to a handful of tasks
    when the table is small and spreads over the shuffle-partition count
    when it is not (a ``coalesce(1)`` would funnel 100 TB-scale metadata
    through one task — only tiny fixed-size tables pass ``coalesce``).
    """
    import glob
    import time

    _repair_dir(final)
    # a crashed earlier swap may have left an orphan .tmp — writer-side
    # cleanup (single-owner writes; readers never touch .tmp dirs)
    for t in glob.glob(f"{final}.*.tmp"):
        shutil.rmtree(t, ignore_errors=True)
    w = df
    if coalesce is not None:
        w = w.coalesce(coalesce)
    elif sort_cols:
        w = w.repartitionByRange(*sort_cols)
    tmp = f"{final}.{uuid.uuid4().hex[:8]}.tmp"
    writer = w.write.mode("overwrite").option("maxRecordsPerFile", max_records)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    bak = f"{final}.{time.time_ns():020d}.bak"
    if os.path.exists(final):
        os.replace(final, bak)
    os.replace(tmp, final)
    if os.path.exists(bak):
        shutil.rmtree(bak)


class JournalStore:
    """Parquet-backed store; pass ``catalog`` (a table-name prefix) to make
    the bucketed co-located layout (``sources/layout.py``) the DEFAULT read
    path: ``compact()`` publishes journal+metajournal as id-bucketed catalog
    tables, and ``read()`` plans the zero-Exchange co-located join against
    them until the next write staled the publication (then it falls back to
    the live parquet until the next compaction — the compacted-snapshot +
    live-tail pattern)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        catalog: str | None = None,
        buckets: int = 16,
        meta_bands: int = 256,
    ):
        """``meta_bands`` sets the metajournal's PHYSICAL directory count:
        the head table is partitioned by ``seg_band = segment % meta_bands``
        while ``segment`` stays a logical data column (the reference's
        10,000 SegmentNr buckets are Cassandra partition KEYS — free; as
        parquet DIRECTORIES they cost a filesystem op each, and an sf1
        measurement showed a wide batch touching ~7k of 10k segment dirs
        spending 51 s on directory/file churn alone).  The trade-off knob:
        few bands make wide batches cheap (<= meta_bands dirs per trigger)
        but a 1-key batch rewrites 1/meta_bands of the keys' rows; at 10^9
        keys raise meta_bands toward the segment count.  256 keeps a 1-key
        batch's rewrite small while capping wide-batch fan-out 40x below
        the segment count."""
        self.spark = spark
        self.root = root
        self.catalog = catalog
        self.buckets = buckets
        self.meta_bands = meta_bands
        os.makedirs(root, exist_ok=True)

    def _seg_band(self):
        return F.pmod(F.col("segment"), F.lit(self.meta_bands))

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -- catalog publication watermark ------------------------------------
    #
    # The bucketed catalog tables are a SNAPSHOT; any journal/metajournal
    # write stales them.  The watermark is a pair of tiny files in the store
    # root (not an in-memory flag): every mutating write stamps a fresh
    # token into ``_store_epoch``, and ``publish_catalog`` copies the token
    # it published under into ``_catalog_epoch``.  read() compares the two —
    # so a SECOND store instance (another driver, a restarted job) writing
    # to the same root invalidates THIS instance's catalog snapshot too.

    def _read_token(self, name: str) -> str:
        try:
            with open(self._path(name)) as f:
                return f.read().strip()
        except OSError:
            return ""

    def _write_token(self, name: str, value: str) -> None:
        tmp = self._path(f"{name}.{uuid.uuid4().hex[:8]}.tok")
        with open(tmp, "w") as f:
            f.write(value)
        os.replace(tmp, self._path(name))

    def _mark_stale(self) -> None:
        self._write_token("_store_epoch", uuid.uuid4().hex)

    @property
    def _catalog_live(self) -> bool:
        pub = self._read_token("_catalog_epoch")
        return bool(pub) and pub == self._read_token("_store_epoch")

    def _read(self, name: str, ddl: str) -> DataFrame:
        p = self._path(name)
        _repair_dir(p)
        _repair_partition_baks(p)
        if os.path.exists(p) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
        ):
            return self.spark.read.schema(ddl).parquet(p)
        return self.spark.createDataFrame([], ddl)

    def journal(self) -> DataFrame:
        return self._read("journal", JOURNAL_SCHEMA_DDL)

    def _metajournal_phys(self) -> DataFrame:
        """Head table WITH its physical band partition column."""
        return self._read("metajournal", META_SCHEMA_DDL + ", seg_band long")

    def metajournal(self) -> DataFrame:
        return self._metajournal_phys().drop("seg_band")

    def pointers(self) -> DataFrame:
        return self._read("pointers", POINTERS_SCHEMA_DDL)

    # -- writers -----------------------------------------------------------

    def append_journal(self, rows: DataFrame) -> None:
        """Append event rows (partitioned by topic — partition pruning on
        every topic-scoped read)."""
        self._mark_stale()  # new tail not yet in the bucketed tables
        rows.write.mode("append").partitionBy("topic").parquet(self._path("journal"))

    def swap_metajournal(self, df: DataFrame) -> None:
        """Full head-table rewrite (initial materialization / compaction) —
        same band-partitioned layout as the incremental path."""
        self._mark_stale()
        safe_dir_swap(
            self.spark,
            self._path("metajournal"),
            df.withColumn("seg_band", self._seg_band()),
            sort_cols=["seg_band", "segment", "topic", "id"],
            partition_by=["seg_band"],
        )

    def swap_pointers(self, df: DataFrame) -> None:
        safe_dir_swap(
            self.spark,
            self._path("pointers"),
            df,
            sort_cols=["topic", "partition"],
            partition_by=["topic"],
        )

    # -- incremental head-table writes (the 100 TB path) -------------------

    def _bands_of(self, segments: list[int]) -> list[int]:
        return sorted({int(s) % self.meta_bands for s in segments})

    def metajournal_segments(self, segments: list[int]) -> DataFrame:
        """Head rows of the given segments only — the band filter prunes
        the scan to those partition directories (check the scan's
        PartitionFilters) and the ``segment.isin`` narrows within them, so
        a batch's merge reads O(touched bands), never O(#keys)."""
        return (
            self._metajournal_phys()
            .filter(F.col("seg_band").isin(self._bands_of(segments)))
            .filter(F.col("segment").isin([int(s) for s in segments]))
            .drop("seg_band")
        )

    def metajournal_bands(self, segments: list[int]) -> DataFrame:
        """ALL head rows of the bands the given segments hash into — the
        unit an incremental upsert must carry complete (a band directory
        is rewritten whole)."""
        return (
            self._metajournal_phys()
            .filter(F.col("seg_band").isin(self._bands_of(segments)))
            .drop("seg_band")
        )

    def upsert_metajournal(self, df: DataFrame, touched_segments: list[int]) -> None:
        """Incremental metajournal write: dynamic partition overwrite of
        ONLY the band partitions the touched segments hash into — the
        Spark shape of the reference's per-key point upserts
        (``MetaJournalStatements.scala:315-634``) at directory granularity
        ``meta_bands``.  A micro-batch touching k keys rewrites at most
        min(k, meta_bands) directories regardless of total key count, and
        a WIDE batch (bulk load, backfill) is capped at ``meta_bands``
        directories — the sf1 measurement that motivated banding: 15k keys
        over 10k segment dirs cost 51 s of pure directory churn; over 256
        band dirs the same write is a few seconds.

        ``df`` must contain the COMPLETE new state of every touched BAND
        (batch keys merged with ALL rows of the bands they hash into —
        ``metajournal_bands`` is the matching read).  A touched band left
        with zero live rows cannot be expressed by dynamic overwrite, so
        its directory is dropped explicitly.  Crash mid-write affects only
        touched bands, which the offset guard replays on restart; the
        metajournal is derived state, re-materializable from the journal
        in the worst case.
        """
        path = self._path("metajournal")
        _repair_dir(path)
        self._mark_stale()
        w = df.withColumn("seg_band", self._seg_band())
        (
            w.repartitionByRange("seg_band", "segment", "topic", "id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", 4_000_000)
            .partitionBy("seg_band")
            .parquet(path)
        )
        remaining = {
            r.seg_band for r in w.select("seg_band").distinct().collect()
        }
        for band in set(self._bands_of(touched_segments)) - remaining:
            band_dir = os.path.join(path, f"seg_band={band}")
            if os.path.exists(band_dir):
                shutil.rmtree(band_dir)

    def upsert_pointers(self, df: DataFrame, touched_topics: list[str]) -> None:
        """Incremental pointers write: dynamic overwrite of the batch's
        topic partitions only (pointer rows never disappear, so no
        empty-partition cleanup applies)."""
        path = self._path("pointers")
        _repair_dir(path)
        (
            df.repartitionByRange("topic", "partition")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", 4_000_000)
            .partitionBy("topic")
            .parquet(path)
        )

    # -- bucketed catalog publication (sources/layout.py as the default) ---

    def publish_catalog(self) -> None:
        """Publish the store as id-bucketed, sorted catalog tables — the
        co-located layout of ``sources/layout.py`` — making the
        zero-Exchange journal⋈metajournal join the default ``read()`` plan.
        Aligned bucket counts on both sides are what buy the shuffle-free
        join; the sort by (id, seq_nr) buys min-max row-group skipping
        inside each bucket file."""
        assert self.catalog, "construct the store with catalog=<prefix>"
        # capture the epoch BEFORE snapshotting: a write landing while the
        # catalog tables are being built bumps _store_epoch past this token,
        # so the publication correctly reports stale.  Reading the token
        # afterwards would stamp the concurrent write over and serve a
        # catalog that is missing it.
        tok = self._read_token("_store_epoch")
        if not tok:
            self._mark_stale()
            tok = self._read_token("_store_epoch")
        (
            self.journal()
            .write.mode("overwrite")
            .partitionBy("topic")
            .bucketBy(self.buckets, "id")
            .sortBy("id", "seq_nr")
            .format("parquet")
            .saveAsTable(f"{self.catalog}_journal")
        )
        (
            self.metajournal()
            .write.mode("overwrite")
            .bucketBy(self.buckets, "id")
            .sortBy("id")
            .format("parquet")
            .saveAsTable(f"{self.catalog}_metajournal")
        )
        self._write_token("_catalog_epoch", tok)

    def _read_catalog(
        self,
        topic: str | None,
        key: str | None,
        from_seq_nr: int,
        cfg: "JournalConfig",
    ) -> DataFrame:
        """The co-located read: same semantics as the parquet path, planned
        against the bucketed tables — the join and the R5 window both run on
        the scan's hash(id) bucketing, so the whole read has zero Exchange.

        Requires ``spark.sql.requireAllClusterKeysForCoPartition=false``
        (set by ``session.get_spark``): the join clusters on (topic, id)
        [+ record_id when correlation is on, Catalyst extracts it into the
        equi-keys], and hash(id) buckets co-partition any superset of the
        bucket key under that setting."""
        from kafka_journal_spark.operators.read import apply_seq_nr_uniqueness

        j = self.spark.table(f"{self.catalog}_journal")
        m = self.spark.table(f"{self.catalog}_metajournal").select(
            "topic", "id", "record_id", F.col("delete_to").alias("_dt")
        )
        if topic is not None:
            j = j.filter(F.col("topic") == topic)
            m = m.filter(F.col("topic") == topic)
        if key is not None:
            j = j.filter(F.col("id") == key)
            m = m.filter(F.col("id") == key)
        df = j.join(m, ["topic", "id"], "inner")  # co-located, never hinted
        if cfg.correlate_events_with_meta:
            df = df.filter(F.col("meta_record_id") == F.col("record_id"))
        df = df.filter(F.col("seq_nr") > F.coalesce(F.col("_dt"), F.lit(0))).filter(
            F.col("seq_nr") >= F.lit(from_seq_nr)
        )
        return apply_seq_nr_uniqueness(df, cfg.seq_nr_uniqueness).drop(
            "_dt", "record_id"
        )

    # -- read path (EventualCassandra.read semantics) ----------------------

    def read(
        self,
        topic: str | None = None,
        key: str | None = None,
        from_seq_nr: int = 1,
        config: JournalConfig | None = None,
    ) -> DataFrame:
        """Recovery read over the replicated store (R1 eventual side +
        R5 dedup + R8 orphan filtering), under the configured integrity
        modes (``JournalConfig``)."""
        from kafka_journal_spark.operators.read import apply_seq_nr_uniqueness

        cfg = config or JournalConfig()
        if self.catalog and self._catalog_live:
            return self._read_catalog(topic, key, from_seq_nr, cfg)
        j = self.journal()
        m = self.metajournal().select(
            "topic", "id", "record_id", F.col("delete_to").alias("_dt")
        )
        if topic is not None:
            j = j.filter(F.col("topic") == topic)
            m = m.filter(F.col("topic") == topic)
        if key is not None:
            j = j.filter(F.col("id") == key)
            m = m.filter(F.col("id") == key)
        # broadcast the head side only when a key filter bounds it to O(1)
        # rows; an unfiltered (or merely topic-filtered) metajournal is
        # O(#keys) and would OOM the executors at 100x scale — let AQE pick
        # the strategy from the observed size there
        m_side = F.broadcast(m) if key is not None else m
        df = j.join(m_side, ["topic", "id"], "inner")
        if cfg.correlate_events_with_meta:
            df = df.filter(F.col("meta_record_id") == F.col("record_id"))
        df = df.filter(F.col("seq_nr") > F.coalesce(F.col("_dt"), F.lit(0))).filter(
            F.col("seq_nr") >= F.lit(from_seq_nr)
        )
        return apply_seq_nr_uniqueness(df, cfg.seq_nr_uniqueness).drop(
            "_dt", "record_id"
        )

    def pointer(self, topic: str, key: str):
        """Last seq_nr for a key (R6), None if absent."""
        rows = (
            self.metajournal()
            .filter((F.col("topic") == topic) & (F.col("id") == key))
            .select("seq_nr")
            .collect()
        )
        return rows[0].seq_nr if rows else None

    def _journal_file_stats(self) -> list[tuple]:
        """Per-topic (n_files, total_bytes) from a filesystem walk of the
        journal's ``topic=`` partition directories — O(#files) METADATA,
        zero data read (the object-store listing a real deployment already
        pays; at 100 TB this is the cheap signal that schedules
        compaction, vs. the row-level debt which needs a scan)."""
        from urllib.parse import unquote

        root = self._path("journal")
        out = []
        if os.path.isdir(root):
            for entry in sorted(os.listdir(root)):
                if not entry.startswith("topic=") or entry.endswith(
                    (".bak", ".tmp")
                ):
                    continue
                n, total = 0, 0
                for r, _, fs in os.walk(os.path.join(root, entry)):
                    for f in fs:
                        if f.endswith(".parquet"):
                            n += 1
                            total += os.path.getsize(os.path.join(r, f))
                out.append((unquote(entry[len("topic="):]), n, total))
        return out

    def health(self) -> DataFrame:
        """Per-topic store observability: physical journal rows vs rows a
        read can see (the gap = purge orphans + delete-hidden rows —
        COMPACTION DEBT), live keys, tombstone watermark mass, the
        replicated offset, plus the small-file signal (``n_files`` /
        ``avg_file_mb`` per topic — a standing replicator appends files
        every trigger, and the file count is what tells the maintenance
        job to size-tier-merge long before row debt accumulates).  The
        numbers that size/schedule ``compact()`` and alert on debt at
        scale; every input is one aggregate over a table the store
        already maintains or one filesystem listing."""
        files = self.spark.createDataFrame(
            self._journal_file_stats() or [],
            "topic string, n_files long, total_bytes long",
        )
        phys = self.journal().groupBy("topic").agg(
            F.count(F.lit(1)).alias("n_physical_rows"),
            F.max("offset").alias("max_journal_offset"),
        )
        vis = self.read().groupBy("topic").agg(F.count(F.lit(1)).alias("n_visible"))
        keys = self.metajournal().groupBy("topic").agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.coalesce("delete_to", F.lit(0))).cast("long").alias(
                "tombstone_debt"
            ),
        )
        ptr = self.pointers().groupBy("topic").agg(
            F.max("offset").alias("replicated_offset")
        )
        return (
            phys.join(vis, "topic", "left")
            .join(keys, "topic", "left")
            .join(ptr, "topic", "left")
            .join(F.broadcast(files), "topic", "left")
            .select(
                "topic",
                "n_physical_rows",
                F.coalesce("n_visible", F.lit(0)).alias("n_visible"),
                (
                    F.col("n_physical_rows") - F.coalesce("n_visible", F.lit(0))
                ).alias("compaction_debt"),
                F.coalesce("n_keys", F.lit(0)).alias("n_keys"),
                F.coalesce("tombstone_debt", F.lit(0)).alias("tombstone_debt"),
                "max_journal_offset",
                "replicated_offset",
                F.coalesce("n_files", F.lit(0)).alias("n_files"),
                F.round(
                    F.coalesce("total_bytes", F.lit(0))
                    / F.greatest(F.coalesce("n_files", F.lit(0)), F.lit(1))
                    / F.lit(1048576.0),
                    6,
                ).alias("avg_file_mb"),
            )
        )

    def compact(
        self,
        topics: list[str] | None = None,
        *,
        min_debt: int | None = None,
        min_files: int | None = None,
    ) -> list[str]:
        """Physically drop orphaned and deleted rows (the deferred cleanup
        behind the tombstone design) and merge small files: keep only rows
        visible to read(), rewriting ONLY the selected topics' partition
        directories — the incremental shape of the reference's per-key
        point deletes (``JournalStatements.scala:252-320`` never rewrite
        the table to delete one journal).

        Topic selection:
        - ``topics=[...]``    — compact exactly these topics.
        - ``min_debt`` / ``min_files`` — consult :meth:`health` and compact
          topics whose ``compaction_debt >= min_debt`` OR
          ``n_files >= min_files`` (the health-driven maintenance loop: a
          scheduler calls ``compact(min_debt=1, min_files=64)`` and the
          cost is O(topics-with-debt), not O(table)).
        - no arguments       — all topics (full compaction, the previous
          behavior; initial materialization / catalog publication point).

        Each selected ``topic=`` directory is swapped with the same
        rename-aside/bak protocol as whole-table swaps; a crash mid-swap is
        repaired per-directory on the next open (``_repair_partition_baks``).
        Unselected topics' directories and files are untouched (pinned by
        ``test_store_recovery.py``).  Output files are bounded by record
        count and clustered by (topic, id, seq_nr) so post-compaction scans
        get min-max skipping on both the key and the seq range — the 100 TB
        layout where one journal read touches a handful of row groups, not
        the whole topic.  Returns the topics actually compacted.
        """
        import glob
        import time
        from urllib.parse import unquote

        final = self._path("journal")
        _repair_dir(final)
        _repair_partition_baks(final)
        # a crashed earlier compaction may have left an orphan staging dir
        for t in glob.glob(self._path("_journal.*.tmp")):
            shutil.rmtree(t, ignore_errors=True)
        if topics is None:
            if min_debt is None and min_files is None:
                topics = [
                    r.topic
                    for r in self.journal().select("topic").distinct().collect()
                ]
            else:
                topics = [
                    r.topic
                    for r in self.health().collect()
                    if (min_debt is not None and r.compaction_debt >= min_debt)
                    or (min_files is not None and r.n_files >= min_files)
                ]
        topics = sorted(set(topics))
        if not topics:
            return []
        # the isin filter prunes the scan to the selected partition dirs
        visible = self.read().filter(F.col("topic").isin(topics))
        tmp = self._path(f"_journal.{uuid.uuid4().hex[:8]}.tmp")
        (
            visible.repartitionByRange("topic", "id", "seq_nr")
            .sortWithinPartitions("topic", "id", "seq_nr")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 4_000_000)
            .partitionBy("topic")
            .parquet(tmp)
        )
        # swap per topic directory: names come from Spark's own partition
        # path escaping on the tmp write; a selected topic with ZERO
        # visible rows has no tmp dir and its live dir is simply retired
        fresh_dirs = {
            os.path.basename(p) for p in glob.glob(os.path.join(tmp, "topic=*"))
        }
        live_dirs = {
            os.path.basename(p)
            for p in glob.glob(os.path.join(final, "topic=*"))
            if not p.endswith(".bak")
        }
        sel = set(topics)
        targets = fresh_dirs | {
            d for d in live_dirs if unquote(d[len("topic="):]) in sel
        }
        os.makedirs(final, exist_ok=True)
        for dname in sorted(targets):
            live = os.path.join(final, dname)
            fresh = os.path.join(tmp, dname)
            bak = f"{live}.{time.time_ns():020d}.bak"
            if os.path.exists(live):
                os.replace(live, bak)  # rename aside, never rmtree live
            if os.path.exists(fresh):
                os.replace(fresh, live)
            if os.path.exists(bak):
                shutil.rmtree(bak)
        shutil.rmtree(tmp, ignore_errors=True)
        # compaction is the natural publication point for the bucketed
        # co-located layout — refresh it so read() planning stays
        # catalog-first (the catalog is a SNAPSHOT by contract; stores that
        # want O(touched) maintenance run without one).  When the catalog
        # is ALREADY live, skip: compaction never changes visible rows, so
        # the published snapshot still equals the store and republishing
        # would be a pure O(table) rewrite for nothing (pinned by
        # test_store_recovery.py::test_compact_skips_live_catalog_republish).
        if self.catalog and not self._catalog_live:
            self.publish_catalog()
        return topics
