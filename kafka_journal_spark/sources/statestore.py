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
- ``metajournal/`` — per-key heads (small: O(#keys)), atomically swapped per
  batch via tmp-dir + rename.
- ``pointers/``    — per-(topic,partition) replicated offsets, ditto.

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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: full journal row (JournalStatements.scala:34-52: payload twin columns,
#: per-record user headers map, payload metadata JSON)
JOURNAL_SCHEMA_DDL = (
    "id string, topic string, segment long, seq_nr long, partition int, "
    "offset long, timestamp timestamp, origin string, version string, "
    "meta_record_id string, payload_type string, payload_txt string, "
    "payload_bin binary, tags array<string>, headers map<string,string>, "
    "metadata string"
)
#: head row incl. expiry columns (MetaJournalStatements.scala:24-57
#: expire_after/expire_on; ours is day-granular, hence the column name)
META_SCHEMA_DDL = (
    "topic string, segment long, id string, partition int, offset long, "
    "segment_size int, seq_nr long, delete_to long, created timestamp, "
    "created_date date, updated timestamp, record_id string, "
    "expire_after_days long, expire_on date"
)
POINTERS_SCHEMA_DDL = (
    "topic string, partition int, offset long, created timestamp, updated timestamp"
)


class JournalStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _read(self, name: str, ddl: str) -> DataFrame:
        p = self._path(name)
        if os.path.exists(p) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
        ):
            return self.spark.read.schema(ddl).parquet(p)
        return self.spark.createDataFrame([], ddl)

    def journal(self) -> DataFrame:
        return self._read("journal", JOURNAL_SCHEMA_DDL)

    def metajournal(self) -> DataFrame:
        return self._read("metajournal", META_SCHEMA_DDL)

    def pointers(self) -> DataFrame:
        return self._read("pointers", POINTERS_SCHEMA_DDL)

    # -- writers -----------------------------------------------------------

    def append_journal(self, rows: DataFrame) -> None:
        """Append event rows (partitioned by topic — partition pruning on
        every topic-scoped read)."""
        rows.write.mode("append").partitionBy("topic").parquet(self._path("journal"))

    def _swap(self, name: str, df: DataFrame) -> None:
        """Atomic table replacement: write tmp, rename over.

        The write parallelism is size-aware, not hard-coded: a range
        repartition on the natural sort key spreads an O(#keys) metajournal
        over the shuffle-partition count, and AQE's partition coalescing
        collapses that to a handful of tasks when the table is actually
        small — so the same code path writes one file at test scale and
        hundreds of balanced files for a billion-key head table (a
        ``coalesce(1)`` here would funnel 100 TB-scale metadata through a
        single task).
        """
        tmp = self._path(f"_{name}.{uuid.uuid4().hex[:8]}.tmp")
        sort_cols = [c for c in ("topic", "segment", "id", "partition") if c in df.columns]
        (
            df.repartitionByRange(*sort_cols)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 4_000_000)
            .parquet(tmp)
        )
        final = self._path(name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    def swap_metajournal(self, df: DataFrame) -> None:
        self._swap("metajournal", df)

    def swap_pointers(self, df: DataFrame) -> None:
        self._swap("pointers", df)

    # -- read path (EventualCassandra.read semantics) ----------------------

    def read(self, topic: str | None = None, key: str | None = None, from_seq_nr: int = 1) -> DataFrame:
        """Recovery read over the replicated store (R1 eventual side +
        R5 dedup + R8 orphan filtering)."""
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
        df = (
            j.join(m_side, ["topic", "id"], "inner")
            .filter(F.col("meta_record_id") == F.col("record_id"))
            .filter(F.col("seq_nr") > F.coalesce(F.col("_dt"), F.lit(0)))
            .filter(F.col("seq_nr") >= F.lit(from_seq_nr))
        )
        w = Window.partitionBy("topic", "id", "seq_nr").orderBy("offset")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_dt", "record_id")
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

    def compact(self) -> None:
        """Physically drop orphaned and deleted rows (the deferred cleanup
        behind the tombstone design): keep only rows visible to read().

        Output files are bounded by record count and clustered by
        (topic, id, seq_nr) so post-compaction scans get min-max skipping on
        both the key and the seq range — the 100 TB layout where one journal
        read touches a handful of row groups, not the whole topic.
        """
        visible = self.read()
        tmp = self._path(f"_journal.{uuid.uuid4().hex[:8]}.tmp")
        (
            visible.repartitionByRange("topic", "id", "seq_nr")
            .sortWithinPartitions("topic", "id", "seq_nr")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 4_000_000)
            .partitionBy("topic")
            .parquet(tmp)
        )
        final = self._path("journal")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
