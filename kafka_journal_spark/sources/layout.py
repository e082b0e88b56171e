"""Physical storage layout for 100 TB (SURVEY.md §7.1 step 9).

The reference manually segments Cassandra partitions (``SegmentNr.scala``);
on Spark the same goals map to native layout primitives:

- ``journal``: partitioned by ``topic`` (partition pruning on every
  topic-scoped query), **bucketed by id** and sorted by (id, seq_nr) —
  per-key recovery reads touch one bucket file per topic, and joins against
  metajournal (bucketed the same way) are co-located: no shuffle at all
  (check the plan: no Exchange above either scan).
- ``metajournal``: bucketed by id with the same bucket count — the join key
  alignment is what buys the shuffle-free join.
- at 100 TB add a date partition level (``created_date``) for retention
  pruning; bucket count sizes to ~1 GB per bucket file per topic partition.

Bucketing requires saveAsTable (a metastore entry); the default local
warehouse works fine in tests and any HMS/Unity/Glue catalog in prod.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def write_journal_bucketed(
    journal: DataFrame, table: str = "journal_bucketed", buckets: int = DEFAULT_BUCKETS
) -> None:
    (
        journal.write.mode("overwrite")
        .partitionBy("topic")
        .bucketBy(buckets, "id")
        .sortBy("id", "seq_nr")
        .format("parquet")
        .saveAsTable(table)
    )


def write_metajournal_bucketed(
    meta: DataFrame, table: str = "metajournal_bucketed", buckets: int = DEFAULT_BUCKETS
) -> None:
    (
        meta.write.mode("overwrite")
        .bucketBy(buckets, "id")
        .sortBy("id")
        .format("parquet")
        .saveAsTable(table)
    )


def read_journal_colocated(
    spark: SparkSession,
    journal_table: str = "journal_bucketed",
    meta_table: str = "metajournal_bucketed",
    from_seq_nr: int = 1,
) -> DataFrame:
    """The co-located recovery read: journal ⋈ metajournal on the bucket key
    — with aligned bucketing Catalyst plans this join with zero Exchange
    nodes (verified by test_layout's plan assertion)."""
    j = spark.table(journal_table)
    m = spark.table(meta_table).select(
        "id", F.col("delete_to").alias("_dt")
    )
    return (
        j.join(m, "id")
        .filter(F.col("seq_nr") > F.coalesce(F.col("_dt"), F.lit(0)))
        .filter(F.col("seq_nr") >= F.lit(from_seq_nr))
        .drop("_dt")
    )
