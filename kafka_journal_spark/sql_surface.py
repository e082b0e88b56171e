"""The SQL entry point (SURVEY §4 optional nicety (a)): register the
materialized journal tables as temp views so users query with plain
``spark.sql`` — the recovery semantics become WHERE clauses the optimizer
can see, and everything Catalyst offers over SQL (grouping sets, subqueries,
CTEs) comes for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_journal_spark.operators.actions import journal_actions
from kafka_journal_spark.operators.replicate import (
    materialize_journal,
    materialize_metajournal,
    materialize_pointers,
)


def register_journal_views(spark: SparkSession, sf_dir: str) -> None:
    """Create kj_journal / kj_metajournal / kj_pointers temp views."""
    acts = journal_actions(spark, sf_dir)
    materialize_journal(acts).createOrReplaceTempView("kj_journal")
    materialize_metajournal(acts).createOrReplaceTempView("kj_metajournal")
    materialize_pointers(acts).createOrReplaceTempView("kj_pointers")


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pure-SQL recovery-style query over the registered views: per-topic
    journal stats with a correlated EXISTS (journals that still have rows)."""
    register_journal_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT m.topic,
               COUNT(*) AS n_journals,
               CAST(SUM(CASE WHEN EXISTS (
                   SELECT 1 FROM kj_journal j
                   WHERE j.topic = m.topic AND j.id = m.id
               ) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_rows,
               CAST(MAX(m.seq_nr) AS BIGINT) AS max_seq_nr,
               CAST(SUM(m.seq_nr) AS BIGINT) AS total_seq
        FROM kj_metajournal m
        GROUP BY m.topic
        """
    )

