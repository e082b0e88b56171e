"""Journal TTL: expiry bookkeeping + the background purge job (SURVEY.md
§2.4 P8; reference ``PurgeExpired.scala:23-71`` + ``ExpiryService.scala:53-76``).

Semantics re-expressed:
- each append batch may carry ``expire_after`` (duration ms) in its payload
  metadata (``PayloadMetadata.scala:181``);
- the journal head's expiry follows the **last** append: a new duration
  updates it, an append without one removes it (the ExpiryService
  update/ignore/remove decision, ``ExpiryService.scala:60-75``);
- ``expire_on = date(last_append_ts + expire_after)`` (date-bucketed so the
  scan prunes by partition/min-max, ``ExpiryService.scala:53-58``);
- the purge job scans heads with ``expire_on <= today`` and emits **Purge
  actions back through the journal pipeline** — expiry is not a direct
  delete, it rides the normal replication path so ordering guarantees hold
  (``PurgeExpired.scala:60-70``).

The derived actions stream assigns ``expire_after`` deterministically (every
10th offset) so the whole pipeline has a DuckDB oracle.

Scale: expiry candidates come from a metajournal scan filtered on
``expire_on`` — the reference's secondary index becomes parquet min-max
pruning (or a date-partitioned head table); the purge fan-out is one control
message per expired key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: deterministic expiry assignment for the derived stream: appends whose
#: offset % 10 == 0 expire after (1 + floor(abs_value) % 30) days
EXPIRY_CUTOFF = "2024-02-01"  # fixed "today" for reproducible queries


def actions_with_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived actions stream + deterministic ``expire_after_days``."""
    import os

    from kafka_journal_spark.operators.actions import actions_from_events, load_events

    events = load_events(spark, sf_dir)
    acts = actions_from_events(events)
    exp = F.when(
        (F.col("action_type") == "append") & (F.col("offset") % 10 == 0),
        1 + F.pmod(F.floor(F.abs(F.conv(F.substring(F.md5(F.col("offset").cast("string")), 1, 4), 16, 10).cast("long"))), F.lit(30)),
    )
    return acts.withColumn("expire_after_days", exp.cast("long"))


def metajournal_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key expiry state, read straight off the metajournal head's
    ``expire_after_days``/``expire_on`` columns (the reference's
    ``MetaJournalStatements.scala:24-57`` expiry columns; the head follows
    the LAST effective append per ``ExpiryService.scala:60-75``) — the head
    IS the source, nothing is re-derived here.  Delete-only journals have a
    head row with null expiry."""
    from kafka_journal_spark.operators.replicate import materialize_metajournal

    acts = actions_with_expiry(spark, sf_dir)
    return materialize_metajournal(acts).select(
        "topic", "id", "expire_after_days", "expire_on"
    )


def expiry_candidates(spark: SparkSession, sf_dir: str, cutoff: str = EXPIRY_CUTOFF) -> DataFrame:
    """Journal ids due for purge: expire_on <= cutoff (P8 scan)."""
    return (
        metajournal_expiry(spark, sf_dir)
        .filter(F.col("expire_on") <= F.lit(cutoff).cast("date"))
        .select("topic", "id", "expire_on")
    )


def expiry_purge_actions(spark: SparkSession, sf_dir: str, cutoff: str = EXPIRY_CUTOFF) -> DataFrame:
    """The purge control messages the TTL job would produce back into Kafka
    (one per expired journal, keyed so they land on the key's partition)."""
    cands = expiry_candidates(spark, sf_dir, cutoff)
    return cands.select(
        "topic",
        "id",
        F.lit("purge").alias("action_type"),
        F.col("expire_on").alias("due_date"),
    )


EXPIRY_ORACLES: dict[str, str] = {}


def _build_oracles() -> None:
    from kafka_journal_spark.oracles import FOLD_SQL

    expire_days = (
        "CASE WHEN action_type = 'append' AND \"offset\" % 10 = 0 THEN "
        "1 + (FLOOR(ABS(('0x' || substr(md5(CAST(\"offset\" AS VARCHAR)), 1, 4))::BIGINT)) % 30) END"
    )
    last_app = f"""
        WITH {FOLD_SQL},
        ea AS (
          SELECT *, {expire_days} AS expire_after_days
          FROM __fold WHERE _eff AND action_type = 'append'
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY topic, id ORDER BY "offset" DESC) AS _rn
          FROM ea
        ),
        last AS (
          SELECT topic, id, CAST(expire_after_days AS BIGINT) AS expire_after_days,
                 CASE WHEN expire_after_days IS NOT NULL THEN
                   CAST(to_timestamp(epoch(timestamp) + expire_after_days * 86400) AS DATE)
                 END AS expire_on
          FROM r WHERE _rn = 1
        )
    """
    # the head table has one row per live journal (append OR delete-only,
    # the latter with null expiry) — mirror the widened META schema
    EXPIRY_ORACLES["x_meta_expiry"] = f"""{last_app},
        keys AS (
          SELECT topic, id FROM __fold
          WHERE _eff AND action_type IN ('append', 'delete')
          GROUP BY topic, id
        )
        SELECT k.topic, k.id, l.expire_after_days, l.expire_on
        FROM keys k LEFT JOIN last l ON k.topic = l.topic AND k.id = l.id
    """
    EXPIRY_ORACLES["x_expiry_candidates"] = (
        f"{last_app} SELECT topic, id, expire_on FROM last "
        f"WHERE expire_on <= DATE '{EXPIRY_CUTOFF}'"
    )


_build_oracles()

EXPIRY_QUERIES = {
    "x_meta_expiry": metajournal_expiry,
    "x_expiry_candidates": expiry_candidates,
}
