"""The Action stream: the engine's fundamental input (FIXTURES.md §1).

The reference stores *actions* in Kafka — "It stores actions" (reference
``Notes for Next Developer.md:15``); the ADT is
``Append | Delete | Purge | Mark`` (reference ``journal/.../Action.scala:10-173``,
header wire format ``ActionHeader.scala:97-123``).

The driver's synthetic ``events`` table is a generic event stream, so we
derive a deterministic actions stream from it (same derivation in Spark and in
the DuckDB oracle SQL below):

- key: ``id = 'user-' || user_id``, ``topic = 'journal'``
- Kafka position: ``partition = user_id % 8`` (a key always lives in one
  partition, as in Kafka keyed produce), ``offset = event_id`` (unique,
  ascending — Kafka offsets need not be dense)
- action_type:  purchase -> delete, error -> purge, signup -> mark,
  click/view -> append
- seq_nr: running count of appends per key in offset order (1-based,
  monotonic — reference ``SeqNr.scala:42-51``); single-event appends so
  seq_nr_from == seq_nr_to (``SeqRange.scala:12-47``)
- delete_to: writer-side clamp to the current pointer as in reference
  ``Journals.scala:326-332`` (``min(pointer, to)``): we emit
  ``1 + floor(abs(value)) % appends_so_far`` and *drop* deletes on absent
  journals (the reference returns None for those)
- payload: the event's ``props`` JSON carried verbatim as a text payload
  (payload encoding is pluggable in the reference; see codecs.py)

Scale note: the derivation is one window over ``(id)`` ordered by ``offset``
— a single hash shuffle on the journal key, which is also the partitioning
every downstream journal operator needs, so Catalyst reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: number of simulated Kafka partitions for the derived topic
N_PARTITIONS = 8

ACTION_COLUMNS = [
    "topic",
    "partition",
    "offset",
    "id",
    "action_type",
    "timestamp",
    "origin",
    "version",
    "seq_nr_from",
    "seq_nr_to",
    "payload_type",
    "payload",
    "tags",
    "delete_to",
    "mark_id",
]


def actions_from_events(events: DataFrame) -> DataFrame:
    """Derive the deterministic actions stream from the ``events`` table."""
    base = events.select(
        F.lit("journal").alias("topic"),
        (F.col("user_id") % N_PARTITIONS).cast("int").alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("id"),
        F.when(F.col("event_type") == "purchase", "delete")
        .when(F.col("event_type") == "error", "purge")
        .when(F.col("event_type") == "signup", "mark")
        .otherwise("append")
        .alias("action_type"),
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("_orig_type"),
        F.col("value"),
        F.col("props"),
    )
    w = (
        Window.partitionBy("id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_append = F.when(F.col("action_type") == "append", F.lit(1)).otherwise(F.lit(0))
    withseq = base.withColumn("appends_so_far", F.sum(is_append).over(w).cast("long"))
    app = F.col("action_type") == "append"
    dele = F.col("action_type") == "delete"
    mark = F.col("action_type") == "mark"
    return (
        withseq
        # a delete on a journal that has no appends yet is a no-op in the
        # reference (Journals.scala:326-332 returns None) — drop it
        .filter(~(dele & (F.col("appends_so_far") == 0)))
        .select(
            "topic",
            "partition",
            "offset",
            "id",
            "action_type",
            "timestamp",
            F.concat(F.lit("src-"), F.col("partition").cast("string")).alias("origin"),
            F.lit("1.0").alias("version"),
            F.when(app, F.col("appends_so_far")).alias("seq_nr_from"),
            F.when(app, F.col("appends_so_far")).alias("seq_nr_to"),
            F.when(app, F.lit("text")).alias("payload_type"),
            F.when(app, F.col("props")).alias("payload"),
            # event tags (akka Tagged, reference Tags.scala): the original
            # event type tags each appended event
            F.when(app, F.array(F.col("_orig_type"))).alias("tags"),
            F.when(
                dele,
                F.lit(1)
                + F.pmod(
                    F.floor(F.abs(F.col("value"))).cast("long"), F.col("appends_so_far")
                ),
            ).alias("delete_to"),
            F.when(mark, F.concat(F.lit("mark-"), F.col("offset").cast("string"))).alias(
                "mark_id"
            ),
        )
    )


#: DuckDB CTE producing the identical actions table from the `events` view.
#: Kept as a building block: journal-family oracles are
#: ``WITH actions AS ({ACTIONS_SQL}) SELECT ...``.
ACTIONS_SQL = f"""
    WITH __base AS (
        SELECT
            'journal' AS topic,
            CAST(user_id % {N_PARTITIONS} AS INTEGER) AS partition,
            CAST(event_id AS BIGINT) AS "offset",
            'user-' || CAST(user_id AS VARCHAR) AS id,
            CASE event_type
                WHEN 'purchase' THEN 'delete'
                WHEN 'error' THEN 'purge'
                WHEN 'signup' THEN 'mark'
                ELSE 'append'
            END AS action_type,
            ts AS timestamp,
            event_type AS _orig_type,
            value,
            props
        FROM events
    ), __seq AS (
        SELECT *,
            CAST(SUM(CASE WHEN action_type = 'append' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY id ORDER BY "offset"
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS appends_so_far
        FROM __base
    )
    SELECT
        topic, partition, "offset", id, action_type, timestamp,
        'src-' || CAST(partition AS VARCHAR) AS origin,
        '1.0' AS version,
        CASE WHEN action_type = 'append' THEN appends_so_far END AS seq_nr_from,
        CASE WHEN action_type = 'append' THEN appends_so_far END AS seq_nr_to,
        CASE WHEN action_type = 'append' THEN 'text' END AS payload_type,
        CASE WHEN action_type = 'append' THEN props END AS payload,
        CASE WHEN action_type = 'append' THEN [_orig_type] END AS tags,
        CASE WHEN action_type = 'delete'
             THEN 1 + (CAST(FLOOR(ABS(value)) AS BIGINT) % appends_so_far) END AS delete_to,
        CASE WHEN action_type = 'mark' THEN 'mark-' || CAST("offset" AS VARCHAR) END AS mark_id
    FROM __seq
    WHERE NOT (action_type = 'delete' AND appends_so_far = 0)
"""


def load_events(spark, sf_dir: str) -> DataFrame:
    """Load the ``events`` table, tolerating nanosecond parquet timestamps.

    The synthetic events.parquet stores TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; we read nanos as long and truncate to
    microseconds — exactly DuckDB's TIMESTAMP_NS -> TIMESTAMP coercion, so
    oracles agree.  Integer ``DIV`` avoids double-precision loss on the
    1.7e18 nano values.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def journal_actions(spark, sf_dir: str) -> DataFrame:
    """(spark, sf_dir) -> actions DataFrame; the entry used by queries()."""
    return actions_from_events(load_events(spark, sf_dir))
