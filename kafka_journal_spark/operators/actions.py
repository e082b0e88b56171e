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

from pyspark.sql import DataFrame
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
    """Derive the deterministic actions stream from the ``events`` table.

    The derivation is spelled as ``selectExpr`` SQL strings (r11
    optimization): the Column-by-Column form issued ~60 py4j round-trips
    per invocation and cost ~0.39 s of driver-side construction — paid by
    every journal-family query on every bench run.  The parsed expressions
    are term-for-term the same tree (ACTIONS_SQL below is the DuckDB
    spelling of the identical derivation), so plans and results are
    unchanged — the driver gate and tools/check_correctness.py hold the
    parity.
    """
    base = events.selectExpr(
        "'journal' AS topic",
        f"CAST(user_id % {N_PARTITIONS} AS INT) AS partition",
        "CAST(event_id AS BIGINT) AS offset",
        "concat('user-', CAST(user_id AS STRING)) AS id",
        "CASE WHEN event_type = 'purchase' THEN 'delete' "
        "WHEN event_type = 'error' THEN 'purge' "
        "WHEN event_type = 'signup' THEN 'mark' "
        "ELSE 'append' END AS action_type",
        "ts AS timestamp",
        "event_type AS _orig_type",
        "value",
        "props",
    )
    withseq = base.selectExpr(
        "*",
        "CAST(sum(CASE WHEN action_type = 'append' THEN 1 ELSE 0 END) OVER ("
        "PARTITION BY id ORDER BY offset "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS appends_so_far",
    )
    return (
        withseq
        # a delete on a journal that has no appends yet is a no-op in the
        # reference (Journals.scala:326-332 returns None) — drop it
        .filter("NOT (action_type = 'delete' AND appends_so_far = 0)")
        .selectExpr(
            "topic",
            "partition",
            "offset",
            "id",
            "action_type",
            "timestamp",
            "concat('src-', CAST(partition AS STRING)) AS origin",
            "'1.0' AS version",
            "CASE WHEN action_type = 'append' THEN appends_so_far END AS seq_nr_from",
            "CASE WHEN action_type = 'append' THEN appends_so_far END AS seq_nr_to",
            "CASE WHEN action_type = 'append' THEN 'text' END AS payload_type",
            "CASE WHEN action_type = 'append' THEN props END AS payload",
            # event tags (akka Tagged, reference Tags.scala): the original
            # event type tags each appended event
            "CASE WHEN action_type = 'append' THEN array(_orig_type) END AS tags",
            "CASE WHEN action_type = 'delete' THEN 1 + pmod("
            "CAST(FLOOR(ABS(value)) AS BIGINT), appends_so_far) END AS delete_to",
            "CASE WHEN action_type = 'mark' "
            "THEN concat('mark-', CAST(offset AS STRING)) END AS mark_id",
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


#: footer-schema cache for the events table, keyed by (abs path -> (file
#: signature, schema)).  Unlike the immutable corpus tables (see
#: sources/tables.read_parquet_cached_schema) an events dir CAN mutate
#: between reads (replicated stores append between micro-batches), so a
#: bare path key would serve stale schemas there — the cache key therefore
#: includes a recursive (name, mtime_ns, size) listing of the dir: any
#: file added/removed/rewritten re-infers.  The signature costs ~4 us for
#: the handful of files a local events dir has (vs ~95 ms of footer
#: inference per DataFrame construction, paid by every journal-family and
#: events-analytics query on every bench run); dirs beyond 256 entries
#: skip caching entirely (at that scale a real deployment reads through a
#: catalog/table format where schema is metadata — guide §6).
_EVENTS_SCHEMA_CACHE: dict[str, tuple[tuple, object]] = {}

#: (applicationId, path) -> (signature, coerced DataFrame) — see
#: sources/tables._DF_CACHE for the immutable-plan rationale
_EVENTS_DF_CACHE: dict[tuple[str, str], tuple[tuple, object]] = {}

from kafka_journal_spark.sources.tables import (  # noqa: E402
    SIG_MAX_ENTRIES as _SIG_MAX_ENTRIES,
)


def _events_dir_signature(path: str) -> tuple | None:
    """Shared mutation-safe signature (sources/tables.dir_signature)."""
    from kafka_journal_spark.sources.tables import dir_signature

    return dir_signature(path)


def load_events(spark, sf_dir: str) -> DataFrame:
    """Load the ``events`` table, tolerating nanosecond parquet timestamps.

    The synthetic events.parquet stores TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; we read nanos as long and truncate to
    microseconds — exactly DuckDB's TIMESTAMP_NS -> TIMESTAMP coercion, so
    oracles agree.  Integer ``DIV`` avoids double-precision loss on the
    1.7e18 nano values.

    Schema comes from the signature-keyed footer cache above when the dir
    is byte-identical to the last read; the DATA is read from parquet on
    every run either way.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    sig = _events_dir_signature(p)
    # memoize the coerced DataFrame itself behind the same signature key
    # (r12, same rationale as tables._DF_CACHE: an immutable plan, reused,
    # caches no data — it amortizes the ~50-90 ms of relation construction
    # every journal-family build re-paid); any file change under the
    # events dir rebuilds the relation and its captured file index
    key = (spark.sparkContext.applicationId, p)
    if sig is not None:
        hit = _EVENTS_DF_CACHE.get(key)
        if hit is not None and hit[0] == sig:
            return hit[1]
    cached = _EVENTS_SCHEMA_CACHE.get(p) if sig is not None else None
    if cached is not None and cached[0] == sig:
        schema = cached[1]
        df = spark.read.schema(schema).parquet(p)
    else:
        df = spark.read.parquet(p)
        schema = df.schema
        if sig is not None:
            _EVENTS_SCHEMA_CACHE[p] = (sig, schema)
    if schema["ts"].dataType.simpleString() == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if sig is not None:
        _EVENTS_DF_CACHE[key] = (sig, df)
    return df


def journal_actions(spark, sf_dir: str) -> DataFrame:
    """(spark, sf_dir) -> actions DataFrame; the entry used by queries()."""
    return actions_from_events(load_events(spark, sf_dir))
