"""DuckDB oracle SQL for the journal-family queries.

Each string is ANSI SQL over the pre-registered parquet views (``events`` et
al.), computing the same result as the corresponding Spark operator through an
*independent* formulation (the driver compares row counts, schemas and
order-insensitive value hashes at sf=0.01).

All journal oracles share the ``actions`` CTE (operators/actions.py:ACTIONS_SQL)
and the ``__fold`` CTE below, which replays the replication fold with plain
window functions.
"""

from __future__ import annotations

from kafka_journal_spark import SEGMENT_SIZE_DEFAULT, SEGMENTS_DEFAULT
from kafka_journal_spark.operators.actions import ACTIONS_SQL

# per-action fold state: purge horizon, effectiveness, delete watermark
FOLD_SQL = f"""
    __actions AS ({ACTIONS_SQL}),
    __p AS (
        SELECT *,
            MAX(CASE WHEN action_type = 'purge' THEN "offset" END)
                OVER (PARTITION BY topic, id) AS _purge_off
        FROM __actions
    ),
    __e AS (
        SELECT *, ("offset" > COALESCE(_purge_off, -1)) AS _eff FROM __p
    ),
    __fold AS (
        SELECT *,
            MAX(CASE WHEN action_type = 'delete' AND _eff THEN delete_to END)
                OVER (PARTITION BY topic, id) AS _del_to
        FROM __e
    )
"""

JOURNAL_ROWS_SQL = f"""
    __journal AS (
        SELECT
            id, topic,
            CAST(FLOOR((seq_nr_from - 1) / {SEGMENT_SIZE_DEFAULT}) AS BIGINT) AS segment,
            seq_nr_from AS seq_nr,
            partition, "offset", timestamp, origin, version,
            payload_type, payload AS payload_txt
        FROM __fold
        WHERE action_type = 'append' AND _eff AND seq_nr_from > COALESCE(_del_to, 0)
    )
"""

METAJOURNAL_SQL = f"""
    __meta AS (
        SELECT
            topic,
            ('0x' || substr(md5(id), 1, 8))::BIGINT % {SEGMENTS_DEFAULT} AS segment,
            id,
            MIN(partition) AS partition,
            MAX("offset") AS "offset",
            CAST({SEGMENT_SIZE_DEFAULT} AS INTEGER) AS segment_size,
            CAST(GREATEST(COALESCE(MAX(seq_nr_to), 0), COALESCE(MAX(delete_to), 0)) AS BIGINT) AS seq_nr,
            CAST(NULLIF(GREATEST(COALESCE(MAX(delete_to), 0),
                                 COALESCE(MIN(seq_nr_from), 1) - 1), 0) AS BIGINT) AS delete_to,
            MIN(timestamp) AS created,
            CAST(MIN(timestamp) AS DATE) AS created_date,
            MAX(timestamp) AS updated
        FROM __fold
        WHERE _eff AND action_type IN ('append', 'delete')
        GROUP BY topic, id
    )
"""


def _q(body: str) -> str:
    return f"WITH {FOLD_SQL}, {JOURNAL_ROWS_SQL}, {METAJOURNAL_SQL} {body}"


ORACLES: dict[str, str] = {
    "j_actions": f"WITH __a AS ({ACTIONS_SQL}) SELECT * FROM __a",
    # the wire round-trip must reproduce the actions stream bit-for-bit
    "j_wire_roundtrip": f"WITH __a AS ({ACTIONS_SQL}) SELECT * FROM __a",
    "j_journal": _q("SELECT * FROM __journal"),
    # incremental streaming replication == one-shot materialization
    "j_stream_replicate": _q("SELECT * FROM __journal"),
    "j_meta": _q("SELECT * FROM __meta"),
    "j_pointers": f"""
        WITH __a AS ({ACTIONS_SQL})
        SELECT topic, partition, MAX("offset") AS "offset",
               MIN(timestamp) AS created, MAX(timestamp) AS updated
        FROM __a GROUP BY topic, partition
    """,
    "j_read": _q(
        """SELECT id, topic, seq_nr, partition, "offset", timestamp, origin,
                  version, payload_type, payload_txt
           FROM __journal WHERE seq_nr >= 1"""
    ),
    "j_read_from": _q(
        """SELECT id, topic, seq_nr, partition, "offset", timestamp, origin,
                  version, payload_type, payload_txt
           FROM __journal WHERE seq_nr >= 4"""
    ),
    "j_pointer": _q('SELECT topic, id, partition, "offset", seq_nr FROM __meta'),
    "j_ids": _q("SELECT topic, id FROM __meta WHERE topic = 'journal'"),
    "j_replay_limit": _q(
        """SELECT id, topic, seq_nr, partition, "offset", timestamp, origin,
                  version, payload_type, payload_txt
           FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY topic, id ORDER BY seq_nr) AS _rn
             FROM __journal WHERE seq_nr BETWEEN 2 AND 1000000
           ) WHERE _rn <= 10"""
    ),
    # the merge result must equal full materialization (consistency property)
    "j_recovery_merge": _q(
        """SELECT id, topic, seq_nr, partition, "offset", timestamp, origin,
                  version, payload_type, payload_txt
           FROM __journal WHERE seq_nr >= 1"""
    ),
}
