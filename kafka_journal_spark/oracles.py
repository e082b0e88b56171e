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
            payload_type, payload AS payload_txt, tags
        FROM __fold
        WHERE action_type = 'append' AND _eff AND seq_nr_from > COALESCE(_del_to, 0)
    )
"""

METAJOURNAL_SQL = f"""
    -- delete watermark clamped to the appended head when one exists
    -- (ReplicatedCassandra.scala:309-316); raw on delete-only journals
    __meta_agg AS (
        SELECT
            topic, id,
            MIN(partition) AS partition,
            MAX("offset") AS "offset",
            MAX(seq_nr_to) AS _max_app,
            MIN(seq_nr_from) AS _first_app,
            MAX(delete_to) AS _d,
            MIN(timestamp) AS created,
            MAX(timestamp) AS updated
        FROM __fold
        WHERE _eff AND action_type IN ('append', 'delete')
        GROUP BY topic, id
    ),
    __meta AS (
        SELECT
            topic,
            -- Java String.hashCode parity (SegmentNr.scala:146-150):
            -- abs(lower(id).hashCode % segments), int32 wrap emulated in
            -- bigint space.  The fold walks UTF-16 CODE UNITS like the
            -- JVM: a BMP code point is one 31*h+c step, a supplementary
            -- code point contributes its surrogate PAIR in one combined
            -- step (961*h + 31*hi + lo) — identical to the Spark twin
            -- (replicate.py java_string_hash), so non-BMP ids (emoji,
            -- U+1D11E) land in the same metajournal segment in both
            -- engines
            ABS(list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                               list_transform(string_split(lower(id), ''),
                                              c -> CAST(ascii(c) AS BIGINT))),
                  (acc, x) -> ((((CASE WHEN x < 65536 THEN acc * 31 + x
                                  ELSE acc * 961
                                       + 31 * (55296 + (x - 65536) // 1024)
                                       + 56320 + (x - 65536) % 1024 END)
                                 + 2147483648) % 4294967296
                                + 4294967296) % 4294967296) - 2147483648
                ) % {SEGMENTS_DEFAULT}) AS segment,
            id,
            partition,
            "offset",
            CAST({SEGMENT_SIZE_DEFAULT} AS INTEGER) AS segment_size,
            CAST(GREATEST(COALESCE(_max_app, 0),
                          COALESCE(CASE WHEN _d IS NOT NULL AND _max_app IS NOT NULL THEN LEAST(_d, _max_app) ELSE _d END, 0))
                 AS BIGINT) AS seq_nr,
            CAST(NULLIF(GREATEST(
                COALESCE(CASE WHEN _d IS NOT NULL AND _max_app IS NOT NULL THEN LEAST(_d, _max_app) ELSE _d END, 0),
                COALESCE(_first_app, 1) - 1), 0) AS BIGINT) AS delete_to,
            created,
            CAST(created AS DATE) AS created_date,
            updated
        FROM __meta_agg
    )
"""


def _q(body: str) -> str:
    return f"WITH {FOLD_SQL}, {JOURNAL_ROWS_SQL}, {METAJOURNAL_SQL} {body}"


#: array-typed columns are serialized with ``to_json`` in gate outputs (both
#: engines emit the identical compact JSON; the driver's pandas canonicalizer
#: cannot sort raw list cells) — the engine APIs keep real arrays.
#: the HeadInfo fold (HeadInfo.scala:206-275) as ONE SQL chain over the
#: rows of a CTE named ``__src`` — shared by the streaming oracle (whole
#: action stream) and the batch oracle (0.7-split un-replicated tail), so
#: the intricate clamp semantics (purge horizon, LAST_VALUE head-so-far,
#: suffix-min re-clamp, pre-append watermark clamp) live in exactly one
#: place: a semantic fix cannot silently reach only one of the twins.
def _head_fold_sql(src_ctes: str) -> str:
    return f"""
        WITH {src_ctes},
        p AS (SELECT *, MAX(CASE WHEN action_type = 'purge' THEN "offset" END)
                  OVER (PARTITION BY topic, id) AS _p FROM __src),
        q AS (SELECT *, ("offset" > COALESCE(_p, -1)) AS _post FROM p),
        r AS (SELECT *, LAST_VALUE(CASE WHEN _post AND action_type = 'append' THEN seq_nr_to END IGNORE NULLS)
                  OVER (PARTITION BY topic, id ORDER BY "offset"
                        ROWS UNBOUNDED PRECEDING) AS _seq_so_far FROM q),
        -- HeadInfo.scala:255-262 re-clamps the accumulated watermark to the
        -- current head at every delete: each delete's contribution is capped
        -- by the suffix-min of the head over later append-state deletes
        r2 AS (SELECT *, MIN(CASE WHEN _post AND action_type = 'delete' AND delete_to IS NOT NULL AND _seq_so_far IS NOT NULL
                                  THEN _seq_so_far END)
                  OVER (PARTITION BY topic, id ORDER BY "offset"
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS _sfx_min_s FROM r),
        agg0 AS (
          SELECT topic, id, MAX(_p) AS _p,
                 MIN(CASE WHEN _post AND action_type = 'append' THEN "offset" END) AS _first_app_off,
                 -- last/first append BY OFFSET (HeadInfo.scala:242 sets
                 -- seqNr = range.to unconditionally; restarting ranges lower it)
                 MAX_BY(CASE WHEN _post AND action_type = 'append' THEN seq_nr_to END,
                        CASE WHEN _post AND action_type = 'append' THEN "offset" END) AS _max_seq,
                 MIN_BY(CASE WHEN _post AND action_type = 'append' THEN seq_nr_from END,
                        CASE WHEN _post AND action_type = 'append' THEN "offset" END) AS _first_from,
                 MAX(CASE WHEN _post AND action_type = 'delete' AND delete_to IS NOT NULL AND _seq_so_far IS NOT NULL
                       THEN LEAST(delete_to, _sfx_min_s) END) AS _del_in,
                 MAX(CASE WHEN _post AND action_type = 'delete' AND delete_to IS NOT NULL AND _seq_so_far IS NULL
                       THEN delete_to END) AS _del_pre,
                 MIN(CASE WHEN _post AND action_type = 'delete' AND delete_to IS NOT NULL AND _seq_so_far IS NOT NULL
                       THEN _seq_so_far END) AS _min_s_del
          FROM r2 GROUP BY topic, id
        ),
        -- HeadInfo.scala:232-247: the pure-delete watermark is clamped to
        -- first_from - 1 by the first append (dropped when first_from = 1),
        -- then re-clamped by every later append-state delete's head view
        agg AS (
          SELECT topic, id, _p, _first_app_off, _max_seq,
                 CASE WHEN _max_seq IS NULL THEN _del_pre
                      ELSE GREATEST(_del_in,
                             CASE WHEN _del_pre IS NOT NULL AND _first_from > 1
                                  THEN LEAST(_del_pre, _first_from - 1,
                                             COALESCE(_min_s_del, 4611686018427387904)) END)
                 END AS _del_to
          FROM agg0
        )
        SELECT topic, id,
               CASE WHEN _max_seq IS NOT NULL THEN 'append'
                    WHEN _del_to IS NOT NULL THEN 'delete'
                    WHEN _p IS NOT NULL THEN 'purge' ELSE 'empty' END AS kind,
               CASE WHEN _max_seq IS NOT NULL THEN _first_app_off END AS "offset",
               CAST(COALESCE(CASE WHEN _max_seq IS NOT NULL THEN _max_seq END, 0) AS BIGINT) AS seq_nr,
               CAST(CASE WHEN _max_seq IS NOT NULL OR _del_to IS NOT NULL THEN _del_to END AS BIGINT) AS delete_to
        FROM agg
    """


ORACLES: dict[str, str] = {
    "j_actions": f"WITH __a AS ({ACTIONS_SQL}) SELECT * FROM __a",
    # the wire round-trip must reproduce the actions stream bit-for-bit
    "j_wire_roundtrip": f"""
        WITH __a AS ({ACTIONS_SQL})
        SELECT topic, partition, "offset", id, action_type, timestamp, origin,
               version, seq_nr_from, seq_nr_to, payload_type, payload,
               to_json(tags) AS tags, delete_to, mark_id
        FROM __a
    """,
    # binary-envelope round-trip: decode(encode(x)) == x with the payload
    # carried as raw md5 bytes (hex-projected for the gate; Spark hex() and
    # DuckDB upper(md5()) agree)
    "j_wire_roundtrip_bin": f"""
        WITH __a AS ({ACTIONS_SQL})
        SELECT topic, partition, "offset", id, action_type, timestamp, origin,
               version, seq_nr_from, seq_nr_to,
               CASE WHEN action_type = 'append' THEN 'binary' END AS payload_type,
               CASE WHEN action_type = 'append' THEN upper(md5(payload)) END AS payload_hex,
               to_json(tags) AS tags,
               CASE WHEN action_type = 'append' THEN '{{}}' END AS metadata,
               delete_to, mark_id
        FROM __a
    """,
    "j_journal": _q(
        """SELECT id, topic, segment, seq_nr, partition, "offset", timestamp,
                  origin, version, payload_type, payload_txt,
                  to_json(tags) AS tags
           FROM __journal"""
    ),
    # incremental streaming replication == one-shot materialization
    "j_stream_replicate": _q(
        """SELECT id, topic, segment, seq_nr, partition, "offset", timestamp,
                  origin, version, payload_type, payload_txt,
                  to_json(tags) AS tags
           FROM __journal"""
    ),
    # tag-filtered read (akka Tagged use-case, reference Tags.scala)
    "j_read_by_tag": _q(
        """SELECT id, topic, seq_nr, "offset", payload_txt,
                  to_json(tags) AS tags
           FROM __journal WHERE list_contains(tags, 'click')"""
    ),
    # materialized tag secondary index (explode) and the indexed read,
    # which must return exactly the rows of the direct tag-filtered scan
    "j_tag_index": _q(
        """SELECT unnest(tags) AS tag, topic, id, seq_nr, "offset"
           FROM __journal"""
    ),
    "j_read_by_tag_idx": _q(
        """SELECT id, topic, seq_nr, "offset", payload_txt,
                  to_json(tags) AS tags
           FROM __journal WHERE list_contains(tags, 'click')"""
    ),
    # per-topic visibility accounting (compaction debt, tombstone mass,
    # log high-water mark) — derived entirely from the shared CTEs
    "j_store_health": _q(
        """SELECT a.topic, a.n_append_actions,
                  COALESCE(l.n_live, 0) AS n_live,
                  a.n_append_actions - COALESCE(l.n_live, 0) AS n_hidden,
                  COALESCE(k.n_keys, 0) AS n_keys,
                  CAST(COALESCE(k.tombstone_debt, 0) AS BIGINT) AS tombstone_debt,
                  a.max_log_offset
           FROM (SELECT topic,
                        SUM(CASE WHEN action_type = 'append' THEN 1 ELSE 0 END) AS n_append_actions,
                        MAX("offset") AS max_log_offset
                 FROM __actions GROUP BY topic) a
           LEFT JOIN (SELECT topic, COUNT(*) AS n_live
                      FROM __journal GROUP BY topic) l USING (topic)
           LEFT JOIN (SELECT topic, COUNT(*) AS n_keys,
                             SUM(COALESCE(delete_to, 0)) AS tombstone_debt
                      FROM __meta GROUP BY topic) k USING (topic)"""
    ),
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
           FROM __journal WHERE seq_nr >= 20"""
    ),
    "j_pointer": _q('SELECT topic, id, partition, "offset", seq_nr FROM __meta'),
    "j_ids": _q("SELECT topic, id FROM __meta WHERE topic = 'journal'"),
    # stream-stream interval join == identical batch join (the watermark
    # only bounds state; with availableNow every pair is emitted)
    "x_stream_join": """
        SELECT v.user_id AS user_id, v.event_id AS view_id,
               p.event_id AS purchase_id,
               CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_secs
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    # streaming watermarked dedup == plain distinct (event_id is unique in
    # the source; the stream sees every row twice)
    "x_dedup_stream": """
        SELECT DISTINCT event_id, ts, user_id, event_type, value FROM events
    """,
    # streaming tumbling windows == batch hour buckets (epoch-aligned)
    "x_window_stream": """
        SELECT date_trunc('hour', ts) AS ws, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2
    """,
    # streaming session windows (30-min gap): session = gap-island, end =
    # last event + gap (Spark's session_window end is exclusive, so a gap of
    # exactly 30 minutes starts a NEW session -> the island condition is >=)
    "x_session_stream": """
        WITH lagd AS (
          SELECT user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          FROM events
        ),
        marks AS (
          SELECT user_id, ts,
                 CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM lagd
        ),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marks
        )
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
    # statistical aggs from exact integral moments (HUGEINT sums), derived
    # in double with the identical op order as the Spark side
    "x_stats_moments": """
        WITH q AS (
          SELECT event_type,
                 CAST(FLOOR(value * 1e6) AS HUGEINT) AS v,
                 CAST(user_id AS HUGEINT) AS u
          FROM events
        ),
        a AS (
          SELECT event_type, COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2,
                 SUM(u) AS su, SUM(u * u) AS su2, SUM(v * u) AS svu
          FROM q GROUP BY event_type
        ),
        d AS (
          SELECT event_type, n,
                 CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
                 CAST(s2 AS DOUBLE) AS s2d, CAST(su AS DOUBLE) AS sud,
                 CAST(su2 AS DOUBLE) AS su2d, CAST(svu AS DOUBLE) AS svud
          FROM a
        )
        SELECT event_type, n,
               (FLOOR((s1d / nd / 1e6) * 1000000.0 + 0.5) / 1000000.0) AS mean_value,
               (FLOOR(((s2d / nd - (s1d / nd) * (s1d / nd)) / 1e12) * 1000000.0 + 0.5) / 1000000.0) AS var_value,
               (FLOOR(sqrt((s2d / nd - (s1d / nd) * (s1d / nd)) / 1e12) * 1000000.0 + 0.5) / 1000000.0) AS stddev_value,
               (FLOOR(((nd * svud - s1d * sud)
                        / sqrt((nd * s2d - s1d * s1d) * (nd * su2d - sud * sud))
                       + 1.0) * 1000000.0 + 0.5) / 1000000.0) AS corr_value_user_p1
        FROM d
    """,
    # skew patterns: salted two-phase agg / pair-dedup distinct must equal
    # the naive forms
    "x_skew_salted_agg": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events GROUP BY event_type
    """,
    "x_skew_count_distinct": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
        FROM events GROUP BY event_type
    """,
    # HLL sketch gate: the estimate itself is engine-specific, but the
    # advertised error bound is checkable — the Spark side emits
    # |approx - exact| <= max(6*rsd*exact, 1) as a boolean; the oracle
    # asserts it TRUE for every group (and pins n/exact_users exactly)
    "x_approx_distinct": """
        SELECT event_type, COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS approx_within_bound
        FROM events GROUP BY event_type
    """,
    # S13: last-write-wins settings state from the derived op sequence
    # (buckets 0-4 overwritten with max event_id, 7-8 removed)
    "x_settings_kv": """
        WITH b AS (
          SELECT CAST(user_id % 10 AS BIGINT) AS k, COUNT(*) AS n,
                 MAX(event_id) AS m
          FROM events GROUP BY 1
        ),
        keys AS (SELECT unnest(range(10)) AS k),
        j AS (
          SELECT keys.k, COALESCE(b.n, 0) AS n, COALESCE(b.m, 0) AS m
          FROM keys LEFT JOIN b ON keys.k = b.k
        )
        SELECT 's' || CAST(k AS VARCHAR) AS key,
               CAST(CASE WHEN k < 5 THEN m ELSE n END AS VARCHAR) AS value,
               'gate' AS origin
        FROM j WHERE k NOT IN (7, 8)
    """,
    # secondary-index lookups (MetaJournalStatements.scala:247-310)
    "j_ids_by_segment": _q(
        """SELECT topic, segment, id FROM __meta
           WHERE topic = 'journal'
             AND segment = (SELECT MIN(segment) FROM __meta)"""
    ),
    "j_ids_by_created": _q(
        """SELECT topic, created_date, id FROM __meta
           WHERE topic = 'journal'
             AND created_date = (SELECT MIN(created_date) FROM __meta)"""
    ),
    "j_replay_limit": _q(
        """SELECT id, topic, seq_nr, partition, "offset", timestamp, origin,
                  version, payload_type, payload_txt
           FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY topic, id ORDER BY seq_nr) AS _rn
             FROM __journal WHERE seq_nr BETWEEN 2 AND 1000000
           ) WHERE _rn <= 10"""
    ),
    # C1-C3: the standing head-state stream's final states == the batch
    # HeadInfo fold over the whole action stream
    "x_head_stream": _head_fold_sql(
        f"""__a AS ({ACTIONS_SQL}), __src AS (SELECT * FROM __a)"""
    ),
    # R3 batch form: HeadInfo fold over the un-replicated tail (0.7 split)
    "j_head_info": _head_fold_sql(
        f"""__a AS ({ACTIONS_SQL}),
        s AS (SELECT *, CAST(FLOOR(MAX("offset") OVER (PARTITION BY topic, partition) * 0.7) AS BIGINT) AS _split FROM __a),
        __src AS (SELECT * FROM s WHERE "offset" > _split)"""
    ),
    # W5 unit-weight batching (max_events=7 so sf0.01 has multi-batch keys)
    "w_batching": f"""
        WITH __a AS ({ACTIONS_SQL}),
        rn AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY topic, id ORDER BY "offset") AS _rn
          FROM __a WHERE action_type = 'append'
        ),
        b AS (SELECT *, CAST(FLOOR((_rn - 1) / 7) AS BIGINT) AS batch_nr FROM rn)
        SELECT topic, id, batch_nr, COUNT(*) AS n_events,
               MIN(seq_nr_from) AS seq_lo, MAX(seq_nr_to) AS seq_hi,
               MIN("offset") AS first_offset, MAX("offset") AS last_offset
        FROM b GROUP BY 1, 2, 3
    """,
    # pure-SQL surface over the registered views (correlated EXISTS)
    "q_sql_surface": _q(
        """SELECT m.topic,
                  COUNT(*) AS n_journals,
                  CAST(SUM(CASE WHEN EXISTS (
                      SELECT 1 FROM __journal j
                      WHERE j.topic = m.topic AND j.id = m.id
                  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_rows,
                  CAST(MAX(m.seq_nr) AS BIGINT) AS max_seq_nr,
                  CAST(SUM(m.seq_nr) AS BIGINT) AS total_seq
           FROM __meta m
           GROUP BY m.topic"""
    ),
    # every journal row duplicated once at a shifted offset -> every
    # (topic, id, seq_nr) flagged with exactly 2 copies
    "j_integrity": _q(
        """SELECT topic, id, seq_nr,
                  CAST(2 AS BIGINT) AS n_copies,
                  "offset" AS first_offset,
                  "offset" + 1000000 AS last_offset
           FROM __journal"""
    ),
    # the merge result must equal full materialization (consistency property)
    "j_recovery_merge": _q(
        """SELECT id, topic, seq_nr, partition, "offset", timestamp, origin,
                  version, payload_type, payload_txt
           FROM __journal WHERE seq_nr >= 1"""
    ),
}

# the SQL-TVF read must agree with the DataFrame read path: same oracle
ORACLES["q_read_journal_sql"] = ORACLES["j_read_from"]
