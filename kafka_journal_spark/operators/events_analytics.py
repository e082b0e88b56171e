"""Event-stream analytics filling the remaining §2.7 operator categories:
distinct aggregation, set operations, the as-of join, and time-bucketed
(tumbling-window) aggregation — each with an exact DuckDB oracle.

The as-of join is the one operator Spark lacks natively (SURVEY §2.7 row):
implemented as a union-tag + running ``last(..., ignorenulls)`` window — a
single sort per key, no range-explosion, the standard Spark-first shape for
"most recent prior fact per event".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_journal_spark.operators.actions import load_events


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count aggregation (approx_count_distinct available on
    the same shape; the gate checks the exact form)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over part-key sets: large parts that were
    ordered, minus one brand, plus the never-ordered parts."""
    import os

    from kafka_journal_spark.sources.tables import read_parquet_cached_schema

    part = read_parquet_cached_schema(spark, os.path.join(sf_dir, "part.parquet"))
    li = read_parquet_cached_schema(spark, os.path.join(sf_dir, "lineitem.parquet"))
    large = part.filter(F.col("p_size") > 20).select(F.col("p_partkey").alias("k"))
    ordered = li.select(F.col("l_partkey").alias("k")).distinct()
    brand1 = part.filter(F.col("p_brand") == "Brand#1").select(F.col("p_partkey").alias("k"))
    never_ordered = part.select(F.col("p_partkey").alias("k")).exceptAll(ordered)
    return large.intersect(ordered).exceptAll(brand1).union(never_ordered).distinct()


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent prior click of the
    same user (NULL if none).

    Scale: one shuffle on user_id + one ordered window — no range join
    explosion; at 100 TB this beats an interval-join formulation because the
    state per key is a single carried value.
    """
    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.withColumn(
        "click_id",
        F.last(
            F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
        ).over(w),
    ).withColumn(
        "click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
        ).over(w),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_id",
        "click_ts",
    )


def x_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time aggregation (batch form of the streaming
    windowed agg; in streaming the same expression runs under a watermark)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a user's events split into sessions at
    >30-minute silences (batch form of a session window; in streaming the
    same semantics ride ``F.session_window`` with a watermark).

    The gap test compares timestamps with interval arithmetic (exact at µs)
    — an epoch-seconds subtraction would truncate sub-second parts
    differently across engines.

    Scale: one shuffle on user_id; lag + running sum over one sort.
    """
    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id")
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(
        F.lag("ts").over(ws).isNull()
        | (F.col("ts") > F.lag("ts").over(ws) + F.expr("INTERVAL 30 MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    df = ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return df.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: signup -> later click -> later purchase
    per user (sequence-pattern aggregation).

    Each stage's anchor is the earliest qualifying event strictly after the
    previous stage's anchor — three conditional-min aggregations per user,
    no self-joins.  Scale: one shuffle on user_id.
    """
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
        F.collect_list(F.struct("ts", "event_type")).alias("evs"),
    )
    t2 = F.array_min(
        F.transform(
            F.filter(
                F.col("evs"),
                lambda e: (e["event_type"] == F.lit("click")) & (e["ts"] > F.col("t1")),
            ),
            lambda e: e["ts"],
        )
    )
    per_user = per_user.withColumn("t2", F.when(F.col("t1").isNotNull(), t2))
    t3 = F.array_min(
        F.transform(
            F.filter(
                F.col("evs"),
                lambda e: (e["event_type"] == F.lit("purchase")) & (e["ts"] > F.col("t2")),
            ),
            lambda e: e["ts"],
        )
    )
    per_user = per_user.withColumn("t3", F.when(F.col("t2").isNotNull(), t3))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_signup_click"),
        F.count("t3").alias("n_signup_click_purchase"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week, counted
    by weeks-since-cohort of their later activity — the classic product-
    analytics rollup.

    Plan: one min-aggregate per user (cohort assignment), joined back to the
    events (AQE broadcasts the per-user table while it is small, shuffles
    once it is not), then a (cohort_week, week_offset) count with map-side
    combine.  Weeks are epoch-day / 7 buckets — identical integer math in
    both engines, no timezone or week-start semantics to diverge on.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", F.floor(F.unix_date(F.to_date("ts")) / 7).alias("_wk")
    )
    cohort = ev.groupBy("user_id").agg(F.min("_wk").alias("_cohort_wk"))
    return (
        ev.join(cohort, "user_id")
        .groupBy(
            F.col("_cohort_wk").cast("long").alias("cohort_week"),
            (F.col("_wk") - F.col("_cohort_wk")).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


def j_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT topic (Pointer2Statements.SelectTopics)."""
    from kafka_journal_spark.operators.actions import journal_actions

    return journal_actions(spark, sf_dir).select("topic").distinct()


EVENTS_ORACLES: dict[str, str] = {
    "q_cohort_retention": """
        WITH e AS (
          SELECT user_id,
                 CAST(FLOOR(datediff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) / 7) AS BIGINT) AS wk
          FROM events
        ),
        c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
        SELECT c.cohort_wk AS cohort_week,
               CAST(e.wk - c.cohort_wk AS BIGINT) AS week_offset,
               COUNT(DISTINCT e.user_id) AS n_active_users
        FROM e JOIN c USING (user_id)
        GROUP BY 1, 2
    """,
    "q_distinct": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "q_setops": """
        SELECT DISTINCT k FROM (
          (SELECT p_partkey AS k FROM part WHERE p_size > 20
           INTERSECT
           SELECT DISTINCT l_partkey AS k FROM lineitem)
          EXCEPT ALL
          SELECT p_partkey AS k FROM part WHERE p_brand = 'Brand#1'
        )
        UNION
        SELECT k FROM (
          SELECT p_partkey AS k FROM part
          EXCEPT ALL
          SELECT DISTINCT l_partkey AS k FROM lineitem
        )
    """,
    "q_asof_join": """
        WITH carried AS (
          SELECT event_id, ts, user_id, event_type,
                 LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
                 LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
          FROM events
        )
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, click_id, click_ts
        FROM carried WHERE event_type = 'purchase'
    """,
    "x_window_tumbling": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "j_topics": "SELECT DISTINCT 'journal' AS topic FROM events",
    "q_funnel": """
        WITH u AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
          FROM events GROUP BY user_id
        ),
        u2 AS (
          SELECT u.user_id, u.t1,
                 (SELECT MIN(e.ts) FROM events e
                  WHERE e.user_id = u.user_id AND e.event_type = 'click'
                    AND e.ts > u.t1) AS t2
          FROM u
        ),
        u3 AS (
          SELECT u2.user_id, u2.t1, u2.t2,
                 (SELECT MIN(e.ts) FROM events e
                  WHERE e.user_id = u2.user_id AND e.event_type = 'purchase'
                    AND e.ts > u2.t2) AS t3
          FROM u2
        )
        SELECT COUNT(*) AS n_users,
               COUNT(t1) AS n_signup,
               COUNT(t2) AS n_signup_click,
               COUNT(t3) AS n_signup_click_purchase
        FROM u3
    """,
    "q_sessionize": """
        WITH o AS (
          SELECT event_id, ts, user_id,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        ),
        s AS (
          SELECT *, CASE WHEN prev_ts IS NULL
                          OR ts > prev_ts + INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS ns
          FROM o
        ),
        t AS (
          SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM s
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM t GROUP BY user_id, session_id
    """,
}

EVENTS_QUERIES = {
    "q_cohort_retention": q_cohort_retention,
    "q_sessionize": q_sessionize,
    "q_funnel": q_funnel,
    "q_distinct": q_distinct,
    "q_setops": q_setops,
    "q_asof_join": q_asof_join,
    "x_window_tumbling": x_window_tumbling,
    "j_topics": j_topics,
}
