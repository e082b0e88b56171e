"""R3 in batch form: the HeadInfo fold over a bounded action set as a
DataFrame aggregation (the same summary ``folds.head_info`` computes purely
and ``streaming/head_state.py`` maintains incrementally).

Used by the recovery planner when no standing head stream exists: fold the
un-replicated Kafka tail per key into Empty/Append/Delete/Purge + the
first-append offset, last seq_nr, and clamped delete watermark
(reference ``HeadInfo.scala:105-275``).

One window + one aggregation on the (topic, id) partitioning — the same
exchange every other journal operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def head_info_batch(actions: DataFrame) -> DataFrame:
    """Per-key final HeadInfo over an action DataFrame.

    Clamping semantics: a delete seen while in Append state clamps to the
    seq_nr appended so far; a delete with no prior append keeps its raw
    watermark (Delete state).  The max over those per-delete clamped values
    is the final watermark.
    """
    wk = Window.partitionBy("topic", "id")
    wseq = (
        Window.partitionBy("topic", "id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = actions.withColumn(
        "_purge_off", F.max(F.when(F.col("action_type") == "purge", F.col("offset"))).over(wk)
    )
    post = F.col("offset") > F.coalesce(F.col("_purge_off"), F.lit(-1))
    df = df.withColumn("_post", post)
    # seq appended so far (post-purge) at each row
    df = df.withColumn(
        "_seq_so_far",
        F.max(
            F.when(F.col("_post") & (F.col("action_type") == "append"), F.col("seq_nr_to"))
        ).over(wseq),
    )
    clamped = F.when(
        F.col("_post") & (F.col("action_type") == "delete"),
        F.when(
            F.col("_seq_so_far").isNotNull(),
            F.least(F.col("delete_to"), F.col("_seq_so_far")),
        ).otherwise(F.col("delete_to")),
    )
    agg = df.groupBy("topic", "id").agg(
        F.max("_purge_off").alias("_p"),
        F.min(
            F.when(F.col("_post") & (F.col("action_type") == "append"), F.col("offset"))
        ).alias("_first_app_off"),
        F.max(
            F.when(F.col("_post") & (F.col("action_type") == "append"), F.col("seq_nr_to"))
        ).alias("_max_seq"),
        F.max(clamped).alias("_del_to"),
    )
    kind = (
        F.when(F.col("_max_seq").isNotNull(), "append")
        .when(F.col("_del_to").isNotNull(), "delete")
        .when(F.col("_p").isNotNull(), "purge")
        .otherwise("empty")
    )
    return agg.select(
        "topic",
        "id",
        kind.alias("kind"),
        F.when(kind == "append", F.col("_first_app_off")).alias("offset"),
        F.coalesce(
            F.when(kind == "append", F.col("_max_seq")), F.lit(0)
        ).cast("long").alias("seq_nr"),
        F.when(kind.isin("append", "delete"), F.col("_del_to")).cast("long").alias("delete_to"),
    )
