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

    Clamping semantics (HeadInfo.scala:206-247): a delete seen while in
    Append state clamps to the seq_nr appended so far; a delete with no
    prior append keeps its raw watermark while the state stays Delete, but
    when the first append arrives the accumulated pure-delete watermark is
    clamped to ``min(watermark, first_seq_nr_from - 1)`` and dropped
    entirely when the append starts at 1 (``range.from.prev[Option]``).
    The max over the per-delete clamped values is the final watermark.
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
    # seq appended so far (post-purge) at each row — the LAST append's
    # seq_nr_to by offset, not a running max: the reference sets
    # ``seqNr = range.to`` unconditionally (HeadInfo.scala:242), so a
    # foreign stream whose ranges restart lowers the head
    df = df.withColumn(
        "_seq_so_far",
        F.last(
            F.when(F.col("_post") & (F.col("action_type") == "append"), F.col("seq_nr_to")),
            ignorenulls=True,
        ).over(wseq),
    )
    is_app = F.col("_post") & (F.col("action_type") == "append")
    # a delete with NULL delete_to is malformed input the pure fold
    # tolerates as a no-op (folds.head_info_step) — exclude it here too:
    # F.least SKIPS nulls, so an unguarded NULL delete in append state
    # would set the watermark to the current head (hiding every live
    # event in snapshot-mode reads while fold-mode returns them)
    is_del = (
        F.col("_post")
        & (F.col("action_type") == "delete")
        & F.col("delete_to").isNotNull()
    )
    # the reference RE-clamps the accumulated watermark to the current head
    # at every delete — dt' = min(max(dt, to), seq) (HeadInfo.scala:255-262).
    # Unrolled with min/max distributivity, the final watermark is
    #   max over deletes j of min(to_j, suffix-min of seq-so-far over
    #   append-state deletes at-or-after j)
    # so each delete's contribution is clamped by every LATER delete's view
    # of the head, which an append restarting its range can have lowered.
    w_sfx = (
        Window.partitionBy("topic", "id")
        .orderBy("offset")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    s_at_del = F.when(is_del & F.col("_seq_so_far").isNotNull(), F.col("_seq_so_far"))
    df = df.withColumn("_sfx_min_s", F.min(s_at_del).over(w_sfx))
    del_in_append = F.when(
        is_del & F.col("_seq_so_far").isNotNull(),
        F.least(F.col("delete_to"), F.col("_sfx_min_s")),
    )
    del_pre_append = F.when(is_del & F.col("_seq_so_far").isNull(), F.col("delete_to"))
    app_off = F.when(is_app, F.col("offset"))
    agg = df.groupBy("topic", "id").agg(
        F.max("_purge_off").alias("_p"),
        F.min(app_off).alias("_first_app_off"),
        # last/first APPEND BY OFFSET (max_by/min_by skip null ordering
        # rows) — not max/min of the seq values, which diverges on
        # restarting ranges
        F.max_by(F.col("seq_nr_to"), app_off).alias("_max_seq"),
        F.min_by(F.col("seq_nr_from"), app_off).alias("_first_from"),
        F.max(del_in_append).alias("_del_in"),
        F.max(del_pre_append).alias("_del_pre"),
        F.min(s_at_del).alias("_min_s_del"),
    )
    # final watermark: Delete state keeps the raw max; Append state takes
    # max(clamped in-append deletes, pre-append watermark clamped to
    # first_from - 1, dropped when first_from == 1)  (HeadInfo.scala:232-247).
    # The pre-append watermark entered the fold at the first append, so it
    # too is re-clamped by every append-state delete's view of the head.
    # (F.least/GREATEST skip nulls in both engines, so guard explicitly)
    pre_kept = F.when(
        F.col("_del_pre").isNotNull() & (F.col("_first_from") > 1),
        F.least(
            F.col("_del_pre"),
            F.col("_first_from") - 1,
            F.coalesce(F.col("_min_s_del"), F.lit(2**62)),
        ),
    )
    agg = agg.withColumn(
        "_del_to",
        F.when(F.col("_max_seq").isNull(), F.col("_del_pre")).otherwise(
            F.greatest(F.col("_del_in"), pre_kept)
        ),
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
