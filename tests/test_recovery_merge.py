"""The recovery-merge consistency property (reference ConsistencySpec /
JournalSpec variants): merging a replicated prefix with a Kafka tail must
equal full materialization, at every split point."""

from __future__ import annotations

import pytest
from conftest import append, delete, make_actions, mark, purge

from kafka_journal_spark.operators.read import recovery_merge
from kafka_journal_spark.operators.replicate import materialize_journal

SCENARIOS = {
    "appends_then_delete_in_tail": [
        append("a", 1), append("a", 2), append("a", 3), delete("a", 2), append("a", 4),
    ],
    "purge_in_tail": [
        append("a", 1), append("a", 2), purge("a"), append("a", 3),
    ],
    "two_keys_interleaved": [
        append("a", 1), append("b", 1), delete("a", 1), append("b", 2),
        purge("b"), append("a", 2), append("b", 3), mark("a"),
    ],
    "delete_then_purge_then_fresh": [
        append("a", 1), delete("a", 1), purge("a"), append("a", 2), delete("a", 2),
        append("a", 3),
    ],
}


def _rows(df):
    return sorted(
        (r.id, r.seq_nr, r.offset) for r in df.select("id", "seq_nr", "offset").collect()
    )


@pytest.mark.parametrize("name", sorted(SCENARIOS))
@pytest.mark.parametrize("split_frac", [0.0, 0.3, 0.6, 0.99])
def test_merge_equals_full_materialization(spark, name, split_frac):
    df = make_actions(spark, SCENARIOS[name])
    expected = _rows(materialize_journal(df))
    got = _rows(recovery_merge(df, split_frac=split_frac))
    assert got == expected, f"{name} split={split_frac}"


def test_duplicated_tail_deduped(spark):
    # R5 monotonic guard: re-delivered tail records must not duplicate events
    df = make_actions(spark, SCENARIOS["appends_then_delete_in_tail"])
    merged = recovery_merge(df, split_frac=0.5)
    ids = [(r.id, r.seq_nr) for r in merged.collect()]
    assert len(ids) == len(set(ids))


def test_null_partition_rows_survive_the_split_join(spark):
    """The window form this refactor replaced grouped NULL topic/partition
    rows into their own group and classified them like any other; a bare
    equi-join would drop them from BOTH prefix and tail (NULL never equals
    NULL), silently losing events from the merged read.  The eqNullSafe
    join must keep the full-materialization invariant on such logs."""
    from pyspark.sql import functions as F

    df = make_actions(spark, SCENARIOS["two_keys_interleaved"]).withColumn(
        "partition",
        F.when(F.col("id") == "b", F.lit(None).cast("int")).otherwise(
            F.col("partition")
        ),
    )
    expected = _rows(materialize_journal(df))
    # sanity: the null-partition key's surviving events are in the model
    assert any(i == "b" for (i, _, _) in expected)
    for frac in (0.0, 0.5, 0.99):
        got = _rows(recovery_merge(df, split_frac=frac))
        assert got == expected, frac


def test_split_points_match_window_form_on_random_logs(spark):
    """Engine-pair parity for the round-9 split-point refactor: the
    aggregate-join split (groupBy max broadcast back) must classify every
    action into prefix/tail exactly like the window form it replaced
    (max().over(partitionBy topic, partition)), across random multi-
    partition logs and every split fraction — the prefix/tail partition IS
    recovery_merge's only use of the split, so identical classification
    means identical reads."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(0xC0FFEE)
    rows = []
    for i in range(300):
        rows.append(
            dict(
                append(f"k{rng.randrange(8)}", rng.randrange(1, 50)),
                partition=rng.randrange(4),
                # sparse, shuffled offsets: max(offset) differs per partition
                offset=rng.randrange(10_000),
            )
        )
    df = make_actions(spark, rows)
    # make_actions merges dict fields over its defaults, so the sparse
    # random offsets survive — assert the log is genuinely multi-partition
    offs = {(r.partition, r.offset) for r in df.select("partition", "offset").collect()}
    assert len(offs) > 4

    for frac in (0.0, 0.25, 0.5, 0.9, 1.0):
        agg = df.groupBy("topic", "partition").agg(
            F.floor(F.max("offset") * F.lit(frac)).cast("long").alias("_split")
        )
        via_join = {
            (r.partition, r.offset, r.offset <= r._split)
            for r in df.join(agg, ["topic", "partition"]).collect()
        }
        wp = Window.partitionBy("topic", "partition")
        via_window = {
            (r.partition, r.offset, r.offset <= r._split)
            for r in df.withColumn(
                "_split",
                F.floor(F.max("offset").over(wp) * F.lit(frac)).cast("long"),
            ).collect()
        }
        assert via_join == via_window, frac


def test_redelivered_append_below_replicated_delete_stays_deleted(spark):
    """An at-least-once producer retry that re-keys offsets can place
    appends with OLD seq numbers in the un-replicated tail AFTER the
    delete covering them was replicated.  The prefix side yields nothing,
    the tail fold sees no tail delete, and R5 has no surviving original
    to dedup against — pre-fix the merge resurrected the deleted events,
    breaking the full-materialization invariant.  The replicated
    watermark must clamp tail rows too (and a tail PURGE must void the
    clamp: a fresh incarnation legitimately restarts below it)."""
    acts = [
        append("a", 1), append("a", 2), delete("a", 2),  # replicated prefix
        append("a", 1), append("a", 2),  # the re-keyed retry in the tail
    ]
    df = make_actions(spark, acts)
    expected = _rows(materialize_journal(df))
    assert expected == []  # the model hides everything below the watermark
    got = _rows(recovery_merge(df, split_frac=0.5))
    assert got == expected, got

    # purge-in-tail voids the clamp: the new incarnation's appends live
    acts2 = [
        append("b", 1), delete("b", 1),          # replicated
        purge("b"), append("b", 1),              # tail: fresh incarnation
    ]
    df2 = make_actions(spark, acts2)
    expected2 = _rows(materialize_journal(df2))
    assert [s for (_, s, _) in expected2] == [1]
    got2 = _rows(recovery_merge(df2, split_frac=0.4))
    assert got2 == expected2, got2


def test_null_id_rows_get_per_key_folds_like_the_model(spark):
    """Pin the r11 single-pass rewrite's documented NULL-id contract: the
    windowed form folds NULL-keyed rows as their own (topic, id) group —
    exactly how materialize_journal's window treats them — where the old
    join composition gave them no fold at all.  A NULL-id delete must
    therefore clamp NULL-id appends (and nothing else), and the merge must
    still equal full materialization at every split point."""
    from pyspark.sql import functions as F

    acts = [
        append("x", 1), append("x", 2),          # a normal key, untouched
        append("n", 1), append("n", 2), append("n", 3),
        delete("n", 2), append("n", 4),          # folds apply to the NULL key
    ]
    df = make_actions(spark, acts).withColumn(
        "id",
        F.when(F.col("id") == "n", F.lit(None).cast("string")).otherwise(
            F.col("id")
        ),
    )

    def _rows_nullsafe(frame):
        return sorted(
            ((r.id or "", r.seq_nr, r.offset) for r in
             frame.select("id", "seq_nr", "offset").collect()),
        )

    expected = _rows_nullsafe(materialize_journal(df))
    # the model itself folds the NULL group: seq 1-2 deleted, 3-4 live
    assert [(i, s) for (i, s, _) in expected] == [
        ("", 3), ("", 4), ("x", 1), ("x", 2),
    ]
    for frac in (0.0, 0.3, 0.6, 0.99):
        got = _rows_nullsafe(recovery_merge(df, split_frac=frac))
        assert got == expected, frac
