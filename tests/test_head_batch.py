"""Cross-implementation check: the Spark batch HeadInfo fold
(`operators/head.py:head_info_batch`) must equal the pure-Python fold
(`folds.py:head_info`) on randomized action sequences — including
overshooting deletes, deletes before any append, purges mid-stream, and
appends restarting at seq 1 — the cases where the clamp semantics
(HeadInfo.scala:206-275) bite."""

from __future__ import annotations

import random

from kafka_journal_spark.folds import ActionRec, head_info
from kafka_journal_spark.operators.head import head_info_batch

ACTIONS_DDL = (
    "topic string, partition int, offset long, id string, action_type string, "
    "seq_nr_from long, seq_nr_to long, delete_to long"
)


def _random_sequences(n_keys=60, seed=20260813):
    rng = random.Random(seed)
    rows, pure = [], {}
    off = 0
    for k in range(n_keys):
        key = f"k{k}"
        seq = 0
        recs = []
        for _ in range(rng.randint(1, 12)):
            off += 1
            kind = rng.choices(
                ["append", "delete", "purge", "mark"], weights=[6, 3, 1, 1]
            )[0]
            if kind == "append":
                # occasionally restart at 1 (fresh journal after purge or a
                # foreign stream) to hit the drop-watermark branch
                if seq == 0 or rng.random() < 0.15:
                    seq = 0
                first = seq + 1
                seq = first + rng.randint(0, 3)
                recs.append(ActionRec("append", off, first, seq))
                rows.append((
                    "t", 0, off, key, "append", first, seq, None,
                ))
            elif kind == "delete":
                # watermark may overshoot everything appended so far; a
                # NULL watermark (malformed input both folds must no-op,
                # not crash or clamp) appears ~1 in 8 deletes
                to = None if rng.random() < 0.125 else rng.randint(1, 30)
                recs.append(ActionRec("delete", off, delete_to=to))
                rows.append(("t", 0, off, key, "delete", None, None, to))
            elif kind == "purge":
                recs.append(ActionRec("purge", off))
                rows.append(("t", 0, off, key, "purge", None, None, None))
            else:
                recs.append(ActionRec("mark", off))
                rows.append(("t", 0, off, key, "mark", None, None, None))
        pure[key] = head_info(recs)
    return rows, pure


def test_batch_fold_equals_pure_fold_randomized(spark):
    rows, pure = _random_sequences()
    df = spark.createDataFrame(rows, ACTIONS_DDL)
    got = {
        r.id: (r.kind, r.offset, r.seq_nr, r.delete_to)
        for r in head_info_batch(df).collect()
    }
    assert set(got) == set(pure)
    for key, h in pure.items():
        assert got[key] == (h.kind, h.offset, h.seq_nr, h.delete_to), (
            key,
            got[key],
            h,
        )
