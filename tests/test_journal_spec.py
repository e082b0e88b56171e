"""Exhaustive model-based spec, porting the reference JournalSpec strategy
(journal/src/test/.../JournalSpec.scala + Combinations.scala): for every way
to split seq_nrs [1..n] into consecutive append batches, optionally followed
by a delete(k) or purge, the Spark materialization must agree with the pure
JournalModel on read() and pointer().

All scenarios are packed into ONE DataFrame (one key per scenario) so the
whole spec costs a single Spark job per assertion set.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_journal_spark.folds import (
    JournalModel,
    append_rec,
    combinations,
    delete_rec,
    purge_rec,
)
from kafka_journal_spark.operators.read import pointer as pointer_q
from kafka_journal_spark.operators.replicate import (
    materialize_journal,
    materialize_metajournal,
)

TS = dt.datetime(2024, 1, 1)

ACTIONS_DDL = (
    "topic string, partition int, offset long, id string, action_type string, "
    "timestamp timestamp, origin string, version string, seq_nr_from long, "
    "seq_nr_to long, payload_type string, payload string, payloads array<string>, "
    "delete_to long, mark_id string"
)


def _scenarios():
    """(key, [ActionRec]) for every combination x suffix."""
    out = []
    for n in range(0, 5):
        for ci, combo in enumerate(combinations(n)):
            base = []
            for off, batch in enumerate(combo):
                base.append(append_rec(off, batch[0], batch[-1]))
            suffixes = [("plain", None)]
            if n > 0:
                suffixes += [(f"del{k}", delete_rec(len(base), k)) for k in range(1, n + 1)]
            suffixes += [("purge", purge_rec(len(base)))]
            for sname, suffix in suffixes:
                acts = list(base) + ([suffix] if suffix else [])
                out.append((f"n{n}c{ci}{sname}", acts))
    return out


def _to_rows(key, acts):
    rows = []
    for a in acts:
        rows.append(
            {
                "topic": "journal",
                "partition": 0,
                "offset": a.offset,
                "id": key,
                "action_type": a.kind,
                "timestamp": TS + dt.timedelta(seconds=a.offset),
                "origin": "o",
                "version": "1.0",
                "seq_nr_from": a.seq_nr_from,
                "seq_nr_to": a.seq_nr_to,
                "payload_type": "text" if a.kind == "append" else None,
                "payload": None,
                "payloads": list(a.payloads) if a.kind == "append" else None,
                "delete_to": a.delete_to,
                "mark_id": None,
            }
        )
    return rows


def test_all_combinations_match_model(spark):
    scenarios = _scenarios()
    assert len(scenarios) == 81  # 1+3+8+20+48 + purge-only for n=0 ... exhaustive n<=4
    rows = [r for key, acts in scenarios for r in _to_rows(key, acts)]
    df = spark.createDataFrame(rows, schema=ACTIONS_DDL)

    journal = materialize_journal(df)
    got_reads: dict[str, list] = {key: [] for key, _ in scenarios}
    for r in journal.select("id", "seq_nr", "payload_txt").collect():
        got_reads[r.id].append((r.seq_nr, r.payload_txt))
    meta = materialize_metajournal(df)
    got_pointers = {r.id: r.seq_nr for r in pointer_q(meta).collect()}

    for key, acts in scenarios:
        model = JournalModel().apply_all(acts)
        assert sorted(got_reads[key]) == model.read(), f"read mismatch for {key}"
        assert got_pointers.get(key) == model.pointer(), f"pointer mismatch for {key}"


def test_batch_append_straddling_delete(spark):
    # one append batch [1..4], delete to 2: only 3,4 survive, from one record
    acts = [append_rec(0, 1, 4), delete_rec(1, 2)]
    df = spark.createDataFrame(_to_rows("k", acts), schema=ACTIONS_DDL)
    rows = sorted(
        (r.seq_nr, r.payload_txt)
        for r in materialize_journal(df).select("seq_nr", "payload_txt").collect()
    )
    assert rows == [(3, "p3"), (4, "p4")]
