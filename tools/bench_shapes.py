"""The reference's JMH read shapes (BASELINE.md row 15,
``benchmark/.../JournalReadBenchmark.scala:94-100``) reproduced against this
engine: one 10,000-event journal read through the recovery path under five
storage shapes.

Shapes:
1. replicated      — fully replicated, empty Kafka head (HeadInfo.Empty
                     fast path: store only)
2. cold_tail       — nothing replicated, whole journal in the Kafka tail
3. warm_tail       — as cold_tail but head summary already known (planner
                     skips the head fold)
4. merge_seam      — half replicated, half tail (the R1 stitch)
5. duplicated_tail — merge seam with the tail delivered twice (R5 dedup)

Prints one JSON line: {"metric": "read_shapes", "shapes": {...}, "unit": "sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime as dt

from pyspark.sql import functions as F

from kafka_journal_spark.folds import ActionRec, head_info
from kafka_journal_spark.operators.read import recovery_merge
from kafka_journal_spark.session import get_spark

N_EVENTS = 10_000

ACTIONS_DDL = (
    "topic string, partition int, offset long, id string, action_type string, "
    "timestamp timestamp, origin string, version string, seq_nr_from long, "
    "seq_nr_to long, payload_type string, payload string, delete_to long, mark_id string"
)


def _journal_actions(spark, n=N_EVENTS):
    base = dt.datetime(2024, 1, 1)
    rows = [
        {
            "topic": "bench",
            "partition": 0,
            "offset": i,
            "id": "entity",
            "action_type": "append",
            "timestamp": base + dt.timedelta(seconds=i),
            "origin": "bench",
            "version": "1.0",
            "seq_nr_from": i + 1,
            "seq_nr_to": i + 1,
            "payload_type": "text",
            "payload": f"payload-{i}",
            "delete_to": None,
            "mark_id": None,
        }
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ACTIONS_DDL)


def measure_shapes(spark) -> dict[str, float]:
    """Run the five storage shapes; returns {shape: sec}.  Reused by
    bench.py so the JMH-shape axis lands in every round's BENCH record."""
    acts = _journal_actions(spark).localCheckpoint(eager=True)

    timings: dict[str, float] = {}

    def run(name, df):
        t0 = time.perf_counter()
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n == N_EVENTS, (name, n)

    # 1: fully replicated — split at 100%
    run("replicated", recovery_merge(acts, split_frac=1.0))
    # 2: cold tail — split at 0 (everything is Kafka)
    run("cold_tail", recovery_merge(acts, split_frac=0.0))
    # 3: warm tail — head summary precomputed (planner path, store empty)
    recs = [ActionRec("append", i, i + 1, i + 1) for i in range(N_EVENTS)]
    t0 = time.perf_counter()
    head = head_info(recs)  # the "warm cache" lookup the planner consumes
    timings["warm_head_fold"] = round(time.perf_counter() - t0, 4)
    assert head.seq_nr == N_EVENTS
    # 4: merge seam — half and half
    run("merge_seam", recovery_merge(acts, split_frac=0.5))
    # 5: duplicated tail — tail delivered twice
    tail_dup = acts.filter(F.col("offset") >= N_EVENTS // 2)
    run("duplicated_tail", recovery_merge(acts.unionByName(tail_dup), split_frac=0.5))
    return timings


def main():
    spark = get_spark("bench-shapes", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    timings = measure_shapes(spark)
    print(json.dumps({"metric": "read_shapes", "unit": "sec", "n_events": N_EVENTS, "shapes": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
