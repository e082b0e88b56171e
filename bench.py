"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "queries_first": {...}, "sf": ...}.

Each query is forced with a noop write (full computation, no driver
collect).  ``queries`` holds the MEDIAN of 3 forced runs — steady-state
throughput, the quantity that scales to a long-running cluster — matching
the JMH methodology behind BASELINE.md (JMH measures after warmup
iterations by design).  ``queries_first`` keeps the first-run numbers so
one-time plan-JIT cost stays visible instead of being attributed to
whichever query happens to run first (the r3→r4 "regressions" in
d_dedup_exact / q_topk_per_group were exactly that attribution noise —
see BASELINE.md §same-session ratios).  ``value`` sums the medians.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "j_actions",
    "j_journal",
    "j_meta",
    "j_read",
    "j_recovery_merge",
    "j_wire_roundtrip",
    "j_wire_roundtrip_bin",
    "s_recovery_hybrid",
    "x_meta_expiry",
    "q1",
    "q3",
    "q5",
    "q6",
    "q_window_running",
    "q_topk_per_group",
    "q_asof_join",
    "d_dedup_exact",
    "d_minhash_lsh",
    "d_dedup_clusters",
    "d_simhash_sigs",
    "d_pack_chunks",
    "e_cosine_topk",
    "e_cosine_pandas",
    "e_quantize_int8",
    "m_wav_decode",
    # round-5 additions (kept additive: r4-vs-r5 comparisons use the
    # shared prefix)
    "q9",
    "q18",
    "d_pii_scrub",
    "d_repetition",
    "d_decontaminate",
    "m_bmp_decode",
    "d_pipeline_e2e",
    # round-6 additions (additive: r5-vs-r6 comparisons use the shared prefix)
    "m_png_decode",
    "d_span_dedup",
    # round-7 addition: the ANN quality metric (exact + multiprobe + the
    # recall division in one query)
    "e_ann_recall",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from kafka_journal_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    # gates + extras: the registry split is a driver-window concern, not a
    # bench concern — j_actions/j_read/q3 live in the extras
    qs = {**E.queries(), **E.extra_queries()}

    # JVM/codegen warmup: exercise the operator classes the headline queries
    # share (parquet scan, window, hash-agg, sort-merge join, to_json /
    # from_json) on tiny data so the one-time JIT cost lands here rather
    # than being attributed to whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    w = spark.range(256).selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS s")
    (
        w.selectExpr("k", "s", "sum(id) OVER (PARTITION BY k ORDER BY id) AS r")
        .filter("r >= 0")
        .groupBy("k")
        .agg({"r": "max"})
        .collect()
    )
    w.join(w.selectExpr("k AS k2", "id AS id2"), w.k == F.col("k2")).count()
    (
        w.groupBy("k")
        .agg(F.max_by("s", "id"), F.min_by("s", "id"), F.max("id"))
        .select(
            F.aggregate(
                F.split(F.col("max_by(s, id)"), ""),
                F.lit(0).cast("long"),
                lambda a, c: a + F.ascii(c),
            )
        )
        .collect()
    )
    (
        w.select(F.to_json(F.struct("k", "s")).alias("j"))
        .select(F.from_json("j", "k long, s string"))
        .collect()
    )
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(64).collect()
    # spin up the Arrow/pandas Python worker pool (one worker per core):
    # the first UDF-bearing query otherwise pays ~seconds of fleet startup
    import pandas as _pd

    def _noop(it):
        for b in it:
            yield b

    (
        spark.range(cpus * 4, numPartitions=cpus)
        .withColumnRenamed("id", "x")
        .mapInPandas(_noop, schema="x long")
        .count()
    )

    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        runs = []
        # build INSIDE the timed region: eager work at DataFrame
        # construction (localCheckpoint in the span/cluster families)
        # is part of the query and must not run off the clock
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        first_run[name] = round(runs[0], 4)
        timings[name] = round(sorted(runs)[1], 4)

    # the reference's JMH read shapes (BASELINE.md row 15) ride along so the
    # shape axis is tracked every round
    from tools.bench_shapes import measure_shapes

    shapes = measure_shapes(spark)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_first": first_run,
                "shapes": shapes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
