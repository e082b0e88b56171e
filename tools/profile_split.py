"""Per-query build/exec split profiler (guide §1.1: find WHERE the time goes
before changing anything).

For each named headline query: construct the DataFrame (timed — py4j/driver
construction cost, analysis, any eager jobs at build), then force it with
the noop sink (timed — cluster execution).  Medians of N in one session,
matching the bench methodology.

Usage: python tools/profile_split.py [query ...] [--rounds N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 5
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])

    import __spark_entry__ as E
    from kafka_journal_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile_split", cpus=cpus)
    qs = {**E.queries(), **E.extra_queries()}

    names = args or ["e_ann_recall", "e_cosine_topk"]
    # warmup: one full run of each so JIT/codegen is not attributed
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        builds, execs = [], []
        for r in range(rounds):
            spark.sparkContext.setJobDescription(f"profile:{name}:build:{r}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}:exec:{r}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b = statistics.median(builds)
        x = statistics.median(execs)
        print(
            f"{name:22s} build={b:6.3f}  exec={x:6.3f}  total={b + x:6.3f}"
            f"  (build runs: {' '.join(f'{v:.3f}' for v in builds)};"
            f" exec runs: {' '.join(f'{v:.3f}' for v in execs)})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
