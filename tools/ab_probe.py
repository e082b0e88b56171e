"""Interleaved same-session A/B probe — the measurement methodology for
hosts with minute-scale noise (OPTIMIZATION_r11.md).

Usage (as a library):
    from tools.ab_probe import ab_probe
    ab_probe(spark, {"old": make_old_df, "new": make_new_df}, rounds=7)

Each variant is a zero-arg callable returning a DataFrame; one round runs
every variant once (construction + noop write, the bench clock) in
round-robin order, so bursty host noise hits all variants alike.  Prints
per-variant medians and the pairwise ratio.
"""

from __future__ import annotations

import statistics
import time


def ab_probe(spark, variants: dict, rounds: int = 7, warmup: int = 1) -> dict:
    names = list(variants)
    times = {n: [] for n in names}
    for n in names:  # warmup: codegen/JIT for both shapes
        for _ in range(warmup):
            variants[n]().write.format("noop").mode("overwrite").save()
    for r in range(rounds):
        for n in names:
            spark.sparkContext.setJobDescription(f"ab:{n}:{r}")
            t0 = time.perf_counter()
            variants[n]().write.format("noop").mode("overwrite").save()
            times[n].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    meds = {n: statistics.median(times[n]) for n in names}
    for n in names:
        runs = " ".join(f"{t:.3f}" for t in times[n])
        print(f"{n:12s} median={meds[n]:.3f}  runs: {runs}")
    if len(names) == 2:
        a, b = names
        print(f"ratio {b}/{a} = {meds[b]/meds[a]:.3f}")
    return meds
