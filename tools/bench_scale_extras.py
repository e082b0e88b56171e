"""One-shot scale probe for NON-headline operators: run each listed query
once (cold) at the given sf dir and print one JSON line.  The headline
bench (`bench.py`) covers the steady-state medians; this tool exists to
catch scaling cliffs in the heavier ops the headline set leaves out
(pairwise candidate generation, streaming state, replication, policy
removal) at the sf1 scale point.

Usage: python tools/bench_scale_extras.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: heavier-representative extras: candidate-pair generation, clustering
#: policies, incremental indexes, streaming state, store replication
DEFAULT_EXTRAS = [
    "d_ngram_jaccard",
    "d_span_clean",
    "d_span_clean_keep1",
    "d_lsh_incremental",
    "d_simhash_multiprobe",
    "d_embedding_neardup",
    "e_embedding_clusters",
    "e_ann_multiprobe",
    "e_ivf_topk",
    "e_ann_incremental",
    "d_bm25_topk",
    "d_token_rarity",
    "j_stream_replicate",
    "x_head_stream",
    "x_dedup_stream",
    "x_window_stream",
    "q_sessionize",
    "q_funnel",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    names = sys.argv[2:] or DEFAULT_EXTRAS
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from kafka_journal_spark.session import get_spark

    spark = get_spark("bench-scale-extras", cpus=cpus)
    qs = {**E.queries(), **E.extra_queries()}
    timings = {}
    # KJ_PAIR_TAU overrides the pair family's similarity threshold — the
    # REALISTIC corpus (gen_scale.py dup_mode=realistic) must be graded at
    # tau >= 0.7: its non-duplicate rows are isotropic 64-dim vectors
    # whose random-pair cosine tail at 0.35 would count coincidences as
    # true pairs (see the generate() docstring for the math)
    tau = os.environ.get("KJ_PAIR_TAU")
    TAU_AWARE = {"d_embedding_neardup", "e_embedding_clusters"}
    for name in names:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        if tau is not None and name in TAU_AWARE:
            df = qs[name](spark, sf_dir, tau=float(tau))
        else:
            df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    out = {
        "metric": "scale_extras_single_pass",
        "unit": "sec",
        "sf_dir": sf_dir,
        "queries": timings,
        "value": round(sum(timings.values()), 4),
    }
    # pair-family scaling telemetry: post-split occupancy must stay
    # bounded however hot the corpus's semantic clusters run
    if any(n in timings for n in ("d_embedding_neardup", "e_embedding_clusters")):
        from kafka_journal_spark.functions.similarity import pair_bucket_stats

        out["pair_bucket_stats"] = pair_bucket_stats(spark, sf_dir)
        # candidates-vs-true-pairs (costs ~one full pair join — opt in).
        # cand_per_true ~1 = the intrinsic floor: wall time tracks TRUE
        # pair volume, not bucketing waste (sf100p measured 1.15)
        if os.environ.get("KJ_PAIR_EFFICIENCY") == "1":
            from kafka_journal_spark.functions.similarity import (
                pair_efficiency_stats,
            )

            out["pair_efficiency"] = (
                pair_efficiency_stats(spark, sf_dir, tau=float(tau))
                if tau is not None
                else pair_efficiency_stats(spark, sf_dir)
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
