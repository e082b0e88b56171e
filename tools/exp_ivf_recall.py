"""Parameter sweep for the two-level IVF union recall (round-11 tuning).

Usage: python tools/exp_ivf_recall.py <sf_dir> <factor> <spec> [<spec> ...]
where <spec> is e.g. "P=3", "P=5", "flat" (force single-level), "P=4,A=3".
Prints one JSON line per spec.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir, factor = sys.argv[1], int(sys.argv[2])
    specs = sys.argv[3:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from kafka_journal_spark.functions import similarity as sim
    from kafka_journal_spark.session import get_spark
    from probe_ivf_union import probe

    spark = get_spark("exp-ivf-recall", cpus=cpus)
    base = {
        "IVF_COARSE_PROBE": sim.IVF_COARSE_PROBE,
        "IVF_ASSIGN": sim.IVF_ASSIGN,
        "IVF_TWO_LEVEL_MIN_K": sim.IVF_TWO_LEVEL_MIN_K,
    }
    for spec in specs:
        for k, v in base.items():
            setattr(sim, k, v)
        label = spec
        if spec != "flat":
            for part in spec.split(","):
                key, val = part.split("=")
                attr = {"P": "IVF_COARSE_PROBE", "A": "IVF_ASSIGN"}[key]
                setattr(sim, attr, int(val))
        else:
            sim.IVF_TWO_LEVEL_MIN_K = 1 << 60
        r = probe(spark, sf_dir, factor)
        r["spec"] = label
        print(json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
