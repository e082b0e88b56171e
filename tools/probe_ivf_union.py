"""Round-11 probe: the two-level IVF union scheme on the REALISTIC
duplication corpora (tools/gen_scale.py dup_mode=realistic; exact
template-derived ground truth), with the ASSIGNMENT stage's wall split out
— the r10 verdict's done-criteria for de-quadratifying the union path:
recall >= 0.95 at BOTH decade points, and the assignment stage measured
~linear across the 4x row step (500k -> 2M vectors).

Usage: python tools/probe_ivf_union.py [sf_dir factor] [sf_dir factor ...]
Defaults to the two realistic corpora.  Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAU = float(os.environ.get("KJ_PAIR_TAU", "0.7"))


def probe(spark, sf_dir: str, factor: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_scale import _dup_template

    from kafka_journal_spark.functions import similarity as sim

    emb = sim._emb(spark, sf_dir)
    out: dict = {"sf_dir": sf_dir, "factor": factor, "tau": TAU}

    # -- stage split: the assignment alone (sample + assign + materialize)
    t0 = time.perf_counter()
    asg = sim._ivf_cell_assignments(emb).localCheckpoint(eager=True)
    out["assign_s"] = round(time.perf_counter() - t0, 2)
    out["assign_rows"] = asg.count()
    asg.unpersist()

    # -- full union pair extraction (assignment re-runs inside: the probe
    # grades the OPERATOR wall, not a warm cache)
    t0 = time.perf_counter()
    pairs = sim._neardup_pairs_from(emb, TAU, "union").localCheckpoint(
        eager=True
    )
    n_found = pairs.count()
    out["union_pairs_s"] = round(time.perf_counter() - t0, 2)
    out["pairs_found"] = n_found

    # -- exact ground truth from the generation template: vec_id =
    # src_vid + i * vk; replica slots i group by template gid, clusters
    # never span sources, members sit at cosine 0.93-0.98 >> tau
    from pyspark.sql import functions as F

    tpl = _dup_template(factor)
    vk = emb.agg(F.max("vec_id")).first()[0] // factor + 1
    gid_rows = [(i, gid) for (i, gid, rnk, gsize) in tpl if gsize > 1]
    n_src = emb.count() // factor
    from collections import Counter

    sizes = Counter(g for (_, g, _, s) in tpl if s > 1)
    expected = n_src * sum(s * (s - 1) // 2 for s in sizes.values())
    g = spark.createDataFrame(gid_rows, "rep long, gid long")
    p = (
        pairs.withColumn("src_i", F.col("i") % vk)
        .withColumn("src_j", F.col("j") % vk)
        .withColumn("rep_i", (F.col("i") / vk).cast("long"))
        .withColumn("rep_j", (F.col("j") / vk).cast("long"))
    )
    true_found = (
        p.filter(F.col("src_i") == F.col("src_j"))
        .join(F.broadcast(g.withColumnRenamed("rep", "rep_i")), "rep_i")
        .join(
            F.broadcast(
                g.withColumnRenamed("rep", "rep_j").withColumnRenamed(
                    "gid", "gid_j"
                )
            ),
            "rep_j",
        )
        .filter(F.col("gid") == F.col("gid_j"))
        .count()
    )
    pairs.unpersist()
    out["vk"] = vk
    out["expected_pairs"] = expected
    out["true_found"] = true_found
    out["recall"] = round(true_found / expected, 4) if expected else None
    return out


def main():
    args = sys.argv[1:]
    points = (
        [(args[i], int(args[i + 1])) for i in range(0, len(args), 2)]
        if args
        else [
            # both corpora share the factor-1000 template (BASELINE r10):
            # sf10r_p = 500-vector source x 1000, sf100r_p = 2000 x 1000
            ("/root/repo/.scale/sf10r_p", 1000),
            ("/root/repo/.scale/sf100r_p", 1000),
        ]
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from kafka_journal_spark.session import get_spark

    spark = get_spark("probe-ivf-union", cpus=cpus)
    out = {"metric": "ivf_union_two_level_probe_r11", "points": []}
    for sf_dir, factor in points:
        r = probe(spark, sf_dir, factor)
        print(f"# {sf_dir}: {json.dumps(r)}", file=sys.stderr)
        out["points"].append(r)
    if len(out["points"]) == 2:
        a, b = out["points"]
        rows = b["assign_rows"] / max(a["assign_rows"], 1)
        out["assign_wall_ratio"] = round(b["assign_s"] / a["assign_s"], 2)
        out["assign_rows_ratio"] = round(rows, 2)
        out["union_wall_ratio"] = round(
            b["union_pairs_s"] / a["union_pairs_s"], 2
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
