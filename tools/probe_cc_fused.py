"""Probe: label-propagation with TWO rounds per localCheckpoint (half the
driver-sequenced jobs per iteration) vs the shipping one-round form.

The fused form computes r1 = propagate(labels), r2 = propagate(r1) in one
plan; the change counts of both rounds ride the checkpoint job as observe
aggregates.  r1 feeds two consumers (r2's neighbor join and the final
select) — both consume it exchanged by the same key, so AQE stage reuse
should compute it once.

Usage: python tools/probe_cc_fused.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from kafka_journal_spark.session import get_spark
from tools.ab_probe import ab_probe


def _cc_label_fused(edges: DataFrame, max_iter: int):
    labels = edges.groupBy(F.col("s").alias("node")).agg(
        F.least(F.col("s"), F.min("d")).alias("label")
    )
    rounds, converged = 1, False

    def prop(lbl):
        nbr = (
            edges.join(
                lbl.select(F.col("node").alias("s"), F.col("label").alias("_sl")), "s"
            )
            .groupBy(F.col("d").alias("node"))
            .agg(F.min("_sl").alias("_nl"))
        )
        return lbl.join(nbr, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("_nl", F.col("label"))).alias("label"),
            (F.coalesce("_nl", F.col("label")) < F.col("label")).alias("_ch"),
        )

    while rounds < max_iter and not converged:
        if rounds + 2 <= max_iter:
            r1 = prop(labels)
            nbr2 = (
                edges.join(
                    r1.select(F.col("node").alias("s"), F.col("label").alias("_sl")),
                    "s",
                )
                .groupBy(F.col("d").alias("node"))
                .agg(F.min("_sl").alias("_nl"))
            )
            r2 = r1.join(nbr2, "node", "left").select(
                "node",
                F.least(F.col("label"), F.coalesce("_nl", F.col("label"))).alias(
                    "label"
                ),
                (F.coalesce("_nl", F.col("label")) < F.col("label")).alias("_ch2"),
                F.col("_ch").alias("_ch1"),
            )
            obs = Observation()
            new = (
                r2.observe(
                    obs,
                    F.coalesce(F.sum(F.col("_ch1").cast("long")), F.lit(0)).alias("c1"),
                    F.coalesce(F.sum(F.col("_ch2").cast("long")), F.lit(0)).alias("c2"),
                )
                .localCheckpoint(eager=True)
            )
            m = obs.get
            c1, c2 = int(m["c1"]), int(m["c2"])
            rounds += 2
            labels = new.drop("_ch1", "_ch2")
            if c2 == 0:
                converged = True
                if c1 == 0:
                    rounds -= 1  # r2 was a no-op verify; count like the serial form
        else:
            r1 = prop(labels)
            obs = Observation()
            new = r1.observe(
                obs, F.coalesce(F.sum(F.col("_ch").cast("long")), F.lit(0)).alias("n")
            ).localCheckpoint(eager=True)
            rounds += 1
            labels = new.drop("_ch")
            if int(obs.get["n"]) == 0:
                converged = True
    return labels, rounds, converged


def clusters_fused(spark, sf_dir):
    import kafka_journal_spark.functions.dedup as D

    edges = (
        D._band_candidates(spark, sf_dir)
        .filter(F.col("est_jaccard") >= F.lit(D.CLUSTER_THRESHOLD))
        .select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
        .dropDuplicates(["s", "d"])
        .localCheckpoint(eager=True)
    )
    sym = edges.select("s", "d").unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    labels, rounds, converged = _cc_label_fused(sym, 20)
    assert converged
    return (
        D._docs(spark, sf_dir)
        .select("doc_id")
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("label", F.col("doc_id")).alias("cluster_id"))
        .withColumn("keep", F.col("cluster_id") == F.col("doc_id"))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("probe-cc-fused", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    import kafka_journal_spark.functions.dedup as D

    old = D.dedup_clusters(spark, sf_dir)
    new = clusters_fused(spark, sf_dir)
    a = sorted(map(tuple, old.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b, "label mismatch"
    print(f"EQUALITY OK ({len(a)} rows)")

    ab_probe(
        spark,
        {
            "old_1round": lambda: D.dedup_clusters(spark, sf_dir),
            "new_fused2": lambda: clusters_fused(spark, sf_dir),
        },
        rounds=rounds,
    )
    spark.stop()


if __name__ == "__main__":
    main()
