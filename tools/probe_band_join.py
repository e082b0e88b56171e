"""Probe: LSH band self-join strategy — broadcast (current, computes the
signature relation TWICE) vs shuffled-hash/sort-merge (identical subplans on
both sides -> ReusedExchange computes signatures ONCE).

Usage: python tools/probe_band_join.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_journal_spark.functions.dedup import (
    MINHASH_K,
    _band_relation,
    minhash_signatures,
)
from kafka_journal_spark.functions.numeric import round6
from kafka_journal_spark.session import get_spark
from tools.ab_probe import ab_probe


def band_pairs(spark, sf_dir, hint: str | None):
    sigs = minhash_signatures(spark, sf_dir)
    bands = _band_relation(sigs)
    a = bands.alias("a")
    b = bands.alias("b")
    if hint:
        a = a.hint(hint)
        b = b.hint(hint)
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(MINHASH_K))
    )
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        round6(est).alias("est_jaccard"),
    )
    return joined.dropDuplicates(["doc_a", "doc_b"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("probe-band-join", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    old = band_pairs(spark, sf_dir, None)
    shj = band_pairs(spark, sf_dir, "shuffle_hash")
    smj = band_pairs(spark, sf_dir, "merge")

    # value parity first (strategy changes must not change the pair set).
    # exceptAll over these plans trips a Spark 4.1 INTERNAL_ERROR in
    # BindReferences, so compare an order-independent (count, checksum).
    def _sig(df):
        r = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("doc_a", "doc_b", F.format_number("est_jaccard", 6)).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
        ).collect()[0]
        return (r["n"], int(r["h"] or 0))

    s_old, s_shj, s_smj = _sig(old), _sig(shj), _sig(smj)
    assert s_old == s_shj, f"SHJ mismatch {s_old} vs {s_shj}"
    assert s_old == s_smj, f"SMJ mismatch {s_old} vs {s_smj}"
    print(f"EQUALITY OK (old == shj == smj), sig={s_old}")

    for name, df in (("old", old), ("shj", shj), ("smj", smj)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_scan = plan.count("Scan parquet")
        n_reuse = plan.count("ReusedExchange")
        print(f"{name}: scans={n_scan} reused_exchanges={n_reuse}")

    ab_probe(
        spark,
        {
            "old_bcast": lambda: band_pairs(spark, sf_dir, None),
            "new_shj": lambda: band_pairs(spark, sf_dir, "shuffle_hash"),
            "new_smj": lambda: band_pairs(spark, sf_dir, "merge"),
        },
        rounds=rounds,
    )
    spark.stop()


if __name__ == "__main__":
    main()
