"""Probe: _cc_star large/small-star checkpoint fusion A/B (verdict r11
item 3 / r12 idle task 9).

The shipping star engine eagerly localCheckpoints BOTH half-steps of a
round: the large-star relation ``ls`` and the small-star output ``ss`` —
2 driver-sequenced checkpoint jobs per round.  The fused variant skips the
``ls`` checkpoint so a round is ONE checkpoint job whose plan contains the
whole large+small composition; ``ls`` feeds two consumers (its per-``a``
min aggregate and the join back), so the fused plan computes the
large-star subtree twice per round unless exchange reuse catches it.
Fusion is right exactly when per-job overhead dominates that recompute —
the question needs a measurement at scale, not an assumption.

Graphs measured:
- the engine's own near-dup LSH edge relation (pass an sf dir; sf10 for
  the scale point) — shallow components, 2-4 rounds;
- a synthetic 1M-node chain (``--chain N``) — the adversarial deep graph
  star exists for, ~2*log2(N) half-steps, where per-round overhead has
  maximal weight.

Label equality (fused vs shipping vs the label engine where feasible) is
asserted exceptAll-both-ways BEFORE timing.

Usage: python tools/probe_star_fused.py [sf_dir|--chain N] [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_journal_spark.functions.dedup import (
    _cc_star,
    _checkpoint_with_checksum,
)
from kafka_journal_spark.session import get_spark
from tools.ab_probe import ab_probe


def _cc_star_fused(edges: DataFrame, max_iter: int):
    """Twin of dedup._cc_star with the large-star eager checkpoint removed
    (one checkpoint job per round instead of two); everything else —
    canonicalization, checksum probe, exact confirm, label extraction —
    is line-for-line the shipping code."""
    edges_c, prev = _checkpoint_with_checksum(
        edges.filter(F.col("s") != F.col("d"))
        .select(F.greatest("s", "d").alias("a"), F.least("s", "d").alias("b"))
        .distinct()
    )
    rounds, converged = 0, False
    for _ in range(max_iter):
        rounds += 1
        sym = edges_c.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
            edges_c.select(F.col("b").alias("s"), F.col("a").alias("d"))
        )
        mins = sym.groupBy("s").agg(F.min("d").alias("_mn"))
        m = F.least(F.col("s"), F.col("_mn"))
        ls = (
            sym.join(mins, "s")
            .filter(F.col("d") > F.col("s"))
            .select(F.col("d").alias("a"), m.alias("b"))
            .distinct()  # NOT checkpointed: the one-line difference
        )
        smins = ls.groupBy("a").agg(F.min("b").alias("_m"))
        ss, cur = _checkpoint_with_checksum(
            ls.join(smins, "a")
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .unionByName(smins.select("a", F.col("_m").alias("b")))
            .distinct()
        )
        prev_edges, edges_c = edges_c, ss
        if cur == prev:
            if prev_edges.exceptAll(edges_c).isEmpty():
                converged = True
                break
        prev = cur
    labels = (
        edges_c.select(F.col("a").alias("node"), F.col("b").alias("label"))
        .unionByName(
            edges_c.select(F.col("b").alias("node"), F.col("b").alias("label"))
        )
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    return labels, rounds, converged


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("probe_star_fused", cpus=cpus)

    if arg == "--chain":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
        print(f"graph: chain of {n} nodes")
        edges = (
            spark.range(n - 1)
            .select(F.col("id").alias("s"), (F.col("id") + 1).alias("d"))
            .localCheckpoint(eager=True)
        )
        max_iter = 64
    else:
        from kafka_journal_spark.functions.dedup import (
            CLUSTER_THRESHOLD,
            _band_candidates,
        )

        print(f"graph: LSH near-dup edges over {arg}")
        edges = (
            _band_candidates(spark, arg)
            .filter(F.col("est_jaccard") >= F.lit(CLUSTER_THRESHOLD))
            .select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
            .dropDuplicates(["s", "d"])
            .localCheckpoint(eager=True)
        )
        max_iter = 20
    print(f"edges: {edges.count()}")

    sym = edges.select("s", "d").unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    a, ra, ca = _cc_star(sym, max_iter)
    b, rb, cb = _cc_star_fused(sym, max_iter)
    assert ca and cb and ra == rb, (ra, rb, ca, cb)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), "label mismatch"
    print(f"labels equal; both converged in {ra} rounds; timing...")

    def ship():
        lbl, _, conv = _cc_star(sym, max_iter)
        assert conv
        return lbl

    def fused():
        lbl, _, conv = _cc_star_fused(sym, max_iter)
        assert conv
        return lbl

    ab_probe(spark, {"ship": ship, "fused": fused}, rounds=rounds)
    spark.stop()


if __name__ == "__main__":
    main()
