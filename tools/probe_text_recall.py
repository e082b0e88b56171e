"""Round-11 probe: GROUND-TRUTH pair recall for the TEXT dedup family
(ngram-Jaccard, MinHash-LSH) on the realistic-duplication corpora — the
text twin of the embedding recall probe (r10 centerpiece; r11 adaptive-A).

The r10 text probes measured pair-count EXPONENTS only; this one grades
recall against an EXACT analytic truth the corpus construction affords:
a duplicate group's members are the same gid-suffixed base text plus a
single per-rank trailing token (' zedit<rnk>', gen_scale.py realistic
documents branch), so for a group whose rank-0 member has S distinct
3-token shingles,

- a (rank-0, rank-k) pair has Jaccard exactly S / (S + 1)  (one extra
  trailing shingle on the ranked side, always novel — it contains the
  rank token), and
- a (rank-a, rank-b) pair (both > 0) has exactly S / (S + 2).

True-at-threshold pairs are therefore countable without any all-pairs
scan: one Spark pass computes S per (source doc, group) from the rank-0
members, and a driver-side fold over the shared template yields the
qualified-pair count per threshold.  Cross-source text overlap can
create REAL near-dup pairs outside the template (common phrases +
shared suffix); recall is measured over template pairs only, so those
extras inflate `pairs_found` but never the recall denominator.

Usage: python tools/probe_text_recall.py [sf_dir factor ...]
Defaults to the two realistic corpora.  Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the dedup family's graded threshold (dedup.JACCARD_THRESHOLD)
TAU = 0.5


def probe(spark, sf_dir: str, factor: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_scale import _dup_template

    from pyspark.sql import functions as F
    from kafka_journal_spark.functions import dedup as dd
    from kafka_journal_spark.functions.text import shingles_col, tokens_col

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    dc = docs.agg(F.max("doc_id")).first()[0] // factor + 1
    out: dict = {"sf_dir": sf_dir, "factor": factor, "tau": TAU,
                 "n_docs": n_docs, "dc": dc}

    tpl = _dup_template(factor)
    groups = [(i, gid, rnk, gsize) for (i, gid, rnk, gsize) in tpl if gsize > 1]
    rank0_rep = {gid: i for (i, gid, rnk, _s) in groups if rnk == 0}
    gsize_of = {gid: s for (_i, gid, _r, s) in groups}
    rep_gid = {i: gid for (i, gid, _r, _s) in groups}

    # ---- S per (src, gid): distinct shingle count of the rank-0 member
    rank0_reps = sorted(rank0_rep.values())
    s_rows = (
        docs.withColumn("rep", (F.col("doc_id") / dc).cast("long"))
        .filter(F.col("rep").isin(rank0_reps))
        .select(
            (F.col("doc_id") % dc).alias("src"),
            "rep",
            tokens_col().alias("_tk"),
        )
        .select(
            "src",
            "rep",
            # shingles_col already returns the DISTINCT shingle set
            F.size(shingles_col(F.col("_tk"), 3)).alias("S"),
        )
        .collect()
    )
    rep_of_gid = {v: k for k, v in rank0_rep.items()}  # rep -> gid
    s_of = {(r.src, rep_of_gid[r.rep]): r.S for r in s_rows}

    # ---- expected template pairs, total and qualified at TAU
    def truth(theta: float) -> tuple[int, int]:
        total = qual = 0
        for (src, gid), S in s_of.items():
            s = gsize_of[gid]
            p0, p1 = s - 1, (s - 1) * (s - 2) // 2
            total += p0 + p1
            if S and S / (S + 1.0) >= theta:
                qual += p0
            if S and S / (S + 2.0) >= theta:
                qual += p1
        return total, qual

    out["expected_template_pairs"], out["expected_q_tau"] = truth(TAU)

    # ---- template membership of a found pair
    g = spark.createDataFrame(
        [(i, gid) for i, gid in rep_gid.items()], "rep long, gid long"
    )

    def template_hits(pairs, a: str, b: str) -> int:
        p = (
            pairs.withColumn("src_a", F.col(a) % dc)
            .withColumn("src_b", F.col(b) % dc)
            .withColumn("rep_a", (F.col(a) / dc).cast("long"))
            .withColumn("rep_b", (F.col(b) / dc).cast("long"))
            .filter(F.col("src_a") == F.col("src_b"))
        )
        return (
            p.join(F.broadcast(g.withColumnRenamed("rep", "rep_a")), "rep_a")
            .join(
                F.broadcast(
                    g.withColumnRenamed("rep", "rep_b").withColumnRenamed(
                        "gid", "gid_b"
                    )
                ),
                "rep_b",
            )
            .filter(F.col("gid") == F.col("gid_b"))
            .count()
        )

    # ---- ngram-Jaccard (exact J >= TAU by contract): candidate recall
    # over the qualified truth must be 1.0 unless the shared-shingle join
    # or the over-cap anti-join loses a pair
    t0 = time.perf_counter()
    np_pairs = dd.ngram_jaccard_pairs(spark, sf_dir).localCheckpoint(eager=True)
    n_found = np_pairs.count()
    out["ngram"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "pairs_found": n_found,
        "template_found": template_hits(np_pairs, "doc_a", "doc_b"),
    }
    out["ngram"]["recall_q_tau"] = (
        round(out["ngram"]["template_found"] / out["expected_q_tau"], 4)
        if out["expected_q_tau"]
        else None
    )
    np_pairs.unpersist()

    # ---- MinHash-LSH banded candidates: recall over the qualified truth,
    # with the banding-theory expectation for comparison (K=16, 4x4:
    # P(candidate | J) = 1 - (1 - J^4)^4)
    t0 = time.perf_counter()
    mh_pairs = dd.minhash_lsh_pairs(spark, sf_dir).localCheckpoint(eager=True)
    m_found = mh_pairs.count()
    out["minhash"] = {
        "wall_s": round(time.perf_counter() - t0, 2),
        "pairs_found": m_found,
        "template_found": template_hits(mh_pairs, "doc_a", "doc_b"),
    }
    exp_hits = 0.0
    for (src, gid), S in s_of.items():
        s = gsize_of[gid]
        for j, cnt in (
            (S / (S + 1.0) if S else 0.0, s - 1),
            (S / (S + 2.0) if S else 0.0, (s - 1) * (s - 2) // 2),
        ):
            if j >= TAU:
                exp_hits += cnt * (1.0 - (1.0 - j**4) ** 4)
    out["minhash"]["recall_q_tau"] = (
        round(out["minhash"]["template_found"] / out["expected_q_tau"], 4)
        if out["expected_q_tau"]
        else None
    )
    out["minhash"]["theory_recall_q_tau"] = (
        round(exp_hits / out["expected_q_tau"], 4)
        if out["expected_q_tau"]
        else None
    )
    mh_pairs.unpersist()
    return out


def main():
    args = sys.argv[1:]
    points = (
        [(args[i], int(args[i + 1])) for i in range(0, len(args), 2)]
        if args
        else [
            ("/root/repo/.scale/sf10r_p", 1000),
            ("/root/repo/.scale/sf100r_p", 1000),
        ]
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from kafka_journal_spark.session import get_spark

    spark = get_spark("probe-text-recall", cpus=cpus)
    out = {"metric": "text_dedup_recall_probe_r11", "points": []}
    for sf_dir, factor in points:
        r = probe(spark, sf_dir, factor)
        print(f"# {sf_dir}: {json.dumps(r)}", file=sys.stderr)
        out["points"].append(r)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
