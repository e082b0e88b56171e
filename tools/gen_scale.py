"""Scale-point generator: build sfN data as a keyed K-fold replication of
an existing driver-generated sf dir (default sf0.1 x 10 -> "sf1").

Usage: python tools/gen_scale.py [src_dir] [dst_dir] [factor] [tables]
       tables: optional comma-separated subset (partial decades, e.g.
       "events,documents,embeddings" for the sf100 probe)

Why replication instead of a fresh generator: the driver's generator is
not part of this repo, and the bench needs 10x VOLUME with the SAME
distribution shapes — replica i offsets every key family (orderkey,
custkey, partkey, suppkey, event_id, user_id, doc_id, vec_id) by
i * (max+1), so per-key histories, join selectivities, group
cardinalities-per-key, and skew shapes are preserved exactly while join
fan-in and table sizes grow linearly.  Fixed dimensions (region, nation)
stay fixed, like TPC-H's own scaling rules.

Document texts get a per-replica token suffix (replica 0 untouched), so
the near-dup structure WITHIN a replica matches the source corpus but
replicas don't alias each other — a verbatim 10x copy would hand MinHash/
SimHash a degenerate corpus where every doc has 9 identical twins and
candidate pairs explode 10x beyond what a real corpus of that size
produces.

DuckDB does the heavy lifting (single-node, streams to parquet); Spark
reads the result through the same loaders as the driver-generated dirs
(`load_events` tolerates both nanosecond and microsecond timestamps).
"""

from __future__ import annotations

import os
import sys

import duckdb


def _mx(con, path, col) -> int:
    return int(con.execute(f"SELECT max({col}) FROM '{path}'").fetchone()[0])


def _dup_template(
    factor: int,
    dup_rate: float = 0.08,
    alpha: float = 2.5,
    max_size: int = 100,
    seed: int = 7,
) -> list[tuple[int, int, int, int]]:
    """Partition the ``factor`` replica slots into groups — mostly
    singletons plus POWER-LAW duplicate clusters (P(s) ∝ s^-alpha on
    [2, max_size]) sized so ~``dup_rate`` of all slots sit in a cluster.
    Returns (i, gid, rnk, gsize) per slot.  One template shared by every
    source row: the cluster-size histogram is exact and clusters never
    span sources, so which replica indices group together is immaterial.

    This is the REALISTIC duplication shape (r9 verdict task 2): web-crawl
    dedup studies put near-dup rates around 5–15% with heavy-tailed
    cluster sizes, versus the default cliquey mode where every source row
    fans into one K-wide near-identical family and true-pair volume grows
    quadratically in the decade factor BY CONSTRUCTION."""
    import random

    rng = random.Random(seed)
    sizes = list(range(2, max_size + 1))
    weights = [s**-alpha for s in sizes]
    tot = sum(weights)
    probs = [w / tot for w in weights]
    # EXACT dup budget (a probabilistic draw starves small factors): draw
    # power-law cluster sizes until ~dup_rate of the slots are consumed,
    # the rest are singletons
    budget = round(dup_rate * factor)
    budget = max(2, budget) if factor >= 25 else (2 if factor >= 10 else 0)
    cluster_sizes = []
    while budget >= 2:
        s = min(rng.choices(sizes, probs)[0], budget, factor)
        cluster_sizes.append(s)
        budget -= s
    groups = cluster_sizes + [1] * (factor - sum(cluster_sizes))
    rng.shuffle(groups)
    rows, i = [], 0
    for gid, s in enumerate(groups):
        for r in range(s):
            rows.append((i, gid, r, s))
            i += 1
    return rows


def generate(
    src: str,
    dst: str,
    factor: int = 10,
    tables: set[str] | None = None,
    dup_mode: str = "cliquey",
) -> None:
    """``tables=None`` builds every table; a subset builds only those —
    the partial-decade form (an sf100 events+documents+embeddings probe
    costs ~2 GB while full sf100 lineitem alone is ~14 GB).

    ``dup_mode`` shapes the near-duplicate structure of documents and
    embeddings (all other tables are identical across modes):

    - ``"cliquey"`` (default, the historical corpora): every source row
      fans into replica variants whose mutual similarity decays with
      replica distance — an adversarial corpus where TRUE near-dup pair
      volume grows superlinearly in the factor by construction (measured
      r9: 1.43B true pairs at 2M vectors, tau 0.35).  Upper-bounds the
      pair family's scaling.
    - ``"realistic"``: ~8% of rows belong to power-law duplicate clusters
      (sizes 2..100, alpha 2.5 — the web-crawl duplication shape); all
      other rows are mutually DISSIMILAR (synthetic isotropic vectors /
      per-row token suffixes).  True pair volume is then
      O(sum cluster_size^2) = O(rows): the linear-pair corpus that grades
      whether the pair family's wall time tracks corpus size when the
      data is not adversarial.  NOTE for probes: isotropic 64-dim vectors
      put random-pair cosine at sigma = 1/8, so grade this corpus at
      tau >= 0.7 (noise tail (1-tau^2)^31 ~ 9e-10 per pair) — cluster
      members sit at ~0.96, far above it; tau 0.35 would count random
      coincidences as true pairs.
    """
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    if dup_mode not in ("cliquey", "realistic"):
        raise ValueError(f"unknown dup_mode {dup_mode!r}")
    if dup_mode == "realistic":
        con.execute("CREATE TEMP TABLE tpl(i BIGINT, gid BIGINT, rnk INT, gsize INT)")
        con.executemany(
            "INSERT INTO tpl VALUES (?, ?, ?, ?)", _dup_template(factor)
        )

    def want(t: str) -> bool:
        return tables is None or t in tables

    def src_p(t):
        return os.path.join(src, f"{t}.parquet")

    #: per-table row-group sizing: small row groups keep single-file tables
    #: SPLITTABLE (Spark's byte-range splits land on row-group boundaries —
    #: a monolithic row group serializes map-only operators onto one core no
    #: matter what minPartitionNum asks for).  CPU-dense-per-row text tables
    #: get fine groups so all cores engage; big scan-bound tables keep
    #: larger groups for scan throughput.
    RG = {"documents": 1024, "embeddings": 1024, "events": 32768}

    def copy(table: str, select_sql: str) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        rg = RG.get(table, 131072)
        con.execute(
            f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed dims: unchanged
    for t in ("region", "nation"):
        if want(t):
            copy(t, f"SELECT * FROM '{src_p(t)}'")

    need_tpch = any(
        want(t) for t in ("customer", "supplier", "part", "orders", "lineitem")
    )
    if need_tpch:
        ck = _mx(con, src_p("customer"), "c_custkey") + 1
        sk = _mx(con, src_p("supplier"), "s_suppkey") + 1
        pk = _mx(con, src_p("part"), "p_partkey") + 1
        ok = _mx(con, src_p("orders"), "o_orderkey") + 1
    rep = f"(SELECT unnest(range({factor})) AS i)"

    if want("customer"): copy(
        "customer",
        f"""SELECT c_custkey + i * {ck} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{src_p("customer")}', {rep}""",
    )
    if want("supplier"): copy(
        "supplier",
        f"""SELECT s_suppkey + i * {sk} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM '{src_p("supplier")}', {rep}""",
    )
    if want("part"): copy(
        "part",
        f"""SELECT p_partkey + i * {pk} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM '{src_p("part")}', {rep}""",
    )
    if want("orders"): copy(
        "orders",
        f"""SELECT o_orderkey + i * {ok} AS o_orderkey,
                   o_custkey + i * {ck} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{src_p("orders")}', {rep}""",
    )
    if want("lineitem"): copy(
        "lineitem",
        f"""SELECT l_orderkey + i * {ok} AS l_orderkey,
                   l_partkey + i * {pk} AS l_partkey,
                   l_suppkey + i * {sk} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{src_p("lineitem")}', {rep}""",
    )

    if want("events"):
        ev = _mx(con, src_p("events"), "event_id") + 1
        us = _mx(con, src_p("events"), "user_id") + 1
    if want("events"): copy(
        "events",
        f"""SELECT event_id + i * {ev} AS event_id, ts,
                   user_id + i * {us} AS user_id, event_type, value, props
            FROM '{src_p("events")}', {rep}""",
    )

    if want("documents"):
        dc = _mx(con, src_p("documents"), "doc_id") + 1
    if want("documents") and dup_mode == "realistic":
        # cluster members share a per-(source, group) token suffix (so the
        # group is a mutual near-dup family) with a tiny tail edit per
        # rank; singletons get the per-replica suffix that de-aliases them
        # from everything (disjoint shingle sets)
        copy(
            "documents",
            f"""SELECT doc_id + i * {dc} AS doc_id,
                       CASE
                         WHEN gsize = 1 AND i = 0 THEN text
                         WHEN gsize = 1 THEN regexp_replace(text, '(\\S+)',
                             '\\1q' || CAST(i AS VARCHAR), 'g')
                         ELSE regexp_replace(text, '(\\S+)',
                             '\\1g' || CAST(gid AS VARCHAR), 'g')
                              || CASE WHEN rnk > 0
                                 THEN ' zedit' || CAST(rnk AS VARCHAR)
                                 ELSE '' END
                       END AS text,
                       lang, source, n_chars
                FROM '{src_p("documents")}', tpl""",
        )
    elif want("documents"): copy(
        "documents",
        f"""SELECT doc_id + i * {dc} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)',
                                            '\\1q' || CAST(i AS VARCHAR), 'g')
                   END AS text,
                   lang, source, n_chars
            FROM '{src_p("documents")}', {rep}""",
    )

    if want("embeddings"):
        vk = _mx(con, src_p("embeddings"), "vec_id") + 1
    if want("embeddings") and dup_mode == "realistic":
        # fully synthetic unit vectors, hash-deterministic: each GROUP gets
        # an isotropic base direction (cross-group cosine ~ N(0, 1/64) —
        # mutually dissimilar at tau >= 0.7), and members perturb it by
        # eps=0.2 relative to the base norm (member-member cosine ~ 0.96).
        # The source table only scaffolds row count / vec_id / label.
        u = (
            "(CAST(hash(src_vid * 1000003 + gid * 8191 + d) % 2000001 "
            "AS DOUBLE) - 1e6) / 1e6"
        )
        du = (
            "(CAST(hash(src_vid * 999983 + gid * 524287 + rnk * 127 + d * 31)"
            " % 2000001 AS DOUBLE) - 1e6) / 1e6"
        )
        copy(
            "embeddings",
            f"""SELECT vec_id,
                       list_transform(raw,
                         x -> CAST(x / sqrt(nrm2) AS FLOAT)) AS embedding,
                       label
                FROM (
                  SELECT vec_id, label, raw,
                         list_aggregate(list_transform(raw, y -> y * y),
                                        'sum') AS nrm2
                  FROM (
                    SELECT src_vid + i * {vk} AS vec_id, label,
                           list_transform(range(1, 65),
                                          d -> {u} + 0.2 * ({du})) AS raw
                    FROM (SELECT vec_id AS src_vid, label
                          FROM '{src_p("embeddings")}'), tpl
                  )
                )""",
        )
    # deterministic per-replica perturbation: verbatim embedding copies
    # would give every vector 9 exact twins (cosine 1.0) and inflate
    # near-dup candidate pairs quadratically — same reasoning as the
    # document token suffixes (replica 0 untouched)
    elif want("embeddings"): copy(
        "embeddings",
        f"""SELECT vec_id + i * {vk} AS vec_id,
                   CASE WHEN i = 0 THEN embedding ELSE
                     list_transform(list_zip(embedding,
                                             range(1, len(embedding) + 1)),
                       z -> CAST(z[1] + 0.008 * i *
                                 (((vec_id + z[2]) % 7) - 3) AS FLOAT))
                   END AS embedding,
                   label
            FROM '{src_p("embeddings")}', {rep}""",
    )
    con.close()


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    dup_mode = sys.argv[5] if len(sys.argv) > 5 else "cliquey"
    generate(src, dst, factor, tables, dup_mode)
