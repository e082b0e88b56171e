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


def generate(
    src: str, dst: str, factor: int = 10, tables: set[str] | None = None
) -> None:
    """``tables=None`` builds every table; a subset builds only those —
    the partial-decade form (an sf100 events+documents+embeddings probe
    costs ~2 GB while full sf100 lineitem alone is ~14 GB)."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

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
    if want("documents"): copy(
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
    # deterministic per-replica perturbation: verbatim embedding copies
    # would give every vector 9 exact twins (cosine 1.0) and inflate
    # near-dup candidate pairs quadratically — same reasoning as the
    # document token suffixes (replica 0 untouched)
    if want("embeddings"): copy(
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
    generate(src, dst, factor, tables)
