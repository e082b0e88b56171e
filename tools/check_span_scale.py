"""FULL-parity scale check for the two span-clean oracles — the pair the
r7 sf10 run could only grade on a 5% sample because the monolithic DuckDB
text-rebuild oracle (250M token rows at 500k docs) exceeded container
memory.

Strategy (doc-range-sharded oracle over a DISK-BACKED DuckDB database):
the only corpus-GLOBAL facts are the duplicated-gram set and (for the
keep-first policy) each gram's canonical occurrence — both are
materialized ONCE into physical tables whose size is O(grams), which the
r7 sampled run already proved fits.  Everything downstream (position
explode, token rebuild, md5) is keyed by doc_id alone, so it runs per
``doc_id % n_shards`` shard: each shard's oracle rows are compared
against the engine's rows (written to parquet by Spark, filtered to the
same shard) entirely inside DuckDB (symmetric EXCEPT) — no full-corpus
rebuild is ever resident, and nothing is sampled.

Usage: python tools/check_span_scale.py [sf_dir] [n_shards]
       env CHECK_JSON=<path> writes the per-query verdicts
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def _shard_sql_strict(n: int, s: int, spark_parquet: str) -> str:
    from kafka_journal_spark.functions.dedup import SPAN_L

    return f"""
    WITH h AS (SELECT doc_id, pos FROM hits WHERE doc_id % {n} = {s}),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + {SPAN_L}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) THEN 1 ELSE 0 END AS _new
      FROM h
    ),
    num AS (
      SELECT doc_id, pos,
             SUM(_new) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS _island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, MIN(pos) AS span_start,
             MAX(pos) + {SPAN_L} AS span_end
      FROM num GROUP BY doc_id, _island
    ),
    covered AS (
      SELECT DISTINCT doc_id, unnest(range(span_start, span_end)) AS pos
      FROM spans
    ),
    {_rebuild_tail(n, s)}
    {_compare_tail(n, s, spark_parquet)}
    """


def _shard_sql_keep1(n: int, s: int, spark_parquet: str) -> str:
    from kafka_journal_spark.functions.dedup import SPAN_L

    return f"""
    WITH h AS (SELECT doc_id, pos, _canon FROM hits WHERE doc_id % {n} = {s}),
    cover AS (
      SELECT doc_id, _canon, unnest(range(pos, pos + {SPAN_L})) AS cpos
      FROM h
    ),
    covered AS (
      SELECT doc_id, cpos AS pos
      FROM cover GROUP BY doc_id, cpos HAVING NOT bool_or(_canon)
    ),
    {_rebuild_tail(n, s)}
    {_compare_tail(n, s, spark_parquet)}
    """


def _rebuild_tail(n: int, s: int) -> str:
    return f"""
    tok AS (
      SELECT doc_id, u.i - 1 AS pos, u.tok
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) + 1),
                      i -> {{'i': i, 'tok': toks[i]}})) AS u
        FROM toks WHERE doc_id % {n} = {s}
      )
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM tok t LEFT JOIN covered c
        ON t.doc_id = c.doc_id AND t.pos = c.pos
      WHERE c.pos IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS _clean
      FROM kept GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id, len(toks) AS n_tokens
      FROM toks WHERE doc_id % {n} = {s}
    ),
    oracle AS (
      SELECT t.doc_id,
             CAST(t.n_tokens AS BIGINT) AS n_tokens,
             CAST(t.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
             md5(COALESCE(r._clean, '')) AS clean_md5
      FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    )"""


def _compare_tail(n: int, s: int, spark_parquet: str) -> str:
    return f"""
    , engine AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(n_removed AS BIGINT) AS n_removed, clean_md5
      FROM read_parquet('{spark_parquet}/*.parquet')
      WHERE doc_id % {n} = {s}
    )
    SELECT (SELECT COUNT(*) FROM oracle) AS n_oracle,
           (SELECT COUNT(*) FROM engine) AS n_engine,
           (SELECT COUNT(*) FROM (SELECT * FROM oracle EXCEPT SELECT * FROM engine)) AS only_oracle,
           (SELECT COUNT(*) FROM (SELECT * FROM engine EXCEPT SELECT * FROM oracle)) AS only_engine
    """


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from kafka_journal_spark.functions.dedup import HASH60_SQL, SPAN_L
    from kafka_journal_spark.functions.text import TOKS_SQL
    from kafka_journal_spark.session import get_spark

    scratch = tempfile.mkdtemp(prefix="kjs-spanscale-")
    record = {}
    try:
        # 1) engine results -> parquet (distributed write, never collected)
        spark = get_spark("check-span-scale", cpus=cpus)
        qs = {**E.queries(), **E.extra_queries()}
        outs = {}
        for name in ("d_span_clean", "d_span_clean_keep1"):
            out = os.path.join(scratch, name)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").parquet(out)
            outs[name] = out
            print(f"# engine {name}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
        spark.stop()

        # 2) disk-backed DuckDB: global gram facts materialized once
        con = duckdb.connect(os.path.join(scratch, "oracle.duckdb"))
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        con.execute("SET max_temp_directory_size='120GB'")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(sf_dir, 'documents.parquet')}'"
        )
        t0 = time.perf_counter()
        con.execute(f"CREATE TABLE toks AS SELECT doc_id, {TOKS_SQL} AS toks FROM documents")
        con.execute(f"""
            CREATE TABLE g AS
            SELECT doc_id, u.i - 1 AS pos,
                   {HASH60_SQL.format(x="u.gram")} AS gh
            FROM (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - {SPAN_L} + 2),
                            i -> {{'i': i,
                                  'gram': array_to_string(toks[i:i+{SPAN_L - 1}], ' ')}})) AS u
              FROM toks WHERE len(toks) >= {SPAN_L}
            )""")
        con.execute(
            "CREATE TABLE dup AS SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2"
        )
        con.execute("""
            CREATE TABLE hits AS
            SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, pos) = 1
                     AS _canon
            FROM g JOIN dup USING (gh)""")
        con.execute("DROP TABLE g")
        con.execute("DROP TABLE dup")
        print(f"# global gram tables: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        # 3) per-shard rebuild + symmetric EXCEPT compare
        for name, shard_sql in (
            ("d_span_clean", _shard_sql_strict),
            ("d_span_clean_keep1", _shard_sql_keep1),
        ):
            tot_o = tot_e = bad = 0
            t0 = time.perf_counter()
            for s in range(n_shards):
                n_o, n_e, oo, oe = con.execute(
                    shard_sql(n_shards, s, outs[name])
                ).fetchone()
                tot_o += n_o
                tot_e += n_e
                bad += oo + oe
                print(f"# {name} shard {s}/{n_shards}: oracle={n_o} "
                      f"engine={n_e} diff={oo + oe}", file=sys.stderr)
            ok = bad == 0 and tot_o == tot_e and tot_o > 0
            record[name] = {
                "status": "pass" if ok else "fail",
                "rows": tot_o,
                "engine_rows": tot_e,
                "rows_differing": bad,
                "n_shards": n_shards,
                "secs": round(time.perf_counter() - t0, 1),
                "note": "full value parity via doc-range-sharded disk-backed "
                        "DuckDB oracle (global gram facts materialized once; "
                        "nothing sampled)",
            }
            print(f"{'PASS' if ok else 'FAIL'} {name}: rows={tot_o} diff={bad}")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    out_path = os.environ.get("CHECK_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": record}, f, indent=1,
                      sort_keys=True)
    if any(r["status"] != "pass" for r in record.values()):
        sys.exit(1)
    print("all span scale checks passed")


if __name__ == "__main__":
    main()
