"""Semantic unit tests for the training-data operators (tokens, shingles,
dedup candidates, similarity) on tiny hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_journal_spark.functions.dedup import hash64
from kafka_journal_spark.functions.similarity import cosine, sign_bucket
from kafka_journal_spark.functions.text import shingles_col, tokens_col

SF = "/root/testdata/sf0.001"


def test_tokenize_and_shingles(spark):
    df = spark.createDataFrame(
        [(1, "a b  c d"), (2, "x y"), (3, "")], "doc_id int, text string"
    )
    out = df.select(
        "doc_id",
        tokens_col().alias("toks"),
        shingles_col(tokens_col(), 3).alias("sh"),
    ).collect()
    got = {r.doc_id: (r.toks, r.sh) for r in out}
    assert got[1] == (["a", "b", "c", "d"], ["a b c", "b c d"])
    assert got[2] == (["x", "y"], [])
    assert got[3][1] == []


def test_hash64_is_md5_prefix(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    [r] = df.select(hash64(F.col("s")).alias("h")).collect()
    assert r.h == int("900150983cd24fb0d6963f7d28e17f72"[:8], 16)


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 1.0]), (3, [1.0, 1.0], [2.0, 2.0])],
        "i int, a array<double>, b array<double>",
    )
    out = {r.i: r.c for r in df.select("i", F.round(cosine(F.col("a"), F.col("b")), 9).alias("c")).collect()}
    assert out[1] == 1.0
    assert out[2] == 0.0
    assert out[3] == 1.0


def test_sign_bucket(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 9.9])],
        "i int, v array<double>",
    )
    [r] = df.select(sign_bucket(F.col("v")).alias("b")).collect()
    # bits: dim0 +(1) dim1 -(0) dim2 +(4) dim3 -(0) dim4 +(16) dim5 -(0)
    assert r.b == 1 + 4 + 16


def test_exact_dedup_groups(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "Hello  World", "en", "s", 11),
            (2, "hello world", "en", "s", 11),
            (3, "different", "en", "s", 9),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from kafka_journal_spark.functions.dedup import dedup_exact

    out = {r.doc_id: (r.canonical_id, r.group_size) for r in dedup_exact(spark, str(tmp_path)).collect()}
    assert out == {1: (1, 2), 2: (1, 2), 3: (3, 1)}


def test_quality_and_sampling_oracle_parity_on_degenerate_docs(spark, tmp_path):
    """Spark-vs-DuckDB parity for d_quality and d_sample_sources on the
    inputs the graded corpora never contain: zero-token documents (the
    oracle's list_sum([]) is NULL where Spark's aggregate seeds 0.0 —
    needs COALESCE) and a source with no trailing digits (a hard CAST of
    '' aborts the whole oracle where the engine yields NULL and falls to
    the odd rate — needs TRY_CAST)."""
    import os

    import duckdb

    from kafka_journal_spark.functions.text import TEXT_ORACLES, d_quality, sample_sources

    d = str(tmp_path / "corpus")
    os.makedirs(d)
    rows = [
        (0, "", "en", "webcrawl7", 0),
        (1, "   \t  ", "en", "curated", 6),  # whitespace-only + digitless source
        (2, "plain text with several tokens here", "en", "news12", 35),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    con = duckdb.connect()
    # Spark writes a DIRECTORY of part files; DuckDB needs the glob
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name, sdf in (
        ("d_quality", d_quality(spark, d)),
        ("d_sample_sources", sample_sources(spark, d)),
    ):
        cur = con.execute(TEXT_ORACLES[name])
        cols = [c[0] for c in cur.description]
        want = {
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in r
            )
            for r in cur.fetchall()
        }
        got = {
            tuple(
                round(v, 6) if isinstance(v, float) else v
                for v in (getattr(r, c) for c in cols)
            )
            for r in sdf.collect()
        }
        assert got == want, (name, got, want)


def test_quality_lang_sample_sql_twins_match_column_forms(spark):
    """r11 round-2 optimization: d_quality / d_lang_id / sample_sources and
    the fused pipeline base build their expressions as SQL strings over a
    hoisted token column.  Values must match the original Column builders
    (which remain in the source as the reference) exactly — including the
    double arithmetic, which the twins spell with D-suffixed literals so
    the trees are term-for-term identical."""
    from pyspark.sql import functions as F

    from kafka_journal_spark.functions.numeric import round6
    from kafka_journal_spark.functions.text import (
        _docs,
        _lang_hit_cols,
        _lang_pred_col,
        _quality_raw_cols,
        _quality_score_col,
        _sample_bucket_rate_cols,
        d_lang_id,
        d_quality,
        sample_sources,
    )

    # quality: Column reference (the pre-conversion body, inline tokens)
    raw = _quality_raw_cols()
    df = _docs(spark, SF).select(
        "doc_id",
        raw["n_tokens"].alias("n_tokens"),
        raw["punct_ratio"].alias("punct_ratio"),
        raw["stopword_ratio"].alias("stopword_ratio"),
        raw["avg_token_len"].alias("avg_token_len"),
    )
    score = _quality_score_col(
        {
            "n_tokens": F.col("n_tokens"),
            "punct_ratio": F.col("punct_ratio"),
            "stopword_ratio": F.col("stopword_ratio"),
            "avg_token_len": F.col("avg_token_len"),
        }
    )
    col_q = df.select(
        "doc_id",
        "n_tokens",
        round6(F.col("punct_ratio")).alias("punct_ratio"),
        round6(F.col("stopword_ratio")).alias("stopword_ratio"),
        round6(F.col("avg_token_len")).alias("avg_token_len"),
        round6(score).alias("quality_score"),
    )
    a = sorted(map(tuple, col_q.collect()))
    b = sorted(map(tuple, d_quality(spark, SF).collect()))
    assert a == b and len(b) > 0  # exact doubles, not approx

    # lang id
    from kafka_journal_spark.functions.text import LANG_PROFILES, tokens_col

    dfl = _docs(spark, SF).select("doc_id", "lang", tokens_col().alias("_toks"))
    hits = _lang_hit_cols(F.col("_toks"))
    dfl = dfl.select(
        "doc_id", "lang", *[hits[lang].alias(f"_h_{lang}") for lang in sorted(hits)]
    )
    expr = _lang_pred_col({lang: F.col(f"_h_{lang}") for lang in LANG_PROFILES})
    col_l = dfl.select(
        "doc_id",
        "lang",
        expr.alias("lang_pred"),
        (expr == F.col("lang")).alias("is_match"),
    )
    a = sorted(map(tuple, col_l.collect()))
    b = sorted(map(tuple, d_lang_id(spark, SF).collect()))
    assert a == b

    # sampling
    bucket, rate = _sample_bucket_rate_cols()
    col_s = _docs(spark, SF).select(
        "doc_id",
        "source",
        bucket.cast("int").alias("bucket"),
        rate.cast("int").alias("rate_permille"),
        (bucket < rate).alias("keep"),
    )
    a = sorted(map(tuple, col_s.collect()))
    b = sorted(map(tuple, sample_sources(spark, SF).collect()))
    assert a == b
