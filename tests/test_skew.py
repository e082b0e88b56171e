"""Skew-safe aggregation helpers: results must equal the naive forms, and
the salted plan must actually spread a hot key over multiple shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_journal_spark.functions.skew import salted_agg, skew_safe_count_distinct


def _hot(spark, n=10_000):
    # one key holds ~90% of rows
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 97).alias("u"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_equals_plain(spark):
    df = _hot(spark)
    got = {
        r.k: (r.n, r.total)
        for r in salted_agg(
            df, keys=["k"], aggs={"n": ("u", "count"), "total": ("v", "sum")},
            salt=16, salt_on="u",
        ).collect()
    }
    want = {
        r.k: (r.n, r.total)
        for r in df.groupBy("k")
        .agg(F.count("u").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == want


def test_salted_agg_spreads_hot_key(spark):
    df = _hot(spark)
    # the partial stage must hold multiple shards for the hot key
    partial = df.withColumn(
        "_salt", F.pmod(F.hash(F.col("u")), F.lit(16))
    ).groupBy("k", "_salt").agg(F.count("*").alias("c"))
    shards = partial.filter(F.col("k") == "hot").count()
    assert shards > 4, shards


def test_skew_safe_count_distinct_equals_naive(spark):
    df = _hot(spark)
    got = {
        r.k: r.n_distinct_u
        for r in skew_safe_count_distinct(df, "k", "u").collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    assert got == want


def test_skew_safe_count_distinct_null_semantics(spark):
    """COUNT(DISTINCT x) excludes NULLs: a NULL distinct value must not
    count, and a group whose ONLY values are NULL must still appear with
    0 (the pre-fix distinct()+count(lit(1)) counted the (k, NULL) pair as
    one more distinct value)."""
    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 1), ("b", None), ("b", None)],
        "k string, u int",
    )
    got = {
        r.k: r.n_distinct_u
        for r in skew_safe_count_distinct(df, "k", "u").collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    assert got == want == {"a": 1, "b": 0}
