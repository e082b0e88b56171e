"""Skew-safe aggregation patterns for hot keys (SURVEY.md scale notes).

Spark's hash aggregation already does map-side combine, so a skewed plain
``groupBy().agg(sum/count)`` is cheap — each reducer sees at most one
partial row per (key, map task).  The patterns here cover the cases that
DO fall over on hot keys at 100 TB:

- ``salted_agg``: algebraic aggregates where the per-key *state* is big or
  the combiner is disabled (e.g. ``collect_list``-adjacent work, UDAFs):
  salt the key, aggregate per (key, salt), then merge the ≤ ``salt``
  partials — the hot key's work spreads over ``salt`` reducers.
- ``skew_safe_count_distinct``: exact COUNT(DISTINCT x) per hot key.  The
  naive form builds one giant hash set on the hot key's single reducer;
  the two-stage rewrite (dedupe on (key, x) — where the *pair* key is
  high-cardinality and therefore well distributed — then count) never
  materializes a per-key set anywhere.

Joins with skewed keys are AQE's job (``spark.sql.adaptive.skewJoin``),
which every session here enables — these helpers cover the agg side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation over ``salt`` shards per key.

    ``aggs`` maps output column -> (input column, fn) where fn is an
    algebraic aggregate with a merge of itself (``sum``, ``count``, ``min``,
    ``max``).  ``salt_on`` picks the shard (a stable column expression; for a
    count/sum any roughly-uniform column works).  Without it the shard is
    derived from a hash of ALL columns — deterministic under task retries
    (an ``F.rand`` fallback would re-assign rows on stage recomputation
    after the partial agg consumed the original assignment, double-counting
    or dropping rows: the classic nondeterministic-repartition hazard).

    LIMITATION of the all-columns fallback: rows that are fully identical
    hash to the SAME shard, so a hot key whose skew comes from exact
    duplicate rows is not spread.  Spreading those would need per-row
    identity that survives retries — which only the data itself can
    provide.  Pass ``salt_on`` naming a near-unique column (an offset,
    event_id, or ``F.struct`` of several) whenever one exists; that is why
    the parameter is first-class rather than an internal detail.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    shard = F.pmod(
        F.hash(
            *(
                [salt_on if isinstance(salt_on, Column) else F.col(salt_on)]
                if salt_on is not None
                else [F.col(c) for c in df.columns]
            )
        ),
        F.lit(salt),
    )
    partial = df.withColumn("_salt", shard).groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def skew_safe_count_distinct(
    df: DataFrame, group_key: str, distinct_key: str
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT distinct_key), hot-key safe.

    Stage 1 dedupes on the (group, distinct) PAIR — high-cardinality, so
    the shuffle spreads evenly no matter how hot ``group_key`` is; stage 2
    counts rows per group with map-side combine.  Equivalent to the naive
    form, but no reducer ever holds a per-key distinct set.

    NULL handling matches ``COUNT(DISTINCT x)`` exactly: the second stage
    counts the COLUMN (``F.count(col)`` skips NULLs), so a group whose
    only values are NULL still appears — with 0, not 1 (a bare
    ``count(lit(1))`` over the distinct pairs counted the (group, NULL)
    pair as one more distinct value).
    """
    pairs = df.select(group_key, distinct_key).distinct()
    return pairs.groupBy(group_key).agg(
        F.count(F.col(distinct_key)).alias(f"n_distinct_{distinct_key}")
    )
