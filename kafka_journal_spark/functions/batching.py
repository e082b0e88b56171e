"""W5: producer write batching — group events into bounded batches
preserving order (reference ``pekko/persistence/.../Batching.scala:22-26``,
``GroupByWeight.scala:34-53``, default ≤100 events per producer record at
``KafkaJournalConfig.scala:55``).

Two forms:
- ``group_by_weight``: the exact greedy fold for arbitrary weights (pure
  Python — runs on the writer client, never over bulk data);
- ``assign_batches``: the distributed unit-weight form (the reference's
  ``Batching.byNumberOfEvents`` default) as a window expression:
  ``batch_nr = floor((row_number - 1) / max_events)`` — exact for unit
  weights, one window on the key partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_EVENTS_IN_BATCH = 100  # KafkaJournalConfig.scala:55


def group_by_weight(items: list, max_weight: int, weight=lambda x: 1) -> list[list]:
    """Greedy order-preserving grouping: a batch closes when adding the next
    item would exceed ``max_weight`` (an over-weight single item gets its
    own batch) — GroupByWeight.scala semantics."""
    batches: list[list] = []
    cur: list = []
    cur_w = 0
    for it in items:
        w = weight(it)
        if cur and cur_w + w > max_weight:
            batches.append(cur)
            cur, cur_w = [], 0
        cur.append(it)
        cur_w += w
    if cur:
        batches.append(cur)
    return batches


def assign_batches(
    appends: DataFrame, max_events: int = MAX_EVENTS_IN_BATCH
) -> DataFrame:
    """Unit-weight batching over an append stream: per (topic, id), in
    offset order, assign ``batch_nr`` and summarize each batch."""
    w = Window.partitionBy("topic", "id").orderBy("offset")
    df = appends.filter(F.col("action_type") == "append").withColumn(
        "batch_nr", F.floor((F.row_number().over(w) - 1) / max_events).cast("long")
    )
    return df.groupBy("topic", "id", "batch_nr").agg(
        F.count("*").alias("n_events"),
        F.min("seq_nr_from").alias("seq_lo"),
        F.max("seq_nr_to").alias("seq_hi"),
        F.min("offset").alias("first_offset"),
        F.max("offset").alias("last_offset"),
    )
