"""kafka-journal-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of evolution-gaming/kafka-journal.

The reference (see SURVEY.md) stores event-sourcing journals in Kafka and
replicates them to Cassandra; its "query surface" is a set of keyed log
operations (append / read-from-seqNr / pointer / delete-to / purge) plus the
replicator dataflow.  This package re-expresses those semantics Spark-first:

- ``operators.actions``    — the Action stream data model (FIXTURES.md §1)
- ``operators.replicate``  — batch replication fold: actions -> journal /
                             metajournal / pointers (reference Batch.scala,
                             ReplicatedCassandra.scala)
- ``operators.read``       — recovery reads, pointers, ids (Journals.scala,
                             EventualCassandra.scala)
- ``plans.recovery``       — HeadInfo-driven read planning (HeadInfo.scala)
- ``folds``                — pure-Python ports of the HeadInfo / Batch folds
                             for unit-level parity testing
- ``streaming.replicator`` — Structured Streaming replication pipeline
- ``functions.*``          — training-data-pipeline extensions (dedup,
                             similarity search, text analysis, multimodal)
"""

__version__ = "0.1.0"

SEGMENT_SIZE_DEFAULT = 10_000  # reference: eventual-cassandra/.../SegmentSize.scala:40
SEGMENTS_DEFAULT = 10_000      # reference: eventual-cassandra/.../Segments.scala:35-37
