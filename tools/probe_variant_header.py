"""Probe: decode_kafka_to_actions' header parse — from_json over the
one-of ACTION_HEADER_SCHEMA (shipping) vs Spark 4 VariantType
(parse_json once + variant_get per field).

OPTIMIZATION_r12.md "Not yet optimized" item 2: the header from_json is
~0.2 s / 99k rows of the wire-roundtrip exec; VariantType is the untried
alternative.  The variant spelling parses the JSON once into the binary
variant encoding and then answers each field access with a shredded
binary traversal instead of a struct field load — whether that beats one
Jackson parse into a struct is exactly what this measures.

Equality is asserted row-for-row BEFORE timing.  The input kafka frame is
localCheckpoint'd so both variants time ONLY the parse + projection, not
the encode.

Usage: python tools/probe_variant_header.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_journal_spark.codecs import ACTION_HEADER_SCHEMA, KAFKA_HEADER_KEY
from kafka_journal_spark.session import get_spark
from tools.ab_probe import ab_probe


#: the header fields the decode projection actually consumes
_FIELDS = [
    ("append.range.`from`", "bigint", "seq_nr_from"),
    ("append.range.`to`", "bigint", "seq_nr_to"),
    ("append.origin", "string", "a_origin"),
    ("append.version", "string", "a_version"),
    ("append.payloadType", "string", "payload_type"),
    ("delete.`to`", "bigint", "delete_to"),
    ("delete.origin", "string", "d_origin"),
    ("delete.version", "string", "d_version"),
    ("purge.origin", "string", "p_origin"),
    ("purge.version", "string", "p_version"),
    ("mark.id", "string", "mark_id"),
    ("mark.origin", "string", "m_origin"),
    ("mark.version", "string", "m_version"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("probe_variant_header", cpus=cpus)

    from kafka_journal_spark.codecs import encode_actions_to_kafka
    from kafka_journal_spark.operators.actions import journal_actions

    kafka = encode_actions_to_kafka(journal_actions(spark, sf_dir))
    hdr_raw = F.get(
        F.filter(F.col("headers"), lambda h: h["key"] == KAFKA_HEADER_KEY), 0
    )["value"].cast("string")
    base = (
        kafka.select(hdr_raw.alias("_hdr_raw"))
        .filter(F.col("_hdr_raw").isNotNull())
        .localCheckpoint(eager=True)
    )
    n = base.count()
    print(f"header rows: {n}")

    def via_from_json():
        h = base.withColumn("_hdr", F.from_json("_hdr_raw", ACTION_HEADER_SCHEMA))
        return h.selectExpr(
            *[f"CAST(_hdr.{path} AS {typ}) AS {alias}" for path, typ, alias in _FIELDS]
        )

    def via_variant():
        h = base.withColumn("_v", F.parse_json("_hdr_raw"))
        return h.selectExpr(
            *[
                "variant_get(_v, '$.{p}', '{t}') AS {a}".format(
                    p=path.replace("`", ""), t=typ, a=alias
                )
                for path, typ, alias in _FIELDS
            ]
        )

    a, b = via_from_json(), via_variant()
    assert a.schema == b.schema, f"schema mismatch:\n{a.schema}\n{b.schema}"
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), "row mismatch"
    print("row-for-row equal; timing...")
    ab_probe(spark, {"from_json": via_from_json, "variant": via_variant}, rounds=rounds)
    spark.stop()


if __name__ == "__main__":
    main()
