from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-journal-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


TS = dt.datetime(2024, 1, 1, 0, 0, 0)

ACTIONS_DDL = (
    "topic string, partition int, offset long, id string, action_type string, "
    "timestamp timestamp, origin string, version string, seq_nr_from long, "
    "seq_nr_to long, payload_type string, payload string, delete_to long, mark_id string"
)


def make_actions(spark: SparkSession, rows, offset_base: int = 0):
    """rows: list of dicts with partial fields; missing fields default to None."""
    full = []
    for i, r in enumerate(rows, start=offset_base):
        base = {
            "topic": "journal",
            "partition": 0,
            "offset": i,
            "id": None,
            "action_type": None,
            "timestamp": TS + dt.timedelta(seconds=i),
            "origin": "src-0",
            "version": "1.0",
            "seq_nr_from": None,
            "seq_nr_to": None,
            "payload_type": None,
            "payload": None,
            "delete_to": None,
            "mark_id": None,
        }
        base.update(r)
        full.append(base)
    return spark.createDataFrame(full, schema=ACTIONS_DDL)


def append(id, seq, **kw):
    return dict(
        id=id, action_type="append", seq_nr_from=seq, seq_nr_to=seq,
        payload_type="text", payload=f"p{seq}", **kw,
    )


def delete(id, to, **kw):
    return dict(id=id, action_type="delete", delete_to=to, **kw)


def purge(id, **kw):
    return dict(id=id, action_type="purge", **kw)


def mark(id, **kw):
    return dict(id=id, action_type="mark", mark_id="m", **kw)
