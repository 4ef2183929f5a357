"""merge_upsert + SCD2 semantics on crafted data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ngrams_collocations_hadoop_spark.operators.merge import (
    merge_upsert, scd2_apply,
)


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "v", "amt"])
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "v", "amt"])
    got = {r["k"]: (r["v"], r["amt"])
           for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0),
                   3: ("c", 30.0), 4: ("d", 40.0)}


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_apply(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ])
    current = spark.createDataFrame([
        (1, "red", _ts("2024-01-01T00:00:00"), None),
        (2, "blue", _ts("2024-01-01T00:00:00"), None),
        (1, "green", _ts("2023-01-01T00:00:00"),
         _ts("2024-01-01T00:00:00")),               # already closed
    ], schema)
    changes = spark.createDataFrame(
        [(1, "purple", _ts("2024-06-01T00:00:00")),   # changed → new version
         (2, "blue", _ts("2024-06-01T00:00:00"))],    # unchanged → no-op
        ["k", "attr", "changed_at"])

    out = scd2_apply(current, changes, key="k", tracked=["attr"],
                     change_ts="changed_at")
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"])
            for r in out.collect()}
    assert len(rows) == 4
    # old open row for k=1 closed at the change ts
    assert rows[(1, "red")] == (_ts("2024-01-01T00:00:00"),
                                _ts("2024-06-01T00:00:00"))
    # new open version appended
    assert rows[(1, "purple")] == (_ts("2024-06-01T00:00:00"), None)
    # unchanged k=2 stays open, history row untouched
    assert rows[(2, "blue")][1] is None
    assert rows[(1, "green")][1] == _ts("2024-01-01T00:00:00")


def test_scd2_null_flip_detected(spark):
    """A tracked attribute flipping NULL <-> '' must register as a
    change: concat_ws-style comparison skips NULLs and would silently
    drop it (the eqNullSafe conjunction does not)."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ])
    current = spark.createDataFrame(
        [(1, None, _ts("2024-01-01T00:00:00"), None),
         (2, "", _ts("2024-01-01T00:00:00"), None)], schema)
    changes = spark.createDataFrame(
        [(1, "", _ts("2024-06-01T00:00:00")),      # NULL -> ''
         (2, None, _ts("2024-06-01T00:00:00"))],   # ''   -> NULL
        schema=T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("attr", T.StringType()),
            T.StructField("changed_at", T.TimestampType()),
        ]))
    out = scd2_apply(current, changes, key="k", tracked=["attr"],
                     change_ts="changed_at")
    rows = {(r["k"], r["attr"], r["valid_to"] is None)
            for r in out.collect()}
    assert len(rows) == 4                      # both closed + both new
    assert (1, None, False) in rows and (1, "", True) in rows
    assert (2, "", False) in rows and (2, None, True) in rows


def test_scd2_multiple_changes_latest_wins(spark):
    """Two change rows for one key collapse to the latest change_ts —
    no fan-out of the closed row."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("attr", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ])
    current = spark.createDataFrame(
        [(1, "red", _ts("2024-01-01T00:00:00"), None)], schema)
    changes = spark.createDataFrame(
        [(1, "green", _ts("2024-03-01T00:00:00")),
         (1, "purple", _ts("2024-06-01T00:00:00"))],
        ["k", "attr", "changed_at"])
    out = scd2_apply(current, changes, key="k", tracked=["attr"],
                     change_ts="changed_at").collect()
    assert len(out) == 2
    rows = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"])
            for r in out}
    assert rows[(1, "red")] == (_ts("2024-01-01T00:00:00"),
                                _ts("2024-06-01T00:00:00"))
    assert rows[(1, "purple")] == (_ts("2024-06-01T00:00:00"), None)
