"""as-of join operator semantics on crafted data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from ngrams_collocations_hadoop_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T12:00:00"), "b"),
         (1, _ts("2024-01-01T08:00:00"), "early"),   # before any right row
         (2, _ts("2024-01-01T11:00:00"), "c"),       # key with no right rows
         (1, _ts("2024-01-01T09:00:00"), "exact")],  # ts == right ts → inclusive
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("name", T.StringType()),
        ]))
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 100),
         (1, _ts("2024-01-01T11:30:00"), 200)],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("val", T.LongType()),
        ]))
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts",
                    payload_cols=["val"])
    got = {r["name"]: r["val"] for r in out.collect()}
    assert got == {
        "a": 100,       # latest right at 09:00 <= 10:00
        "b": 200,       # 11:30 <= 12:00
        "early": None,  # no right row at or before 08:00
        "c": None,      # no right rows for key 2
        "exact": 100,   # inclusive: right at equal ts matches
    }
    assert out.count() == 5  # left row count preserved
