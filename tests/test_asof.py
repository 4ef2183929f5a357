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


def test_pit_enrich_no_leakage_at_exact_instant(spark, tmp_path):
    """An event that itself starts a new segment run must see the
    PREVIOUS version, not the one its own timestamp created — the
    no-leakage property that distinguishes strict PIT from inclusive
    as-of. First events get the none/0 sentinel."""
    import datetime

    from ngrams_collocations_hadoop_spark.operators.asof import (
        q_pit_enrich,
    )

    t0 = datetime.datetime(2024, 3, 1)

    def ev(eid, user, minutes, typ):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user,
                typ, 0.0, "{}")

    rows = [ev(1, 1, 0, "a"), ev(2, 1, 10, "a"), ev(3, 1, 20, "b"),
            ev(4, 1, 30, "a")]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.parquet(f"{sf}/events.parquet")

    out = {r.event_id: (r.prev_seg, r.prev_version)
           for r in q_pit_enrich(spark, sf).collect()}
    assert out[1] == ("none", 0)   # nothing strictly before
    assert out[2] == ("a", 1)      # inside run 1
    assert out[3] == ("a", 1)      # starts run 2 -> sees run 1 only
    assert out[4] == ("b", 2)      # starts run 3 -> sees run 2 only
