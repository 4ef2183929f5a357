"""Structured Streaming semantics: watermark late-data drop in append
mode with a multi-batch file source. (Oracle equivalence for the
streaming queries is covered by test_registry.py.)"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_events(path: str, rows: list[tuple[int, str, float]]) -> None:
    """rows: (event_id, iso_ts, value)"""
    pdf = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        # µs precision: ns-unit timestamps would hit the nanosAsLong path
        "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
        "user_id": [1] * len(rows),
        "value": [r[2] for r in rows],
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def test_watermark_drops_late_rows(spark):
    """Three micro-batches: batch 0 advances event time, batch 1 lets
    the watermark close the first window (append-mode emit + state
    eviction), batch 2 delivers a late row for the closed window — it
    must be dropped, and the emitted count must exclude it.

    (Spark's late filter takes effect for rows arriving in batches
    *after* the one where the watermark passed the window end — hence
    the intermediate batch.)"""
    d = tempfile.mkdtemp(prefix="wm_test_")
    f1, f2, f3 = (f"{d}/b1.parquet", f"{d}/b2.parquet", f"{d}/b3.parquet")
    _write_events(f1, [
        (1, "2024-01-01T10:05:00", 1.0),
        (2, "2024-01-01T10:20:00", 1.0),
        (3, "2024-01-01T12:30:00", 1.0),  # → watermark 12:20 next batch
    ])
    _write_events(f2, [
        (5, "2024-01-01T12:40:00", 1.0),  # watermark 12:20 closes [10:00]
    ])
    _write_events(f3, [
        (4, "2024-01-01T10:40:00", 1.0),  # LATE for closed window [10:00]
        (6, "2024-01-01T14:00:00", 1.0),  # → watermark 13:50 closes [12:00]
    ])
    # force deterministic file order (file source orders by mod time)
    now = dt.datetime.now().timestamp()
    for i, f in enumerate([f1, f2, f3]):
        os.utime(f, (now - 100 + i, now - 100 + i))

    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d)
              # pyarrow writes TIMESTAMP_NTZ; watermarks need TIMESTAMP
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour"))
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.col("window.start").alias("win_start"), "n"))
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("wm_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    dropped = sum(so.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress for so in p["stateOperators"])
    got = {r["win_start"].isoformat(): r["n"]
           for r in spark.table("wm_out").collect()}
    assert dropped == 1                               # the late row
    assert got.get("2024-01-01T10:00:00") == 2        # late row excluded
    assert got.get("2024-01-01T12:00:00") == 2        # events 3 and 5
    assert "2024-01-01T14:00:00" not in got           # never finalized


def test_stream_pair_join_state_spans_batches_and_evicts(spark):
    """Stream-stream interval join: the match arrives in a LATER
    micro-batch than its partner (state must persist across batches),
    and after the watermark advances past the join horizon the buffered
    rows are evicted — a very late row finds no partners."""
    from ngrams_collocations_hadoop_spark.streaming.windows import (
        stream_pair_join,
    )
    d = tempfile.mkdtemp(prefix="ssj_test_")
    files = [f"{d}/b{i}.parquet" for i in range(5)]
    _write_events(files[0], [(1, "2024-01-01T10:00:00", 1.0)])
    _write_events(files[1], [(2, "2024-01-01T10:05:00", 1.0)])  # pairs w/ 1
    _write_events(files[2], [(3, "2024-01-01T13:00:00", 1.0)])  # wm -> 12:50
    # state cleanup is lazy (end-of-batch): one more batch under the
    # advanced watermark so eviction of 1/2 completes BEFORE the late
    # row arrives
    _write_events(files[3], [(5, "2024-01-01T13:10:00", 1.0)])  # pairs w/ 3
    _write_events(files[4], [(4, "2024-01-01T10:08:00", 1.0)])  # evicted era
    now = dt.datetime.now().timestamp()
    for i, f in enumerate(files):
        os.utime(f, (now - 100 + i, now - 100 + i))

    schema = spark.read.parquet(d).schema

    def src():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(d)
                .withColumn("ts", F.col("ts").cast("timestamp")))

    joined = stream_pair_join(src(), src())
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName("ssj_out")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    pairs = {(r["l_id"], r["r_id"]): r["gap_sec"]
             for r in spark.table("ssj_out").collect()}
    # events 2 and 5 paired with buffered partners (cross-batch state);
    # event 4 found nothing: events 1/2 were evicted when the watermark
    # passed their join horizon (absence of (1,4)/(2,4), which WOULD
    # match on the time bounds alone)
    assert pairs == {(1, 2): 300, (3, 5): 600}


def test_stream_merge_to_table_upserts_and_is_idempotent(spark):
    """The foreachBatch merge sink must (a) produce exactly the batch
    aggregate state a plain batch query computes, and (b) be
    idempotent: re-running the same stream into the same table (fresh
    checkpoint, same data) leaves the table unchanged."""
    import tempfile

    from pyspark.sql import functions as F
    from ngrams_collocations_hadoop_spark.sources.tables import load_table
    from ngrams_collocations_hadoop_spark.streaming.windows import (
        _event_stream, stream_merge_to_table,
    )
    sf = "/root/testdata/sf0.001"
    base = tempfile.mkdtemp(prefix="merge_sink_")
    table = base + "/table"

    def run(checkpoint: str) -> None:
        stream = _event_stream(spark, sf)
        agg = (stream.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("value").alias("sum_value")))
        stream_merge_to_table(spark, agg, table, checkpoint,
                              key_cols=["event_type"])

    run(base + "/cp1")
    got1 = {r["event_type"]: (r["n"], round(r["sum_value"], 6))
            for r in spark.read.parquet(table).collect()}
    exact = {r["event_type"]: (r["n"], round(r["sum_value"], 6))
             for r in load_table(spark, sf, "events")
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("value").alias("sum_value")).collect()}
    assert got1 == exact
    # replay with a fresh checkpoint: same input -> same table state
    run(base + "/cp2")
    got2 = {r["event_type"]: (r["n"], round(r["sum_value"], 6))
            for r in spark.read.parquet(table).collect()}
    assert got2 == got1


def test_stream_merge_to_table_upserts_null_keys(spark, tmp_path):
    """A NULL merge key must UPSERT like any other key. Plain `=` in
    the anti-join never matches NULL, so before the null-safe (<=>)
    condition each micro-batch KEPT the table's stale NULL row and
    unioned its own — one duplicate per batch (found by the NULL-
    identity fuzz hazard on stream_merge_sink)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from ngrams_collocations_hadoop_spark.streaming.windows import (
        stream_merge_to_table,
    )

    src = tmp_path / "src"
    src.mkdir()
    # two single-file batches, both containing the NULL key
    for i, rows in enumerate([[("a", 1), (None, 10)],
                              [("a", 2), (None, 20), ("b", 3)]]):
        ks, vs = zip(*rows)
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.string()),
                      "v": pa.array(vs, pa.int64())}),
            str(src / f"batch{i}.parquet"))
    schema = spark.read.parquet(str(src)).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    agg = stream.groupBy("k").agg(F.sum("v").cast("long").alias("s"))
    table = str(tmp_path / "table")
    stream_merge_to_table(spark, agg, table, str(tmp_path / "cp"),
                          key_cols=["k"])
    got = {r["k"]: r["s"] for r in spark.read.parquet(table).collect()}
    rows = spark.read.parquet(table).count()
    # exactly one row per key INCLUDING the NULL key, cumulative totals
    assert rows == 3 and got == {"a": 3, None: 30, "b": 3}


def test_stream_outer_join_withholds_young_unmatched(spark, tmp_path):
    """End-of-stream state flush: an unmatched event old enough that
    the final watermark proves no match (l_ts + follow < wm) must emit
    a null-extended row; an unmatched event younger than that must be
    WITHHELD (still in state when input ends). Matched pairs always
    emit."""
    import datetime

    from ngrams_collocations_hadoop_spark.streaming.windows import (
        q_stream_outer_join,
    )

    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(eid, user, minutes):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user,
                "click", 1.0, "{}")

    rows = [
        ev(1, 100, 0),     # old, unmatched -> must emit null row
        ev(2, 200, 5),     # matched pair (3 follows within 10 min)
        ev(3, 200, 10),
        ev(4, 300, 55),    # young, unmatched: 55m + 10m follow
                           #   >= wm (65m - 15m = 50m) -> withheld
        ev(5, 400, 65),    # max ts; drives the watermark; withheld too
    ]
    import pandas as pd

    # single-FILE parquet: the file-stream source reads through a
    # symlink to this path and does not recurse into Spark's
    # directory-style output
    sf = str(tmp_path)
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    out = {(r.l_id, r.r_id): r.unmatched
           for r in q_stream_outer_join(spark, sf).collect()}
    # matched: 2 -> 3 (and 3 itself is matched as a LEFT? no: 3 has no
    # follower, it's unmatched; 3 is old enough? l_ts 10m + 10m = 20m
    # < 50m -> emits null row)
    assert out[(2, 3)] is False
    assert out[(1, -1)] is True
    assert out[(3, -1)] is True
    assert (4, -1) not in out
    assert (5, -1) not in out
    assert len(out) == 3


def test_stream_full_outer_right_eviction_boundary(spark, tmp_path):
    """Pins the RIGHT-side withhold/emit boundary of the FULL OUTER
    interval join (the left side is pinned by the test above): an
    orphan right event emits its null-extended row iff r_ts <= final
    watermark, NON-strict (probed empirically: exactly-at-wm emits,
    wm+1ms is withheld) — one probe sits exactly AT the watermark
    (must emit) and one 1 ms above it (must stay withheld). A Spark
    minor-version change in eviction strictness fails here first,
    instead of surfacing as an unexplained sweep mismatch."""
    import datetime

    from ngrams_collocations_hadoop_spark.streaming.windows import (
        q_stream_full_outer_join,
    )

    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(eid, user, minutes, ms=0):
        return (eid,
                t0 + datetime.timedelta(minutes=minutes, milliseconds=ms),
                user, "click", 1.0, "{}")

    # watermark = max ts (65m) - 15m delay = 50m; follow window = 10m
    rows = [
        ev(1, 100, 0),    # orphan both ways; old -> both null rows emit
        ev(2, 200, 5),    # matched pair as LEFT of (2,3); as RIGHT it
                          #   has no predecessor -> also a right orphan
        ev(3, 200, 10),
        ev(4, 600, 49),   # right orphan just below wm -> must emit
        ev(5, 700, 50),   # right orphan exactly AT wm -> emits (<=)
        ev(7, 900, 50, 1),  # right orphan at wm + 1ms -> withheld
        ev(6, 800, 65),   # max ts; drives the watermark; withheld
    ]
    import pandas as pd

    sf = str(tmp_path)
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    out = {(r.l_id, r.r_id)
           for r in q_stream_full_outer_join(spark, sf).collect()}
    assert (2, 3) in out            # the matched pair
    assert (1, -1) in out           # left-null: 0m + 10m < 50m
    assert (3, -1) in out           # left-null: 10m + 10m < 50m
    assert (-1, 1) in out           # right orphan, 0m < 50m
    assert (-1, 2) in out           # right orphan, 5m < 50m
    assert (-1, 4) in out           # below wm -> emits
    assert (-1, 5) in out           # boundary probe: 50m == wm -> emits
    assert (-1, 7) not in out       # boundary probe: wm + 1ms -> held
    assert (-1, 6) not in out       # young; withheld
    assert len(out) == 7


def test_stream_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Production restart semantics, which the AvailableNow one-shot
    harness never exercises: a stateful windowed aggregation with a
    DISK checkpoint resumes from its state store after the query
    stops. Proof of resume is twofold: (a) the second run's progress
    counters show it read ONLY the newly arrived file, and (b) the
    resumed complete-mode table equals the one-shot batch aggregate
    over ALL the data — i.e. the first file's contribution came out
    of restored state, not reprocessing."""
    import datetime

    import pandas as pd
    from pyspark.sql import functions as F
    from ngrams_collocations_hadoop_spark.streaming.windows import (
        tumbling_agg,
    )

    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(eid, minutes, etype, value):
        return (eid, t0 + datetime.timedelta(minutes=minutes), 100,
                etype, value, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batch1 = [ev(1, 0, "click", 1.0), ev(2, 30, "click", 2.0),
              ev(3, 70, "view", 4.0)]
    batch2 = [ev(4, 80, "click", 8.0), ev(5, 140, "view", 16.0)]

    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()

    def to_pq(rows, path):
        pdf = pd.DataFrame(rows, columns=cols)
        # µs precision: ns-unit timestamps would need the nanosAsLong
        # session shim this raw reader does not apply
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(path, index=False)

    to_pq(batch1, f"{indir}/b1.parquet")
    schema = spark.read.parquet(indir).schema

    def run_once(qname):
        stream = (spark.readStream.schema(schema).parquet(indir)
                  # pyarrow writes TIMESTAMP_NTZ; watermarks need TIMESTAMP
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        q = (tumbling_agg(stream)
             .writeStream.outputMode("complete")
             .format("memory").queryName(qname)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        n_in = sum(p["numInputRows"] for p in q.recentProgress)
        out = {(r.win_start, r.event_type): (r.n, r.sum_value)
               for r in spark.table(qname).collect()}
        return n_in, out

    n1, out1 = run_once("ckpt_run1")
    assert n1 == len(batch1)
    assert out1[(t0, "click")] == (2, 3.0)

    to_pq(batch2, f"{indir}/b2.parquet")
    n2, out2 = run_once("ckpt_run2")
    # (a) resume: only the new file's rows were read
    assert n2 == len(batch2), (n2, len(batch2))
    # (b) state carried over: equals the one-shot batch aggregate
    batch = {(r.win_start, r.event_type): (r.n, r.sum_value)
             for r in (spark.read.parquet(indir)
                       .groupBy(F.window("ts", "1 hour"), "event_type")
                       .agg(F.count(F.lit(1)).alias("n"),
                            F.round(F.sum("value"), 4).alias("sum_value"))
                       .select(F.col("window.start").alias("win_start"),
                               "event_type", "n", "sum_value")).collect()}
    assert out2 == batch and len(out2) == 4


def test_session_window_exact_gap_boundary(spark):
    """Pin the session_window merge rule at the gap boundary: an event
    at exactly prev + gap lands in the SAME session (the [t, t+gap]
    extent is closed for merging); prev + gap + 1µs starts a new one.
    ORACLE_STREAM_SESSION encodes this as a STRICT `>` gap break — a
    `>=` diverges exactly here (found by the adversarial-corpus fuzz,
    invisible on fixture data whose timestamps never land on the
    boundary)."""
    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:30:00"),
            (2, "2024-01-01 00:00:00"), (2, "2024-01-01 00:30:00.000001"),
            (3, "2024-01-01 00:00:00"), (3, "2024-01-01 00:29:59.999999")]
    df = (spark.createDataFrame(rows, "user_id long, ts string")
          .withColumn("ts", F.to_timestamp("ts")))
    out = {r.user_id: r.n
           for r in (df.groupBy("user_id",
                                F.session_window("ts", "30 minutes"))
                     .agg(F.count(F.lit(1)).alias("n"))).collect()}
    assert out[1] == 2   # exactly at the gap: merged
    assert out[3] == 2   # under the gap: merged
    out2 = (df.filter("user_id = 2")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))).collect()
    assert sorted(r.n for r in out2) == [1, 1]  # 1µs over: split


def test_stream_dedup_gates_null_event_ids(spark, tmp_path):
    """NULL event_ids are unidentifiable (no delivery can be recognized
    as a duplicate) and Spark's dropDuplicates treats NULL keys as
    EQUAL — binary state-store key equality — so without the gate two
    DISTINCT null-id events collapse to one. The data contract says
    event_id is a primary key (NOT NULL + UNIQUE), so this is armor
    beyond the contract: the gate must drop null-id rows entirely,
    matching the oracle's `WHERE event_id IS NOT NULL`."""
    import pandas as pd

    from ngrams_collocations_hadoop_spark.operators.relational import (
        EVENTS_US,  # noqa: F401 — proves the batch-side import path
    )
    from ngrams_collocations_hadoop_spark.streaming.windows import (
        q_stream_dedup,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(20):
        rows.append((None if i % 5 == 0 else i,
                     t0 + dt.timedelta(minutes=i), 1, "t",
                     float(i), "{}"))
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["event_id"] = pdf["event_id"].astype("Int64")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    out = q_stream_dedup(spark, sf).collect()
    # 20 rows, 4 with NULL ids (i = 0,5,10,15) -> every doubled
    # delivery of the 16 identified events dedups to one; the 4
    # null-id rows are gated out, NOT collapsed to a single survivor.
    assert len(out) == 1
    assert out[0].n == 16


def test_stream_id_resolve_picks_keeper_across_divergent_deliveries(
        spark):
    """The conflict stream must really deliver every event TWICE with
    DIVERGENT payloads (value +0.5, props nulled) — otherwise the
    query degenerates to a dedup and the keeper rule is vacuous — and
    the resolved output must be exactly the rule's pick (the original
    row for this conflict shape), not an arbitrary delivery: a wrong
    pick surfaces as a shifted value or a nulled props."""
    from .conftest import SF_SMALL
    from ngrams_collocations_hadoop_spark.sources.tables import load_table
    from ngrams_collocations_hadoop_spark.streaming.windows import (
        _conflict_stream_dir,
        q_stream_id_resolve,
    )

    base = load_table(spark, SF_SMALL, "events")
    n_base = base.count()
    n_props = base.filter(F.col("props").isNotNull()).count()
    assert n_props > 0  # otherwise the props-nulling conflict is inert

    d = _conflict_stream_dir(SF_SMALL)
    raw = spark.read.parquet(d)
    assert raw.count() == 2 * spark.read.parquet(
        f"{SF_SMALL}/events.parquet").count()
    # the second delivery genuinely diverges: its props are ALL null
    assert raw.filter(F.col("props").isNull()).count() >= n_props

    resolved = q_stream_id_resolve(spark, SF_SMALL).toPandas()
    expected = base.filter(F.col("event_id").isNotNull()).toPandas()
    cols = sorted(expected.columns)
    a = resolved[cols].sort_values(cols, ignore_index=True)
    b = expected[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# --- RocksDB state-store parity (VERDICT r05 #6) -------------------------
#
# The 14 streaming queries run on the default HDFS-backed state store;
# at 100 TB state (cross-batch dedup keys, two-sided join state) the
# RocksDB provider is the production story — state lives off-heap /
# on-disk instead of in executor JVM memory. Results and restart
# semantics must be provider-independent.

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


class _state_store:
    def __init__(self, spark, provider_class: str | None):
        self.spark, self.provider = spark, provider_class

    def __enter__(self):
        self.old = self.spark.conf.get(_PROVIDER_KEY, None)
        if self.provider is not None:
            self.spark.conf.set(_PROVIDER_KEY, self.provider)
        return self

    def __exit__(self, *exc):
        if self.old is None:
            self.spark.conf.unset(_PROVIDER_KEY)
        else:
            self.spark.conf.set(_PROVIDER_KEY, self.old)
        return False


def test_rocksdb_state_store_parity(spark):
    """EVERY streaming registry query — windowed/sliding/session aggs,
    watermarked dedup (both forms), inner/outer/full-outer join state,
    applyInPandasWithState custom state, SCD2 enrich, leaderboard,
    merge sink, plus the stateless enrich for completeness — must
    match its DuckDB oracle bit-for-bit under the RocksDB provider
    exactly as under the default provider (the registry's standing
    gate)."""
    from ngrams_collocations_hadoop_spark.registry import QUERIES

    from .conftest import SF_SMALL
    from .util_diff import assert_query_matches_oracle

    names = sorted(n for n in QUERIES if n.startswith("stream_"))
    with _state_store(spark, ROCKSDB_PROVIDER):
        for n in names:
            assert_query_matches_oracle(spark, n, SF_SMALL)


def test_rocksdb_checkpoint_restart(spark, tmp_path):
    """The checkpoint/restart contract under RocksDB: a stateful agg
    resumes from its RocksDB state store after the query stops —
    the second run reads ONLY the new file and its complete-mode table
    equals the batch aggregate over all data. Also asserts the
    provider actually engaged (rocksdb metrics in the progress)."""
    import datetime

    import pandas as pd
    from pyspark.sql import functions as F

    from ngrams_collocations_hadoop_spark.streaming.windows import (
        tumbling_agg,
    )

    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)

    def ev(eid, minutes, etype, value):
        return (eid, t0 + datetime.timedelta(minutes=minutes), 100,
                etype, value, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batch1 = [ev(1, 0, "click", 1.0), ev(2, 30, "click", 2.0),
              ev(3, 70, "view", 4.0)]
    batch2 = [ev(4, 80, "click", 8.0), ev(5, 140, "view", 16.0)]

    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()

    def to_pq(rows, path):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(path, index=False)

    to_pq(batch1, f"{indir}/b1.parquet")
    schema = spark.read.parquet(indir).schema

    def run_once(qname):
        stream = (spark.readStream.schema(schema).parquet(indir)
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        q = (tumbling_agg(stream)
             .writeStream.outputMode("complete")
             .format("memory").queryName(qname)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        n_in = sum(p["numInputRows"] for p in q.recentProgress)
        metrics = set()
        for p in q.recentProgress:
            for op in p.get("stateOperators", []):
                metrics |= set(op.get("customMetrics", {}))
        out = {(r.win_start, r.event_type): (r.n, r.sum_value)
               for r in spark.table(qname).collect()}
        return n_in, out, metrics

    with _state_store(spark, ROCKSDB_PROVIDER):
        n1, out1, metrics1 = run_once("rocksdb_run1")
        assert n1 == len(batch1)
        assert out1[(t0, "click")] == (2, 3.0)
        # the provider really is RocksDB, not silently the default
        assert any("rocksdb" in m.lower() for m in metrics1), metrics1

        to_pq(batch2, f"{indir}/b2.parquet")
        n2, out2, _ = run_once("rocksdb_run2")
        assert n2 == len(batch2), (n2, len(batch2))
        batch = {(r.win_start, r.event_type): (r.n, r.sum_value)
                 for r in (spark.read.parquet(indir)
                           .groupBy(F.window("ts", "1 hour"), "event_type")
                           .agg(F.count(F.lit(1)).alias("n"),
                                F.round(F.sum("value"), 4)
                                .alias("sum_value"))
                           .select(F.col("window.start").alias("win_start"),
                                   "event_type", "n", "sum_value")
                           ).collect()}
        assert out2 == batch and len(out2) == 4


def test_stream_lsh_ingest_checkpoint_restart_and_retry_parity(
        spark, tmp_path):
    """The streaming-to-lifecycle composition's exactly-once story
    (VERDICT r09 #6), pinned end to end on the REAL index jobs:

    (a) checkpoint/restart parity — a quality-gated ingest stream
        appending to the persisted LSH index via foreachBatch is
        stopped after batch 1 and RESTARTED from its checkpoint after
        batch 2 arrives; the restarted run must read only the new file
        (progress counters) and the index must grow by exactly the new
        batch's band rows — file-level exactly-once across restarts;
    (b) batch equivalence — the match over the stream-maintained index
        equals the in-DAG incremental match over the same ingested
        corpus (prebatch ∪ gated batch), the oracle-backed claim of
        the registry row;
    (c) at-least-once retry safety — re-appending an already-delivered
        micro-batch (a foreachBatch retry) duplicates band rows in
        storage but leaves the MATCH OUTPUT unchanged (pair-set dedup
        in _batch_index_candidates), so correctness needs no
        transactional sink."""
    from .conftest import SF_SMALL
    from ngrams_collocations_hadoop_spark.operators.dedup import (
        NEW_BATCH_MOD, append_lsh_index, build_lsh_index,
        match_lsh_index, q_dedup_incremental_lsh)
    from ngrams_collocations_hadoop_spark.operators.pipeline import (
        _quality_survivors)
    from ngrams_collocations_hadoop_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    gated_batch = _quality_survivors(
        spark, SF_SMALL,
        docs=docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0),
        full_row=True)
    corpus = (docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
              .unionByName(gated_batch))
    half1 = gated_batch.filter(F.col("doc_id") % 2 == 0)
    half2 = gated_batch.filter(F.col("doc_id") % 2 != 0)
    n_half1, n_half2 = half1.count(), half2.count()
    assert n_half1 > 0 and n_half2 > 0

    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()
    half1.toPandas().to_parquet(f"{indir}/b1.parquet", index=False)
    schema = spark.read.parquet(indir).schema

    table = build_lsh_index(spark, SF_SMALL, old_only=True)
    try:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(indir)

            def ingest(batch, batch_id):
                append_lsh_index(batch.sparkSession, table, batch)

            q = (stream.writeStream.foreachBatch(ingest)
                 .outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            # the clone-session append staleness the production job
            # also refreshes away (see q_stream_lsh_ingest)
            spark.catalog.refreshTable(table)
            return sum(p["numInputRows"] for p in q.recentProgress)

        assert run_once() == n_half1
        rows_1 = spark.table(table).count()

        half2.toPandas().to_parquet(f"{indir}/b2.parquet", index=False)
        assert run_once() == n_half2          # (a) only the new file
        rows_2 = spark.table(table).count()
        from ngrams_collocations_hadoop_spark.operators.dedup import (
            LSH_BANDS)
        assert rows_2 - rows_1 == n_half2 * LSH_BANDS

        got = {tuple(r) for r in match_lsh_index(
            spark, SF_SMALL, table, docs=corpus).collect()}
        want = {tuple(r) for r in q_dedup_incremental_lsh(
            spark, SF_SMALL, docs=corpus).collect()}
        assert got == want and len(got) > 0    # (b) batch equivalence

        # (c) a replayed micro-batch: storage grows, output does not
        append_lsh_index(spark, table, half2)
        assert spark.table(table).count() == rows_2 + n_half2 * LSH_BANDS
        again = {tuple(r) for r in match_lsh_index(
            spark, SF_SMALL, table, docs=corpus).collect()}
        assert again == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_components_maintain_finds_cross_tick_pairs(spark, tmp_path):
    """The per-tick matcher's relaxed keep rule is load-bearing: a
    new×new near-dup pair whose LOWER doc id arrived in an EARLIER
    tick is discoverable only from the HIGHER id's tick (the lower
    id's tick ran before its partner was in the index), which the
    standard lo<hi keep rule would drop. Craft exactly that shape —
    two near-dup batch docs delivered in separate micro-batches, the
    lower id first — and pin that the maintained components table
    clusters them. Also pins the per-tick match path end to end on a
    corpus where the ONLY near-dup edge is cross-tick."""
    from ngrams_collocations_hadoop_spark.operators.dedup import (
        _tokens, append_lsh_index, build_lsh_index,
        match_index_pairs_for_tick)
    from ngrams_collocations_hadoop_spark.sources.tables import load_table

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango")
    rows = [
        # prebatch docs (ids % 5 != 0), unrelated to the batch cluster
        (1, "one completely unrelated document body here", "en", "s", 1),
        (2, "another disjoint vocabulary entirely separate", "en", "s", 1),
        # the cross-tick near-dup pair: both % 5 == 0, LOWER id ticks
        # first; j(base, base+' uniform') ~ 0.95 > threshold
        (10, base, "en", "s", 1),
        (15, base + " uniform", "en", "s", 1),
    ]
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    table = build_lsh_index(spark, d, old_only=True)
    try:
        docs = load_table(spark, d, "documents")
        tick1 = docs.filter(F.col("doc_id") == 10)
        tick2 = docs.filter(F.col("doc_id") == 15)
        append_lsh_index(spark, table, tick1)
        toks = _tokens(docs).select("doc_id", "toks")
        p1 = match_index_pairs_for_tick(spark, table, tick1, toks)
        assert p1.count() == 0        # partner not arrived yet
        append_lsh_index(spark, table, tick2)
        spark.catalog.refreshTable(table)
        p2 = match_index_pairs_for_tick(spark, table, tick2, toks)
        got = {(r.doc_new, r.doc_match) for r in p2.collect()}
        # found from the HIGHER id's tick — (15, 10), the orientation
        # the standard lo<hi rule would have dropped
        assert (15, 10) in got, got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
