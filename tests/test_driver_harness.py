"""Regression test for the driver-harness contract: queries must be
correct under a SparkSession the harness built itself — no session.py
defaults, hostile non-UTC timezone. Runs in a subprocess because the
in-process session (conftest) already carries our configs."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("bare-harness")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import duckdb, pandas as pd
import __spark_entry__ as E
con = duckdb.connect()
for t in ["events", "orders", "customer", "documents", "lineitem",
          "nation", "region", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
qs, os_ = E.queries(), E.oracle_sql()
for name in ["rel_sessionize", "rel_tumbling_window", "rel_date_math",
             "rel_hypertable_rollup", "rel_range_join", "stream_dedup",
             "stream_sliding", "stream_enrich", "stream_pair_join",
             "colloc_hebrew_topk", "mm_image_dims", "mm_resize",
             "text_pack_sequences", "rel_approx_sketches",
             "stream_merge_sink", "text_dup_span_positions",
             "rel_ewma", "rel_cusum", "rel_scd2", "rel_gap_fill",
             "rel_interval_overlap", "rel_retention_cohorts",
             "rel_pit_enrich", "stream_outer_join",
             "stream_scd2_enrich", "rel_sketch_reagg",
             "stream_full_outer_join", "text_weighted_sample",
             "dedup_persisted_lsh", "colloc_topk_quirk",
             # late-r05 fuzz-hardened queries (exact-sum derives,
             # epoch gate, dense PQ codebook, json casts)
             "stream_session", "stream_stateful_totals",
             "rel_json_extract", "rel_mad_outliers", "rel_star_join",
             "sim_pq_topk", "text_curriculum_buckets",
             # r06 changes: ieee_round llr (all three surfaces) and
             # the persisted-LSH lifecycle split (bucketed catalog
             # table under a bare session's own warehouse)
             "colloc_scored", "colloc_topk_sql",
             "dedup_persisted_lsh_match",
             # r07 changes: identity-totality forms, the ingest
             # pipeline's stage-0 gate, the new audit query
             "dedup_minhash_lsh", "dedup_simhash",
             "sim_cosine_topk_lsh", "text_heaps", "pipeline_ingest",
             "ingest_id_audit", "stream_id_resolve",
             # late-r07 new queries: refinement ANN family + the
             # Morton layout (ts-epoch-sensitive -> timezone matters)
             # + the documents-feed streaming quality gate
             "sim_pq_rerank", "sim_mrl_topk", "rel_zorder_layout",
             "stream_quality_gate",
             # r09 new lifecycle/parameter queries: state-keyed
             # catalog tables under a bare session's own warehouse
             # (components update, PQ codes + stored codebook) and
             # the hash-ordered sampled Lloyd chain
             "dedup_components_update", "sim_pq_persisted_topk",
             "sim_pq_sampled_topk",
             # r10 new: the served-recall audit (reads the persisted
             # PQ artifacts under a bare session's warehouse) and the
             # streaming ingest composition (foreachBatch clone
             # session + checkpoint + state-keyed index table)
             "sim_pq_persisted_recall", "stream_lsh_ingest"]:
    a = qs[name](spark, "/root/testdata/sf0.001").toPandas()
    b = con.execute(os_[name]).df()
    a = a.reindex(sorted(a.columns), axis=1)
    b = b.reindex(sorted(b.columns), axis=1)
    for c in a.columns:
        if a[c].dtype.kind == "f": a[c] = a[c].round(6)
        if b[c].dtype.kind == "f": b[c] = b[c].round(6)
    a = a.sort_values(list(a.columns), ignore_index=True)
    b = b.sort_values(list(b.columns), ignore_index=True)
    assert len(a) == len(b), (name, len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=1e-6)
print("BARE-SESSION-OK")
"""


def test_queries_correct_under_bare_session():
    out = subprocess.run([sys.executable, "-c", SCRIPT],
                         capture_output=True, text=True, timeout=600)
    assert "BARE-SESSION-OK" in out.stdout, out.stderr[-2000:]
