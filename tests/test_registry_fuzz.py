"""Registry-level differential fuzzing: run Spark queries and their
DuckDB oracles on ADVERSARIAL random mini-corpora (tests/fuzz_corpus.py)
and require the same strict canonical-text equality the driver's
correctness gate hashes.

The fixed sf0.01 tables are clean — no NULL or empty documents, no
duplicate timestamps, no gaps exactly on window boundaries, no
degenerate vectors, no dangling foreign keys — so a whole class of
real-corpus hazards never fires there. This gate caught, among others:
a division-by-zero in the weighted sample (empty doc), the
session_window exact-gap boundary rule, char-vs-byte divergence in the
multimodal oracles on multi-byte UTF-8, NULL-poisoning in CUSUM /
packing / curriculum bucketing, and order-dependent double sums in the
incremental aggregate.

This quick gate runs a representative ~60-query subset on two seeds;
scripts/fuzz_sweep.py runs the FULL registry on arbitrary seeds (the
per-round campaign tool).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from .fuzz_corpus import ALL_TABLES, write_fuzz_corpus
from .util_diff import canon

FUZZ_QUERIES = [
    # collocation family (flagship pipeline)
    "colloc_unigram_counts", "colloc_bigram_counts", "colloc_totals",
    "colloc_scored", "colloc_topk", "colloc_hebrew_topk",
    # documents-only
    "dedup_exact", "dedup_fingerprint", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_components",
    "dedup_keep_one", "text_quality", "text_lang_id", "text_fingerprint",
    "text_token_count", "text_dup_spans", "text_dup_span_positions",
    "text_dup_span_removal", "text_winnow_fingerprints", "text_containment",
    "text_weighted_sample", "text_group_sample", "text_char_entropy",
    "text_heaps", "text_zipf", "text_repetition", "text_pii_redact",
    "text_pack_sequences", "text_curriculum_buckets",
    # multimodal plumbing (byte-exact oracles)
    "mm_binary_stats", "mm_frame_sample", "mm_resize",
    # events-only
    "rel_sessionize", "rel_tumbling_window", "rel_sliding_window",
    "rel_ewma", "rel_cusum", "rel_rolling_slope", "rel_sliding_distinct",
    "rel_gap_fill", "rel_json_extract", "rel_anomaly_zscore",
    "rel_event_transitions", "rel_funnel", "rel_window_range",
    "rel_approx_sketches", "rel_incremental_agg", "stream_session",
    # NULL-identity hazard finds (ts/user_id/event_type dropout)
    "rel_sketch_reagg", "rel_pit_enrich", "rel_scd2",
    # embeddings-only
    "sim_cosine_topk", "dedup_embedding_cosine", "sim_label_centroids",
    "sim_kmeans_step", "sim_embedding_covariance",
    # TPC-H-table representatives (ties, NULL acctbal, dangling FKs)
    "rel_pricing_summary", "rel_star_join", "rel_topk_per_group",
    "rel_window_ranks", "rel_percentiles", "rel_asof_join",
    "rel_merge_upsert", "rel_outer_join",
]


def _canon_text(df: pd.DataFrame) -> pd.DataFrame:
    """Strict text canonicalization. Datetime columns are stringified
    PER COLUMN before the frame-level astype(str): pandas formats
    datetimes per consolidated block, so a whole-seconds column can
    gain or lose a '.000000' suffix depending on a sibling column's
    sub-second values — and the Spark and DuckDB frames consolidate
    differently (found by this fuzz on rel_funnel)."""
    df = canon(df)
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype(str)
    return df.astype(str)


def run_fuzz(spark, corpus_dir: str, names: list[str]) -> dict[str, str]:
    """Run each named query and its oracle on the corpus; return the
    failures (empty = all green)."""
    from ngrams_collocations_hadoop_spark.registry import ORACLES, QUERIES

    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{corpus_dir}/{t}.parquet')")
    failures: dict[str, str] = {}
    for name in names:
        try:
            a = QUERIES[name](spark, corpus_dir).toPandas()
        except Exception as e:  # noqa: BLE001 — aggregate, report all
            failures[name] = f"spark error: {type(e).__name__}: {e}"
            continue
        try:
            b = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            failures[name] = f"oracle error: {type(e).__name__}: {e}"
            continue
        if len(a) != len(b):
            failures[name] = f"rows spark={len(a)} duck={len(b)}"
        elif sorted(a.columns) != sorted(b.columns):
            failures[name] = (f"cols spark={sorted(a.columns)} "
                              f"duck={sorted(b.columns)}")
        elif not _canon_text(a).equals(_canon_text(b)):
            failures[name] = "value mismatch (strict canonical text)"
    con.close()
    return failures


# The queries the EMPTY-corpus campaign (scripts/fuzz_empty.py) caught
# diverging on zero-row input: recall audits (ANSI DIVIDE_BY_ZERO vs
# DuckDB NULL), grouping-set grand totals (Spark's Expand emits no
# rows on empty input), the profile's sum-vs-count NULL, and the
# simhash check's formerly constant `nonempty`. Kept as a fast in-suite
# regression gate; the script sweeps the full registry.
EMPTY_SENSITIVE = [
    "sim_pq_recall", "sim_lsh_recall", "sim_ivf_recall",
    "dedup_lsh_recall", "rel_rollup", "rel_cube", "rel_grouping_sets",
    "rel_profile", "dedup_simhash_check",
]


@pytest.mark.fuzz
def test_registry_on_empty_tables(spark, tmp_path):
    import pyarrow.parquet as pq

    d = write_fuzz_corpus(101, str(tmp_path))
    for t in ("documents", "events", "embeddings", "orders", "lineitem"):
        f = f"{d}/{t}.parquet"
        pq.write_table(pq.read_table(f).slice(0, 0), f)
    failures = run_fuzz(spark, d, EMPTY_SENSITIVE)
    assert not failures, f"empty-corpus: {failures}"


@pytest.mark.fuzz
# 101/202: the standing gate seeds; 3001: a campaign seed from the
# r05 adversarial sweep (NULL identities + non-finite values + case
# hazards), folded in per VERDICT r05 #7 so the campaign's hazard
# classes regress in-suite, not only when the script is re-run.
@pytest.mark.parametrize("seed", [101, 202, 3001])
def test_registry_vs_oracle_on_adversarial_corpus(spark, tmp_path, seed):
    d = write_fuzz_corpus(seed, str(tmp_path))
    failures = run_fuzz(spark, d, FUZZ_QUERIES)
    assert not failures, f"seed {seed}: {failures}"


PARTITION_SENSITIVE = [
    # the queries whose plans most plausibly could leak partition
    # order: window ranks/top-k tiebreaks, percentile interpolation,
    # iterative label propagation, sampling keys, streaming state
    "colloc_topk", "rel_topk_per_group", "rel_window_ranks",
    "rel_percentiles", "rel_equidepth_histogram", "rel_mad_outliers",
    "dedup_components", "dedup_keep_one", "text_weighted_sample",
    "text_group_sample", "rel_sessionize", "stream_tumbling",
    "rel_incremental_agg", "rel_corr_stats",
    # the r05 sf0.1 campaign find: per-round float rank sums were
    # accumulation-order dependent — keep its class pinned here
    "dedup_pagerank",
]


@pytest.mark.fuzz
def test_partition_invariance_on_shuffled_split_corpus(spark, tmp_path):
    """Row order + file split must not change any result: rewrite the
    adversarial corpus shuffled into 8 part files per table and compare
    canonical outputs against the single-file corpus (Spark vs Spark).
    scripts/fuzz_partition.py runs the FULL registry; this quick gate
    covers the most order-sensitive plans."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).
                           resolve().parents[1] / "scripts"))
    from fuzz_partition import canon, shuffle_split

    base = str(tmp_path / "base")
    shuf = str(tmp_path / "shuf")
    import os
    os.makedirs(base), os.makedirs(shuf)
    write_fuzz_corpus(303, base)
    shuffle_split(base, shuf, 303)
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    bad = []
    for name in PARTITION_SENSITIVE:
        a = canon(QUERIES[name](spark, base).toPandas())
        b = canon(QUERIES[name](spark, shuf).toPandas())
        if not a.equals(b):
            bad.append(name)
    assert not bad, f"partition-order dependent: {bad}"
