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
    "colloc_kn_condprob",
    # documents-only
    "dedup_exact", "dedup_fingerprint", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_components",
    "dedup_keep_one", "text_quality", "text_lang_id", "text_fingerprint",
    "text_token_count", "text_dup_spans", "text_dup_span_positions",
    "text_dup_span_removal", "text_winnow_fingerprints", "text_containment",
    "text_weighted_sample", "text_group_sample", "text_char_entropy",
    "text_heaps", "text_zipf", "text_repetition", "text_pii_redact",
    "text_pack_sequences", "text_curriculum_buckets", "text_bpe_learn",
    "text_bpe_apply", "pipeline_decontaminate",
    # multimodal plumbing (byte-exact oracles)
    "mm_binary_stats", "mm_frame_sample", "mm_resize", "mm_audio_meta",
    # events-only
    "rel_sessionize", "rel_tumbling_window", "rel_sliding_window",
    "rel_ewma", "rel_cusum", "rel_rolling_slope", "rel_sliding_distinct",
    "rel_gap_fill", "rel_json_extract", "rel_anomaly_zscore",
    "rel_event_transitions", "rel_funnel", "rel_window_range",
    "rel_approx_sketches", "rel_incremental_agg", "stream_session",
    "stream_id_resolve",
    # NULL-identity hazard finds (ts/user_id/event_type dropout)
    "rel_sketch_reagg", "rel_pit_enrich", "rel_scd2",
    # embeddings-only
    "sim_cosine_topk", "dedup_embedding_cosine", "sim_label_centroids",
    "sim_kmeans_step", "sim_embedding_covariance", "sim_pq_rerank",
    "sim_mrl_topk", "sim_ivfpq_topk", "sim_pq_trained_topk",
    "pipeline_embed_ingest",
    # events two-dimensional layout (extreme-magnitude ids, pre-epoch)
    "rel_zorder_layout",
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
    # late-r07 recall audits (same zero-row division class)
    "sim_pq_rerank_recall", "sim_mrl_recall", "sim_ivfpq_recall",
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
    # late-r07: iterative top-1 selection + shortlist-window funnels
    "text_bpe_learn", "sim_pq_rerank", "sim_mrl_topk", "sim_ivfpq_topk",
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


@pytest.mark.fuzz
def test_identity_resolution_restores_totality_on_dup_doc_ids(
        spark, tmp_path):
    """doc_id is the documents PK — a PRECONDITION (found by the r06
    dup-id probe): planting duplicate ids (exact redelivery AND
    re-crawled different text) makes id-keyed pair multiplicities
    engine-dependent in dedup_minhash_lsh / dedup_simhash and the
    cumulative vocabulary order-ambiguous in text_heaps. This test
    pins BOTH halves of the contract: (a) the violation is detected
    (document_id_violations is non-empty and flags the re-crawl
    conflicts), and (b) resolving identity ONCE at ingest
    (resolve_document_identity, the production placement) makes every
    probed documents query total again — Spark and DuckDB agree on
    the resolved corpus, and DuckDB's RESOLVE_DOCUMENTS_SQL twin picks
    the SAME keeper rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ngrams_collocations_hadoop_spark.sources.tables import (
        RESOLVE_DOCUMENTS_SQL,
        document_id_violations,
        resolve_document_identity,
    )

    d = write_fuzz_corpus(101, str(tmp_path))
    t = pq.read_table(f"{d}/documents.parquet")
    pdf = t.to_pandas()
    dup_same = pdf.iloc[[1, 3, 5]].copy()          # exact redelivery
    dup_diff = pdf.iloc[[2, 4]].copy()             # re-crawl conflict
    dup_diff["text"] = (dup_diff["text"].astype(str)
                        + " recrawl extra tokens here")
    # same-text, divergent-METADATA duplicates (a lang-id rerun / a
    # different source tag): without full-row tiebreaks the keeper's
    # metadata would be row-order dependent (ADVICE r06)
    dup_meta = pdf.iloc[[6, 7]].copy()
    dup_meta["source"] = "recrawl"
    dup_meta["lang"] = ["de", None]
    out = pd.concat([pdf, dup_same, dup_diff, dup_meta],
                    ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False, schema=t.schema),
        f"{d}/documents.parquet")

    # (a) the gate sees the violation, and classifies it
    viol = {r.doc_id: (r.copies, r.distinct_texts)
            for r in document_id_violations(spark, d).collect()}
    assert len(viol) == 7
    assert sum(1 for _, dt in viol.values() if dt > 1) == 2  # re-crawls

    # the r07 identity-TOTALITY campaign: the three documents-side
    # queries the r06 probe measured engine-dependent are now total
    # under duplicate ids WITHOUT resolution — minhash/simhash report
    # per-pair max-Jaccard/min-Hamming over text combinations, heaps
    # tiebreaks its growth curve by content; and the first-class
    # audit query agrees with its oracle ON the violating corpus
    assert not run_fuzz(
        spark, d, ["dedup_minhash_lsh", "dedup_simhash", "text_heaps",
                   "ingest_id_audit"])
    from ngrams_collocations_hadoop_spark.sources.tables import (
        q_ingest_id_audit)
    audit = q_ingest_id_audit(spark, d).collect()[0]
    assert (audit.doc_dup_ids, audit.doc_conflict_ids,
            audit.vec_dup_ids) == (7, 2, 0)

    # the composed ingest pipeline carries its OWN stage-0 identity
    # gate (VERDICT r06 #3): cross-engine green on the UNRESOLVED
    # dup-id corpus (both engines resolve identically in-DAG) ...
    assert not run_fuzz(spark, d, ["pipeline_ingest"])

    # ... while the id-keyed precondition family FAILS LOUD in-query
    # (r08, VERDICT r07 #5): the require_unique_ids gate raises the
    # pinned error instead of returning engine-dependent rows
    from ngrams_collocations_hadoop_spark.registry import (
        QUERIES as _Q)
    with pytest.raises(Exception, match="PK precondition"):
        _Q["dedup_components_lsh"](spark, d).collect()
    with pytest.raises(Exception, match="PK precondition"):
        _Q["dedup_cdc_chunks"](spark, d).collect()
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    pre_pipeline = {tuple(r) for r in
                    QUERIES["pipeline_ingest"](spark, d).collect()}

    # (b) resolve once at ingest -> every probed query total again
    resolved = resolve_document_identity(
        spark.read.parquet(f"{d}/documents.parquet"))
    # FULL-ROW keeper parity with the DuckDB twin (not just
    # (doc_id, text)): divergent keeper metadata feeds downstream
    # lang/source groupings, so it must be rule-determined too
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    duck_keep = con.execute(
        f"SELECT doc_id, coalesce(text, ''), coalesce(lang, '<null>'), "
        f"coalesce(source, '<null>'), coalesce(n_chars, -1) "
        f"FROM ({RESOLVE_DOCUMENTS_SQL})").fetchall()
    con.close()
    spark_keep = [
        (r.doc_id,
         r.text if r.text is not None else "",
         r.lang if r.lang is not None else "<null>",
         r.source if r.source is not None else "<null>",
         r.n_chars if r.n_chars is not None else -1)
        for r in resolved.collect()]
    assert sorted(spark_keep) == sorted(duck_keep)

    # preserve the original arrow schema: a bare pandas round-trip
    # would promote nullable int64 columns (n_chars) to float64
    pq.write_table(
        pa.Table.from_pandas(resolved.toPandas(), preserve_index=False,
                             schema=t.schema),
        f"{d}/documents.parquet")
    # the pre-resolution probe persisted doc token sets; the rewritten
    # path produces an IDENTICAL logical plan, which the CacheManager
    # would serve from the stale InMemoryRelation
    spark.catalog.clearCache()
    spark.catalog.refreshByPath(f"{d}/documents.parquet")
    probed = [n for n in FUZZ_QUERIES
              if n.startswith(("dedup_", "text_", "colloc_", "mm_"))]
    failures = run_fuzz(spark, d, probed)
    assert not failures, f"post-resolution: {failures}"

    # ... and the pipeline's in-DAG gate picked exactly the keepers
    # the ingest-time resolve did (the gate is idempotent: running it
    # on an already-resolved corpus changes nothing)
    post_pipeline = {tuple(r) for r in
                     QUERIES["pipeline_ingest"](spark, d).collect()}
    assert pre_pipeline == post_pipeline


@pytest.mark.fuzz
def test_identity_resolution_restores_totality_on_dup_vec_ids(
        spark, tmp_path):
    """The embeddings twin of the dup-doc_id contract (r06 probe):
    duplicate vec_ids make hyperplane-LSH ANN emit engine-dependent
    duplicate candidate rows and CRASH the PQ ADC index (dense
    positional codebook ids assume one row per id). Pins: (a) the
    gate detects and classifies the violation, (b) the unresolved
    corpus genuinely breaks, (c) ingest-time resolution
    (resolve_embedding_identity; DuckDB twin picks the same keepers
    via the integer-rendering rule, no float formatting anywhere)
    restores the whole embeddings family."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ngrams_collocations_hadoop_spark.sources.tables import (
        _EMB_KEY_DUCK,
        _EMB_KEY_SPARK,
        RESOLVE_EMBEDDINGS_SQL,
        embedding_id_violations,
        resolve_embedding_identity,
    )

    d = write_fuzz_corpus(101, str(tmp_path))
    t = pq.read_table(f"{d}/embeddings.parquet")
    pdf = t.to_pandas()
    dup_same = pdf.iloc[[1, 3]].copy()             # exact redelivery
    dup_diff = pdf.iloc[[2]].copy()                # re-embedded vector
    dup_diff["embedding"] = dup_diff["embedding"].apply(
        lambda v: [x * 0.5 + 0.01 for x in v])
    out = pd.concat([pdf, dup_same, dup_diff], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, preserve_index=False, schema=t.schema),
        f"{d}/embeddings.parquet")

    viol = {r.vec_id: (r.copies, r.distinct_vectors)
            for r in embedding_id_violations(spark, d).collect()}
    assert len(viol) == 3
    assert sum(1 for _, dv in viol.values() if dv > 1) == 1

    # r07 identity-TOTALITY campaign, embeddings side: hyperplane-LSH
    # ANN is now total without resolution (per-pair max-cosine over
    # vector combinations), and the audit oracle-matches on the
    # violating corpus ...
    assert not run_fuzz(spark, d, ["sim_cosine_topk_lsh",
                                   "ingest_id_audit",
                                   # the embed-ingest pipeline's
                                   # stage-0 resolve makes it green
                                   # on the UNRESOLVED corpus (both
                                   # engines resolve in-DAG, r08)
                                   "pipeline_embed_ingest"])
    from ngrams_collocations_hadoop_spark.sources.tables import (
        q_ingest_id_audit)
    audit = q_ingest_id_audit(spark, d).collect()[0]
    assert (audit.vec_dup_ids, audit.vec_conflict_ids,
            audit.doc_dup_ids) == (3, 1, 0)
    # ... and the PQ ADC index — positional, NOT totalizable — now
    # raises its pinned precondition error instead of an out-of-bounds
    # crash
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    with pytest.raises(Exception, match="PK precondition"):
        QUERIES["sim_pq_topk"](spark, d).collect()
    # ... and every composer of the shared PQ encoder inherits the
    # same loud gate (late-r07: the rerank funnel and IVF-PQ;
    # r08: the trained-codebook variant)
    with pytest.raises(Exception, match="PK precondition"):
        QUERIES["sim_ivfpq_topk"](spark, d).collect()
    with pytest.raises(Exception, match="PK precondition"):
        QUERIES["sim_pq_trained_topk"](spark, d).collect()

    resolved = resolve_embedding_identity(
        spark.read.parquet(f"{d}/embeddings.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    duck_keep = con.execute(
        f"SELECT vec_id, {_EMB_KEY_DUCK} "
        f"FROM ({RESOLVE_EMBEDDINGS_SQL})").fetchall()
    con.close()
    spark_keep = [
        (r.vec_id, r.k) for r in resolved.selectExpr(
            "vec_id", f"{_EMB_KEY_SPARK} AS k").collect()]
    assert sorted(spark_keep) == sorted(
        (v, list(k)) for v, k in duck_keep)

    pq.write_table(
        pa.Table.from_pandas(resolved.toPandas(), preserve_index=False,
                             schema=t.schema),
        f"{d}/embeddings.parquet")
    spark.catalog.clearCache()
    spark.catalog.refreshByPath(f"{d}/embeddings.parquet")
    probed = ["sim_cosine_topk", "sim_cosine_topk_lsh",
              "sim_cosine_topk_ivf", "sim_cosine_topk_quantized",
              "sim_cosine_topk_filtered", "sim_pq_topk",
              "sim_pq_trained_topk", "pipeline_embed_ingest",
              "sim_label_centroids", "sim_kmeans_step",
              "sim_embedding_covariance", "dedup_embedding_cosine",
              "dedup_semantic", "sim_power_iteration"]
    failures = run_fuzz(spark, d, probed)
    assert not failures, f"post-resolution: {failures}"
