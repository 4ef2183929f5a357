"""The query registry — the driver-facing API surface.

``QUERIES`` maps a query name to a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES`` maps the same name to equivalent DuckDB SQL (omitted for
genuinely non-SQL-expressible operators, which get the driver's weaker
rows-only check). ``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import oracle
from .operators import asof, dedup, interval, multimodal, pipeline, similarity, textstats
from .operators import collocations as co
from .operators import relational as rel
from .operators import merge as mg
from .operators import ngrams as ng
from .operators import skew
from .sources import storage, tables
from .streaming import windows as sw
from . import sql_api

QueryFn = Callable[[SparkSession, str], DataFrame]

# ORDERING POLICY: the driver's correctness harness adjudicates a
# 50-query window from the FRONT of this dict each round, so entries are
# ordered by adjudication need, not by topic:
#   1. queries whose implementation changed this round (need a fresh row);
#   2. queries new this round;
#   3. queries with NO official row in any round, then queries whose
#      newest green row is the OLDEST (refresh rotation) — fill the
#      remaining window slots with these;
#   4. everything else behind the window, oldest evidence first, so the
#      next rotation pulls from the front of the tail.
# r05 window: 4 changed (gap_fill micro-unit sums; weighted-sample
# quantized key; power-iteration overflow rescale; full-outer stream
# join oracle boundary fix) + 2 new (persisted bucketed LSH index,
# deterministic quirk-mode top-k) + the 22 remaining never-adjudicated
# "(2b)" queries from r04's accounting + the 20 stalest r02-green rows
# + the 2 stateful streaming queries (r03; verdict item #7).
# Accounting after r05: NO query remains unadjudicated; behind the
# window sit 23 r02-green rows (the refresh queue head for r06 —
# colloc_topk_sql .. rel_set_ops), then 39 r03-green, then 49
# r04-green. The registry (161) spans >3 windows, so the r06 window
# should be ~23 r02 + the stalest r03 block unless implementations
# change.
# Late-r05 robustness edits (adversarial-corpus fuzz findings, see
# tests/test_registry_fuzz.py and scripts/fuzz_sweep.py): two groups
# of queries changed on hazards that do NOT occur in the fixture
# tables, all strict-verified green at sf0.01 at HEAD (full
# 161/161 sweep + 4-seed full-registry fuzz after the edits):
#   (a) degenerate/extreme-input handling — NULL text/value/payload,
#       malformed JSON, non-ASCII payload bytes, exact session-gap
#       timestamps, sub-audit-size sketch groups, pre-epoch event
#       times (streaming epoch gate), <2-point OLS fits, half-grid
#       median interpolation (fingerprints, cusum, json_extract,
#       weighted_sample, pack/curriculum, mm_*, stream_session and
#       every streaming source, stateful totals, approx_sketches,
#       zipf, heaps, mad_outliers);
#   (b) the order-independent aggregation pass — every
#       float-sum/avg/moment-then-round output now derives from exact
#       quantized integer sums via functions/exact.py (pricing_summary,
#       rollup/cube/pivot, star_join, window_running/range,
#       scalar_subquery, tumbling/sliding/sessionize, unpivot,
#       equidepth, grouping_sets, salted/bucketed/bloom joins,
#       hypertable/range rollups, corr_stats, anomaly_zscore,
#       incremental_agg, bm25, doc_cross_entropy, centroids,
#       kmeans_step, all streaming value sums incl. the stateful
#       operator's integer-micro state);
#   (c) the rational-derive pass (seed-505 find on dsir_weights, then
#       the same class closed by grep): mean/ratio derivations that
#       divide an exact integer sum by a count or power of ten can
#       land EXACTLY on a round-6/round-4 half, where the engines'
#       round() disagree — replaced with the shared floor-half derive
#       (dsir_weights, link_prediction, rolling_slope, merge_upsert's
#       1.1x bump in 1e7-unit integers). Of these only dsir_weights is
#       behind the window;
#   (d) the NULL-identity pass (corpus now plants NULL ts / user_id /
#       event_type / lang): NULL event times hit window()-drops vs
#       NULL-bucket and NULLS FIRST/LAST divergences — gated once at
#       the events scan (sources/tables.py::load_table) and mirrored
#       in every events oracle, so EVERY events query's plan gained
#       one pushed IsNotNull (no behavior change on NULL-free data);
#       plus four semantic finds: the merge sink duplicated NULL-key
#       rows per micro-batch (now <=> anti-join), sketch_reagg's
#       equi-join dropped the NULL-type group (now <=>), pit_enrich's
#       union-merge null-safely matched anonymous events the join
#       oracle says are unmatched (NULL-uid dim rows dropped), and the
#       window_topk rank tiebreak ordered NULL first vs last (NULL
#       type excluded). heaps excludes NULL-lang docs (NULL join keys
#       made cum_voc=0 -> ln(0) error-vs-NULL). Follow-up review finds:
#       dsir_weights' target indicator is eqNullSafe (a token seen only
#       in NULL-lang docs had ct=NULL -> its lr vanished from sums,
#       seed-902), attribution drops NULL-uid clicks (the pit_enrich
#       hazard), kl_drift and snapshot_diff got the remaining
#       rational-derive rewrites, and the fuzz corpus gained 'purchase'
#       so the attribution/range-join follow side is actually
#       exercised. Behind-window: dsir_weights, kl_drift. Seed-906:
#       Spark's FULL OUTER stream-stream join MATCHES two NULL-keyed
#       rows (binary state-key equality) while the inner variant and
#       batch `=` do not — NULL join identities are now gated out of
#       all keyed stream-stream joins AND their oracles' watermark
#       base (wm must be computed over the gated set). Seed-908:
#       round() of a tiny negative gives -0.0 in DuckDB but 0.0 in
#       Spark (BigDecimal drops the sign) — the corr/covar/var family
#       normalizes with `+ 0E0`. Behind-window additions from these:
#       stream_pair_join, rel_corr_stats. Tier-2 probe: NULL/empty/
#       wrong-dim embedding vectors hard-error DuckDB's
#       list_inner_product but NULL-propagate in Spark — the finite-
#       vector gate now also requires a non-NULL 64-component vector
#       (both sides; every embedding query's scan changed, output-
#       invariant on clean data). NULL FK columns in orders/lineitem/
#       customer diverge NOWHERE (planted as regression armor).
#       Case-hazard probe: Java/Spark full-case lower() maps U+0130 ->
#       i+U+0307 and word-final capital sigma -> ς where DuckDB's
#       simple map does not — ORACLE-side-only fix (clean_token_sql
#       duckdb dialect + hebrew_text_sql("duckdb") emulate Java before
#       lower); Spark sides untouched, so no driver row is
#       invalidated. İstanbul/ΘΕΟΣ/ΑΣ now in the fuzz vocabulary,
#       which then caught asof attaching NULL-custkey orders (right-
#       side gate) and a last-digit covar flap (seed-953): round(x,6)
#       of a shared double is engine-divergent at binary 6-decimal
#       boundaries — the corr family + zscore now derive via the
#       magnitude-guarded IEEE floor form (_r6; Spark floor(DOUBLE)
#       returns LONG, so x*1e6 must not exceed it) and pow() was
#       replaced by * (Java vs libm pow is 1-ulp divergent). The same
#       class was then closed package-wide (functions/exact.py::
#       ieee_round / ieee_round_sql): every RATIONAL-valued output
#       that went through round() — jaccard/overlap, recalls,
#       pagerank, clustering coeff, percent_rank/cume_dist,
#       transition probs, shares, retention, EWMA, MAD sigma, quality
#       scores, repetition/contamination/dup/removal fractions,
#       mixture shares, zipf/heaps fits, cosines, covariance, pmi/
#       t_score/chi2, condprob, new_ratio — now derives through the
#       guarded IEEE floor on the shared expression. ln/sqrt-
#       irrational outputs (llr, entropy, tfidf) keep round(): their
#       boundary probability is ~2^-52, and llr is the flagship
#       driver column left byte-stable on purpose.
#   (e) the non-finite-measurement pass (NaN/±Inf/-0.0 planted in
#       events.value): gated to NULL at both scan choke points
#       (load_table + streaming _gate_epoch) with isfinite() mirrors
#       in every value-reading oracle — every events query's scan
#       changed again, output-invariant on finite data; and the
#       EMPTY-corpus campaign (scripts/fuzz_empty.py) fixed 9
#       zero-row divergences: try_divide in the four recall audits
#       (sim_pq/sim_lsh/sim_ivf/dedup_lsh), HAVING count(*)>0 oracle
#       mirrors for rollup/cube/grouping_sets (Spark's Expand emits
#       no rows on empty input), count()-not-sum() in rel_profile,
#       and a data-derived nonempty in dedup_simhash_check. Of these,
#       behind-window: rel_rollup, rel_cube, sim_lsh_recall,
#       sim_ivf_recall, dedup_lsh_recall, dedup_simhash_check,
#       rel_salted_join (oracle-side gate only). Also in (e): the
#       zero-norm embedding gate (an all-zero vector's cosine is 0/0 —
#       ANSI DIVIDE_BY_ZERO vs DuckDB NULL; 8 queries) plus null-safe
#       norm divisions in cosine_expr/centroids/semantic (Catalyst's
#       InferFiltersFromConstraints clones downstream expressions into
#       scan-level filters where CSE evaluates them on PRE-gate rows,
#       so the division itself must be total) — the whole embedding
#       family changed, output-invariant on gated data; behind-window:
#       sim_cosine_topk, sim_cosine_topk_lsh, sim_cosine_topk_ivf,
#       sim_cosine_topk_quantized, sim_cosine_topk_filtered,
#       sim_label_centroids, sim_kmeans_step, sim_embedding_covariance,
#       dedup_embedding_cosine, dedup_semantic; and the JSON magnitude
#       guard (rel_json_extract, in-window via the (3b) refresh).
#   (f) the quantizer-emission change (functions/exact.py::_qterm —
#       the per-row nearest quantizer is now emitted as the IEEE
#       floor(x*unit + 0.5) form instead of round(x*unit), removing
#       Spark's per-row BigDecimal path; measured 3.6x on the
#       quantizing sum): every usum/uavg/uterm/uwin default-grid
#       query changed on BOTH engine texts together, output-invariant
#       on ≤6-decimal data (equivalence + cross-engine + order-
#       independence pinned in tests/test_exact.py); the fn="floor"
#       irrational grids are unchanged. Behind-window changed queries
#       (pricing_summary, rollup/cube/pivot, star_join,
#       window_running, incremental_agg, scalar_subquery, unpivot was
#       in-window, streaming value sums, hypertable/equidepth
#       in-window, kmeans_step, label_centroids...) are almost all
#       already in the group-(b) r06 refresh queue, so the rotation
#       plan is unchanged.
#   (g) the late-r05 review pass (self-review of the round's diff;
#       all strict-verified green + fuzz at HEAD): rel_corr_stats now
#       implements TRUE pairwise deletion (pair-restricted x-moments
#       _sxp/_sxxp/_np; previously _n mixed all value rows into the
#       bivariate stats — semantics wrong on NULL-uid corpora though
#       both engines agreed; pinned against the NATIVE aggregates in
#       test_storage_skew.py); rel_json_extract's avg_k and
#       rel_approx_sketches' exact_p50/p99 left the engine-divergent
#       round(avg())/percentile-interpolation class (exact integer
#       sums; rank-and-interpolate over micro-ints); the streaming
#       epoch gate literal is timezone-anchored; the stateful
#       operator's q_micro matches the _qterm half convention. All
#       streaming oracle texts were hoisted into three shared
#       constants (proven byte-identical before/after). Behind-window
#       changed: rel_corr_stats, rel_approx_sketches (both already in
#       the r06 refresh queue); in-window: rel_json_extract,
#       stream_stateful_totals, every streaming query (gate literal,
#       output-invariant).
#   (h) the sf0.1 strict-sweep campaign (the full registry verified at
#       10x the adjudication scale) found dedup_pagerank hash-flapping
#       6/1538 rows: the per-round float sum(rank/deg) is accumulation-
#       order dependent and per-round rounding does not absorb an
#       ulp-of-boundary sum — invisible at sf0.01. pagerank() now
#       iterates INTEGER micro-rank state with exact per-edge floored
#       contributions (both oracles rewritten identically); re-verified
#       hash-exact at sf0.01 AND sf0.1. Behind-window changed:
#       dedup_pagerank, dedup_pagerank_lsh, stream_dedup (NULL-id gate,
#       contract-invariant) — r06 rotation front with the rest.
#   (i) the dedup.py review pass: connected_components_star's
#       termination test was WRONG (no-target-is-a-child alone does
#       not imply one-parent-per-child; counterexample graph stops a
#       round early, splitting a component — ~0.7% of random graphs;
#       fixtures never triggered it) — fixed + counterexample +
#       30-random-graph equivalence pinned in test_dedup_similarity.
#       Oracle-side only: every embedding oracle's gate now mirrors
#       Spark's three-valued NULL-component drop (list_filter ignores
#       NULL lambda results; hazard planted at embeddings[17]).
#       Plan-only: pagerank/k_core/adamic_adar checkpoint the directed
#       edge list BEFORE the bidirectional union (the LSH edge source
#       computed 2-4x per job otherwise), and dedup_simhash filters
#       hamming before its dedup shuffle. Behind-window changed (Spark
#       side): dedup_components_star, dedup_simhash — r06 front.
# Changed-and-behind-window queries go to the FRONT of the r06
# rotation together with the r02 refresh queue (most of group (b)
# IS that queue, so the rotation plan is unchanged in substance;
# group (e)'s seven join them).
#
# r06 window (this round): 5 changed (llr rounding switched to the
# shared ieee_round floor form on ALL THREE surfaces — DataFrame,
# Spark-SQL flagship, DuckDB oracle — retiring the last hot-path
# BigDecimal round(), VERDICT r05 #4; approx_sketches' exact-pct join
# made null-safe, ADVICE r05) + 1 new (dedup_persisted_lsh_match —
# the lifecycle's match-only job, VERDICT r05 #3) + the full 23-query
# r02 refresh queue (determinism-pass-edited members first) + the 5
# late-r05-changed behind-window queries (pagerank pair, stream_dedup,
# components_star, simhash) + the 16 stalest r03 rows prioritizing
# late-r05-edited ones (stream_pair_join, salted_join, the LSH/recall
# block). Accounting after r06: no query's newest official row older
# than r03; the r07 refresh queue head is the remaining r03 block
# (text_train_test_split .. stream_enrich), then the r04 block led by
# the group-(e) embedding family (sim_cosine_topk et al., which
# changed in late r05 without fresh official rows).
# r07 candidate campaign (from the r06 dup-id probe): doc_id/vec_id
# PK-ness is a tooled PRECONDITION (sources/tables.py::
# resolve_document_identity / resolve_embedding_identity +
# *_id_violations; divergences + post-resolution totality pinned in
# test_registry_fuzz.py). If r07 wants the stronger guarantee —
# id-keyed queries TOTAL under duplicate ids without resolution —
# fold dup-ids into fuzz_corpus.py and align the 5 affected queries'
# multiplicity semantics (minhash_lsh, simhash, heaps, cosine_topk_lsh,
# pq_topk); everything else measured total already.
#
# r07 window (this round): 9 changed — the identity-totality campaign
# (VERDICT r06 #2): minhash max-jaccard / simhash min-hamming /
# cosine-lsh max-cosine TOTAL multiplicity forms (composers keep the
# raw per-row helpers, byte-identical plans; the recall/check
# composers of the three changed surfaces ride along), sim_pq_topk's
# pinned PK-precondition gate (+ its recall composer), text_heaps'
# content tiebreak, and the ingest pipeline's stage-0 identity gate
# (VERDICT r06 #3) — plus 2 new (ingest_id_audit, the identity gate
# as an oracle-checked query; stream_id_resolve, the keeper rule as a
# streaming operator over divergent at-least-once redeliveries; late
# r07 adds 13 more new: the two-stage refinement ANN family —
# sim_pq_rerank + sim_pq_rerank_recall (PQ ADC shortlist -> exact
# re-rank), sim_mrl_topk + sim_mrl_recall (Matryoshka prefix funnel),
# sim_ivfpq_topk + sim_ivfpq_recall (the composed coarse-prune ->
# ADC -> refine serving stack) — rel_zorder_layout, the Morton
# data-layout operator, the tokenizer loop text_bpe_learn +
# text_bpe_apply, pipeline_decontaminate, the train-side
# benchmark-decontamination accounting, colloc_kn_condprob, the
# interpolated Kneser-Ney LM, mm_audio_meta, the codec-free WAV
# header decode, and stream_quality_gate, the quality gate as a
# streaming ingest stage over the documents feed) — then
# the full 17-query r03 refresh queue and the stalest r04 rows led by
# the late-r05-edited embedding family (VERDICT r06 #1;
# stream_merge_sink, mm_resize, and — for the late-r07 additions —
# dedup_fingerprint, dedup_ngram_jaccard, rel_equidepth_histogram,
# text_dup_spans, text_contamination, dedup_exact, dedup_components,
# dedup_keep_one, dedup_incremental_lsh, pipeline_training_prep,
# dedup_communities_lsh, dedup_keep_one_lsh, dedup_components_lsh
# displaced to the tail head by the new queries). All dup-id totality/raise contracts are pinned in
# test_registry_fuzz.py WITHOUT pre-resolution, and the full-registry
# dup-id campaign (scripts/fuzz_dupid.py) measures the remaining
# documented-precondition family. Accounting after r07: no query's
# newest official row older than r04; the r08 refresh queue head is
# the remaining r04 rows (dedup_fingerprint .. colloc_totals), then
# the r05 rows.
#
# r08 window (this round): 14 changed — the fail-loud PK gate
# (require_unique_ids/attach_pk_gate, VERDICT r07 #5) attached to
# every query of the former documented-precondition family (the
# raw-pair LSH composers, the persisted/incremental index lifecycle,
# CDC chunking; fuzz_dupid.py reclassified all 14 to expected-raise,
# seed 7201 at final HEAD (181 queries): 158 green / 23
# expected-raise / 0 documented /
# 0 unexpected) — plus 3 new (pipeline_embed_ingest, the embeddings
# ingest with vec_id resolution as stage 0, VERDICT r07 #7;
# sim_pq_trained_topk + sim_pq_trained_recall, the Lloyd-trained PQ
# codebook variant and its lift audit, VERDICT r07 #6 — measured
# recall@10 0.28 -> 0.38 at sf0.01, 0.22 -> 0.28 at sf0.1, at
# identical serving cost; late-r08 adds a 4th new query,
# dedup_components_incremental — star-contracted incremental cluster
# maintenance for an ingest batch, measured 4 rounds vs 6 full at
# sf0.01) — then the full 31-query r04 refresh queue (the
# r07-refactor-touched text_contamination first) and the stalest r05
# row (rel_gap_fill; text_weighted_sample was displaced to the tail
# head by the 4th new query — new outranks refresh).
# Accounting after r08: no query's newest official row older than
# r05; the r09 refresh queue head is text_weighted_sample, then the
# remaining r05 block (sim_power_iteration .. stream_dedup_bounded),
# then r06.
#
# r09 window (this round): 7 changed — the persisted-LSH pair (the
# trusted ``docs`` override on match_lsh_index, ADVICE r08; plus the
# bench-delta triage subject), the two LSH composers whose token
# cache moved to the bounded _tokens_persisted live list (VERDICT
# r08 #7; caching-only, output-invariant — the REST of the
# _minhash_lsh_pair_rows family is r07/r08-green and stays behind
# the window with the same output-invariance), the incremental
# components query (same cache path), and the trained-PQ pair
# (_PQ_TRAIN_LIVE switched to semantics-deduped bounded tracking +
# the sample parameter threaded through _pq_trained_codebook) —
# plus 3 new (dedup_components_update, the persisted-components
# lifecycle's amortized per-ingest UPDATE job, VERDICT r08 #3;
# sim_pq_sampled_topk, the production fixed-budget sampled Lloyd
# training, VERDICT r08 #4 — at fixture scale the corpus is under
# the 1e5 budget so it equals sim_pq_trained_topk, pinned in pytest
# AND by its own unrolled-CTE oracle; sim_pq_persisted_topk, the
# persisted PQ-codes index lifecycle — encode once per refresh,
# serve from the materialized table, the ANN sibling of the
# persisted LSH index) — then the FULL 40-query
# r05 refresh queue (text_weighted_sample first, then
# sim_power_iteration .. stream_dedup_bounded); colloc_scored was
# displaced to the tail head (new outranks refresh).
# Accounting after r09: no query's newest official row older than
# r06; the r10 refresh queue head is colloc_scored (the r09 verdict
# noted this comment and the tail order disagreed — the TAIL order
# wins, matching the displaced-to-tail-head bookkeeping), then the
# remaining r06 block, then r07.
#
# r10 window (this round): 10 changed — the persisted PQ index now
# stores the PRODUCTION sampled-Lloyd codebook (VERDICT r09 #2:
# sim_pq_persisted_topk's oracle switched to the sampled CTE chain;
# serve now delivers the trained +0.10/+0.06 recall@10 lift from the
# stored table) and gained the trusted ``emb`` serve-gate override
# (VERDICT r09 #5); every cross-invocation plan cache moved to the
# state-keyed bounded TrackedCache (ADVICE r09 — plans/cache.py;
# output-invariant for dedup_persisted_lsh/_match, dedup_minhash_lsh,
# dedup_incremental_lsh, dedup_components_incremental and the
# trained/sampled PQ chains); dedup_components_update kept its PK
# gate under path-only state keying (post-r09-adjudication commit) —
# plus 3 new (sim_pq_persisted_recall, the trained lift measured
# THROUGH the stored index; stream_lsh_ingest, the quality-gated
# document stream appending to the persisted band index per
# micro-batch via foreachBatch with checkpoint/restart parity pinned,
# VERDICT r09 #6; stream_components_maintain, the second half of the
# composition — per-tick index append + tick-only match + components
# refresh write-back, same oracle as the batch amortized update) —
# then 37 of the 41-query r06 refresh queue (flagship colloc family
# first, colloc_scored at the head).
# Accounting after r10: no query's newest official row older than
# r07; the r11 refresh queue head is the 4 displaced r06 rows
# (rel_bucketed_join, text_quality, text_lang_id, text_fingerprint),
# then the r07 block (dedup_embedding_cosine .. stream_quality_gate).
QUERIES: dict[str, QueryFn] = {
    # --- (1) implementation changed this round (r10: the persisted
    #     PQ index now stores the production sampled-Lloyd codebook
    #     (oracle switched to the sampled CTE chain) + the trusted
    #     emb override on its serve gate; every tracked plan cache
    #     moved to the state-keyed TrackedCache (ADVICE r09 —
    #     output-invariant for the LSH composers, the incremental
    #     components query, and the trained/sampled PQ chains); the
    #     components update kept its PK gate under path-only keying
    #     (post-r09-adjudication commit a805fba) ---
    "sim_pq_persisted_topk": similarity.q_pq_persisted_topk,
    "sim_pq_sampled_topk": similarity.q_pq_sampled_topk,
    "sim_pq_trained_topk": similarity.q_pq_trained_topk,
    "sim_pq_trained_recall": similarity.q_sim_pq_trained_recall,
    "dedup_persisted_lsh": dedup.q_dedup_persisted_lsh,
    "dedup_persisted_lsh_match": dedup.q_dedup_persisted_lsh_match,
    "dedup_minhash_lsh": dedup.q_dedup_minhash_lsh,
    "dedup_incremental_lsh": dedup.q_dedup_incremental_lsh,
    "dedup_components_incremental": dedup.q_dedup_components_incremental,
    "dedup_components_update": dedup.q_dedup_components_update,
    # --- (2) new this round: the persisted-PQ recall audit (the
    #     trained lift measured THROUGH the stored index, VERDICT
    #     r09 #2) and the streaming-ingest-maintains-the-LSH-index
    #     composition (foreachBatch appends + match over the
    #     maintained index, VERDICT r09 #6) ---
    "sim_pq_persisted_recall": similarity.q_sim_pq_persisted_recall,
    "stream_lsh_ingest": sw.q_stream_lsh_ingest,
    "stream_components_maintain": sw.q_stream_components_maintain,
    # --- (3) the r06-stale refresh queue (VERDICT r09 #1: the
    #     flagship colloc family first — colloc_scored heads it,
    #     resolving the r09 queue-head nit in favor of the tail
    #     order — then the core relational block and the remaining
    #     r06 rows; 37 of the 41 fit, the last 4 displaced to the
    #     tail head) ---
    "colloc_scored": co.q_scored,
    "colloc_topk": co.q_topk,
    "colloc_hebrew_topk": co.q_hebrew_topk,
    "colloc_topk_quirk": co.q_topk_quirk,
    "rel_approx_sketches": rel.q_approx_sketches,
    "rel_star_join": rel.q_star_join,
    "rel_corr_stats": rel.q_corr_stats,
    "rel_rollup": rel.q_rollup,
    "rel_cube": rel.q_cube,
    "rel_pivot": rel.q_pivot,
    "rel_window_running": rel.q_window_running,
    "rel_pricing_summary": rel.q_pricing_summary,
    "colloc_topk_sql": sql_api.sql_flagship,
    "colloc_assoc": ng.q_assoc_scores,
    "colloc_pmi_topk": ng.q_pmi_topk,
    "colloc_condprob": ng.q_condprob,
    "colloc_doc_cross_entropy": ng.q_doc_cross_entropy,
    "colloc_vocab_growth": ng.q_vocab_growth,
    "ngram_trigram_counts": ng.q_trigram_counts,
    "rel_percentiles": rel.q_percentiles,
    "rel_distinct_agg": rel.q_distinct_agg,
    "rel_semi_join": rel.q_semi_join,
    "rel_anti_join": rel.q_anti_join,
    "rel_outer_join": rel.q_outer_join,
    "rel_topk_per_group": rel.q_topk_per_group,
    "rel_global_topn": rel.q_global_topn,
    "rel_window_ranks": rel.q_window_ranks,
    "rel_set_ops": rel.q_set_ops,
    "dedup_pagerank": dedup.q_dedup_pagerank,
    "stream_dedup": sw.q_stream_dedup,
    "dedup_components_star": dedup.q_dedup_components_star,
    "stream_pair_join": sw.q_stream_pair_join,
    "rel_salted_join": skew.q_salted_join,
    "sim_cosine_topk_quantized": similarity.q_cosine_topk_quantized,
    "rel_incremental_agg": rel.q_incremental_agg,
    "dedup_triangles": dedup.q_dedup_triangles,
    "rel_string_agg": rel.q_string_agg,
    # ================= end of the 50-query r10 window =================
    # tail: the 4 displaced r06 rows first (the r11 refresh queue
    # head — rel_bucketed_join, text_quality, text_lang_id,
    # text_fingerprint), then r07-green, r08-green, r09-green —
    # newest official evidence last
    "rel_bucketed_join": storage.q_bucketed_join,
    "text_quality": textstats.q_text_quality,
    "text_lang_id": textstats.q_lang_id,
    "text_fingerprint": textstats.q_fingerprint,
    "pipeline_ingest": pipeline.q_ingest_pipeline,
    "dedup_simhash": dedup.q_dedup_simhash,
    "dedup_simhash_check": dedup.q_dedup_simhash_check,
    "sim_cosine_topk_lsh": similarity.q_cosine_topk_lsh,
    "sim_lsh_recall": similarity.q_sim_lsh_recall,
    "sim_pq_topk": similarity.q_pq_topk,
    "sim_pq_recall": similarity.q_sim_pq_recall,
    "text_heaps": textstats.q_heaps,
    "ingest_id_audit": tables.q_ingest_id_audit,
    "stream_id_resolve": sw.q_stream_id_resolve,
    "sim_pq_rerank": similarity.q_pq_rerank,
    "sim_pq_rerank_recall": similarity.q_sim_pq_rerank_recall,
    "sim_mrl_topk": similarity.q_mrl_topk,
    "sim_mrl_recall": similarity.q_sim_mrl_recall,
    "rel_zorder_layout": rel.q_zorder_layout,
    "text_bpe_learn": textstats.q_bpe_learn,
    "text_bpe_apply": textstats.q_bpe_apply,
    "sim_ivfpq_topk": similarity.q_ivfpq_topk,
    "sim_ivfpq_recall": similarity.q_sim_ivfpq_recall,
    "pipeline_decontaminate": pipeline.q_decontaminate,
    "colloc_kn_condprob": ng.q_kn_condprob,
    "mm_audio_meta": multimodal.q_mm_audio_meta,
    "stream_quality_gate": sw.q_stream_quality_gate,
    "text_train_test_split": textstats.q_train_test_split,
    "text_pii_redact": textstats.q_pii_redact,
    "text_repetition": textstats.q_repetition,
    "text_corpus_stats": textstats.q_corpus_stats,
    "text_tfidf": textstats.q_tfidf,
    "text_stratified_sample": textstats.q_stratified_sample,
    "text_doc_chunks": textstats.q_doc_chunks,
    "text_pack_sequences": textstats.q_pack_sequences,
    "text_mixture_weights": textstats.q_mixture_weights,
    "text_curriculum_buckets": textstats.q_curriculum_buckets,
    "mm_binary_stats": multimodal.q_mm_binary_stats,
    "mm_frame_sample": multimodal.q_mm_frame_sample,
    "mm_image_dims": multimodal.q_mm_image_dims,
    "stream_tumbling": sw.q_stream_tumbling,
    "stream_session": sw.q_stream_session,
    "stream_sliding": sw.q_stream_sliding,
    "stream_enrich": sw.q_stream_enrich,
    "sim_cosine_topk": similarity.q_cosine_topk,
    "sim_cosine_topk_ivf": similarity.q_cosine_topk_ivf,
    "sim_cosine_topk_filtered": similarity.q_cosine_topk_filtered,
    "dedup_embedding_cosine": dedup.q_dedup_embedding_cosine,
    "sim_label_centroids": similarity.q_label_centroids,
    "sim_embedding_covariance": similarity.q_embedding_covariance,
    "sim_kmeans_step": similarity.q_kmeans_step,
    "dedup_semantic": similarity.q_dedup_semantic,
    "sim_ivf_recall": similarity.q_sim_ivf_recall,
    "dedup_components_lsh": dedup.q_dedup_components_lsh,
    "dedup_keep_one_lsh": dedup.q_dedup_keep_one_lsh,
    "dedup_communities_lsh": dedup.q_dedup_communities_lsh,
    "dedup_kcore": dedup.q_dedup_kcore,
    "dedup_clustering_coeff": dedup.q_dedup_clustering_coeff,
    "dedup_pagerank_lsh": dedup.q_dedup_pagerank_lsh,
    "dedup_triangles_lsh": dedup.q_dedup_triangles_lsh,
    "dedup_link_prediction": dedup.q_dedup_link_prediction,
    "dedup_lsh_recall": dedup.q_dedup_lsh_recall,
    "dedup_cdc_chunks": dedup.q_dedup_cdc_chunks,
    "pipeline_training_prep": pipeline.q_training_prep,
    "pipeline_embed_ingest": pipeline.q_embed_ingest,
    "text_contamination": textstats.q_contamination,
    "dedup_components": dedup.q_dedup_components,
    "dedup_keep_one": dedup.q_dedup_keep_one,
    "dedup_exact": dedup.q_dedup_exact,
    "dedup_fingerprint": dedup.q_dedup_fingerprint,
    "dedup_ngram_jaccard": dedup.q_dedup_ngram_jaccard,
    "rel_equidepth_histogram": rel.q_equidepth_histogram,
    "text_dup_spans": textstats.q_dup_spans,
    "mm_resize": multimodal.q_mm_resize,
    "stream_merge_sink": sw.q_stream_merge_sink,
    "text_dup_span_positions": textstats.q_dup_span_positions,
    "text_dup_span_removal": textstats.q_dup_span_removal,
    "text_group_sample": textstats.q_group_sample,
    "text_dsir_weights": textstats.q_dsir_weights,
    "text_shard_assign": textstats.q_shard_assign,
    "text_bpe_pairs": textstats.q_bpe_pairs,
    "rel_mad_outliers": rel.q_mad_outliers,
    "stream_window_topk": sw.q_stream_window_topk,
    "pipeline_export": pipeline.q_export_manifest,
    "rel_grouping_sets": rel.q_grouping_sets,
    "rel_interval_overlap": rel.q_interval_overlap,
    "rel_bloom_prefilter": skew.q_bloom_prefilter,
    "text_zipf": textstats.q_zipf,
    "text_kl_drift": textstats.q_kl_drift,
    "text_winnow_fingerprints": textstats.q_winnow_fingerprints,
    "text_token_positions": textstats.q_token_positions,
    "text_bm25": textstats.q_bm25,
    "text_token_count": textstats.q_token_count,
    "colloc_unigram_counts": co.q_unigram_counts,
    "colloc_bigram_counts": co.q_bigram_counts,
    "colloc_totals": co.q_totals,
    "rel_gap_fill": rel.q_gap_fill,
    "text_weighted_sample": textstats.q_weighted_sample,
    "sim_power_iteration": similarity.q_power_iteration,
    "stream_full_outer_join": sw.q_stream_full_outer_join,
    "rel_ewma": rel.q_ewma,
    "stream_outer_join": sw.q_stream_outer_join,
    "rel_scd2": rel.q_scd2_history,
    "rel_pit_enrich": asof.q_pit_enrich,
    "text_containment": textstats.q_containment,
    "rel_sketch_reagg": rel.q_sketch_reagg,
    "rel_cusum": rel.q_cusum,
    "rel_retention_cohorts": rel.q_retention_cohorts,
    "stream_scd2_enrich": sw.q_stream_scd2_enrich,
    "rel_attribution": asof.q_attribution,
    "text_char_entropy": textstats.q_char_entropy,
    "rel_sliding_distinct": rel.q_sliding_distinct,
    "rel_profile": rel.q_profile,
    "rel_snapshot_diff": rel.q_snapshot_diff,
    "rel_rolling_slope": rel.q_rolling_slope,
    "rel_json_extract": rel.q_json_extract,
    "rel_tumbling_window": rel.q_tumbling_window,
    "rel_sliding_window": rel.q_sliding_window,
    "rel_sessionize": rel.q_sessionize,
    "rel_asof_join": asof.q_asof_events_orders,
    "rel_range_join": interval.q_range_join,
    "rel_hypertable_rollup": interval.q_hypertable_rollup,
    "rel_date_math": rel.q_date_math,
    "rel_string_funcs": rel.q_string_funcs,
    "rel_merge_upsert": mg.q_merge_upsert,
    "rel_scalar_subquery": rel.q_scalar_subquery,
    "rel_global_sort": rel.q_global_sort,
    "rel_window_range": rel.q_window_range,
    "rel_funnel": rel.q_funnel,
    "rel_anomaly_zscore": rel.q_anomaly_zscore,
    "rel_event_transitions": rel.q_event_transitions,
    "rel_key_skew": rel.q_key_skew,
    "rel_fuzzy_match": rel.q_fuzzy_match,
    "rel_unpivot": rel.q_unpivot,
    "rel_window_firstlast": rel.q_window_firstlast,
    "stream_stateful_totals": sw.q_stream_stateful_totals,
    "stream_dedup_bounded": sw.q_stream_dedup_bounded,
}


ORACLES: dict[str, str] = {
    "ingest_id_audit": tables.ORACLE_INGEST_ID_AUDIT,
    "stream_id_resolve": sw.ORACLE_STREAM_ID_RESOLVE,
    "sim_pq_rerank": similarity.ORACLE_PQ_RERANK,
    "sim_pq_rerank_recall": similarity.ORACLE_SIM_PQ_RERANK_RECALL,
    "sim_mrl_topk": similarity.ORACLE_MRL_TOPK,
    "sim_mrl_recall": similarity.ORACLE_SIM_MRL_RECALL,
    "rel_zorder_layout": rel.ORACLE_ZORDER_LAYOUT,
    "text_bpe_learn": textstats.ORACLE_BPE_LEARN,
    "text_bpe_apply": textstats.ORACLE_BPE_APPLY,
    "sim_ivfpq_topk": similarity.ORACLE_IVFPQ_TOPK,
    "sim_ivfpq_recall": similarity.ORACLE_SIM_IVFPQ_RECALL,
    "pipeline_decontaminate": pipeline.ORACLE_DECONTAMINATE,
    "colloc_kn_condprob": oracle.colloc_kn_condprob_sql(),
    "mm_audio_meta": multimodal.ORACLE_MM_AUDIO_META,
    "stream_quality_gate": sw.ORACLE_STREAM_QUALITY_GATE,
    "dedup_persisted_lsh": dedup.ORACLE_DEDUP_PERSISTED_LSH,
    # match-only job: same pair set — the index contents are identical,
    # only WHEN the index shuffle is paid differs (build vs per-query)
    "dedup_persisted_lsh_match": dedup.ORACLE_DEDUP_PERSISTED_LSH,
    "colloc_topk_quirk": oracle.colloc_topk_quirk_sql(),
    "colloc_unigram_counts": oracle.colloc_unigram_counts_sql(),
    "colloc_bigram_counts": oracle.colloc_bigram_counts_sql(),
    "colloc_totals": oracle.colloc_totals_sql(),
    "colloc_scored": oracle.colloc_scored_sql(),
    "colloc_topk": oracle.colloc_topk_sql(),
    "colloc_topk_sql": oracle.colloc_topk_sql(),    # same oracle as colloc_topk
    "colloc_hebrew_topk": oracle.colloc_hebrew_topk_sql(),
    "rel_approx_sketches": rel.ORACLE_APPROX_SKETCHES,
    "colloc_assoc": oracle.colloc_assoc_sql(),
    "colloc_pmi_topk": oracle.colloc_pmi_topk_sql(),
    "colloc_condprob": oracle.colloc_condprob_sql(),
    "colloc_doc_cross_entropy": oracle.colloc_doc_cross_entropy_sql(),
    "colloc_vocab_growth": oracle.vocab_growth_sql(),
    "ngram_trigram_counts": oracle.trigram_counts_sql(),
    "rel_percentiles": rel.ORACLE_PERCENTILES,
    "rel_pricing_summary": rel.ORACLE_PRICING_SUMMARY,
    "rel_distinct_agg": rel.ORACLE_DISTINCT_AGG,
    "rel_rollup": rel.ORACLE_ROLLUP,
    "rel_cube": rel.ORACLE_CUBE,
    "rel_pivot": rel.ORACLE_PIVOT,
    "rel_star_join": rel.ORACLE_STAR_JOIN,
    "rel_semi_join": rel.ORACLE_SEMI_JOIN,
    "rel_anti_join": rel.ORACLE_ANTI_JOIN,
    "rel_outer_join": rel.ORACLE_OUTER_JOIN,
    "rel_topk_per_group": rel.ORACLE_TOPK_PER_GROUP,
    "rel_global_topn": rel.ORACLE_GLOBAL_TOPN,
    "rel_window_running": rel.ORACLE_WINDOW_RUNNING,
    "rel_window_ranks": rel.ORACLE_WINDOW_RANKS,
    "rel_corr_stats": rel.ORACLE_CORR_STATS,
    "rel_set_ops": rel.ORACLE_SET_OPS,
    "rel_json_extract": rel.ORACLE_JSON_EXTRACT,
    "rel_tumbling_window": rel.ORACLE_TUMBLING_WINDOW,
    "rel_sliding_window": rel.ORACLE_SLIDING_WINDOW,
    "rel_sessionize": rel.ORACLE_SESSIONIZE,
    "rel_asof_join": asof.ORACLE_ASOF_EVENTS_ORDERS,
    "rel_range_join": interval.ORACLE_RANGE_JOIN,
    "rel_hypertable_rollup": interval.ORACLE_HYPERTABLE_ROLLUP,
    "rel_date_math": rel.ORACLE_DATE_MATH,
    "rel_string_funcs": rel.ORACLE_STRING_FUNCS,
    "rel_merge_upsert": mg.ORACLE_MERGE_UPSERT,
    "rel_scalar_subquery": rel.ORACLE_SCALAR_SUBQUERY,
    "rel_global_sort": rel.ORACLE_GLOBAL_SORT,
    "rel_window_range": rel.ORACLE_WINDOW_RANGE,
    "rel_funnel": rel.ORACLE_FUNNEL,
    "rel_anomaly_zscore": rel.ORACLE_ANOMALY_ZSCORE,
    "rel_event_transitions": rel.ORACLE_EVENT_TRANSITIONS,
    "rel_key_skew": rel.ORACLE_KEY_SKEW,
    "rel_fuzzy_match": rel.ORACLE_FUZZY_MATCH,
    "rel_unpivot": rel.ORACLE_UNPIVOT,
    "rel_equidepth_histogram": rel.ORACLE_EQUIDEPTH_HISTOGRAM,
    "rel_window_firstlast": rel.ORACLE_WINDOW_FIRSTLAST,
    "rel_string_agg": rel.ORACLE_STRING_AGG,
    "rel_incremental_agg": rel.ORACLE_INCREMENTAL_AGG,
    "sim_embedding_covariance": similarity.ORACLE_EMBEDDING_COVARIANCE,
    "dedup_triangles": dedup.ORACLE_DEDUP_TRIANGLES,
    "text_contamination": textstats.ORACLE_CONTAMINATION,
    "stream_dedup_bounded": sw.ORACLE_STREAM_DEDUP_BOUNDED,
    "stream_merge_sink": sw.ORACLE_STREAM_MERGE_SINK,
    "text_token_positions": textstats.ORACLE_TOKEN_POSITIONS,
    "text_doc_chunks": textstats.ORACLE_DOC_CHUNKS,
    "text_pack_sequences": textstats.ORACLE_PACK_SEQUENCES,
    "text_mixture_weights": textstats.ORACLE_MIXTURE_WEIGHTS,
    "text_dup_spans": textstats.ORACLE_DUP_SPANS,
    "text_dup_span_positions": textstats.ORACLE_DUP_SPAN_POSITIONS,
    "text_dup_span_removal": textstats.ORACLE_DUP_SPAN_REMOVAL,
    "dedup_incremental_lsh": dedup.ORACLE_DEDUP_INCREMENTAL_LSH,
    "sim_cosine_topk_filtered": similarity.ORACLE_COSINE_TOPK_FILTERED,
    "text_group_sample": textstats.ORACLE_GROUP_SAMPLE,
    "dedup_components_star": dedup.ORACLE_DEDUP_COMPONENTS,
    "sim_ivf_recall": similarity.ORACLE_SIM_IVF_RECALL,
    "pipeline_training_prep": pipeline.ORACLE_TRAINING_PREP,
    "dedup_semantic": similarity.ORACLE_DEDUP_SEMANTIC,
    "text_dsir_weights": textstats.ORACLE_DSIR_WEIGHTS,
    "text_shard_assign": textstats.ORACLE_SHARD_ASSIGN,
    "text_bpe_pairs": textstats.ORACLE_BPE_PAIRS,
    "rel_mad_outliers": rel.ORACLE_MAD_OUTLIERS,
    "stream_window_topk": sw.ORACLE_STREAM_WINDOW_TOPK,
    "dedup_cdc_chunks": dedup.ORACLE_DEDUP_CDC_CHUNKS,
    "dedup_communities_lsh": dedup.ORACLE_DEDUP_COMMUNITIES_LSH,
    "pipeline_export": pipeline.ORACLE_EXPORT_MANIFEST,
    "rel_grouping_sets": rel.ORACLE_GROUPING_SETS,
    "rel_interval_overlap": rel.ORACLE_INTERVAL_OVERLAP,
    "rel_gap_fill": rel.ORACLE_GAP_FILL,
    "rel_bloom_prefilter": skew.ORACLE_BLOOM_PREFILTER,
    "text_zipf": textstats.ORACLE_ZIPF,
    "text_kl_drift": textstats.ORACLE_KL_DRIFT,
    "text_winnow_fingerprints": textstats.ORACLE_WINNOW_FINGERPRINTS,
    "sim_kmeans_step": similarity.ORACLE_KMEANS_STEP,
    "sim_power_iteration": similarity.ORACLE_POWER_ITERATION,
    "rel_ewma": rel.ORACLE_EWMA,
    "dedup_link_prediction": dedup.ORACLE_DEDUP_LINK_PREDICTION,
    "stream_outer_join": sw.ORACLE_STREAM_OUTER_JOIN,
    "rel_scd2": rel.ORACLE_SCD2_HISTORY,
    "dedup_kcore": dedup.ORACLE_DEDUP_KCORE,
    "sim_pq_topk": similarity.ORACLE_PQ_TOPK,
    "sim_pq_recall": similarity.ORACLE_SIM_PQ_RECALL,
    "rel_pit_enrich": asof.ORACLE_PIT_ENRICH,
    "text_containment": textstats.ORACLE_CONTAINMENT,
    "rel_sketch_reagg": rel.ORACLE_SKETCH_REAGG,
    "rel_cusum": rel.ORACLE_CUSUM,
    "text_weighted_sample": textstats.ORACLE_WEIGHTED_SAMPLE,
    "rel_retention_cohorts": rel.ORACLE_RETENTION_COHORTS,
    "stream_scd2_enrich": sw.ORACLE_STREAM_SCD2_ENRICH,
    "rel_attribution": asof.ORACLE_ATTRIBUTION,
    "text_char_entropy": textstats.ORACLE_CHAR_ENTROPY,
    "pipeline_ingest": pipeline.ORACLE_INGEST_PIPELINE,
    "pipeline_embed_ingest": pipeline.ORACLE_EMBED_INGEST,
    "sim_pq_trained_topk": similarity.ORACLE_PQ_TRAINED_TOPK,
    "sim_pq_trained_recall": similarity.ORACLE_SIM_PQ_TRAINED_RECALL,
    "dedup_components_incremental":
        dedup.ORACLE_DEDUP_COMPONENTS_INCREMENTAL,
    "dedup_components_update": dedup.ORACLE_DEDUP_COMPONENTS_UPDATE,
    "sim_pq_sampled_topk": similarity.ORACLE_PQ_SAMPLED_TOPK,
    # the persisted form materializes the codes the in-query SAMPLED
    # form computes (the stored codebook is the production sampled-
    # Lloyd one since r10, VERDICT r09 #2) — value-neutral, hence the
    # shared oracle
    "sim_pq_persisted_topk": similarity.ORACLE_PQ_SAMPLED_TOPK,
    "sim_pq_persisted_recall":
        similarity.ORACLE_SIM_PQ_PERSISTED_RECALL,
    "stream_lsh_ingest": sw.ORACLE_STREAM_LSH_INGEST,
    # same full post-ingest membership as the batch amortized update —
    # N ticks of append+match+refresh ≡ one batch update
    "stream_components_maintain": dedup.ORACLE_DEDUP_COMPONENTS_UPDATE,
    "rel_sliding_distinct": rel.ORACLE_SLIDING_DISTINCT,
    "rel_profile": rel.ORACLE_PROFILE,
    "rel_snapshot_diff": rel.ORACLE_SNAPSHOT_DIFF,
    "dedup_clustering_coeff": dedup.ORACLE_DEDUP_CLUSTERING_COEFF,
    "stream_full_outer_join": sw.ORACLE_STREAM_FULL_OUTER_JOIN,
    "rel_rolling_slope": rel.ORACLE_ROLLING_SLOPE,
    "text_heaps": textstats.ORACLE_HEAPS,
    "text_curriculum_buckets": textstats.ORACLE_CURRICULUM_BUCKETS,
    "dedup_exact": dedup.ORACLE_DEDUP_EXACT,
    "dedup_fingerprint": dedup.ORACLE_DEDUP_FINGERPRINT,
    "dedup_ngram_jaccard": dedup.ORACLE_DEDUP_NGRAM_JACCARD,
    "dedup_embedding_cosine": dedup.ORACLE_DEDUP_EMBEDDING_COSINE,
    "dedup_components": dedup.ORACLE_DEDUP_COMPONENTS,
    "dedup_minhash_lsh": dedup.ORACLE_DEDUP_MINHASH_LSH,
    "dedup_simhash": dedup.ORACLE_DEDUP_SIMHASH,
    "dedup_components_lsh": dedup.ORACLE_DEDUP_COMPONENTS_LSH,
    "dedup_lsh_recall": dedup.ORACLE_DEDUP_LSH_RECALL,
    "dedup_simhash_check": dedup.ORACLE_DEDUP_SIMHASH_CHECK,
    "dedup_keep_one": dedup.ORACLE_DEDUP_KEEP_ONE,
    "dedup_keep_one_lsh": dedup.ORACLE_DEDUP_KEEP_ONE_LSH,
    "dedup_pagerank": dedup.ORACLE_DEDUP_PAGERANK,
    "dedup_pagerank_lsh": dedup.ORACLE_DEDUP_PAGERANK_LSH,
    "dedup_triangles_lsh": dedup.ORACLE_DEDUP_TRIANGLES_LSH,
    "sim_cosine_topk_quantized": similarity.ORACLE_COSINE_TOPK_QUANTIZED,
    "text_tfidf": textstats.ORACLE_TFIDF,
    "text_stratified_sample": textstats.ORACLE_STRATIFIED_SAMPLE,
    "stream_sliding": sw.ORACLE_STREAM_SLIDING,
    "stream_enrich": sw.ORACLE_STREAM_ENRICH,
    "stream_pair_join": sw.ORACLE_STREAM_PAIR_JOIN,
    "rel_salted_join": skew.ORACLE_SALTED_JOIN,
    "rel_bucketed_join": storage.ORACLE_BUCKETED_JOIN,
    "sim_cosine_topk": similarity.ORACLE_COSINE_TOPK,
    "sim_cosine_topk_lsh": similarity.ORACLE_COSINE_TOPK_LSH,
    "sim_lsh_recall": similarity.ORACLE_SIM_LSH_RECALL,
    "sim_cosine_topk_ivf": similarity.ORACLE_COSINE_TOPK_IVF,
    "sim_label_centroids": similarity.ORACLE_LABEL_CENTROIDS,
    "text_bm25": textstats.ORACLE_BM25,
    "text_token_count": textstats.ORACLE_TOKEN_COUNT,
    "text_quality": textstats.ORACLE_TEXT_QUALITY,
    "text_lang_id": textstats.ORACLE_LANG_ID,
    "text_fingerprint": textstats.ORACLE_FINGERPRINT,
    "text_train_test_split": textstats.ORACLE_TRAIN_TEST_SPLIT,
    "text_pii_redact": textstats.ORACLE_PII_REDACT,
    "text_repetition": textstats.ORACLE_REPETITION,
    "text_corpus_stats": textstats.ORACLE_CORPUS_STATS,
    "mm_binary_stats": multimodal.ORACLE_MM_BINARY_STATS,
    "mm_image_dims": multimodal.ORACLE_MM_IMAGE_DIMS,
    "mm_resize": multimodal.ORACLE_MM_RESIZE,
    "mm_frame_sample": multimodal.ORACLE_MM_FRAME_SAMPLE,
    "stream_tumbling": sw.ORACLE_STREAM_TUMBLING,
    "stream_dedup": sw.ORACLE_STREAM_DEDUP,
    "stream_session": sw.ORACLE_STREAM_SESSION,
    "stream_stateful_totals": sw.ORACLE_STREAM_STATEFUL,
}
