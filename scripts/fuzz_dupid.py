#!/usr/bin/env python
"""Full-registry DUP-ID campaign (r07): plant duplicate doc_ids and
vec_ids — exact redelivery AND re-crawl/re-embed conflicts — into an
adversarial fuzz corpus, then strict-compare EVERY registry query
against its DuckDB oracle on the UNRESOLVED corpus.

This measures the identity-totality boundary for the whole registry,
not just the 5 queries the r06 probe flagged:

- queries that are TOTAL under duplicate ids stay green;
- `sim_pq_topk` / `sim_pq_recall` must RAISE their pinned
  PK-precondition error (counted as expected, reported separately);
- anything else that goes red is a NEWLY-DISCOVERED id-keyed
  precondition — a finding, not noise (the corpus is a pure function
  of the seed, so it reproduces exactly).

Usage: python scripts/fuzz_dupid.py [seed ...]    (default: 7201)
Exit 1 on any UNEXPECTED failure.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries that must fail LOUDLY with the pinned "PK precondition"
# error on an unresolved dup-id corpus instead of matching:
#
# - the PQ/ADC family: the positional codebook cannot be totalized —
#   every composer of the PQ encoder inherits the same gate (the
#   shortlist/rerank forms and the IVF-PQ funnel raise the identical
#   pinned error through the shared _pq_parts aggregate);
# - the former DOCUMENTED-precondition family, upgraded r08 (VERDICT
#   r07 #5) to the in-query ``require_unique_ids`` gate: every
#   consumer of the raw per-row LSH pair helper (their shared DuckDB
#   fragment computes GROUP-BY-id union signatures while Spark signs
#   per row — totalizing them would change ~12 adjudicated composed
#   plans for a hazard the ingest gate already closes), the persisted/
#   incremental index lifecycle (the batch split and the index keys
#   are id-keyed), and dedup_cdc_chunks (per-doc chunk windows key on
#   doc_id — two texts under one id interleave by position; a
#   synthetic row id would be partition-order-dependent, i.e. WORSE).
#   Resolution-at-ingest remains the production contract
#   (sources/tables.py::resolve_document_identity); these gates make
#   an ad-hoc run on an unaudited corpus diagnosable.
EXPECT_RAISE = {
    "sim_pq_topk", "sim_pq_recall",
    "sim_pq_rerank", "sim_pq_rerank_recall",
    "sim_ivfpq_topk", "sim_ivfpq_recall",
    # the trained-codebook variant encodes through the same _pq_parts
    # aggregate, so it inherits the identical pinned gate — as does
    # the sampled-training form (r09)
    "sim_pq_trained_topk", "sim_pq_trained_recall",
    "sim_pq_sampled_topk", "sim_pq_persisted_topk",
    "dedup_components_lsh", "dedup_keep_one_lsh",
    "dedup_components_incremental", "dedup_components_update",
    "dedup_communities_lsh", "dedup_incremental_lsh",
    "dedup_persisted_lsh", "dedup_persisted_lsh_match",
    "dedup_kcore", "dedup_clustering_coeff", "dedup_pagerank_lsh",
    "dedup_triangles_lsh", "dedup_link_prediction",
    "dedup_lsh_recall", "dedup_cdc_chunks",
    "pipeline_training_prep",
    # r10: the persisted-recall audit serves through the gated PQ
    # build; both streaming compositions fail loud at their EAGER
    # pre-batch index build, before any stream starts
    "sim_pq_persisted_recall", "stream_lsh_ingest",
    "stream_components_maintain",
}

# Empty since r08: nothing in the registry is allowed to silently
# diverge on a dup-id corpus any more — every id-keyed query either
# totalizes (stays green) or raises the pinned error above. Kept as a
# mechanism: a future operator with a measured, documented boundary
# goes here, and only failures outside BOTH sets are defects.
EXPECT_PRECONDITION: set[str] = set()


def plant_dup_ids(d: str) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{d}/documents.parquet")
    pdf = t.to_pandas()
    dup_same = pdf.iloc[[1, 3, 5]].copy()            # exact redelivery
    dup_diff = pdf.iloc[[2, 4]].copy()               # re-crawl conflict
    dup_diff["text"] = (dup_diff["text"].astype(str)
                        + " recrawl extra tokens here")
    dup_meta = pdf.iloc[[6]].copy()                  # metadata-only dup
    dup_meta["source"] = "recrawl"
    out = pd.concat([pdf, dup_same, dup_diff, dup_meta],
                    ignore_index=True)
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False,
                                        schema=t.schema),
                   f"{d}/documents.parquet")

    t = pq.read_table(f"{d}/embeddings.parquet")
    pdf = t.to_pandas()
    dup_same = pdf.iloc[[1, 3]].copy()               # exact redelivery
    dup_diff = pdf.iloc[[2]].copy()                  # re-embedded vector
    dup_diff["embedding"] = dup_diff["embedding"].apply(
        lambda v: [x * 0.5 + 0.01 for x in v])
    out = pd.concat([pdf, dup_same, dup_diff], ignore_index=True)
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False,
                                        schema=t.schema),
                   f"{d}/embeddings.parquet")


def main() -> None:
    from ngrams_collocations_hadoop_spark.registry import QUERIES
    from ngrams_collocations_hadoop_spark.session import get_spark
    from tests.fuzz_corpus import write_fuzz_corpus
    from tests.test_registry_fuzz import run_fuzz

    seeds = [int(s) for s in sys.argv[1:]] or [7201]
    spark = get_spark(app_name="fuzz_dupid")
    n_unexpected = 0
    for seed in seeds:
        with tempfile.TemporaryDirectory(prefix=f"dupid_{seed}_") as d:
            write_fuzz_corpus(seed, d)
            plant_dup_ids(d)
            failures = run_fuzz(spark, d, list(QUERIES))
        n_pre = 0
        n_raise = 0
        n_seed_unexpected = 0   # per-seed, so the summary line never
        for name, why in failures.items():  # inherits earlier seeds' count
            if name in EXPECT_RAISE and why.startswith("spark error") \
                    and "PK precondition" in why:
                print(f"EXPECTED-RAISE {name}@{seed}", flush=True)
                n_raise += 1
                continue
            if name in EXPECT_PRECONDITION:
                print(f"PRECONDITION {name}@{seed}: {why}", flush=True)
                n_pre += 1
                continue
            print(f"FAIL {name}@{seed}: {why}", flush=True)
            n_seed_unexpected += 1
        n_unexpected += n_seed_unexpected
        ok = len(QUERIES) - len(failures)
        # n_raise counts only PK-matched raises: an EXPECT_RAISE query
        # failing any OTHER way lands in n_unexpected alone, so the
        # categories always partition the failures (review find r08)
        print(f"seed {seed}: {ok} green / {n_raise} "
              f"expected-raise / {n_pre} documented-precondition / "
              f"{n_seed_unexpected} unexpected", flush=True)
    print(f"DONE seeds={len(seeds)} unexpected={n_unexpected}")
    sys.exit(1 if n_unexpected else 0)


if __name__ == "__main__":
    main()
