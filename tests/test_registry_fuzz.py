"""Registry-level differential fuzzing: run Spark queries and their
DuckDB oracles on ADVERSARIAL random mini-corpora and require the same
strict canonical-text equality the driver's correctness gate hashes.

The fixed sf0.01 tables are clean (no empty documents, no duplicate
timestamps at second granularity, no degenerate vectors), so a whole
class of real-corpus hazards never fires there. The generator forces
them deliberately:

- documents: exact-duplicate texts, one-token mutations (near-dup tie
  structure), single-token docs, one-token-repeated docs, EMPTY docs
  (n_chars = 0 — this caught a division-by-zero in the
  Efraimidis-Spirakis weighted sample), tiny shared vocabulary so
  hash/fingerprint collisions and Jaccard ties are dense;
- events: same-user same-timestamp ties, inactivity gaps exactly AT
  and just over the 1800 s sessionize boundary, sub-second offsets,
  values on round-half boundaries (x.5, x.123455), zero and negative
  values, props with a missing key;
- embeddings: exact-duplicate vectors (cosine = 1 ties), near
  duplicates, negated vectors (cosine = -1), tiny-norm vectors.

Every generated corpus is deterministic in the seed (random.Random —
no hypothesis shrinking needed; a failing seed reproduces exactly).
Queries covered: every registry entry that reads only the synthetic
documents/events/embeddings tables and is batch-executable (41).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .util_diff import canon


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

VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "the", "a", "emigre", "x1", "sort", "window"]
LANGS = ["en", "de"]
SOURCES = ["cc", "wiki", "books"]
ETYPES = ["click", "view", "error", "buy"]
EMB_DIM = 64

FUZZ_QUERIES = [
    # documents-only
    "dedup_exact", "dedup_fingerprint", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_components",
    "dedup_keep_one", "text_quality", "text_lang_id", "text_fingerprint",
    "text_token_count", "text_dup_spans", "text_dup_span_positions",
    "text_dup_span_removal", "text_winnow_fingerprints", "text_containment",
    "text_weighted_sample", "text_group_sample", "text_char_entropy",
    "text_heaps", "text_zipf", "text_repetition", "text_pii_redact",
    # events-only
    "rel_sessionize", "rel_tumbling_window", "rel_sliding_window",
    "rel_ewma", "rel_cusum", "rel_rolling_slope", "rel_sliding_distinct",
    "rel_gap_fill", "rel_json_extract", "rel_anomaly_zscore",
    "rel_event_transitions", "rel_funnel", "rel_window_range",
    # embeddings-only
    "sim_cosine_topk", "dedup_embedding_cosine", "sim_label_centroids",
    "sim_kmeans_step", "sim_embedding_covariance",
]


def _gen_documents(rng: random.Random, n: int = 120) -> pa.Table:
    bases = [" ".join(rng.choices(VOCAB, k=rng.randint(3, 30)))
             for _ in range(6)]
    rows = []
    ids = rng.sample(range(0, 100000), n)
    for i in range(n):
        mode = rng.randrange(10)
        if mode < 3:                     # exact duplicate of a base
            text = rng.choice(bases)
        elif mode < 6:                   # near-duplicate: mutate one token
            toks = rng.choice(bases).split(" ")
            toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
            text = " ".join(toks)
        elif mode == 6:                  # single token
            text = rng.choice(VOCAB)
        elif mode == 7:                  # one token repeated
            text = " ".join([rng.choice(VOCAB)] * rng.randint(2, 12))
        elif mode == 8:                  # empty text (degenerate)
            text = ""
        else:                            # random short doc
            text = " ".join(rng.choices(VOCAB, k=rng.randint(1, 12)))
        rows.append((ids[i], text, rng.choice(LANGS), rng.choice(SOURCES),
                     len(text)))
    cols = list(zip(*rows))
    return pa.table({"doc_id": pa.array(cols[0], pa.int64()),
                     "text": pa.array(cols[1], pa.string()),
                     "lang": pa.array(cols[2], pa.string()),
                     "source": pa.array(cols[3], pa.string()),
                     "n_chars": pa.array(cols[4], pa.int64())})


def _gen_events(rng: random.Random, n: int = 200) -> pa.Table:
    base = 1704067200_000000  # 2024-01-01 UTC, microseconds
    rows = []
    users = [0, 1, 2, 7]
    cur = {u: base + rng.randint(0, 3600) * 1000000 for u in users}
    for i in range(n):
        u = rng.choice(users)
        mode = rng.randrange(10)
        if mode < 3:
            step = rng.randint(1, 600)   # in-session
        elif mode == 3:
            step = 1800                  # exactly AT the session gap
        elif mode == 4:
            step = 1801                  # just over it
        elif mode == 5:
            step = 0                     # tie: same user, same ts
        else:
            step = rng.randint(601, 7200)
        cur[u] += step * 1000000
        if rng.randrange(8) == 0:
            cur[u] += rng.randint(1, 999999)  # sub-second offset
        vmode = rng.randrange(8)
        if vmode == 0:
            value = 0.0
        elif vmode == 1:
            value = -rng.randint(1, 50) + 0.5
        elif vmode == 2:
            value = rng.randint(0, 100) + 0.123455  # round-6 boundary
        elif vmode == 3:
            value = rng.randint(0, 100) + 0.5
        else:
            value = round(rng.uniform(-20, 120), 2)
        props = rng.choice(['{"k": %d}' % rng.randint(0, 99), '{}',
                            '{"k": %d}' % rng.randint(0, 99), '{"j": 4}'])
        rows.append((i, cur[u], u, rng.choice(ETYPES), value, props))
    cols = list(zip(*rows))
    return pa.table({"event_id": pa.array(cols[0], pa.int64()),
                     "ts": pa.array(cols[1], pa.timestamp("us")),
                     "user_id": pa.array(cols[2], pa.int64()),
                     "event_type": pa.array(cols[3], pa.string()),
                     "value": pa.array(cols[4], pa.float64()),
                     "props": pa.array(cols[5], pa.string())})


def _gen_embeddings(rng: random.Random, n: int = 80,
                    dim: int = EMB_DIM) -> pa.Table:
    bases = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(5)]
    rows = []
    for i in range(n):
        mode = rng.randrange(10)
        if mode < 3:                     # exact duplicate (cosine = 1)
            v = list(rng.choice(bases))
        elif mode < 6:                   # near duplicate
            v = [x + rng.uniform(-0.01, 0.01) for x in rng.choice(bases)]
        elif mode == 6:                  # negated (cosine = -1)
            v = [-x for x in rng.choice(bases)]
        elif mode == 7:                  # tiny norm
            v = [x * 1e-6 for x in rng.choice(bases)]
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, [float(round(x, 6)) for x in v], rng.randrange(4)))
    cols = list(zip(*rows))
    return pa.table({"vec_id": pa.array(cols[0], pa.int64()),
                     "embedding": pa.array(cols[1], pa.list_(pa.float32())),
                     "label": pa.array(cols[2], pa.int32())})


def write_fuzz_corpus(seed: int, out_dir: str) -> str:
    rng = random.Random(seed)
    pq.write_table(_gen_documents(rng), f"{out_dir}/documents.parquet")
    pq.write_table(_gen_events(rng), f"{out_dir}/events.parquet")
    pq.write_table(_gen_embeddings(rng), f"{out_dir}/embeddings.parquet")
    return out_dir


@pytest.mark.parametrize("seed", [101, 202])
def test_registry_vs_oracle_on_adversarial_corpus(spark, tmp_path, seed):
    from ngrams_collocations_hadoop_spark.registry import ORACLES, QUERIES

    d = write_fuzz_corpus(seed, str(tmp_path))
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    failures: dict[str, str] = {}
    for name in FUZZ_QUERIES:
        try:
            a = QUERIES[name](spark, d).toPandas()
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
    assert not failures, f"seed {seed}: {failures}"
