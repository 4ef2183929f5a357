"""Similarity search over an embedding column (array<float>).

Two paths:
- ``q_cosine_topk`` — brute-force top-k neighbors for a query set:
  broadcast the (small) query side against every candidate, score with
  a codegen'd cosine expression, bounded per-query top-k via
  row_number (WindowGroupLimitExec prunes before the shuffle). Exact;
  cost is |Q|·|N| — the right plan when |Q| is small, at any |N|.
- ``q_cosine_topk_lsh`` — random-hyperplane LSH: candidates share a
  signed-projection bucket with the query in any of L tables, then
  exact re-rank. Sub-linear candidate sets in its operating regime;
  recall is approximate but the ALGORITHM is exactly reproducible in
  SQL (md5-derived literal hyperplanes shared with the oracle), so the
  query is hash-checked end to end and recall@k is itself a checked
  scalar (``q_sim_lsh_recall``).

Hyperplanes are deterministic pseudo-random (md5-derived literal
coefficients), so results are stable across runs, executors, and
engines with no fit/model state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import ieee_round, ieee_round_sql, uavg, uavg_sql

from ..plans.cache import PlanMemo, TrackedCache
from ..sources.tables import load_table
from .dedup import cosine_expr

def load_finite_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings scan with a finite-vector gate: drop vectors with a
    NaN/Inf component. Corrupt model outputs exist in real corpora,
    and they poison every quantizing/moment operator DIVERGENTLY —
    DuckDB's integer CAST of a non-finite value is a hard error while
    Spark's behavior differs per expression. Sanitizing at the scan
    (standard ingest validation) makes every embedding operator total;
    every oracle's embeddings scan mirrors the gate with a
    list_filter-on-isnan/isinf subquery.

    The gate also requires a non-NULL vector of exactly EMB_DIM (64)
    components: a NULL or empty embedding (failed model output) is a
    hard error in DuckDB's list_inner_product but NULL-propagates in
    Spark's aggregate lambdas — and a wrong-dimension vector breaks
    every dot product and the PQ subvector split the same way.

    And a NONZERO component: an all-zero vector has norm 0, so its
    cosine is 0/0 — an ANSI DIVIDE_BY_ZERO stop-the-query error in
    Spark (double division IS ANSI-checked) vs NULL in DuckDB, and
    semantically undefined either way. Denormal-tiny norms are fine
    (the norm is accumulated in DOUBLE), only exact zero is gated.

    A NULL COMPONENT inside the vector is dropped here by three-valued
    logic (the exists() predicate is NULL, never TRUE, so NOT exists
    filters the row); the DuckDB oracles must mirror it EXPLICITLY
    (`x IS NULL` filter) because list_filter discards NULL lambda
    results — without the mirror the oracle keeps the row and
    hard-errors in list_dot_product."""
    return load_table(spark, sf_dir, "embeddings").filter(
        F.expr(FINITE_EMB_COND))


# The gate condition, shared with composed pipelines that apply it to
# a non-scan input (the embed-ingest pipeline gates its RESOLVED
# stage-0 output); the DuckDB twin is the literal every embedding
# oracle below embeds verbatim.
FINITE_EMB_COND = (
    "embedding IS NOT NULL AND size(embedding) = 64 AND "
    "NOT exists(embedding, x -> isnan(x) "
    "OR abs(x) = CAST('Infinity' AS FLOAT)) AND "
    "exists(embedding, x -> x != 0)")
FINITE_EMB_COND_SQL = (
    "embedding IS NOT NULL AND len(embedding) = 64 AND "
    "len(list_filter(embedding, x -> x IS NULL)) = 0 AND "
    "len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND "
    "len(list_filter(embedding, x -> x != 0)) > 0")


TOPK_NEIGHBORS = 10
N_QUERY_VECS = 10   # fixture query set: vec_id < 10
LSH_BITS = 8
EMB_DIM = 64


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id <
    N_QUERY_VECS), excluding self; deterministic tiebreak on vec_id."""
    e = load_finite_embeddings(spark, sf_dir)
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    cand = e.select(F.col("vec_id").alias("cand_id"),
                    F.col("embedding").alias("c_emb"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("q_emb", "c_emb"))
    )
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    ieee_round(F.col("cosine"), 6).alias("cosine"), "rank"))


ORACLE_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(c.v, c.v))) AS cosine
    FROM e q JOIN e c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERY_VECS}),
ranked AS (
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
    FROM scored)
SELECT query_id, cand_id, CASE WHEN abs((cosine)) < 4e9 THEN floor((cosine) * 1e6 + 0.5E0) / 1e6 ELSE (cosine) END AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


# --- metadata-filtered ANN (hybrid search) ------------------------------

FILTER_MIN_CHARS = 400    # candidate gate: documents.n_chars >= this


def q_cosine_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered similarity search ("hybrid search"): exact
    top-k cosine neighbors per query vector, restricted to candidates
    whose DOCUMENT passes a metadata gate (here `n_chars >=
    FILTER_MIN_CHARS` — the quality/store-filter shape every retrieval
    stack needs: filter + vector score in one query).

    Scale shape — the gate applies BEFORE any distance math: the
    documents-side predicate prunes at the parquet scan (pushed
    filter), the id semi-join cuts the candidate embedding stream, and
    only survivors enter the broadcast-Q scoring. Post-filtering a
    plain top-k instead (score, rank, then drop gated rows) would both
    waste |Q|x|corpus| cosine work AND return < k rows per query —
    filter-THEN-rank is the semantics retrieval actually wants, and
    per-query result counts stay exactly k whenever k survivors
    exist."""
    e = load_finite_embeddings(spark, sf_dir)
    keep = (load_table(spark, sf_dir, "documents")
            .filter(F.col("n_chars") >= FILTER_MIN_CHARS)
            .select(F.col("doc_id").alias("cand_id")))
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    cand = (e.select(F.col("vec_id").alias("cand_id"),
                     F.col("embedding").alias("c_emb"))
            .join(keep, on="cand_id", how="left_semi"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("q_emb", "c_emb"))
    )
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    ieee_round(F.col("cosine"), 6).alias("cosine"), "rank"))


ORACLE_COSINE_TOPK_FILTERED = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
keep AS (SELECT doc_id FROM documents
         WHERE n_chars >= {FILTER_MIN_CHARS}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(c.v, c.v))) AS cosine
    FROM e q JOIN e c ON c.vec_id <> q.vec_id
    JOIN keep k ON k.doc_id = c.vec_id
    WHERE q.vec_id < {N_QUERY_VECS}),
ranked AS (
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
    FROM scored)
SELECT query_id, cand_id, CASE WHEN abs((cosine)) < 4e9 THEN floor((cosine) * 1e6 + 0.5E0) / 1e6 ELSE (cosine) END AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


# --- hyperplane LSH ------------------------------------------------------

# Hyperplane coefficients are a data-independent constant matrix,
# generated once in Python from md5 (exact 3-decimal rationals) and
# inlined as literals into BOTH the Spark expression and the oracle
# SQL. That makes the entire approximate algorithm — bucketing,
# candidate join, re-rank — cross-engine reproducible, so the LSH path
# gets a full hash-checked oracle like the IVF path (the earlier
# xxhash64-seeded variant was rows-only purely because DuckDB cannot
# evaluate xxhash64). At scale the matrix would ship as a broadcast /
# generated column exactly the same way.
LSH_TABLES = 2


def _hyp_coeff(t: int, j: int, d: int) -> float:
    import hashlib

    h = hashlib.md5(f"hyp_{t}_{j}_{d}".encode()).hexdigest()[:6]
    return round(int(h, 16) % 1001 / 500.0 - 1.0, 3)


_HYPERPLANES = [[[_hyp_coeff(t, j, d) for d in range(EMB_DIM)]
                 for j in range(LSH_BITS)] for t in range(LSH_TABLES)]


def hyperplane_bucket(emb_col: str, table: int = 0,
                      bits: int = LSH_BITS) -> F.Column:
    """Signed-random-projection bucket id for one hash table: bit j =
    sign(v · h_j). Literal-array hyperplanes → Catalyst constant-folds
    them; the dot product is a codegen'd left-to-right aggregate."""
    terms = []
    for j in range(bits):
        arr = "array(" + ", ".join(f"{v!r}D" for v in
                                   _HYPERPLANES[table][j]) + ")"
        dot = (f"aggregate(zip_with({emb_col}, {arr}, "
               f"(x, h) -> CAST(x AS DOUBLE) * h), 0D, "
               f"(acc, v) -> acc + v)")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j}L ELSE 0L END)")
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH approximate top-k: candidates share a
    bucket with the query in ANY of the LSH_TABLES independent tables
    (the OR-construction — per-pair hit probability 1-(1-p^bits)^L for
    per-hyperplane agreement p), then exact cosine re-rank over the
    deduplicated candidate set.

    Scale shape: per table one equi-join on (table_id, bucket) — the
    explode-over-tables + join is exactly the MinHash band-join plan;
    candidates ≈ L·|corpus|/2^bits per query. The operating regime is
    near-duplicate retrieval (p → 1 ⇒ recall → 1 with strong pruning);
    on an ambient-similarity corpus like this fixture (top-k neighbors
    at cosine 0.24-0.49, p ≈ 0.6) hyperplane LSH provably cannot have
    both recall and pruning — the checked `sim_lsh_recall` query makes
    that number visible instead of hiding it.

    TOTAL under duplicate vec_ids (r07 identity campaign): the
    candidate dedup is a (query_id, cand_id) MAX-cosine aggregate —
    the strongest similarity evidence between the two identities —
    instead of a dropDuplicates that kept whichever colliding row
    (with ITS embeddings) an engine happened to hit first. On a
    PK-satisfying corpus every pair's collisions carry the same two
    vectors, so max is the identity, and the aggregate replaces the
    dropDuplicates exchange one-for-one (no extra shuffle; cosine
    moves before the exchange, where the map-side partial max also
    shrinks it to one row per pair)."""
    e = load_finite_embeddings(spark, sf_dir)
    banded = e.select(
        "vec_id", "embedding",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("table_id"),
                     hyperplane_bucket("embedding", t).alias("bucket"))
            for t in range(LSH_TABLES)])).alias("tb"),
    ).select("vec_id", "embedding", "tb.table_id", "tb.bucket")
    q = (banded.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 "table_id", "bucket"))
    cand = banded.select(F.col("vec_id").alias("cand_id"),
                         F.col("embedding").alias("c_emb"),
                         "table_id", "bucket")
    scored = (cand.join(F.broadcast(q), on=["table_id", "bucket"])
              .filter(F.col("cand_id") != F.col("query_id"))
              .withColumn("cosine", cosine_expr("q_emb", "c_emb"))
              .groupBy("query_id", "cand_id")
              .agg(F.max("cosine").alias("cosine")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    ieee_round(F.col("cosine"), 6).alias("cosine"), "rank"))


def _hyperplanes_values_sql() -> str:
    """(table_id, bit, h DOUBLE[]) VALUES rows for the oracle CTE —
    the same literal matrix the Spark expression folds in."""
    rows = []
    for t in range(LSH_TABLES):
        for j in range(LSH_BITS):
            arr = "[" + ", ".join(repr(v) for v in _HYPERPLANES[t][j]) \
                + "]::DOUBLE[]"
            rows.append(f"({t}, {j}, {arr})")
    return ",\n    ".join(rows)


ORACLE_COSINE_TOPK_LSH = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
hyp(table_id, bit, h) AS (VALUES
    {_hyperplanes_values_sql()}),
buckets AS (
    -- grouped per (vec_id, v) ROW, not per vec_id: Spark's bucket is
    -- a per-row expression, so a duplicate id keeps one bucket per
    -- vector (grouping by vec_id alone would sum the duplicates' bit
    -- indicators into a bucket of neither — the r07 identity
    -- campaign); vectors ride through the join so the cosine is
    -- computed from the COLLIDING vectors, then max-aggregated per
    -- pair exactly as the Spark side does
    SELECT e.vec_id, e.v, hyp.table_id,
           sum(CASE WHEN list_dot_product(e.v, hyp.h) > 0
                    THEN 1::BIGINT << bit ELSE 0 END) AS bucket
    -- DISTINCT before the hyperplane cross join: an EXACT-redelivery
    -- duplicate (same vec_id, same vector) would otherwise land both
    -- copies in one (vec_id, v, table) group and the bit-indicator
    -- sum would double the bucket value (found by the r07 dup-id
    -- campaign, scripts/fuzz_dupid.py seed 7201)
    FROM (SELECT DISTINCT vec_id, v FROM e) e CROSS JOIN hyp
    GROUP BY e.vec_id, e.v, hyp.table_id),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           max(list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(c.v, c.v)))) AS cosine
    FROM buckets q JOIN buckets c
      ON q.table_id = c.table_id AND q.bucket = c.bucket
    WHERE q.vec_id < {N_QUERY_VECS} AND c.vec_id <> q.vec_id
    GROUP BY 1, 2),
ranked AS (
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
    FROM scored)
SELECT query_id, cand_id, CASE WHEN abs((cosine)) < 4e9 THEN floor((cosine) * 1e6 + 0.5E0) / 1e6 ELSE (cosine) END AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


def q_sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checked recall@k of the LSH ANN against the exact brute-force
    top-k: one row (n_exact, n_found, recall). Fully oracle-checkable
    now that both sides are cross-engine deterministic — a silent
    recall collapse (or an accidental recall *change* from retuning
    bits/tables) turns this row red. On this ambient-similarity
    fixture the number is LOW by the math in q_cosine_topk_lsh's
    docstring — the point of checking it is that it is the real
    number."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    found = (q_cosine_topk_lsh(spark, sf_dir)
             .select("query_id", "cand_id").withColumn("_hit", F.lit(1)))
    hits = F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
    return (exact.join(found, on=["query_id", "cand_id"], how="left")
            .agg(F.count(F.lit(1)).alias("n_exact"),
                 hits.alias("n_found"),
                 ieee_round(F.try_divide(hits.cast("double"),
                                         F.count(F.lit(1))), 4)
                 .alias("recall")))


ORACLE_SIM_LSH_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
lsh_side AS ({ORACLE_COSINE_TOPK_LSH})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(l.cand_id) AS BIGINT) AS n_found,
       CASE WHEN abs((count(l.cand_id)::DOUBLE / count(*))) < 4e9 THEN floor((count(l.cand_id)::DOUBLE / count(*)) * 1e4 + 0.5E0) / 1e4 ELSE (count(l.cand_id)::DOUBLE / count(*)) END AS recall
FROM exact_side x
LEFT JOIN lsh_side l
  ON x.query_id = l.query_id AND x.cand_id = l.cand_id
"""


# --- IVF (inverted-file) ANN ---------------------------------------------

# Coarse quantizer: every vector whose vec_id is a multiple of
# CENTROID_STRIDE is a centroid, so the centroid count scales with the
# corpus (10 at sf0.01, 100 at sf0.1) with no fit/model state and full
# cross-engine reproducibility.
CENTROID_STRIDE = 50
NPROBE = 2


def _ivf_cells(spark: SparkSession,
               sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The IVF coarse-quantizer stage, shared by the exact-rerank IVF
    query and the IVF-PQ composition: (index, probes) where index =
    every corpus vector with its nearest-centroid cell and probes =
    each query with its NPROBE nearest cells. Extracted verbatim from
    q_cosine_topk_ivf; that query's plan is unchanged."""
    e = load_finite_embeddings(spark, sf_dir)
    cents = (e.filter(F.col("vec_id") % CENTROID_STRIDE == 0)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("embedding").alias("cent_emb")))
    scored_cells = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .withColumn("ccos", cosine_expr("embedding", "cent_emb"))
        .select("vec_id", "embedding", "cent_id", "ccos"))
    w_cell = (Window.partitionBy("vec_id")
              .orderBy(F.desc("ccos"), F.asc("cent_id")))
    ranked_cells = scored_cells.withColumn(
        "cell_rank", F.row_number().over(w_cell))
    index = (ranked_cells.filter(F.col("cell_rank") == 1)
             .select(F.col("vec_id").alias("cand_id"),
                     F.col("embedding").alias("c_emb"),
                     F.col("cent_id").alias("cell")))
    probes = (ranked_cells.filter((F.col("vec_id") < N_QUERY_VECS)
                                  & (F.col("cell_rank") <= NPROBE))
              .select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("q_emb"),
                      F.col("cent_id").alias("cell")))
    return index, probes


def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its nearest
    centroid cell (argmax cosine, tiebreak min centroid id), probe the
    NPROBE nearest cells per query, exact re-rank within the probed
    cells only.

    Scale shape: assignment is a broadcast of the (small) centroid set
    against the full corpus — one map-side pass; the search is an
    equi-join on cell id, so per-query work is the probed cells' size
    (~NPROBE/n_cells of the corpus), not the corpus. Deterministic
    end-to-end → full SQL oracle, unlike the LSH path."""
    index, probes = _ivf_cells(spark, sf_dir)
    scored = (
        index.join(F.broadcast(probes), on="cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("q_emb", "c_emb")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    ieee_round(F.col("cosine"), 6).alias("cosine"), "rank"))


ORACLE_COSINE_TOPK_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
cents AS (
    SELECT vec_id AS cent_id, v AS cv FROM e
    WHERE vec_id % {CENTROID_STRIDE} = 0),
cell_scored AS (
    SELECT e.vec_id, e.v, c.cent_id,
           list_dot_product(e.v, c.cv)
             / (sqrt(list_dot_product(e.v, e.v))
                * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
    FROM e CROSS JOIN cents c),
ranked_cells AS (
    SELECT vec_id, v, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cent_id ASC) AS cell_rank
    FROM cell_scored),
idx AS (
    SELECT vec_id AS cand_id, v AS cv, cent_id AS cell
    FROM ranked_cells WHERE cell_rank = 1),
probes AS (
    SELECT vec_id AS query_id, v AS qv, cent_id AS cell
    FROM ranked_cells
    WHERE vec_id < {N_QUERY_VECS} AND cell_rank <= {NPROBE}),
scored AS (
    SELECT p.query_id, i.cand_id,
           list_dot_product(p.qv, i.cv)
             / (sqrt(list_dot_product(p.qv, p.qv))
                * sqrt(list_dot_product(i.cv, i.cv))) AS cosine
    FROM idx i JOIN probes p USING (cell)
    WHERE i.cand_id <> p.query_id),
ranked AS (
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
    FROM scored)
SELECT query_id, cand_id, CASE WHEN abs((cosine)) < 4e9 THEN floor((cosine) * 1e6 + 0.5E0) / 1e6 ELSE (cosine) END AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checked recall@k of the IVF ANN against the exact brute-force
    top-k — the IVF twin of ``q_sim_lsh_recall``, so BOTH approximate
    index families carry an honest, driver-adjudicated recall row. An
    accidental NPROBE/centroid retune that collapses recall turns this
    row red instead of silently degrading retrieval."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    found = (q_cosine_topk_ivf(spark, sf_dir)
             .select("query_id", "cand_id").withColumn("_hit", F.lit(1)))
    hits = F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
    return (exact.join(found, on=["query_id", "cand_id"], how="left")
            .agg(F.count(F.lit(1)).alias("n_exact"),
                 hits.alias("n_found"),
                 ieee_round(F.try_divide(hits.cast("double"),
                                         F.count(F.lit(1))), 4)
                 .alias("recall")))


ORACLE_SIM_IVF_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
ivf_side AS ({ORACLE_COSINE_TOPK_IVF})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(i.cand_id) AS BIGINT) AS n_found,
       CASE WHEN abs((count(i.cand_id)::DOUBLE / count(*))) < 4e9 THEN floor((count(i.cand_id)::DOUBLE / count(*)) * 1e4 + 0.5E0) / 1e4 ELSE (count(i.cand_id)::DOUBLE / count(*)) END AS recall
FROM exact_side x
LEFT JOIN ivf_side i
  ON x.query_id = i.query_id AND x.cand_id = i.cand_id
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize every embedding, then aggregate per-label centroids
    of the unit vectors — the shared kernel of k-means iterations,
    class prototypes, and embedding-drift monitoring.

    Scale shape: normalization is a map-side array transform; the
    centroid aggregation explodes to (label, pos, x) and partially
    aggregates before the shuffle, so shuffle volume is bounded by
    labels x dim, not by the corpus.
    """
    e = load_finite_embeddings(spark, sf_dir)
    v = e.select("vec_id", "label",
                 F.col("embedding").cast("array<double>").alias("v"))
    norm = F.sqrt(F.expr("aggregate(v, 0D, (a, x) -> a + x * x)"))
    unit = (v.withColumn("nrm", norm)
            .select("label",
                    F.expr("transform(v, x -> x / nullif(nrm, 0D))").alias("u")))
    return (unit.select("label", F.posexplode("u").alias("pos", "x"))
            .groupBy("label", "pos")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 uavg("x", scale=6, unit="1e12", fn="floor", huge="DECIMAL(38,0)").alias("centroid"))
            .withColumn("pos", F.col("pos").cast("long")))


ORACLE_LABEL_CENTROIDS = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
u AS (
    SELECT label,
           list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
    FROM e),
comp AS (
    SELECT label, CAST(i - 1 AS BIGINT) AS pos, uv[i] AS x
    FROM u, UNNEST(range(1, len(uv) + 1)) AS r(i))
SELECT label, pos,
       CAST(count(*) AS BIGINT) AS n_vecs,
       {uavg_sql("x", scale=6, unit="1e12", fn="floor")} AS centroid
FROM comp GROUP BY label, pos
"""


# --- int8 scalar quantization ANN ----------------------------------------

# Symmetric int8 scalar quantization: q[d] = clamp(round(x*127), ±127).
# The fixture embeddings satisfy |x| < 1; real corpora fit a per-model
# scale the same way. All dot products over quantized vectors are exact
# integer arithmetic (|q·q| ≤ 127²·64 < 2^20, exactly representable in
# double regardless of accumulation order) — which is what makes this
# approximate-ANN path FULLY oracle-checkable, unlike hash-based LSH.
QUANT_SCALE = 127


def quantize_expr(emb_col: str) -> F.Column:
    return F.expr(
        f"transform({emb_col}, x -> CAST(least({QUANT_SCALE}D, "
        f"greatest(-{QUANT_SCALE}D, round(CAST(x AS DOUBLE) "
        f"* {QUANT_SCALE}D))) AS BIGINT))")


def q_cosine_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k cosine neighbors scored on int8-quantized vectors, with
    the float cosine of each returned neighbor alongside (the
    quantization-error audit a production ANN rollout runs).

    Scale story: at 100 TB of embeddings the int8 corpus is 4× smaller
    than float32 — 4× less scan I/O and shuffle for a brute-force or
    IVF pass — and integer dot products vectorize better. The plan
    shape is identical to q_cosine_topk (broadcast query side, codegen
    scoring, WindowGroupLimit top-k); only the scoring representation
    changes. Ranking is by quantized cosine, so the oracle checks the
    *approximation itself*, not just the exact re-rank."""
    e = load_finite_embeddings(spark, sf_dir) \
        .withColumn("qv", quantize_expr("embedding"))

    def inorm(col: str) -> F.Column:
        return F.expr(f"aggregate(zip_with({col}, {col}, "
                      f"(x, y) -> x * y), 0L, (a, v) -> a + v)")

    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("qv").alias("q_q"))
         .withColumn("q_n", inorm("q_q")))
    cand = (e.select(F.col("vec_id").alias("cand_id"),
                     F.col("embedding").alias("c_emb"),
                     F.col("qv").alias("c_q"))
            .withColumn("c_n", inorm("c_q")))
    idot = F.expr("aggregate(zip_with(q_q, c_q, (x, y) -> x * y), "
                  "0L, (a, v) -> a + v)")
    qcos = (idot.cast("double")
            / (F.sqrt(F.col("q_n").cast("double"))
               * F.sqrt(F.col("c_n").cast("double"))))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter((F.col("cand_id") != F.col("query_id"))
                & (F.col("q_n") > 0) & (F.col("c_n") > 0))
        .withColumn("q_cosine", qcos)
        .withColumn("cosine", cosine_expr("q_emb", "c_emb"))
    )
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("q_cosine"), F.asc("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    ieee_round(F.col("q_cosine"), 6).alias("q_cosine"),
                    ieee_round(F.col("cosine"), 6).alias("cosine"), "rank"))


ORACLE_COSINE_TOPK_QUANTIZED = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           list_transform(embedding::DOUBLE[],
               x -> CAST(least({QUANT_SCALE}, greatest(-{QUANT_SCALE},
                    round(x * {QUANT_SCALE}))) AS BIGINT)) AS q
    FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
n AS (
    SELECT vec_id, v, q,
           list_dot_product(q::DOUBLE[], q::DOUBLE[]) AS qn
    FROM e),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
           list_dot_product(a.q::DOUBLE[], b.q::DOUBLE[])
             / (sqrt(a.qn) * sqrt(b.qn)) AS q_cosine,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) AS cosine
    FROM n a JOIN n b ON b.vec_id <> a.vec_id
    WHERE a.vec_id < {N_QUERY_VECS} AND a.qn > 0 AND b.qn > 0),
ranked AS (
    SELECT query_id, cand_id, q_cosine, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY q_cosine DESC, cand_id ASC) AS BIGINT) AS rank
    FROM scored)
SELECT query_id, cand_id, CASE WHEN abs((q_cosine)) < 4e9 THEN floor((q_cosine) * 1e6 + 0.5E0) / 1e6 ELSE (q_cosine) END AS q_cosine,
       CASE WHEN abs((cosine)) < 4e9 THEN floor((cosine) * 1e6 + 0.5E0) / 1e6 ELSE (cosine) END AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


# --- embedding-dimension covariance matrix -------------------------------

def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of the embedding dimensions (the
    input to PCA / whitening / drift monitoring), upper triangle only.

    Shape: double posexplode fans each vector to dim² (i, j, xi·xj)
    terms map-side, then a partial-agg'd groupBy — shuffle volume is
    bounded by partitions × dim², NEVER by corpus size; nothing
    quadratic in rows. (The dim² fan-out is per-vector CPU, the price
    of one-pass covariance; for dim ≫ 100 you'd block the matrix.)

    Determinism: covar_pop is a float accumulation whose order differs
    per engine, so round(…, 6) can land on opposite sides of a rounding
    boundary (the one r03 hash flap). Instead the moment sums S_ij, S_i,
    S_j are accumulated EXACTLY: each term is quantized to integer
    units of 1e-12 via floor(x·1e12) — floor of an IEEE double is
    bit-deterministic in every engine, unlike double→DECIMAL casts whose
    tie-rounding differs (HALF_UP vs half-even; observed on dim 37 of
    the sf0.01 fixture) — and summed as DECIMAL(38,0), which is exact
    and order-independent. The covariance is then derived as ONE fixed
    double expression, identical text in Spark and DuckDB; the trailing
    + 0.0 normalizes IEEE −0.0 to +0.0 on both sides."""
    e = load_finite_embeddings(spark, sf_dir) \
        .select(F.col("embedding").cast("array<double>").alias("v"))
    xi = e.select("v", F.posexplode("v").alias("i", "xi"))
    xij = (xi.select("i", "xi", F.posexplode("v").alias("j", "xj"))
           .filter(F.col("i") <= F.col("j")))
    sc = F.lit(1e12)
    mom = (xij.groupBy("i", "j")
           .agg(F.sum(F.floor(F.col("xi") * F.col("xj") * sc)
                      .cast("decimal(38,0)")).alias("sij"),
                F.sum(F.floor(F.col("xi") * sc)
                      .cast("decimal(38,0)")).alias("si"),
                F.sum(F.floor(F.col("xj") * sc)
                      .cast("decimal(38,0)")).alias("sj"),
                F.count(F.lit(1)).alias("n")))
    cov = ieee_round((F.col("sij").cast("double")
                      - F.col("si").cast("double")
                      * F.col("sj").cast("double") / (F.col("n") * sc))
                     / (F.col("n") * sc), 6)
    return mom.select(F.col("i").cast("long"), F.col("j").cast("long"),
                      cov.alias("cov"))


ORACLE_EMBEDDING_COVARIANCE = """
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
xi AS (
    SELECT v, CAST(i - 1 AS BIGINT) AS i, v[i] AS xi
    FROM e, UNNEST(range(1, len(v) + 1)) AS r(i)),
xij AS (
    SELECT i, xi, CAST(j - 1 AS BIGINT) AS j, v[j] AS xj
    FROM xi, UNNEST(range(1, len(v) + 1)) AS s(j)
    WHERE i <= j - 1),
m AS (
    SELECT i, j,
           sum(CAST(floor(xi * xj * 1e12) AS DECIMAL(38,0))) AS sij,
           sum(CAST(floor(xi * 1e12) AS DECIMAL(38,0))) AS si,
           sum(CAST(floor(xj * 1e12) AS DECIMAL(38,0))) AS sj,
           count(*) AS n
    FROM xij GROUP BY i, j)
SELECT i, j,
       CASE WHEN abs(((CAST(sij AS DOUBLE)
              - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / (n * 1e12))
             / (n * 1e12))) < 4e9 THEN floor(((CAST(sij AS DOUBLE)
              - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / (n * 1e12))
             / (n * 1e12)) * 1e6 + 0.5E0) / 1e6 ELSE ((CAST(sij AS DOUBLE)
              - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / (n * 1e12))
             / (n * 1e12)) END AS cov
FROM m
"""


# --- one k-means EM step (assign + update) ------------------------------

KMEANS_K = 8    # deterministic init: the first K vec_ids seed the centroids


def _kmeans_assign(e: DataFrame) -> DataFrame:
    """Assign every vector to the nearest of K broadcast centroids by
    squared L2 (deterministic min-cid tiebreak), centroids seeded from
    the first K vec_ids. Map-side argmin over the scan — no shuffle;
    shared by the k-means EM step and the SemDeDup pass."""
    cent = (e.filter(F.col("vec_id") < KMEANS_K)
            .select(F.col("vec_id").alias("cid"),
                    F.col("v").alias("cvec")))
    d2 = F.expr(
        "aggregate(zip_with(v, cvec, (x, c) -> (x - c) * (x - c)), "
        "0D, (a, t) -> a + t)")
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (e.crossJoin(F.broadcast(cent))
            .withColumn("d2", d2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cid").alias("cluster_id"), "v"))


def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full k-means iteration over the embedding corpus:
    assignment (nearest of K broadcast centroids by squared L2,
    deterministic min-cid tiebreak) followed by the centroid update
    (per-dimension means in long format), with centroids seeded from
    the first K vectors — the deterministic init that makes an
    iterative-ML step fully oracle-able.

    Scale shape — the canonical distributed k-means plan: centroids
    broadcast (K·dim doubles), assignment is a map-side argmin over the
    scan (no shuffle), and the update explodes to (cluster, pos, x)
    with map-side partial aggregation, so the one shuffle carries
    ≤ parts·K·dim partial sums, independent of corpus size. Iterating
    = re-running with the emitted centroids; each step is this plan.
    Long-format output (cluster_id, pos, centroid_val) — nested arrays
    don't survive result canonicalizers."""
    e = load_finite_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    assigned = _kmeans_assign(e)
    return (assigned.select("cluster_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                 uavg("x", scale=6, unit="1e12", fn="floor", huge="DECIMAL(38,0)").alias("centroid_val"))
            .withColumn("pos", F.col("pos").cast("long")))


ORACLE_KMEANS_STEP = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
cent AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < {KMEANS_K}),
dists AS (
    SELECT e.vec_id, cent.cid, e.v,
           list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - cent.cvec[i]) * (e.v[i] - cent.cvec[i])))
               AS d2
    FROM e CROSS JOIN cent),
assigned AS (
    SELECT vec_id, cid AS cluster_id, v
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
          FROM dists)
    WHERE rn = 1),
comp AS (
    SELECT cluster_id, CAST(i - 1 AS BIGINT) AS pos, v[i] AS x
    FROM assigned, UNNEST(range(1, len(v) + 1)) AS r(i))
SELECT cluster_id, pos,
       CAST(count(*) AS BIGINT) AS n_members,
       {uavg_sql("x", scale=6, unit="1e12", fn="floor")} AS centroid_val
FROM comp GROUP BY cluster_id, pos
"""


# --- SemDeDup: semantic dedup within k-means clusters --------------------

# Within-cluster cosine ≥ threshold marks the higher vec_id a semantic
# duplicate. 0.35 sits at ~q99 of the sf0.01 within-cluster pair cosines,
# so the drop set is small but non-empty — the regime the real pass
# targets (Abbas et al. 2023, "SemDeDup", arXiv:2303.09540).
SEMANTIC_DUP_THRESHOLD = 0.35


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus with
    the deterministic k-means assignment (first-K seed centroids,
    broadcast argmin — zero shuffle), compare pairs ONLY within a
    cluster, and drop every vector that has a lower-id cluster-mate
    with cosine ≥ SEMANTIC_DUP_THRESHOLD. Emits the full keep/drop
    decision per vector — the form a curation pipeline consumes.

    Scale shape — the SemDeDup cost model: assignment is a map-side
    pass over the scan; the pairwise stage is an equi-join on
    cluster_id, so total work is Σ|C|² over clusters, never corpus².
    At 100 TB you raise K so clusters stay ~fixed-size (K ∝ corpus);
    the centroid set stays broadcastable (K·dim floats) far beyond
    that, and an oversized straggler cluster is handled like any skewed
    join key (salt by a secondary hash, verify across salts)."""
    e = load_finite_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    # The assignment feeds three consumers (both pair sides + the final
    # keep join) and Catalyst does not canonicalize them to one reused
    # exchange — materialize it once (executor-local, never driver).
    # Production would persist the cluster-assignment table anyway: it
    # is the shared input of SemDeDup, the centroid update, and cluster
    # analytics. Unit-normalize HERE, once per vector, so the quadratic
    # within-cluster stage pays ONE index-ordered dot fold per pair
    # instead of dot + two norms (measured sf0.1: 4.0 s -> 2.4 s; the
    # oracle normalizes identically, so threshold membership is still
    # cross-engine exact).
    assigned = (_kmeans_assign(e)
                .withColumn("nrm", F.expr(
                    "sqrt(aggregate(v, 0D, (acc, y) -> acc "
                    "+ CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))"))
                .withColumn("u", F.expr("transform(v, x -> x / nullif(nrm, 0D))"))
                .drop("nrm")
                .localCheckpoint())
    a = assigned.select(F.col("vec_id").alias("id_a"), "cluster_id",
                        F.col("u").alias("ua"))
    b = assigned.select(F.col("vec_id").alias("id_b"), "cluster_id",
                        F.col("u").alias("ub"))
    pair_dot = F.expr(
        "aggregate(zip_with(ua, ub, (x, y) -> x * y), "
        "0D, (acc, v) -> acc + v)")
    dup_ids = (a.join(b, on="cluster_id")
               .filter(F.col("id_a") < F.col("id_b"))
               .withColumn("cos", pair_dot)
               .filter(F.col("cos") >= SEMANTIC_DUP_THRESHOLD)
               .select(F.col("id_b").alias("vec_id"))
               .distinct()
               .withColumn("_dup", F.lit(1)))
    return (assigned.join(dup_ids, on="vec_id", how="left")
            .select("vec_id", F.col("cluster_id").cast("long"),
                    F.col("_dup").isNull().alias("keep")))


ORACLE_DEDUP_SEMANTIC = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
cent AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < {KMEANS_K}),
dists AS (
    SELECT e.vec_id, cent.cid, e.v,
           list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - cent.cvec[i]) * (e.v[i] - cent.cvec[i])))
               AS d2
    FROM e CROSS JOIN cent),
assigned AS (
    SELECT vec_id, cid AS cluster_id, v
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
          FROM dists)
    WHERE rn = 1),
unit AS (
    SELECT vec_id, cluster_id,
           list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM assigned),
dups AS (
    SELECT DISTINCT b.vec_id
    FROM unit a
    JOIN unit b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.u, b.u) >= {SEMANTIC_DUP_THRESHOLD})
SELECT s.vec_id, CAST(s.cluster_id AS BIGINT) AS cluster_id,
       d.vec_id IS NULL AS keep
FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
"""


# --- PCA top component via distributed power iteration ------------------

POWER_ITERATIONS = 3   # fixed unrolled rounds; enough to separate the
                       # dominant direction on the fixture spectrum
_PQ = 10 ** 9          # 1e-9 quantization unit for vectors/centering


def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration — the first genuinely ITERATIVE linear-algebra operator
    (PageRank's dense cousin): v ← normalize(C·v) without ever
    materializing the covariance matrix C.

    Scale shape: each round is ONE corpus pass — the current vector v
    (dim longs) is broadcast, every row computes s = ⟨x−μ, v⟩ map-side,
    and (C·v)_d = Σ_rows s·(x−μ)_d comes back through a dim-bounded
    partial-agg shuffle (≤ partitions × dim rows). T rounds = T scans;
    nothing driver-side, no dim² blow-up (contrast
    ``q_embedding_covariance``, which pays dim² to get the whole
    matrix). This is exactly how you'd run it on 100 TB of embeddings.

    Determinism (the iterative-hash problem, same playbook as
    pagerank's per-iteration quantization): every aggregation is over
    EXACT integers — centered coordinates are floor-quantized to 1e-9
    units, the per-row projection s is an integer dot product
    accumulated in DECIMAL(38,0), and the re-normalization divides by
    max(|w|) then by an integer-exact √norm², both as single derived
    float expressions with identical text in Spark and the unrolled
    DuckDB oracle. Floats never accumulate; they are only derived.

    Overflow headroom: the raw projection s is ≲ dim·|cq|·|vi| ≈ 1e20,
    so sum(s·c) would clear DECIMAL(38,0) at ~1e9 rows (Spark nulls,
    DuckDB raises — divergent failure modes). s is therefore floored
    down by 1e10 (one shared-text derived expression — the same
    round-to-nearest DOUBLE in both engines, so the same integer
    everywhere) before the second pass: s·c stays ≤ ~3e19 and the
    corpus sum fits DECIMAL(38,0) to ~4e18 rows. Direction is
    unaffected — w is normalized by max|w| — and s keeps ~33 bits of
    per-row precision, far beyond what 3 iterations resolve."""
    e = load_finite_embeddings(spark, sf_dir) \
        .select(F.col("embedding").cast("array<double>").alias("v"))
    # exact per-dimension mean: integer micro-sums + count
    xi = e.select(F.posexplode("v").alias("pos", "x"))
    msums = (xi.groupBy("pos")
             .agg(F.sum(F.floor(F.col("x") * _PQ).cast("decimal(38,0)"))
                  .alias("smu"),
                  F.count(F.lit(1)).alias("n")))
    mean_row = (msums.groupBy()
                .agg(F.expr("array_sort(collect_list(struct(pos, smu)))")
                     .alias("ms"),
                     F.max("n").alias("n"))
                .select(F.expr(
                    f"transform(ms, s -> CAST(s.smu AS DOUBLE) "
                    f"/ (CAST(n AS DOUBLE) * {_PQ}))").alias("mu")))
    # centered, quantized rows (exact integers from here on)
    cq = (e.crossJoin(F.broadcast(mean_row))
          .select(F.expr(
              f"zip_with(v, mu, (x, m) -> "
              f"CAST(floor((x - m) * {_PQ}) AS BIGINT))").alias("cq")))
    # v0: uniform direction, exactly 1/8 per component (dim = 64)
    vi = spark.range(1).select(F.expr(
        f"array_repeat(CAST({_PQ // 8} AS BIGINT), {EMB_DIM})").alias("vi"))
    for _ in range(POWER_ITERATIONS):
        s = (cq.crossJoin(F.broadcast(vi))
             .select("cq", F.expr(
                 "CAST(floor(CAST(aggregate(zip_with(cq, vi, (c, u) -> "
                 "CAST(c AS DECIMAL(38,0)) * u), "
                 "CAST(0 AS DECIMAL(38,0)), (a, t) -> a + t) AS DOUBLE) "
                 "/ 1e10) AS DECIMAL(38,0))").alias("s")))
        w = (s.select(F.col("s"), F.posexplode("cq").alias("pos", "c"))
             .groupBy("pos")
             .agg(F.sum(F.col("s") * F.col("c")).alias("w")))
        vi = (w.groupBy()
              .agg(F.expr("array_sort(collect_list(struct(pos, w)))")
                   .alias("ws"),
                   F.max(F.abs("w")).alias("m"))
              .select(F.expr(
                  f"transform(ws, s -> CAST(floor(CAST(s.w AS DOUBLE) "
                  f"/ CAST(m AS DOUBLE) * {_PQ}) AS BIGINT))").alias("u"))
              .select(F.expr(
                  "aggregate(u, CAST(0 AS DECIMAL(38,0)), "
                  "(a, t) -> a + CAST(t AS DECIMAL(38,0)) * t)")
                  .alias("norm2"), "u")
              .select(F.expr(
                  f"transform(u, x -> CAST(floor(CAST(x AS DOUBLE) "
                  f"/ sqrt(CAST(norm2 AS DOUBLE)) * {_PQ}) AS BIGINT))")
                  .alias("vi")))
    return (vi.select(F.posexplode("vi").alias("pos", "l"))
            .select(F.col("pos").cast("long"),
                    (F.col("l").cast("double") / _PQ).alias("loading")))


def _power_oracle() -> str:
    """Unrolled power-iteration oracle: one CTE pair (s_t, w_t, v_t)
    per round, integer-exact throughout, HUGEINT where Spark uses
    DECIMAL(38,0)."""
    head = f"""
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
xi AS (
    SELECT CAST(i - 1 AS BIGINT) AS pos, v[i] AS x
    FROM e, UNNEST(range(1, len(v) + 1)) AS r(i)),
msums AS (
    SELECT pos, sum(CAST(floor(x * {_PQ}) AS HUGEINT)) AS smu,
           count(*) AS n
    FROM xi GROUP BY pos),
mean_row AS (
    SELECT list(CAST(smu AS DOUBLE) / (CAST(n AS DOUBLE) * {_PQ})
                ORDER BY pos) AS mu
    FROM msums),
cq AS (
    SELECT list_transform(range(1, len(v) + 1),
        i -> CAST(floor((v[i] - mu[i]) * {_PQ}) AS BIGINT)) AS cq
    FROM e CROSS JOIN mean_row),
v0 AS (SELECT list_transform(range(1, {EMB_DIM} + 1),
        i -> CAST({_PQ // 8} AS BIGINT)) AS vi)"""
    body = ""
    prev = "v0"
    for t in range(POWER_ITERATIONS):
        body += f""",
s{t} AS (
    SELECT cq, CAST(floor(CAST(list_sum(list_transform(
        range(1, len(cq) + 1),
        i -> CAST(cq[i] AS HUGEINT) * vi[i])) AS DOUBLE)
        / 1e10) AS HUGEINT) AS s
    FROM cq CROSS JOIN {prev}),
w{t} AS (
    SELECT CAST(i - 1 AS BIGINT) AS pos,
           sum(s * CAST(cq[i] AS HUGEINT)) AS w
    FROM s{t}, UNNEST(range(1, len(cq) + 1)) AS r(i)
    GROUP BY pos),
u{t} AS (
    SELECT list(CAST(floor(CAST(w AS DOUBLE) / CAST(m AS DOUBLE)
                           * {_PQ}) AS BIGINT) ORDER BY pos) AS u
    FROM w{t} CROSS JOIN (SELECT max(abs(w)) AS m FROM w{t}) mm),
v{t + 1} AS (
    SELECT list_transform(range(1, len(u) + 1),
        i -> CAST(floor(CAST(u[i] AS DOUBLE)
                        / sqrt(CAST(n2 AS DOUBLE)) * {_PQ}) AS BIGINT))
        AS vi
    FROM u{t} CROSS JOIN (
        SELECT list_sum(list_transform(u, x -> CAST(x AS HUGEINT) * x))
               AS n2 FROM u{t}) nn)"""
        prev = f"v{t + 1}"
    tail = f"""
SELECT CAST(i - 1 AS BIGINT) AS pos,
       CAST(vi[i] AS DOUBLE) / {_PQ} AS loading
FROM {prev}, UNNEST(range(1, len(vi) + 1)) AS r(i)"""
    return head + body + tail


ORACLE_POWER_ITERATION = _power_oracle()


# --- product-quantization ANN (ADC scoring over 4-bit codes) ------------

PQ_M = 8         # subspaces (EMB_DIM / PQ_M dims each)
PQ_K = 16        # centroids per subspace -> 4-bit codes
PQ_SUB = EMB_DIM // PQ_M


def _pq_d2_expr(m: int, v: str, cv: str) -> str:
    """Sub-vector squared-L2 for subspace m — identical index-ordered
    fold in Spark; the oracle uses the same index arithmetic."""
    return (f"aggregate(zip_with(slice({v}, {m * PQ_SUB + 1}, {PQ_SUB}), "
            f"slice({cv}, {m * PQ_SUB + 1}, {PQ_SUB}), "
            f"(x, y) -> (x - y) * (x - y)), 0D, (a, t) -> a + t)")


# Recently pinned codebooks — one handle per DISTINCT plan, FIFO
# capped at 3 — bounds pinned storage across repeated PQ queries in
# one session without dropping a cache entry that a still-lazy
# composed query or a warm re-invocation references (the ADVICE r07
# _bpe_chain pattern, semantics-deduped); state-keyed so an in-place
# embeddings rewrite evicts instead of serving stale centroids
# (ADVICE r09; policy in plans/cache.py).
_PQ_CENT_LIVE = TrackedCache(max_live=3)


def _emb_state(sf_dir: str, spark: SparkSession) -> object:
    """The embeddings input's corpus state — the tracked-cache state
    key for every embedding-derived pinned frame."""
    from .dedup import _corpus_stat

    return _corpus_stat(sf_dir, spark, fname="embeddings.parquet")


def _pq_parts(spark: SparkSession, sf_dir: str,
              codebook: DataFrame | None = None
              ) -> tuple[DataFrame, DataFrame]:
    """(codes, qarr): the PQ index — 4-bit code array per corpus
    vector — and the per-query ADC distance table. Shared by the flat
    PQ scorer (``_pq_scored``: codes × every query) and the IVF-PQ
    composition (``q_ivfpq_topk``: codes joined to the probed-cell
    candidate set only). Extracted verbatim from q_pq_topk; its plan
    is unchanged.

    ``codebook`` overrides the one-shot codebook with a caller-built
    (cid INT 0..PQ_K-1, cv ARRAY<DOUBLE> of EMB_DIM) table — the
    trained-codebook variant (``_pq_trained_codebook``) passes its
    Lloyd-refined centroids; everything downstream (encoding, ADC,
    the PK-precondition assert) is identical."""
    codes, qarr, _ = _pq_parts_cent(spark, sf_dir, codebook)
    return codes, qarr


def _pq_parts_cent(spark: SparkSession, sf_dir: str,
                   codebook: DataFrame | None = None
                   ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``_pq_parts`` plus the pinned centroid HANDLE — the extra return
    lets the full-query plan memo (r11) re-pin the codebook on a hit
    exactly as a fresh construction would."""
    e = load_finite_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    # K rows, consumed by encoding AND the query table. Pinned through
    # the tracked cache: semantics-deduped (a naive FIFO release of an
    # "old" same-plan handle would evict the entry every warm
    # re-invocation still reads — measured: the trained-topk bench
    # flip-flopped 1.5 s warm / 8.4 s cold as the release lapped the
    # cap), bounded, and state-keyed on the embeddings input.
    cent = _PQ_CENT_LIVE.get(
        codebook if codebook is not None else _pq_oneshot_codebook(e),
        state=_emb_state(sf_dir, spark))
    codes = _pq_encode(e.crossJoin(F.broadcast(cent)))
    qarr = _pq_query_arr(e, cent)
    return codes, qarr, cent


def _pq_oneshot_codebook(e: DataFrame) -> DataFrame:
    """(cid, cv) one-shot codebook: the first PQ_K FINITE vectors with
    DENSE 0-based ids — the ADC distance table is positional, so
    centroid ids must be 0..K-1 even when the finite-vector gate drops
    low vec_ids (a raw ``vec_id < PQ_K`` seeded a short table and
    out-of-bounds lookups — found by the NaN-vector fuzz). Dense rank
    via a tiny broadcast self-join (K rows), not an unpartitioned
    window. Shared by ``_pq_parts`` (in-query) and ``build_pq_index``
    (which MATERIALIZES it next to the code table)."""
    first_k = (e.orderBy("vec_id").limit(PQ_K)
               .select(F.col("vec_id").alias("cvid"),
                       F.col("v").alias("cv")))
    ids = first_k.select(F.col("cvid").alias("oid"))
    return (first_k.join(F.broadcast(ids), F.col("oid") <= F.col("cvid"))
            .groupBy("cvid")
            .agg(F.first("cv").alias("cv"),
                 (F.count(F.lit(1)) - 1).cast("int").alias("cid"))
            .select("cid", "cv"))


def _pq_encode(pairs: DataFrame) -> DataFrame:
    """(vec_id, codes) from a vectors × broadcast-codebook stream —
    the encode aggregate shared by ``_pq_parts`` (in-query forms),
    ``build_pq_index`` (via _pq_parts), and ``append_pq_index``
    (batch × the STORED codebook).

    vec_id PK PRECONDITION, pinned loudly (r07 identity campaign):
    the ADC index is positional (dense 0-based centroid ids, one
    code row per vec_id), so duplicate ids can't be made total —
    they must be resolved at ingest (resolve_embedding_identity).
    The check rides the encoding aggregate that exists anyway: each
    unique vec_id contributes exactly one cross-join row per
    codebook centroid, so any other count means duplicate id rows
    (or a duplicate inside the first-K codebook slice) and raises a
    diagnosable error instead of the former out-of-bounds crash.
    Zero extra shuffle: count(*) is one more cell in the same
    partial agg."""
    codes = pairs.groupBy("vec_id").agg(
        F.array(*[
            F.expr(f"min(named_struct('d', {_pq_d2_expr(m, 'v', 'cv')}, "
                   f"'c', cid)).c")
            for m in range(PQ_M)]).alias("codes"),
        F.count(F.lit(1)).alias("_nc"))
    return (codes.filter(F.assert_true(
        F.col("_nc") == PQ_K,
        F.concat(F.lit("embeddings.vec_id PK precondition violated "
                       "near vec_id="), F.col("vec_id").cast("string"),
                 F.lit(": duplicate id rows (or a duplicate inside the"
                       " PQ codebook slice); resolve identities at "
                       "ingest with resolve_embedding_identity"))
        ).isNull()).drop("_nc"))


def _pq_query_arr(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(query_id, dt) per-query ADC distance table from a (cid, cv)
    codebook — tiny (|Q| rows, PQ_M·PQ_K doubles each), built against
    the broadcast codebook. Shared by ``_pq_parts`` and the persisted
    serve (which reads the STORED codebook instead of re-deriving
    it)."""
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv")))
    qtab = (q.crossJoin(F.broadcast(cent))
            .select("query_id", "cid", F.expr(
                f"transform(sequence(0, {PQ_M - 1}), m -> "
                f"aggregate(zip_with(slice(qv, m * {PQ_SUB} + 1, {PQ_SUB}), "
                f"slice(cv, m * {PQ_SUB} + 1, {PQ_SUB}), "
                f"(x, y) -> x * y), 0D, (a, t) -> a + t))").alias("dots")))
    return (qtab.groupBy("query_id")
            .agg(F.expr("transform(array_sort(collect_list("
                        "struct(cid, dots))), s -> s.dots)").alias("dt")))


# ADC score: PQ_M table lookups into the query's distance table —
# shared by the flat scorer and the IVF-PQ composition.
_PQ_ADC_EXPR = (f"aggregate(sequence(1, {PQ_M}), 0D, (acc, m) -> "
                f"acc + element_at(element_at(dt, "
                f"CAST(element_at(codes, m) AS INT) + 1), m))")


def _pq_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC-scored (query_id, vec_id, approx) candidate stream — the
    shared stage of ``q_pq_topk`` (rank straight to top-k) and
    ``q_pq_rerank`` (shortlist PQ_RERANK_C, then exact re-rank)."""
    codes, qarr = _pq_parts(spark, sf_dir)
    return (codes.crossJoin(F.broadcast(qarr))
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("approx", F.expr(_PQ_ADC_EXPR)))


# Full-query plan memo for the PQ ANN family (r11, VERDICT r10 #2 —
# the _PQ_CB_MEMO recipe extended from the Lloyd chain to the whole
# declared query): every q_pq_*_topk / q_pq_rerank plan is a pure
# function of (sf_dir, embeddings corpus state) — no eager
# materialization, no catalog reads — yet each invocation rebuilt
# ~0.4-0.6 s of _pq_parts + rank-window Column trees plus one eager
# parquet footer read (load_finite_embeddings). Guards/bounds/repin
# discipline centralized in plans.cache.PlanMemo.
_PQ_QUERY_MEMO = PlanMemo(max_entries=8)


def _pq_adc_topk_plan(spark: SparkSession, sf_dir: str,
                      cb_fn=None):
    """(df, repin) — the full ADC top-k plan (encode → cross-join the
    broadcast query distance tables → filter self → WindowGroupLimit
    top-k), over the one-shot codebook (``cb_fn=None``) or a trained
    one (``cb_fn()`` builds it — a ``_pq_trained_codebook`` call whose
    own memo makes the re-invocation in ``repin`` a pure
    re-pin-and-return). Bodies extracted verbatim from
    q_pq_topk / q_pq_trained_topk / q_pq_sampled_topk; plans
    unchanged."""
    cb = cb_fn() if cb_fn is not None else None
    codes, qarr, cent = _pq_parts_cent(spark, sf_dir, cb)
    st = _emb_state(sf_dir, spark)

    def repin() -> None:
        if cb_fn is not None:
            cb_fn()   # inner memo hit: re-pins the Lloyd round handles
        _PQ_CENT_LIVE.get(cent, state=st)

    scored = (codes.crossJoin(F.broadcast(qarr))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("approx", F.expr(_PQ_ADC_EXPR)))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("approx"), F.asc("vec_id")))
    df = (scored.withColumn("rank", F.row_number().over(w).cast("long"))
          .filter(F.col("rank") <= TOPK_NEIGHBORS)
          .select("query_id", F.col("vec_id").alias("cand_id"),
                  ieee_round(F.col("approx"), 6).alias("approx_dot"),
                  "rank"))
    return df, repin


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: compress every vector to PQ_M 4-bit
    codes (argmin sub-vector centroid per subspace), score queries by
    asymmetric distance computation — the query's exact dot with each
    sub-centroid is precomputed once (PQ_M·PQ_K values per query) and
    the per-candidate score is just PQ_M table lookups. The index that
    makes billion-scale ANN fit in RAM: 4 bytes/vector here vs 256
    (the completion of the family: brute → LSH → IVF → int8 → PQ).

    Codebooks are one-shot (sub-vectors of the first PQ_K vec_ids —
    the deterministic-init idiom from k-means/SemDeDup; production
    would train them with q_kmeans_step per subspace). Scale shape:
    encoding is ONE groupBy over the corpus×PQ_K broadcast cross join
    with min_by-style partial aggregation (map-side combine cuts the
    shuffle to |corpus| rows); scoring joins the tiny
    query-distance-table broadcast against codes and never touches raw
    vectors; ranking is WindowGroupLimit top-k. Determinism: argmin is
    min(named_struct(d2, cid)) — lexicographic, exact tiebreak — and
    every float fold has fixed index order shared with the oracle.

    The constructed plan is memoized per (sf_dir, corpus state) —
    plan-identical, see ``_PQ_QUERY_MEMO``."""
    return _PQ_QUERY_MEMO.get(
        ("topk", sf_dir), spark, _emb_state(sf_dir, spark),
        lambda: _pq_adc_topk_plan(spark, sf_dir))


# --- persisted PQ-codes index (encode once, serve per ingest) -----------

PQ_INDEX_TABLE = "ncs_pq_codes"   # suffixed per embeddings-corpus state

# Codebook-construction scheme tag, folded into the state hash: the
# stored codes are only meaningful WITH the codebook scheme that
# produced them, so changing the scheme (r10: one-shot → sampled-Lloyd,
# VERDICT r09 #2) must re-key the table name — an existing warehouse's
# one-shot codes would otherwise satisfy build-if-absent and serve a
# ranking the trained-chain oracle no longer matches. Old-scheme tables
# become stale siblings and are dropped on the next full build.
PQ_CB_SCHEME = "lloyd-s1e5"


def pq_index_table(sf_dir: str, spark: SparkSession | None = None) -> str:
    """Catalog name of the materialized PQ code table for a corpus
    state — the ``lsh_index_table``/``components_table`` naming scheme
    (``<prefix>_<dirhash>_<statehash>``), keyed on the EMBEDDINGS
    input's state so a re-embedded corpus can never alias a stale
    code table, and on ``PQ_CB_SCHEME`` so a codebook-construction
    change can never alias codes built under the old scheme."""
    import hashlib

    from .dedup import _corpus_stat

    dirh = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    st = _corpus_stat(sf_dir, spark, fname="embeddings.parquet")
    state = sf_dir if st is None else f"{sf_dir}|{st[0]}|{st[1]}"
    h = hashlib.md5(f"{state}|{PQ_CB_SCHEME}".encode()).hexdigest()[:8]
    return f"{PQ_INDEX_TABLE}_{dirh}_{h}"


def _drop_stale_pq_siblings(spark: SparkSession, sf_dir: str,
                            keep: str) -> None:
    """Drop PQ code tables (and their ``_cb`` twins — same prefix) for
    OTHER states of the same corpus path: fuzz/bench loops that rewrite
    fixtures, and codebook-scheme upgrades, would otherwise leak one
    full code-table copy per rewrite (the ``_drop_stale_lsh_siblings``
    hygiene, ADVICE r09). Tables keyed to the current state survive."""
    import hashlib

    dirh = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    prefix = f"{PQ_INDEX_TABLE}_{dirh}_"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix) and not t.name.startswith(keep):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def build_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """The BUILD job of the persisted-PQ lifecycle: materialize the
    4-bit code table (vec_id, codes) AND the codebook it was encoded
    with (``<table>_cb``, 16 rows) as catalog tables — the encode
    pass (corpus × broadcast codebook, one map-side-partial argmin
    aggregate) is paid once per index refresh instead of inside every
    serving query. The ANN sibling of ``build_lsh_index``: at 100 TB
    the PQ index IS a stored artifact (4 bytes/vector), and the
    codebook is stored WITH it because it is the index's schema —
    appends must encode against the epoch's codebook, not re-derive
    one from a drifted corpus (the bucket-spec-in-catalog lesson from
    the LSH lifecycle, ADVICE r06). The vec_id PK gate rides the
    encode aggregate (``_pq_encode``), so a duplicate-id corpus fails
    loud at build time. Returns the code-table name.

    The stored codebook is the PRODUCTION one (VERDICT r09 #2): the
    sampled-Lloyd ``_pq_trained_codebook(sample=PQ_TRAIN_SAMPLE)``, so
    the serve path delivers the trained recall lift (measured +8-10
    points @10 vs one-shot by ``q_sim_pq_trained_recall``) from the
    table instead of persisting the stride codebook the same audit
    shows is strictly worse. Training cost is paid once per index
    refresh and capped at the sample budget (corpus-independent);
    encoding covers the full corpus. Write order matters: the code
    table is dropped BEFORE the new codebook lands so a crash mid-build
    can never leave old codes paired with a new codebook (serve checks
    both artifacts exist and rebuilds); encoding then reads the STORED
    codebook — codes and schema can't drift even across a codebook-
    construction change. A full build also drops stale sibling tables
    of the same corpus path (older states / schemes)."""
    from ..sources.storage import drop_table_and_location

    table = pq_index_table(sf_dir, spark)
    _drop_stale_pq_siblings(spark, sf_dir, keep=table)
    drop_table_and_location(spark, table)
    cb = _pq_trained_codebook(spark, sf_dir, sample=PQ_TRAIN_SAMPLE)
    drop_table_and_location(spark, f"{table}_cb")
    cb.write.mode("overwrite").format("parquet").saveAsTable(f"{table}_cb")
    e = load_finite_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    codes = _pq_encode(
        e.crossJoin(F.broadcast(spark.table(f"{table}_cb"))))
    codes.write.mode("overwrite").format("parquet").saveAsTable(table)
    return table


def append_pq_index(spark: SparkSession, sf_dir: str, table: str,
                    batch: DataFrame) -> None:
    """The APPEND job — the amortized per-ingest cost of the PQ
    lifecycle: encode ONLY the batch's finite vectors against the
    table's STORED codebook and append the code rows; the corpus is
    never re-encoded and the codebook never drifts mid-epoch (a
    re-derived first-K codebook over the grown corpus would silently
    re-key the whole positional ADC index). Batch-proportional:
    |batch| × PQ_K broadcast cross join, one map-side-partial argmin
    aggregate, one parquet append. Duplicate ids WITHIN the batch
    raise through the shared in-aggregate gate; batch-vs-corpus
    duplicates are the ingest pipeline's resolve step
    (``resolve_embedding_identity``), exactly as in the LSH append.
    Append-then-serve ≡ encode-all-with-the-epoch-codebook, pinned in
    tests/test_dedup_similarity.py."""
    cent = spark.table(f"{table}_cb")
    e = (batch.filter(F.expr(FINITE_EMB_COND))
         .select("vec_id",
                 F.col("embedding").cast("array<double>").alias("v")))
    codes = _pq_encode(e.crossJoin(F.broadcast(cent)))
    codes.write.mode("append").format("parquet").saveAsTable(table)


def q_pq_persisted_topk(spark: SparkSession, sf_dir: str,
                        emb: DataFrame | None = None) -> DataFrame:
    """PQ ANN SERVED from the persisted code table — the amortized
    steady state of the PQ lifecycle (build-if-absent on the
    state-keyed name, like ``dedup_persisted_lsh_match``): every
    construction after the first plans only the code-table scan, the
    tiny query-distance-table build (queries × broadcast codebook),
    and the ADC ranking — the corpus-wide encode aggregate AND the
    Lloyd training are gone from the serving plan (plan-asserted in
    tests/test_plans.py). The stored codebook is the production
    sampled-Lloyd one (``build_pq_index``), so output is IDENTICAL to
    ``q_pq_sampled_topk`` (materializing codes is value-neutral),
    hence the shared oracle — the serve delivers the trained recall
    lift from the table (``q_sim_pq_persisted_recall`` measures it).
    The serve side carries the fail-loud vec_id gate on the RAW
    column-pruned id scan (the build's in-aggregate gate protected
    the table; this protects the query-distance side when the table
    pre-exists).

    ``emb`` mirrors ``match_lsh_index``'s trusted override (VERDICT
    r09 #5): a caller-provided, identity-resolved embeddings scan
    skips the corpus-proportional vec_id audit, so resolved-ingest
    pipelines don't pay a full id pass per serve. The default
    raw-fixture scan stays gated — ad-hoc runs on unaudited corpora
    fail loud. Equality of both paths is test-pinned."""
    from ..sources.tables import attach_pk_gate, load_table

    gate = emb is None
    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
    table = pq_index_table(sf_dir, spark)
    # build-if-absent checks BOTH artifacts: a code table without its
    # codebook sibling (e.g. written by an older build) is unusable —
    # the serve must never pair stored codes with a re-derived codebook
    if not (spark.catalog.tableExists(table)
            and spark.catalog.tableExists(f"{table}_cb")):
        build_pq_index(spark, sf_dir)
    codes = spark.table(table)
    # the query-distance table is built against the STORED codebook —
    # the index's schema — never a re-derived one (a drifted corpus
    # would silently re-key the positional ADC lookups)
    e = emb.filter(F.expr(FINITE_EMB_COND)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qarr = _pq_query_arr(e, spark.table(f"{table}_cb"))
    scored = (codes.crossJoin(F.broadcast(qarr))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("approx", F.expr(_PQ_ADC_EXPR)))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("approx"), F.asc("vec_id")))
    out = (scored.withColumn("rank", F.row_number().over(w).cast("long"))
           .filter(F.col("rank") <= TOPK_NEIGHBORS)
           .select("query_id", F.col("vec_id").alias("cand_id"),
                   ieee_round(F.col("approx"), 6).alias("approx_dot"),
                   "rank"))
    if gate:
        # fail-loud PK audit on the raw column-pruned id scan, never
        # the (possibly cached) wide scan — the r08/r09 gate lesson
        ids = load_table(spark, sf_dir, "embeddings").select("vec_id")
        out = attach_pk_gate(out, ids, "vec_id", "the PQ index serve")
    return out


def q_sim_pq_persisted_recall(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Recall@k of the one-shot in-query PQ ranking AND the ranking
    SERVED FROM THE PERSISTED INDEX, side by side in one row — the
    audit that the stored artifact actually delivers the trained
    lift (VERDICT r09 #2): ``recall_served − recall_pq`` is what
    persisting the sampled-Lloyd codebook (instead of the stride
    one-shot) bought, measured THROUGH the table the production stack
    serves from, not through the in-query training path. Shares the
    exact brute-force ground truth with every other recall audit."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    pq = (q_pq_topk(spark, sf_dir)
          .select("query_id", "cand_id").withColumn("_p", F.lit(1)))
    srv = (q_pq_persisted_topk(spark, sf_dir)
           .select("query_id", "cand_id").withColumn("_s", F.lit(1)))
    n = F.count(F.lit(1))
    hp = F.coalesce(F.sum("_p"), F.lit(0)).cast("long")
    hs = F.coalesce(F.sum("_s"), F.lit(0)).cast("long")
    return (exact.join(pq, on=["query_id", "cand_id"], how="left")
            .join(srv, on=["query_id", "cand_id"], how="left")
            .agg(n.alias("n_exact"),
                 hp.alias("n_pq"),
                 hs.alias("n_served"),
                 ieee_round(F.try_divide(hp.cast("double"), n), 4)
                 .alias("recall_pq"),
                 ieee_round(F.try_divide(hs.cast("double"), n), 4)
                 .alias("recall_served")))


PQ_RERANK_C = 30   # ADC shortlist size the exact re-rank scores


def _exact_refine(spark: SparkSession, sf_dir: str,
                  shortlist: DataFrame) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, cand_id) shortlist to
    TOPK_NEIGHBORS — the refinement stage shared by ``q_pq_rerank``
    and ``q_ivfpq_topk`` (one definition, so a tiebreak or rounding
    change can't drift between the funnels). The shortlist re-enters
    the embeddings scan as a broadcast: |Q|·C raw-vector reads, no
    corpus shuffle."""
    e = load_finite_embeddings(spark, sf_dir)
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    cv = e.select(F.col("vec_id").alias("cand_id"),
                  F.col("embedding").alias("c_emb"))
    rr = (cv.join(F.broadcast(shortlist), on="cand_id")
          .join(F.broadcast(q), on="query_id")
          .withColumn("cosine", cosine_expr("q_emb", "c_emb")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (rr.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    ieee_round(F.col("cosine"), 6).alias("cosine"), "rank"))


# the oracle twin of _exact_refine: assumes CTEs `e` (gated vectors)
# and `shortlist` (query_id, cand_id) are in scope
_REFINE_SQL = f"""rr AS (
    SELECT s.query_id, s.cand_id,
           list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(c.v, c.v))) AS cosine
    FROM shortlist s
    JOIN e q ON q.vec_id = s.query_id
    JOIN e c ON c.vec_id = s.cand_id),
rranked AS (
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
    FROM rr)
SELECT query_id, cand_id, {ieee_round_sql('cosine')} AS cosine, rank
FROM rranked WHERE rank <= {TOPK_NEIGHBORS}"""


def q_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ retrieval — the shape production ANN actually
    ships: the compressed index ranks EVERYTHING cheaply (ADC table
    lookups, raw vectors never touched), then the top PQ_RERANK_C
    shortlist per query is re-scored with EXACT cosine from the raw
    vectors and re-ranked to TOPK_NEIGHBORS. The refinement step buys
    back most of the recall 4-bit codes give up (measured by
    ``q_sim_pq_rerank_recall``) while exact math touches only
    |Q|·PQ_RERANK_C vectors instead of |Q|·|corpus|.

    Scale shape: the shortlist is WindowGroupLimit-bounded BEFORE any
    raw-vector read; it re-joins the embeddings scan as a broadcast
    (|Q|·C rows), so the refinement is one map-side pass over the
    corpus with a pushed id filter — no second corpus shuffle, no
    |corpus|² term anywhere.

    Plan memoized per (sf_dir, corpus state) — see
    ``_PQ_QUERY_MEMO``."""
    def build():
        codes, qarr, cent = _pq_parts_cent(spark, sf_dir)
        st = _emb_state(sf_dir, spark)
        scored = (codes.crossJoin(F.broadcast(qarr))
                  .filter(F.col("vec_id") != F.col("query_id"))
                  .withColumn("approx", F.expr(_PQ_ADC_EXPR)))
        wc = (Window.partitionBy("query_id")
              .orderBy(F.desc("approx"), F.asc("vec_id")))
        cands = (scored.withColumn("crank", F.row_number().over(wc))
                 .filter(F.col("crank") <= PQ_RERANK_C)
                 .select("query_id", F.col("vec_id").alias("cand_id")))
        return (_exact_refine(spark, sf_dir, cands),
                lambda: _PQ_CENT_LIVE.get(cent, state=st))

    return _PQ_QUERY_MEMO.get(
        ("rerank", sf_dir), spark, _emb_state(sf_dir, spark), build)


# the per-candidate ADC score text (PQ_M distance-table lookups),
# shared by the flat-PQ and IVF-PQ oracle chains
_PQ_ADC_SQL = (f"list_sum(list_transform(range(1, {PQ_M} + 1), "
               f"m -> dt[CAST(codes[m] AS INT) + 1][m]))")


def _pq_core_ctes(cent_sql: str | None = None) -> str:
    """The codebook/codes/query-distance-table CTE segment (assumes a
    preceding `e` CTE with the finite-vector gate), shared by the flat
    PQ chain and the IVF-PQ composition. ``cent_sql`` overrides the
    one-shot codebook CTE block — it must END with a CTE named `cent`
    of shape (cid, cv); the trained variant passes its Lloyd chain."""
    d2 = lambda m: (f"list_sum(list_transform(range(1, {PQ_SUB} + 1), "
                    f"i -> (v[{m} * {PQ_SUB} + i] - cv[{m} * {PQ_SUB} + i])"
                    f" * (v[{m} * {PQ_SUB} + i] - cv[{m} * {PQ_SUB} + i])))")
    code_cols = ", ".join(
        f"(min(struct_pack(d := {d2(m)}, c := cid))).c" for m in range(PQ_M))
    cent_cte = cent_sql or f"""cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                AS cid, v AS cv
         FROM (SELECT * FROM e ORDER BY vec_id LIMIT {PQ_K}))"""
    return f"""{cent_cte},
codes AS (
    SELECT vec_id, [{code_cols}] AS codes
    FROM e CROSS JOIN cent GROUP BY vec_id),
qtab AS (
    SELECT q.vec_id AS query_id, cid,
           list_transform(range(0, {PQ_M}), m ->
               list_sum(list_transform(range(1, {PQ_SUB} + 1),
                   i -> q.v[m * {PQ_SUB} + i] * cv[m * {PQ_SUB} + i])))
               AS dots
    FROM e q CROSS JOIN cent WHERE q.vec_id < {N_QUERY_VECS}),
qarr AS (SELECT query_id, list(dots ORDER BY cid) AS dt
         FROM qtab GROUP BY query_id)"""


def _pq_ranked_ctes(cent_sql: str | None = None) -> str:
    """The WITH-chain through ADC-ranked candidates, shared by the
    PQ top-k, rerank, and recall oracles (stride AND trained-codebook
    variants — ``cent_sql`` passes through to ``_pq_core_ctes``)."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
{_pq_core_ctes(cent_sql)},
scored AS (
    SELECT query_id, c.vec_id AS cand_id,
           {_PQ_ADC_SQL} AS approx
    FROM codes c CROSS JOIN qarr WHERE c.vec_id <> qarr.query_id),
ranked AS (
    SELECT query_id, cand_id, approx,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY approx DESC, cand_id ASC) AS BIGINT) AS rank
    FROM scored)"""


ORACLE_PQ_TOPK = f"""{_pq_ranked_ctes()}
SELECT query_id, cand_id, {ieee_round_sql('approx')} AS approx_dot, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


ORACLE_PQ_RERANK = f"""{_pq_ranked_ctes()},
shortlist AS (
    SELECT query_id, cand_id FROM ranked WHERE rank <= {PQ_RERANK_C}),
{_REFINE_SQL}
"""


def q_sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checked recall@k of the PQ ANN against the exact brute-force
    cosine top-k — the PQ member of the recall-audit family
    (``q_sim_lsh_recall``, ``q_sim_ivf_recall``), so every approximate
    index in the repo carries an honest, driver-adjudicated recall
    row. PQ with one-shot codebooks trades the most accuracy for the
    most compression; this row is where that trade is VISIBLE."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    found = (q_pq_topk(spark, sf_dir)
             .select("query_id", "cand_id").withColumn("_hit", F.lit(1)))
    hits = F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
    return (exact.join(found, on=["query_id", "cand_id"], how="left")
            .agg(F.count(F.lit(1)).alias("n_exact"),
                 hits.alias("n_found"),
                 ieee_round(F.try_divide(hits.cast("double"),
                                         F.count(F.lit(1))), 4)
                 .alias("recall")))


ORACLE_SIM_PQ_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
pq_side AS ({ORACLE_PQ_TOPK})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(p.cand_id) AS BIGINT) AS n_found,
       CASE WHEN abs((count(p.cand_id)::DOUBLE / count(*))) < 4e9 THEN floor((count(p.cand_id)::DOUBLE / count(*)) * 1e4 + 0.5E0) / 1e4 ELSE (count(p.cand_id)::DOUBLE / count(*)) END AS recall
FROM exact_side x
LEFT JOIN pq_side p
  ON x.query_id = p.query_id AND x.cand_id = p.cand_id
"""


def q_sim_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the plain PQ ADC ranking AND of the two-stage
    rerank, side by side in one row — the audit that makes the
    refinement step's value VISIBLE (recall_rerank − recall_pq is
    exactly what touching |Q|·PQ_RERANK_C raw vectors buys). Shares
    the exact brute-force top-k as ground truth with the other recall
    audits."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    pq = (q_pq_topk(spark, sf_dir)
          .select("query_id", "cand_id").withColumn("_p", F.lit(1)))
    rr = (q_pq_rerank(spark, sf_dir)
          .select("query_id", "cand_id").withColumn("_r", F.lit(1)))
    n = F.count(F.lit(1))
    hp = F.coalesce(F.sum("_p"), F.lit(0)).cast("long")
    hr = F.coalesce(F.sum("_r"), F.lit(0)).cast("long")
    return (exact.join(pq, on=["query_id", "cand_id"], how="left")
            .join(rr, on=["query_id", "cand_id"], how="left")
            .agg(n.alias("n_exact"), hp.alias("n_pq"), hr.alias("n_rerank"),
                 ieee_round(F.try_divide(hp.cast("double"), n), 4)
                 .alias("recall_pq"),
                 ieee_round(F.try_divide(hr.cast("double"), n), 4)
                 .alias("recall_rerank")))


ORACLE_SIM_PQ_RERANK_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
pq_side AS ({ORACLE_PQ_TOPK}),
rr_side AS ({ORACLE_PQ_RERANK})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(p.cand_id) AS BIGINT) AS n_pq,
       CAST(count(r.cand_id) AS BIGINT) AS n_rerank,
       {ieee_round_sql('count(p.cand_id)::DOUBLE / count(*)', 4)}
           AS recall_pq,
       {ieee_round_sql('count(r.cand_id)::DOUBLE / count(*)', 4)}
           AS recall_rerank
FROM exact_side x
LEFT JOIN pq_side p
  ON x.query_id = p.query_id AND x.cand_id = p.cand_id
LEFT JOIN rr_side r
  ON x.query_id = r.query_id AND x.cand_id = r.cand_id
"""


# --- trained PQ codebooks (per-subspace Lloyd refinement) ----------------
# VERDICT r07 #6: the one-shot codebook (sub-vectors of the first
# PQ_K finite vectors) is the knob SCALING.md names as what "raises
# the ADC floor". This trains it: PQ_TRAIN_ITERS Lloyd iterations per
# subspace — all PQ_M subspaces in ONE long-format DAG per iteration,
# not M separate loops — with the same exact-quantized centroid
# update as q_kmeans_step, so both engines iterate bit-identically
# and the trained variant keeps a full hash-checked oracle.

PQ_TRAIN_ITERS = 2

# Production training-sample budget (VERDICT r08 #4): Lloyd's cost is
# iterations × |training set|, and at 100 TB a full-corpus pass per
# codebook refresh is the one ANN-stack stage whose cost grows with
# the corpus. A fixed ~1e5-point sample bounds it corpus-independent:
# PQ_K=16 centroids per subspace need O(K · 1e3) points for stable
# exact-quantized means, and past ~1e5 the centroids stop moving
# (Jégou et al. 2011 train 256-centroid codebooks on ~1e5 points).
# At fixture scale the corpus is smaller than the budget, so the
# sample IS the corpus and the sampled codebook equals the
# full-trained one (pinned in tests/test_dedup_similarity.py); the
# sub-corpus sweep lives in scripts/probe_trained_quantizers.py and
# SCALING.md.
PQ_TRAIN_SAMPLE = 100_000

# Live persisted per-iteration centroid tables (each is 128 rows but
# its subtree scans the training set; the next iteration reads it
# once for assignment). Tracked per DISTINCT plan (sameSemantics —
# same-plan handles alias ONE cache entry) and bounded to two
# codebook variants' worth of iterations, so the trained+sampled
# recall audit keeps both chains warm instead of each invocation
# evicting the other's. State-keyed on the embeddings input (ADVICE
# r09): an in-place rewrite evicts instead of feeding stale centroids
# to a freshly built state-keyed PQ table.
_PQ_TRAIN_LIVE = TrackedCache(max_live=2 * PQ_TRAIN_ITERS)

# Process-level memo of the CONSTRUCTED trained-codebook plan, keyed on
# (sf_dir, sample) (r10 optimization, guide §1.2 per-"task" work where
# the task is the driver): building the Lloyd chain is ~0.5-0.9 s of
# py4j Column-tree round-trips per invocation — paid by every warm
# re-run of sim_pq_trained_topk / sim_pq_sampled_topk and both recall
# audits, at any corpus scale, for a plan that is a pure function of
# (sf_dir, sample, corpus state). The repin closure re-`get`s the
# per-round persisted handles on a hit, so a `catalog.clearCache()`
# between invocations re-pins the chain exactly as a fresh
# construction would (TrackedCache re-persists orphaned same-plan
# handles). A state move (in-place embeddings rewrite — the
# registry-fuzz scenario) or a new session/JVM misses and rebuilds;
# the `e`-override path (epoch-slice training) is never memoized.
# Guards/recency/bounds centralized in plans.cache.PlanMemo (r11 —
# the ADVICE r10 fixes: None-state bypass, reinsert recency,
# applicationId session guard).
_PQ_CB_MEMO = PlanMemo(max_entries=8)

# per-candidate sub-vector d² inside the map-side argmin fold (s is
# the (cid, cv) candidate struct from the broadcast per-subspace list)
_PQ_SUB_D2 = ("aggregate(zip_with(sv, s.cv, (x, y) -> (x - y) * (x - y)), "
              "0D, (a, t) -> a + t)")
# argmin over the candidate array: score each candidate to a
# (d², cid) struct, take the lexicographic array_min — exact float
# compare with min-cid tiebreak, the encoding aggregate's semantics
# as a PURE MAP-SIDE expression (no per-(vec_id, m) shuffle)
_PQ_ARGMIN = (f"array_min(transform(cands, s -> "
              f"named_struct('d', {_PQ_SUB_D2}, 'c', s.cid))).c")


def _pq_lloyd_round(sub: DataFrame, cent: DataFrame) -> DataFrame:
    """One Lloyd iteration over the long-form sub-vector table
    (vec_id, m, sv) against long-form centroids (m, cid, cv).

    Assignment is MAP-SIDE: the K candidates of each subspace are
    collapsed to one broadcast (m, cands-array) row, so the argmin is
    an array expression on the scan — a groupBy(vec_id, m) argmin
    would shuffle the full corpus of sub-vectors once per iteration
    (measured: 12 → 9 distinct exchanges for the full trained-topk
    plan, and every survivor is centroid-bounded). The update is the
    q_kmeans_step shape: explode to (m, cid, pos, x), exact-quantized
    mean with map-side partial combine — shuffle ≤ parts·M·K·SUB
    partial sums, corpus-independent. Empty clusters carry forward
    (the codebook must stay PQ_K-dense — the ADC table is
    positional)."""
    centm = cent.groupBy("m").agg(F.expr(
        "array_sort(collect_list(named_struct('cid', cid, 'cv', cv)))"
    ).alias("cands"))
    upd = (sub.join(F.broadcast(centm), on="m")
           .select("m", F.expr(_PQ_ARGMIN).alias("cid"),
                   F.posexplode("sv").alias("pos", "x"))
           .groupBy("m", "cid", "pos")
           .agg(uavg("x", scale=6, unit="1e12", fn="floor",
                     huge="DECIMAL(38,0)").alias("cx"))
           .groupBy("m", "cid")
           .agg(F.expr("transform(array_sort(collect_list(named_struct("
                       "'pos', pos, 'cx', cx))), s -> s.cx)").alias("cvn")))
    return (cent.join(upd, on=["m", "cid"], how="left")
            .select("m", "cid", F.coalesce("cvn", "cv").alias("cv")))


def _pq_trained_codebook(spark: SparkSession, sf_dir: str,
                         sample: int | None = None,
                         e: DataFrame | None = None) -> DataFrame:
    """(cid, cv) codebook after PQ_TRAIN_ITERS Lloyd iterations per
    subspace — per-subspace k-means is the codebook construction of
    Jégou, Douze & Schmid 2011 ("Product Quantization for Nearest
    Neighbor Search", IEEE TPAMI) — initialized from the one-shot
    codebook (so trained vs stride is exactly "what the iterations
    bought"). The reshape at
    the end concatenates each cid's PQ_M sub-centroids back into one
    EMB_DIM vector — the (cid, cv) contract ``_pq_parts`` encodes
    against, where subspace m only ever reads its own slice.

    Scale shape: per iteration, assignment is a map-side broadcast
    argmin over the corpus scan (M·K sub-centroids broadcast — KB);
    the update shuffles ≤ parts · M·K·SUB partial sums (map-side
    combine), independent of corpus size; each iteration's 128-row
    centroid table is persisted so iteration t+1's plan reads a
    materialized table instead of re-running t.

    ``sample`` bounds the TRAINING set (VERDICT r08 #4, the production
    path at corpus scale): the first ``sample`` finite vectors in
    md5(vec_id) hash order — a deterministic, engine-reproducible
    fixed-size sample (the ORDER BY is a partial top-N per partition,
    never a full sort), so the sampled chain has the same unrolled-CTE
    oracle as the full one. Encoding and serving always run over the
    FULL corpus; only Lloyd's input shrinks. ``sample=None`` trains on
    the whole corpus (the fixture-exact form).

    ``e`` overrides the (vec_id, v) vectors frame — the epoch-slice
    hook the PQ append test uses to train a PRE-batch codebook through
    this exact production path (so the append-never-re-derives pin
    exercises the codebook the build actually stores).

    The default (``e is None``) path serves the constructed plan from
    ``_PQ_CB_MEMO`` (see its comment): the chain is a pure function of
    (sf_dir, sample, embeddings state), so rebuilding its Column trees
    per invocation is per-invocation driver cost for an identical
    plan."""
    if e is None:
        st = _emb_state(sf_dir, spark)

        def build():
            rounds, final = _pq_trained_chain(spark, sf_dir, sample,
                                              None)

            def repin() -> None:
                # no-op when still cached, re-persist after a
                # clearCache, rebuild-equivalent after FIFO eviction
                for h in rounds:
                    _PQ_TRAIN_LIVE.get(h, state=st)

            return final, repin

        return _PQ_CB_MEMO.get((sf_dir, sample), spark, st, build)
    return _pq_trained_chain(spark, sf_dir, sample, e)[1]


def _pq_trained_chain(spark: SparkSession, sf_dir: str,
                      sample: int | None,
                      e: DataFrame | None
                      ) -> tuple[list[DataFrame], DataFrame]:
    """Build the Lloyd chain (the body of ``_pq_trained_codebook``;
    see its docstring for the algorithm and scale shape). Returns the
    per-iteration tracked handles alongside the final codebook so the
    plan memo can re-pin them on a hit."""
    if e is None:
        e = load_finite_embeddings(spark, sf_dir).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    train = e
    if sample is not None:
        train = (e.orderBy(F.md5(F.col("vec_id").cast("string")),
                           "vec_id")
                 .limit(sample))
    first_k = (train.orderBy("vec_id").limit(PQ_K)
               .select(F.col("vec_id").alias("cvid"),
                       F.col("v").alias("cv")))
    ids = first_k.select(F.col("cvid").alias("oid"))
    dense = (first_k.join(F.broadcast(ids), F.col("oid") <= F.col("cvid"))
             .groupBy("cvid")
             .agg(F.first("cv").alias("cv"),
                  (F.count(F.lit(1)) - 1).cast("int").alias("cid")))
    cent = dense.select("cid", F.expr(
        f"inline(transform(sequence(0, {PQ_M - 1}), m -> "
        f"struct(m AS m, slice(cv, m * {PQ_SUB} + 1, {PQ_SUB}) AS cv)))"))
    sub = train.select("vec_id", F.expr(
        f"inline(transform(sequence(0, {PQ_M - 1}), m -> "
        f"struct(m AS m, slice(v, m * {PQ_SUB} + 1, {PQ_SUB}) AS sv)))"))
    st = _emb_state(sf_dir, spark)
    rounds: list[DataFrame] = []
    for _ in range(PQ_TRAIN_ITERS):
        cent = _PQ_TRAIN_LIVE.get(_pq_lloyd_round(sub, cent), state=st)
        rounds.append(cent)
    return rounds, (cent.groupBy("cid")
                    .agg(F.expr("flatten(transform(array_sort("
                                "collect_list(named_struct('m', m, "
                                "'cv', cv))), s -> s.cv))")
                         .alias("cv")))


def q_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_pq_topk`` with the TRAINED codebook: same encoding, same
    ADC scoring, same ranking — only the centroids differ. The paired
    recall audit (``q_sim_pq_trained_recall``) is where the training
    shows up as measured recall instead of a claim. Plan memoized per
    (sf_dir, corpus state) — see ``_PQ_QUERY_MEMO``."""
    return _PQ_QUERY_MEMO.get(
        ("trained", sf_dir), spark, _emb_state(sf_dir, spark),
        lambda: _pq_adc_topk_plan(
            spark, sf_dir,
            cb_fn=lambda: _pq_trained_codebook(spark, sf_dir)))


def q_sim_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the one-shot-codebook ADC ranking AND the
    trained-codebook ranking, side by side in one row —
    recall_trained − recall_pq is exactly what PQ_TRAIN_ITERS Lloyd
    iterations bought at UNCHANGED serving cost (the index and the
    query tables have identical shapes; only centroid values moved).
    Shares the exact brute-force top-k ground truth with every other
    recall audit."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    pq = (q_pq_topk(spark, sf_dir)
          .select("query_id", "cand_id").withColumn("_p", F.lit(1)))
    tr = (q_pq_trained_topk(spark, sf_dir)
          .select("query_id", "cand_id").withColumn("_t", F.lit(1)))
    n = F.count(F.lit(1))
    hp = F.coalesce(F.sum("_p"), F.lit(0)).cast("long")
    ht = F.coalesce(F.sum("_t"), F.lit(0)).cast("long")
    return (exact.join(pq, on=["query_id", "cand_id"], how="left")
            .join(tr, on=["query_id", "cand_id"], how="left")
            .agg(n.alias("n_exact"),
                 hp.alias("n_pq"),
                 ht.alias("n_trained"),
                 ieee_round(F.try_divide(hp.cast("double"), n), 4)
                 .alias("recall_pq"),
                 ieee_round(F.try_divide(ht.cast("double"), n), 4)
                 .alias("recall_trained")))


def q_pq_sampled_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_pq_trained_topk`` on the PRODUCTION sampled-training path
    (VERDICT r08 #4): the codebook's Lloyd iterations read only the
    first ``PQ_TRAIN_SAMPLE`` finite vectors in md5(vec_id) hash
    order, so training cost is corpus-independent while encoding,
    ADC scoring, and ranking still cover the full corpus. At fixture
    scale the corpus is below the sample budget, so this query's
    result EQUALS ``sim_pq_trained_topk``'s (the full-sample pinning
    the verdict asked for — also pytest-pinned); at 100 TB it is the
    form you actually run per codebook refresh. The sub-budget
    crossover (where sampling starts costing recall on this fixture)
    is measured in scripts/probe_trained_quantizers.py → SCALING.md.
    Plan memoized per (sf_dir, corpus state) — see
    ``_PQ_QUERY_MEMO``."""
    return _PQ_QUERY_MEMO.get(
        ("sampled", sf_dir), spark, _emb_state(sf_dir, spark),
        lambda: _pq_adc_topk_plan(
            spark, sf_dir,
            cb_fn=lambda: _pq_trained_codebook(spark, sf_dir,
                                               sample=PQ_TRAIN_SAMPLE)))


def _pq_trained_cent_sql(sample: int | None = None) -> str:
    """The Lloyd-chain CTE block ending in `cent` (cid, cv) — the
    trained twin of ``_pq_core_ctes``'s one-shot codebook CTE, fed to
    it via ``cent_sql``. Iterations are unrolled (a{t}/u{t}/cent{t});
    every float fold, quantized mean, and tiebreak is the shared
    engine-exact idiom, so the chain is bit-reproducible. ``sample``
    mirrors ``_pq_trained_codebook``'s training-set bound: a `samp`
    CTE (first N finite vectors by md5(vec_id), the same
    engine-identical hash order) replaces `e` as the Lloyd input;
    encoding downstream still reads the full `e`."""
    src = "e"
    samp = ""
    if sample is not None:
        samp = (f"samp AS (SELECT * FROM e ORDER BY "
                f"md5(CAST(vec_id AS VARCHAR)), vec_id "
                f"LIMIT {sample}),\n")
        src = "samp"
    sub_d2 = (f"list_sum(list_transform(range(1, {PQ_SUB} + 1), "
              f"i -> (sv[i] - cv[i]) * (sv[i] - cv[i])))")
    parts = [f"""{samp}cent0 AS (
    SELECT cid, m, cv[(m * {PQ_SUB} + 1):((m + 1) * {PQ_SUB})] AS cv
    FROM (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                     AS cid, v AS cv
          FROM (SELECT * FROM {src} ORDER BY vec_id LIMIT {PQ_K})),
         UNNEST(range(0, {PQ_M})) AS r(m)),
sub AS (
    SELECT vec_id, m, v[(m * {PQ_SUB} + 1):((m + 1) * {PQ_SUB})] AS sv
    FROM {src}, UNNEST(range(0, {PQ_M})) AS r(m))"""]
    for t in range(1, PQ_TRAIN_ITERS + 1):
        parts.append(f"""a{t} AS (
    SELECT vec_id, m, sv,
           (min(struct_pack(d := {sub_d2}, c := cid))).c AS cid
    FROM sub JOIN cent{t - 1} USING (m)
    GROUP BY vec_id, m, sv),
u{t} AS (
    SELECT m, cid, pos,
           {uavg_sql("x", scale=6, unit="1e12", fn="floor")} AS cx
    FROM (SELECT m, cid, CAST(i - 1 AS INT) AS pos, sv[i] AS x
          FROM a{t}, UNNEST(range(1, {PQ_SUB} + 1)) AS r(i))
    GROUP BY m, cid, pos),
cent{t} AS (
    SELECT c.m, c.cid, coalesce(u.cv, c.cv) AS cv
    FROM cent{t - 1} c
    LEFT JOIN (SELECT m, cid, list(cx ORDER BY pos) AS cv
               FROM u{t} GROUP BY m, cid) u
      ON u.m = c.m AND u.cid = c.cid)""")
    parts.append(f"""cent AS (
    SELECT cid, flatten(list(cv ORDER BY m)) AS cv
    FROM cent{PQ_TRAIN_ITERS} GROUP BY cid)""")
    return ",\n".join(parts)


ORACLE_PQ_TRAINED_TOPK = f"""{_pq_ranked_ctes(_pq_trained_cent_sql())}
SELECT query_id, cand_id, {ieee_round_sql('approx')} AS approx_dot, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


ORACLE_PQ_SAMPLED_TOPK = f"""{_pq_ranked_ctes(
    _pq_trained_cent_sql(PQ_TRAIN_SAMPLE))}
SELECT query_id, cand_id, {ieee_round_sql('approx')} AS approx_dot, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


ORACLE_SIM_PQ_TRAINED_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
pq_side AS ({ORACLE_PQ_TOPK}),
tr_side AS ({ORACLE_PQ_TRAINED_TOPK})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(p.cand_id) AS BIGINT) AS n_pq,
       CAST(count(t.cand_id) AS BIGINT) AS n_trained,
       {ieee_round_sql('count(p.cand_id)::DOUBLE / count(*)', 4)}
           AS recall_pq,
       {ieee_round_sql('count(t.cand_id)::DOUBLE / count(*)', 4)}
           AS recall_trained
FROM exact_side x
LEFT JOIN pq_side p
  ON x.query_id = p.query_id AND x.cand_id = p.cand_id
LEFT JOIN tr_side t
  ON x.query_id = t.query_id AND x.cand_id = t.cand_id
"""


# The served ranking comes from the stored sampled-Lloyd codebook, so
# its oracle side is the sampled Lloyd-chain CTE — the serve is
# value-neutral vs the in-query sampled form (shared-oracle claim).
ORACLE_SIM_PQ_PERSISTED_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
pq_side AS ({ORACLE_PQ_TOPK}),
srv_side AS ({ORACLE_PQ_SAMPLED_TOPK})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(p.cand_id) AS BIGINT) AS n_pq,
       CAST(count(s.cand_id) AS BIGINT) AS n_served,
       {ieee_round_sql('count(p.cand_id)::DOUBLE / count(*)', 4)}
           AS recall_pq,
       {ieee_round_sql('count(s.cand_id)::DOUBLE / count(*)', 4)}
           AS recall_served
FROM exact_side x
LEFT JOIN pq_side p
  ON x.query_id = p.query_id AND x.cand_id = p.cand_id
LEFT JOIN srv_side s
  ON x.query_id = s.query_id AND x.cand_id = s.cand_id
"""


# --- Matryoshka (truncated-prefix) two-stage retrieval -------------------

MRL_DIM = 16     # prefix dims the cheap first pass scores (EMB_DIM/4)
MRL_CAND = 30    # prefix shortlist the full-dim re-rank scores


def q_mrl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style adaptive retrieval: score EVERY candidate on
    only the first MRL_DIM embedding dimensions (MRL-trained models
    front-load information, so the prefix is a usable coarse ranker),
    keep the top MRL_CAND per query, then re-rank the shortlist with
    full-dimension exact cosine. The funnel every MRL deployment runs:
    the expensive 64-dim math touches |Q|·MRL_CAND rows, not
    |Q|·|corpus|, and at scale the prefix pass reads a 4× narrower
    column (stored as its own column/table, column-pruned at the
    scan).

    Both stages are pure codegen'd array folds with fixed index order;
    the shortlist is WindowGroupLimit-bounded before any full-width
    work. Recall@k vs exact brute force is its own checked row
    (``q_sim_mrl_recall``)."""
    e = load_finite_embeddings(spark, sf_dir)
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    cand = e.select(F.col("vec_id").alias("cand_id"),
                    F.col("embedding").alias("c_emb"))
    pref = (cand.crossJoin(F.broadcast(q))
            .filter(F.col("cand_id") != F.col("query_id"))
            .withColumn("pcos", cosine_expr(
                f"slice(q_emb, 1, {MRL_DIM})",
                f"slice(c_emb, 1, {MRL_DIM})")))
    wc = (Window.partitionBy("query_id")
          .orderBy(F.desc("pcos"), F.asc("cand_id")))
    shortlist = (pref.withColumn("crank", F.row_number().over(wc))
                 .filter(F.col("crank") <= MRL_CAND))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (shortlist.withColumn("cosine", cosine_expr("q_emb", "c_emb"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    ieee_round(F.col("cosine"), 6).alias("cosine"), "rank"))


ORACLE_MRL_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
pref AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           q.v AS qv, c.v AS cv,
           list_dot_product(q.v[1:{MRL_DIM}], c.v[1:{MRL_DIM}])
             / (sqrt(list_dot_product(q.v[1:{MRL_DIM}], q.v[1:{MRL_DIM}]))
                * sqrt(list_dot_product(c.v[1:{MRL_DIM}],
                                        c.v[1:{MRL_DIM}]))) AS pcos
    FROM e q JOIN e c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERY_VECS}),
shortlist AS (
    SELECT query_id, cand_id, qv, cv
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY pcos DESC, cand_id ASC) AS crank FROM pref)
    WHERE crank <= {MRL_CAND}),
rr AS (
    SELECT query_id, cand_id,
           list_dot_product(qv, cv)
             / (sqrt(list_dot_product(qv, qv))
                * sqrt(list_dot_product(cv, cv))) AS cosine
    FROM shortlist),
rranked AS (
    SELECT query_id, cand_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id ASC) AS BIGINT) AS rank
    FROM rr)
SELECT query_id, cand_id, {ieee_round_sql('cosine')} AS cosine, rank
FROM rranked WHERE rank <= {TOPK_NEIGHBORS}
"""


def q_sim_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the Matryoshka prefix funnel vs exact full-dim
    brute force — the honest-audit row of the MRL path, same contract
    as the LSH/IVF/PQ recall audits: how much ranking quality the
    MRL_DIM-of-EMB_DIM first pass gives up after full-dim rerank."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    found = (q_mrl_topk(spark, sf_dir)
             .select("query_id", "cand_id").withColumn("_hit", F.lit(1)))
    hits = F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
    return (exact.join(found, on=["query_id", "cand_id"], how="left")
            .agg(F.count(F.lit(1)).alias("n_exact"),
                 hits.alias("n_found"),
                 ieee_round(F.try_divide(hits.cast("double"),
                                         F.count(F.lit(1))), 4)
                 .alias("recall")))


ORACLE_SIM_MRL_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
mrl_side AS ({ORACLE_MRL_TOPK})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(m.cand_id) AS BIGINT) AS n_found,
       {ieee_round_sql('count(m.cand_id)::DOUBLE / count(*)', 4)} AS recall
FROM exact_side x
LEFT JOIN mrl_side m
  ON x.query_id = m.query_id AND x.cand_id = m.cand_id
"""


# --- IVF-PQ with exact refinement (the composed serving stack) ----------


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + refine — the composition billion-scale ANN actually
    deploys: the coarse quantizer prunes candidates to each query's
    NPROBE cells, PQ ADC ranks ONLY those candidates from their 4-bit
    codes (raw vectors untouched), and the top PQ_RERANK_C shortlist
    is re-scored with exact cosine. Every stage reuses the machinery
    of its standalone query (``_ivf_cells``, ``_pq_parts``,
    ``q_pq_rerank``'s refinement), so the composed index inherits each
    stage's determinism and the whole funnel carries one SQL oracle.

    Scale shape: candidate generation is an equi-join on cell id
    (probed-cells fraction of the corpus per query — never corpus²);
    ADC scoring joins the code table, not embeddings; the only
    raw-vector reads are |Q|·PQ_RERANK_C broadcast-pruned lookups.
    vec_id PK precondition inherited from the PQ encoder (raises
    diagnosably; resolve at ingest)."""
    codes, qarr = _pq_parts(spark, sf_dir)
    index, probes = _ivf_cells(spark, sf_dir)
    cands = (index.select(F.col("cand_id").alias("vec_id"), "cell")
             .join(F.broadcast(probes.select("query_id", "cell")),
                   on="cell")
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id"))
    adc = (codes.join(cands, on="vec_id")
           .join(F.broadcast(qarr), on="query_id")
           .withColumn("approx", F.expr(_PQ_ADC_EXPR)))
    wc = (Window.partitionBy("query_id")
          .orderBy(F.desc("approx"), F.asc("vec_id")))
    shortlist = (adc.withColumn("crank", F.row_number().over(wc))
                 .filter(F.col("crank") <= PQ_RERANK_C)
                 .select("query_id", F.col("vec_id").alias("cand_id")))
    return _exact_refine(spark, sf_dir, shortlist)


ORACLE_IVFPQ_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0 AND len(list_filter(embedding, x -> x != 0)) > 0) embeddings),
{_pq_core_ctes()},
cents AS (
    SELECT vec_id AS cent_id, v AS cv FROM e
    WHERE vec_id % {CENTROID_STRIDE} = 0),
cell_scored AS (
    SELECT e.vec_id, c.cent_id,
           list_dot_product(e.v, c.cv)
             / (sqrt(list_dot_product(e.v, e.v))
                * sqrt(list_dot_product(c.cv, c.cv))) AS ccos
    FROM e CROSS JOIN cents c),
ranked_cells AS (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cent_id ASC) AS cell_rank
    FROM cell_scored),
idx AS (
    SELECT vec_id, cent_id AS cell
    FROM ranked_cells WHERE cell_rank = 1),
probes AS (
    SELECT vec_id AS query_id, cent_id AS cell
    FROM ranked_cells
    WHERE vec_id < {N_QUERY_VECS} AND cell_rank <= {NPROBE}),
cands AS (
    SELECT p.query_id, i.vec_id
    FROM idx i JOIN probes p USING (cell)
    WHERE i.vec_id <> p.query_id),
adc AS (
    SELECT cd.query_id, cd.vec_id AS cand_id,
           {_PQ_ADC_SQL} AS approx
    FROM cands cd
    JOIN codes k ON k.vec_id = cd.vec_id
    JOIN qarr q ON q.query_id = cd.query_id),
shortlist AS (
    SELECT query_id, cand_id
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY approx DESC, cand_id ASC) AS crank FROM adc)
    WHERE crank <= {PQ_RERANK_C}),
{_REFINE_SQL}
"""


def q_sim_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the composed IVF-PQ+refine funnel vs exact brute
    force — the recall-audit member for the composition (its loss is
    the UNION of the cell-pruning loss measured by sim_ivf_recall and
    the code-quantization loss measured by sim_pq_rerank_recall; this
    row is where the combined trade is visible)."""
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "cand_id")
    found = (q_ivfpq_topk(spark, sf_dir)
             .select("query_id", "cand_id").withColumn("_hit", F.lit(1)))
    hits = F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
    return (exact.join(found, on=["query_id", "cand_id"], how="left")
            .agg(F.count(F.lit(1)).alias("n_exact"),
                 hits.alias("n_found"),
                 ieee_round(F.try_divide(hits.cast("double"),
                                         F.count(F.lit(1))), 4)
                 .alias("recall")))


ORACLE_SIM_IVFPQ_RECALL = f"""
WITH exact_side AS ({ORACLE_COSINE_TOPK}),
ivfpq_side AS ({ORACLE_IVFPQ_TOPK})
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(i.cand_id) AS BIGINT) AS n_found,
       {ieee_round_sql('count(i.cand_id)::DOUBLE / count(*)', 4)} AS recall
FROM exact_side x
LEFT JOIN ivfpq_side i
  ON x.query_id = i.query_id AND x.cand_id = i.cand_id
"""
