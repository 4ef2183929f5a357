"""Similarity search over an embedding column (array<float>).

Two paths:
- ``q_cosine_topk`` — brute-force top-k neighbors for a query set:
  broadcast the (small) query side against every candidate, score with
  a codegen'd cosine expression, bounded per-query top-k via
  row_number (WindowGroupLimitExec prunes before the shuffle). Exact;
  cost is |Q|·|N| — the right plan when |Q| is small, at any |N|.
- ``q_cosine_topk_lsh`` — random-hyperplane LSH: candidates share a
  signed-projection bucket with the query, then exact re-rank inside
  the bucket. Sub-linear candidate sets at scale; approximate recall →
  no SQL oracle (rows-only check), pinned by unit tests on crafted
  duplicate vectors.

Hyperplanes are deterministic pseudo-random (xxhash64-derived
coefficients), so results are stable across runs and executors with no
fit/model state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import cosine_expr

TOPK_NEIGHBORS = 10
N_QUERY_VECS = 10   # fixture query set: vec_id < 10
LSH_BITS = 8
EMB_DIM = 64


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id <
    N_QUERY_VECS), excluding self; deterministic tiebreak on vec_id."""
    e = load_table(spark, sf_dir, "embeddings")
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
                    F.round("cosine", 6).alias("cosine"), "rank"))


ORACLE_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
SELECT query_id, cand_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""


def hyperplane_bucket(emb_col: str, bits: int = LSH_BITS) -> F.Column:
    """Signed-random-projection bucket id: bit j = sign(v · h_j), with
    h_j[d] = (xxhash64(j·1024 + d) % 1001) / 500 - 1 ∈ [-1, 1] —
    deterministic, no stored model."""
    return F.expr(
        f"aggregate(transform(sequence(0, {bits - 1}), j -> CASE WHEN "
        f"aggregate(zip_with({emb_col}, "
        f"  transform(sequence(0, {EMB_DIM - 1}), "
        f"    d -> CAST(xxhash64(j * 1024 + d) % 1001 AS DOUBLE) / 500.0 - 1.0), "
        f"  (x, h) -> CAST(x AS DOUBLE) * h), "
        f"0D, (acc, v) -> acc + v) > 0 THEN shiftleft(1L, j) ELSE 0L END), "
        f"0L, (a, x) -> a + x)"
    )


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: equi-join query and candidate
    buckets, exact cosine re-rank inside the bucket. The candidate join
    is a plain shuffle join on the bucket key — sub-linear work at
    scale, tunable recall via bits/probes."""
    e = load_table(spark, sf_dir, "embeddings") \
        .withColumn("bucket", hyperplane_bucket("embedding"))
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb"), "bucket"))
    cand = e.select(F.col("vec_id").alias("cand_id"),
                    F.col("embedding").alias("c_emb"), "bucket")
    scored = (
        cand.join(F.broadcast(q), on="bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("q_emb", "c_emb"))
    )
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))


# --- IVF (inverted-file) ANN ---------------------------------------------

# Coarse quantizer: every vector whose vec_id is a multiple of
# CENTROID_STRIDE is a centroid, so the centroid count scales with the
# corpus (10 at sf0.01, 100 at sf0.1) with no fit/model state and full
# cross-engine reproducibility.
CENTROID_STRIDE = 50
NPROBE = 2


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
    e = load_table(spark, sf_dir, "embeddings")
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
    scored = (
        index.join(F.broadcast(probes), on="cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("q_emb", "c_emb")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("cand_id")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_NEIGHBORS)
            .select("query_id", "cand_id",
                    F.round("cosine", 6).alias("cosine"), "rank"))


ORACLE_COSINE_TOPK_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
SELECT query_id, cand_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
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
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label",
                 F.col("embedding").cast("array<double>").alias("v"))
    norm = F.sqrt(F.expr("aggregate(v, 0D, (a, x) -> a + x * x)"))
    unit = (v.withColumn("nrm", norm)
            .select("label",
                    F.expr("transform(v, x -> x / nrm)").alias("u")))
    return (unit.select("label", F.posexplode("u").alias("pos", "x"))
            .groupBy("label", "pos")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.round(F.avg("x"), 6).alias("centroid"))
            .withColumn("pos", F.col("pos").cast("long")))


ORACLE_LABEL_CENTROIDS = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
u AS (
    SELECT label,
           list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
    FROM e),
comp AS (
    SELECT label, CAST(i - 1 AS BIGINT) AS pos, uv[i] AS x
    FROM u, UNNEST(range(1, len(uv) + 1)) AS r(i))
SELECT label, pos,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(x), 6) AS centroid
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
    e = load_table(spark, sf_dir, "embeddings") \
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
                    F.round("q_cosine", 6).alias("q_cosine"),
                    F.round("cosine", 6).alias("cosine"), "rank"))


ORACLE_COSINE_TOPK_QUANTIZED = f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           list_transform(embedding::DOUBLE[],
               x -> CAST(least({QUANT_SCALE}, greatest(-{QUANT_SCALE},
                    round(x * {QUANT_SCALE}))) AS BIGINT)) AS q
    FROM embeddings),
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
SELECT query_id, cand_id, round(q_cosine, 6) AS q_cosine,
       round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {TOPK_NEIGHBORS}
"""
