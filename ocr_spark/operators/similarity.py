"""Similarity search over an ``array<float>`` embedding column.

  e01 brute-force top-k — the exactness baseline: broadcast the (small)
      query set against all candidates; cosine via JVM higher-order
      functions; per-query top-k via window. One scan, no shuffle of the
      candidate side beyond the window's query-key exchange.
  e02 LSH-bucketed ANN  — the 100 TB path: sign-of-projection bucket keys
      from deterministic hyperplanes; candidates meet only inside a
      bucket. Probe multiple hyperplane sets to trade recall for cost.
  e03 centroid assign   — IVF-style coarse quantization: per-label
      centroids (posexplode + avg), every vector assigned to its nearest
      centroid; at scale this is the routing stage before a per-cell e01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ocr_spark.functions.vectors import cosine_similarity, dot
from ocr_spark.plans import register
from ocr_spark.sources.io import load_table

KNN_K = 5
N_QUERIES = 5
LSH_PLANES = 8


def knn_bruteforce(
    queries: DataFrame, candidates: DataFrame, k: int = KNN_K
) -> DataFrame:
    """Exact cosine top-k for each query vector (brute force, broadcast)."""
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"))
    c = candidates.select("vec_id", "embedding")
    scored = c.join(F.broadcast(q)).select(
        "qid",
        "vec_id",
        cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


@register(
    "e01_knn_bruteforce",
    oracle=f"""
    SELECT q.vec_id AS qid, c.vec_id AS vec_id,
           CAST(row_number() OVER (PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                CAST(c.embedding AS DOUBLE[])) DESC,
                         c.vec_id ASC) AS INT) AS rank,
           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings q JOIN embeddings c ON c.vec_id >= {N_QUERIES}
    WHERE q.vec_id < {N_QUERIES}
    QUALIFY rank <= {KNN_K}
    """,
)
def e01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_bruteforce(
        emb.filter(F.col("vec_id") < N_QUERIES), emb.filter(F.col("vec_id") >= N_QUERIES)
    )


# --- LSH ANN ------------------------------------------------------------------


def _hyperplanes(dim: int, planes: int = LSH_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state, no numpy on
    the driver hot path): weight(p,d) from a splitmix-style integer mix."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            z = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
            z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
            z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
            z = z ^ (z >> 31)
            row.append((z / float(1 << 64)) * 2.0 - 1.0)
        out.append(row)
    return out


def lsh_bucket_key(emb_col, dim: int, planes: int = LSH_PLANES):
    """Sign-of-projection bucket id (0..2^planes-1) as a Column."""
    hps = _hyperplanes(dim, planes)
    key = F.lit(0).cast("long")
    for p, row in enumerate(hps):
        plane = F.array(*[F.lit(x) for x in row])
        sign_bit = F.when(dot(emb_col, plane) > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        key = key + sign_bit
    return key


def ann_lsh(
    queries: DataFrame, candidates: DataFrame, dim: int, k: int = KNN_K
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At 100 TB the candidate side is bucketed once (write-time or a single
    repartition on `bucket`) and each query touches one partition — the
    scan never goes quadratic.
    """
    key = lambda df: df.withColumn("bucket", lsh_bucket_key(F.col("embedding"), dim))  # noqa: E731
    q = key(queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"), "bucket"
    )
    c = key(candidates)
    scored = c.join(F.broadcast(q), "bucket").select(
        "qid", "vec_id", cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


@register("e02_ann_lsh")  # rows-only: bucket routing is not SQL-portable
def e02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return ann_lsh(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        dim,
    )


# --- IVF-style centroid assignment ---------------------------------------------


def label_centroids(emb: DataFrame) -> DataFrame:
    """Element-wise mean embedding per label via posexplode + rebuild."""
    pos = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    means = pos.groupBy("label", "pos").agg(F.avg("v").alias("m"))
    return (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


@register(
    "e03_centroid_assign",
    oracle="""
    WITH pos AS (
      SELECT label, unnest(embedding) AS v,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    ), cent AS (
      SELECT label, list(m ORDER BY pos) AS centroid
      FROM (SELECT label, pos, avg(v) AS m FROM pos GROUP BY label, pos)
      GROUP BY label
    ), scored AS (
      SELECT e.vec_id, e.label,
             c.label AS cand_label,
             list_cosine_similarity(e.embedding, c.centroid) AS cos
      FROM embeddings e CROSS JOIN cent c
    )
    SELECT vec_id, label,
           CAST(cand_label AS INT) AS assigned_label,
           CAST(label = cand_label AS BOOLEAN) AS is_own_label
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cand_label ASC) = 1
    """,
)
def e03_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(emb).select(
        F.col("label").alias("cand_label"), "centroid"
    )
    scored = emb.join(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "cand_label",
        cosine_similarity(
            F.col("embedding"), F.col("centroid")
        ).alias("cos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cand_label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("cand_label").cast("int").alias("assigned_label"),
            (F.col("label") == F.col("cand_label")).alias("is_own_label"),
        )
    )
