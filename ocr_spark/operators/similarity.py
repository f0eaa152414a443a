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
  e04 IVF search        — the composition: route candidates to cells
      once, probe the query's nprobe nearest cells, exact top-k inside
      probed cells only (recall floor pinned in
      tests/test_similarity_recall.py).
  e05 k-means           — iterative Lloyd's on DataFrames (broadcast
      assignment + posexplode mean update); inertia monotonicity and
      determinism pinned by tests; the registered entry runs on
      integer-micro quantized vectors so a DuckDB oracle reproduces the
      3-iteration assignment bit-for-bit.

e02/e04/e05 are fully oracle-gated: sign-LSH bucket keys, IVF routing
and quantized Lloyd's are all exact integer/sequential-fold arithmetic
replicated in generated DuckDB SQL (round 1 left them rows-only).
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
# testdata embeddings are 64-dim at every SF; a constant (rather than a
# plan-time .first() sniff) keeps plan construction action-free and lets
# the DuckDB oracle generate the identical plane tables.
EMBEDDING_DIM = 64


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


def _plane_signs(
    dim: int, planes: int = LSH_PLANES, seed: int = 0
) -> list[list[float]]:
    """Deterministic ±1.0 sign hyperplanes (no RNG state, no numpy on
    the driver hot path): sign(p,d) from a splitmix-style integer mix;
    ``seed`` derives independent tables. Sign planes (random-sign
    projections) are standard sign-LSH and — unlike dense float weights
    — make the bucket key an exactly cross-engine-reproducible sum of
    ±element terms."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            z = (
                (seed * 0xD6E8FEB86659FD93 + p * 0x9E3779B97F4A7C15
                 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB)
                % (1 << 64)
            )
            z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
            z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
            z = z ^ (z >> 31)
            row.append(1.0 if z >= (1 << 63) else -1.0)
        out.append(row)
    return out


def lsh_bucket_key(emb_col, dim: int, planes: int = LSH_PLANES, seed: int = 0):
    """Sign-of-projection bucket id (0..2^planes-1) as a Column.

    Each plane is ONE array literal (F.lit of the whole ±1 list), not
    dim CreateArray(Literal…) nodes — round 1's per-element literals
    bloated serialized tasks past the 1000 KiB warning threshold. The
    projection is the JVM sequential fold (functions.vectors.dot), so
    DuckDB's list_reduce reproduces the sign decision bit-for-bit."""
    hps = _plane_signs(dim, planes, seed)
    key = F.lit(0).cast("long")
    for p, row in enumerate(hps):
        sign_bit = F.when(
            dot(emb_col, F.lit(row)) > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        key = key + sign_bit
    return key


LSH_TABLES = 8
LSH_TABLE_PLANES = 4


def lsh_keys_batch(
    df: DataFrame,
    dim: int,
    tables: int,
    planes: int,
    seed0: int = 0,
    keep_embedding: bool = True,
) -> DataFrame:
    """All ``tables`` bucket keys per vector in ONE Arrow-batched numpy
    pass: (vec_id[, embedding], tbl, bucket), one row per (vector,
    table).

    Bit-identical to the interpreted ``lsh_bucket_key`` fold (and
    therefore to the DuckDB list_reduce oracle): per-element products
    are the same IEEE doubles, and np.cumsum accumulates them strictly
    left-to-right exactly like the JVM/DuckDB sequential folds — the
    equivalence is pinned by tests/test_similarity_recall.py::
    test_lsh_keys_batch_matches_jvm_fold and by every e02/d05 oracle
    row. The rewrite exists because Spark HOFs are interpreted:
    tables × planes × dim fold steps cost ~2 µs each (~8 s for 2000
    vectors at 8×4×64), while the same flops as a batched numpy pass
    are milliseconds."""
    import numpy as np
    import pandas as pd

    P = np.array(
        [_plane_signs(dim, planes, seed=seed0 + t) for t in range(tables)],
        dtype=np.float64,
    )  # (tables, planes, dim)
    shifts = 1 << np.arange(planes, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            mat = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
            if len(mat) == 0:
                continue
            # products then LEFT-TO-RIGHT prefix sum: same rounding as
            # the sequential folds in the JVM and DuckDB
            prods = mat[:, None, None, :] * P[None, :, :, :]
            proj = np.cumsum(prods, axis=-1)[..., -1]  # (n, tables, planes)
            keys = ((proj > 0).astype(np.int64) * shifts).sum(axis=-1)  # (n, tables)
            n = len(mat)
            out = {
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), tables),
                "tbl": np.tile(np.arange(tables, dtype=np.int32), n),
                "bucket": keys.reshape(-1),
            }
            if keep_embedding:
                out["embedding"] = [
                    e for e in pdf["embedding"] for _ in range(tables)
                ]
            yield pd.DataFrame(out)

    schema = "vec_id long" + (
        ", embedding array<float>" if keep_embedding else ""
    ) + ", tbl int, bucket long"
    return df.select("vec_id", "embedding").mapInPandas(kernel, schema)


def ann_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = KNN_K,
    tables: int = LSH_TABLES,
    planes: int = LSH_TABLE_PLANES,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: ``tables`` independent
    plane sets of ``planes`` bits; a candidate is scored iff it shares a
    bucket with the query in >=1 table (classic OR-of-ANDs
    amplification — one table of many planes has near-zero recall on
    unclustered vectors: measured 0.04 with a single 8-plane table vs
    0.56 with 8x4 on the fixture embeddings).

    At 100 TB the candidate side materializes (table, bucket) keys once
    (posexplode at write time); per query only the ``tables`` probed
    buckets are scanned — never the corpus. Recall/cost is tuned by
    (tables, planes): more planes -> smaller buckets, more tables ->
    higher recall.
    """
    def keys(df: DataFrame) -> DataFrame:
        return lsh_keys_batch(df, dim, tables, planes).select(
            "vec_id", "embedding", "tbl", "bucket"
        )

    q = keys(queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        "tbl",
        "bucket",
    )
    pairs = (
        keys(candidates)
        .join(F.broadcast(q), ["tbl", "bucket"])
        .select("qid", "q_emb", "vec_id", "embedding")
        .dropDuplicates(["qid", "vec_id"])
    )
    scored = pairs.select(
        "qid", "vec_id", cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


def _ann_lsh_oracle_sql(
    dim: int = EMBEDDING_DIM,
    tables: int = LSH_TABLES,
    planes: int = LSH_TABLE_PLANES,
) -> str:
    """DuckDB twin of ann_lsh: the ±1 sign planes are emitted as a
    literal VALUES table; the projection is list_reduce over the
    position-wise products, which folds left-to-right exactly like
    Spark's F.aggregate — so every bucket key (and therefore the
    candidate set, ranks, and cosines) is bit-identical."""
    rows = []
    for t in range(tables):
        for p, signs in enumerate(_plane_signs(dim, planes, seed=t)):
            lit = ", ".join(str(s) for s in signs)
            rows.append(f"({t}, {p}, [{lit}]::DOUBLE[])")
    values = ",\n      ".join(rows)
    return f"""
    WITH planes(tbl, p, s) AS (VALUES
      {values}
    ),
    keys AS (
      SELECT e.vec_id, pl.tbl,
             CAST(sum(CASE WHEN list_reduce(
                 list_transform(range(1, {dim + 1}),
                                i -> CAST(e.embedding[i] AS DOUBLE) * pl.s[i]),
                 (a, b) -> a + b) > 0
               THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, pl.tbl
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vec_id
      FROM keys q JOIN keys c ON q.tbl = c.tbl AND q.bucket = c.bucket
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    ),
    scored AS (
      SELECT cand.qid, cand.vec_id,
             list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                    CAST(ce.embedding AS DOUBLE[])) AS rawcos
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.qid
      JOIN embeddings ce ON ce.vec_id = cand.vec_id
    )
    SELECT qid, vec_id,
           CAST(row_number() OVER (PARTITION BY qid
                ORDER BY rawcos DESC, vec_id ASC) AS INT) AS rank,
           round(rawcos, 6) AS cos
    FROM scored QUALIFY rank <= {KNN_K}
    """


@register("e02_ann_lsh", oracle=_ann_lsh_oracle_sql())
def e02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        EMBEDDING_DIM,
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
    # argmax(cos) as min(struct(-cos, cand_label)): struct-min compares
    # lexicographically, so this IS the (cos DESC, cand_label ASC)
    # window order — but as a hash aggregate with MAP-SIDE partial min,
    # the exchange carries one row per vector instead of sorting the
    # full n_vectors x n_labels exploded set (VERDICT r03 #4)
    best = scored.groupBy("vec_id", "label").agg(
        F.min(
            F.struct((-F.col("cos")).alias("nc"), F.col("cand_label").alias("cl"))
        ).alias("b")
    )
    return best.select(
        "vec_id",
        "label",
        F.col("b.cl").cast("int").alias("assigned_label"),
        (F.col("label") == F.col("b.cl")).alias("is_own_label"),
    )


# --- IVF search (routing + per-cell exact) -----------------------------------


def ivf_knn(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = KNN_K,
    nprobe: int = 1,
) -> DataFrame:
    """IVF composition — the 100 TB ANN path: route every candidate to
    its nearest centroid cell once (write-time partitioning in a real
    index), route each query to its ``nprobe`` nearest cells, then run
    the exact cosine top-k only inside probed cells. Cost per query is
    |cell| x nprobe instead of |corpus|; the cell id doubles as the
    shuffle/partition key so a probe touches one partition.

    centroids: (cand_label, centroid) as produced by label_centroids
    (k-means would slot in identically — assignment is by nearest
    centroid, whatever produced them).
    """
    # Routing is PER-ROW arithmetic over the (tiny, index-metadata-sized)
    # centroid table, so it must not shuffle: the centroids are folded
    # into ONE row holding an array<struct<cell,centroid>> and
    # broadcast-cross-joined onto every vector (a 1-row nested-loop —
    # the broadcast-dimension degenerate case), then each row sorts its
    # own score array.  struct sort on (-cos, cell) IS the
    # (cos DESC, cell ASC) window order, with no Window operator and no
    # exchange of the n_vectors x n_cells scored set (VERDICT r04 #5 —
    # the shape e03/e05 shed in r03; the candidate side n=1 is a plain
    # array_min).  cosine_similarity is the same sequential F.aggregate
    # fold as everywhere else, so the doubles match the oracle exactly.
    cent_row = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("cand_label").alias("cell"), F.col("centroid"))
                )
            ).alias("cents")
        )
    )

    def nearest_cells(df: DataFrame, id_col: str, n: int) -> DataFrame:
        scores = F.array_sort(
            F.transform(
                "cents",
                lambda c: F.struct(
                    (-cosine_similarity(F.col("embedding"), c["centroid"])).alias(
                        "nc"
                    ),
                    c["cell"].alias("cl"),
                ),
            )
        )
        scored = df.crossJoin(cent_row).select(
            F.col(id_col), F.slice(scores, 1, n).alias("top")
        )
        if n == 1:
            return scored.select(
                id_col, F.element_at("top", 1)["cl"].alias("cell")
            )
        return scored.select(
            id_col,
            F.explode(F.transform("top", lambda s: s["cl"])).alias("cell"),
        )

    cand_cells = nearest_cells(candidates, "vec_id", 1)
    routed = candidates.join(cand_cells, "vec_id")

    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"))
    q_cells = nearest_cells(
        queries.select(F.col("vec_id"), "embedding"), "vec_id", nprobe
    ).select(F.col("vec_id").alias("qid"), "cell")

    probed = q_cells.join(F.broadcast(q), "qid").join(routed, "cell").select(
        "qid",
        "vec_id",
        cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        probed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", F.round("cos", 6).alias("cos"))
    )


IVF_NPROBE = 4


def _ivf_oracle_sql(nprobe: int = IVF_NPROBE) -> str:
    """DuckDB twin of ivf_knn: same label-mean centroids as e03's
    (proven-matching) oracle, candidate routing rn=1, query routing
    rn<=nprobe, exact cosine rank inside probed cells."""
    return f"""
    WITH pos AS (
      SELECT label, unnest(embedding) AS v,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM embeddings
    ), cent AS (
      SELECT label AS cell, list(m ORDER BY pos) AS centroid
      FROM (SELECT label, pos, avg(v) AS m FROM pos GROUP BY label, pos)
      GROUP BY label
    ), cand_cells AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.centroid) DESC,
                          c.cell ASC) AS crn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id >= {N_QUERIES})
      WHERE crn = 1
    ), q_cells AS (
      SELECT vec_id AS qid, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.centroid) DESC,
                          c.cell ASC) AS crn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < {N_QUERIES})
      WHERE crn <= {nprobe}
    ), scored AS (
      SELECT qc.qid, cc.vec_id,
             list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                    CAST(ce.embedding AS DOUBLE[])) AS rawcos
      FROM q_cells qc
      JOIN cand_cells cc ON cc.cell = qc.cell
      JOIN embeddings qe ON qe.vec_id = qc.qid
      JOIN embeddings ce ON ce.vec_id = cc.vec_id
    )
    SELECT qid, vec_id,
           CAST(row_number() OVER (PARTITION BY qid
                ORDER BY rawcos DESC, vec_id ASC) AS INT) AS rank,
           round(rawcos, 6) AS cos
    FROM scored QUALIFY rank <= {KNN_K}
    """


@register("e04_ivf_knn", oracle=_ivf_oracle_sql())
def e04_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(emb).select(F.col("label").alias("cand_label"), "centroid")
    return ivf_knn(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        cent,
        nprobe=IVF_NPROBE,
    )


# --- k-means (iterative Lloyd's) ---------------------------------------------


def sq_dist(a, b):
    """Squared euclidean distance between two array columns (JVM fold).

    The square is an explicit multiply, not ``** 2`` (Math.pow) — the
    multiply is the expression DuckDB's oracle also evaluates, so the
    folded d2 is bit-identical across engines when the inputs are."""
    def term(x, y):
        d = x.cast("double") - y.cast("double")
        return d * d

    return F.aggregate(
        F.zip_with(a, b, term), F.lit(0.0), lambda acc, x: acc + x
    )


def kmeans(
    emb: DataFrame,
    centroids: DataFrame,
    iters: int = 5,
) -> tuple[DataFrame, DataFrame, list[float]]:
    """Lloyd's algorithm on DataFrames (no MLlib): assignment = broadcast
    centroid join + argmin squared-L2 (window); update = element-wise
    mean via posexplode + rebuild. Returns (assignments, final
    centroids, per-iteration inertia).

    Deterministic given deterministic init (ties broken on cell id).
    Each iteration: one broadcast join + one narrow window + one
    two-level agg — the canonical scale shape (centroids are always the
    broadcast side; vectors never shuffle except the posexplode agg).
    """
    cent = centroids.select("cell", "centroid")
    inertias: list[float] = []
    assigned = None
    prev = None
    for _ in range(max(1, iters)):
        scored = emb.join(F.broadcast(cent)).select(
            "vec_id",
            "embedding",
            "cell",
            sq_dist(F.col("embedding"), F.col("centroid")).alias("d2"),
        )
        # argmin via min(struct(d2, cell, embedding)): (d2, cell) is the
        # exact (d2 ASC, cell ASC) tie order and is unique per vector, so
        # the trailing embedding never decides — it just rides along.
        # Hash agg with map-side partial min: the per-iteration exchange
        # carries one row per vector, not the k-times-exploded sort input
        assigned = (
            scored.groupBy("vec_id")
            .agg(
                F.min(F.struct("d2", "cell", "embedding")).alias("b")
            )
            .select(
                "vec_id",
                F.col("b.embedding").alias("embedding"),
                F.col("b.cell").alias("cell"),
                F.col("b.d2").alias("d2"),
            )
            .persist()
        )
        inertias.append(assigned.agg(F.sum("d2")).collect()[0][0])
        if prev is not None:
            prev.unpersist()
        prev = assigned
        pos = assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
        # sum/count, not avg(): Spark's Average sums doubles in partition
        # order; over integer (quantized) inputs sum() is the exact long
        # sum and the division is the identical IEEE op in DuckDB
        means = pos.groupBy("cell", "pos").agg(
            (F.sum("v") / F.count(F.lit(1))).alias("m")
        )
        cent = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
    return assigned.select("vec_id", "cell", "d2"), cent, inertias


KMEANS_ITERS = 3
MICROS = 1000000.0


def quantize_micros(emb_col):
    """array<float> -> array<long> integer micro-units via floor (floor
    has no midpoint rule, so engines cannot disagree the way HALF_UP
    vs half-away rounding can)."""
    return F.transform(
        emb_col, lambda v: F.floor(v.cast("double") * F.lit(MICROS)).cast("long")
    )


def _kmeans_oracle_sql(iters: int = KMEANS_ITERS, dim: int = EMBEDDING_DIM) -> str:
    """DuckDB twin of the quantized e05: every arithmetic step is the
    identical IEEE expression in both engines — exact long sums /
    count for centroids, sequential-fold (a-b)*(a-b) for d2 — so the
    iterative assignment is reproducible bit-for-bit (the q23/q24
    integer-cents technique applied to k-means)."""
    d2 = (
        "list_reduce(list_transform(range(1, {n}), "
        "i -> (CAST(e.eq[i] AS DOUBLE) - c.centroid[i]) "
        "* (CAST(e.eq[i] AS DOUBLE) - c.centroid[i])), (a, b) -> a + b)"
    ).format(n=dim + 1)
    parts = [
        """
    WITH emb_q AS (
      SELECT vec_id, label,
             [CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) FOR v IN embedding] AS eq
      FROM embeddings
    ), cent0 AS (
      SELECT label AS cell, list(m ORDER BY pos) AS centroid
      FROM (
        SELECT label, pos, CAST(sum(x) AS BIGINT) / count(*) AS m
        FROM (SELECT label, unnest(eq) AS x,
                     unnest(range(1, len(eq) + 1)) AS pos FROM emb_q)
        GROUP BY label, pos)
      GROUP BY label
    )"""
    ]
    prev_cent = "cent0"
    for it in range(1, iters + 1):
        parts.append(f""", assign{it} AS (
      SELECT vec_id, eq, cell, d2 FROM (
        SELECT e.vec_id, e.eq, c.cell, {d2} AS d2,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {d2} ASC, c.cell ASC) AS rn
        FROM emb_q e CROSS JOIN {prev_cent} c)
      WHERE rn = 1
    )""")
        if it < iters:
            parts.append(f""", cent{it} AS (
      SELECT cell, list(m ORDER BY pos) AS centroid
      FROM (
        SELECT cell, pos, CAST(sum(x) AS BIGINT) / count(*) AS m
        FROM (SELECT cell, unnest(eq) AS x,
                     unnest(range(1, len(eq) + 1)) AS pos FROM assign{it})
        GROUP BY cell, pos)
      GROUP BY cell
    )""")
            prev_cent = f"cent{it}"
    parts.append(
        f"""
    SELECT vec_id, CAST(cell AS INT) AS cell, d2 FROM assign{iters}
    """
    )
    return "".join(parts)


def label_centroids_exact(embq: DataFrame) -> DataFrame:
    """Per-label exact mean of quantized (long) embeddings: exact long
    sum / count, so the init centroids match DuckDB bit-for-bit."""
    pos = embq.select("label", F.posexplode("eq").alias("pos", "x"))
    means = pos.groupBy("label", "pos").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("m")
    )
    return (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


@register("e05_kmeans", oracle=_kmeans_oracle_sql())
def e05_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd iterations from the per-label-mean init (deterministic).

    Runs on integer-micro quantized embeddings so every assignment and
    distance is bit-reproducible in the DuckDB oracle (see
    _kmeans_oracle_sql) — round 1 left e05 as a rows-only entry; this
    makes the iterative algorithm independently verified."""
    emb = load_table(spark, sf_dir, "embeddings")
    embq = emb.select("vec_id", "label", quantize_micros(F.col("embedding")).alias("eq"))
    init = label_centroids_exact(embq).select(
        F.col("label").cast("int").alias("cell"), "centroid"
    )
    assigned, _cent, _inertia = kmeans(
        embq.select("vec_id", F.col("eq").alias("embedding")), init, iters=KMEANS_ITERS
    )
    return assigned
