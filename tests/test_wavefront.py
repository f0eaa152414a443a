"""w01 wavefront DP: differential vs an independent edit-distance
implementation (Spark's JVM levenshtein), plus the bounded-lineage plan
property the reference's tile-dataflow version gets from event-driven
scheduling (smithwaterman.c wires tile EDTs; here each wave is a
checkpointed frontier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.wavefront import wavefront_editdist
from ocr_spark.plans import QUERIES, load_all

load_all()


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_wavefront_matches_jvm_levenshtein(spark):
    """Ragged lengths (incl. non-tile multiples, sub-tile, empty) with a
    deliberately tiny tile so every pair crosses many anti-diagonals."""
    import random

    rng = random.Random(7)
    alpha = "abcdef "
    texts = [""]
    for _ in range(29):
        n = rng.choice([0, 1, 5, 15, 16, 17, 40, 63, 64, 65, 100, 150])
        texts.append("".join(rng.choice(alpha) for _ in range(n)))
    docs = _mk_docs(spark, texts)
    got = {
        (r.a_id, r.b_id): r.dist
        for r in wavefront_editdist(docs, maxlen=120, tile=16, step=1).collect()
    }
    a = docs.select(F.col("doc_id").alias("a_id"), F.substring("text", 1, 120).alias("a"))
    b = docs.select(F.col("doc_id").alias("b_id"), F.substring("text", 1, 120).alias("b"))
    want = {
        (r.a_id, r.b_id): r.d
        for r in a.join(b, a.a_id + 1 == b.b_id)
        .select("a_id", "b_id", F.levenshtein("a", "b").alias("d"))
        .collect()
    }
    assert got == want


def test_wavefront_identical_and_disjoint(spark):
    texts = ["hello world" * 10, "hello world" * 10, "zzz", "hello world"]
    docs = _mk_docs(spark, texts)
    got = {
        (r.a_id, r.b_id): r.dist
        for r in wavefront_editdist(docs, maxlen=256, tile=64, step=1).collect()
    }
    assert got[(0, 1)] == 0
    assert got[(1, 2)] == len("hello world" * 10)  # replace 3, insert rest
    assert got[(2, 3)] == 11


def test_wavefront_lineage_bounded(spark, sf_dir):
    """Every wave is localCheckpoint()ed: the final plan must contain no
    MapInPandas chain (frontiers are materialized RDD scans), so plan
    size is O(waves), independent of grid depth."""
    df = QUERIES["w01_wavefront_editdist"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in plan
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan
