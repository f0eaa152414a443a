"""Connected-components stress tests for dup_clusters.

Round-1 advice repro: a deep chain graph. Plain one-hop min-label
propagation with uncheckpointed lineage OOM'd the driver at 12 nodes
(plan grows exponentially); the fixed operator localCheckpoints each
round and pointer-jumps, so a long chain converges in O(log n) rounds
with flat plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import dup_clusters


def _chain(spark, n):
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = (
        spark.range(n - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    return docs, pairs


def test_deep_chain_converges(spark):
    # 48-node path: diameter 47; needs ~6 doubling rounds, not 47.
    docs, pairs = _chain(spark, 48)
    out = dup_clusters(docs, pairs).collect()
    assert len(out) == 48
    assert all(r.cluster_id == 0 for r in out)


def test_two_components_and_singleton(spark):
    docs = spark.range(7).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5), (5, 6)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 4}


def test_nonconvergence_raises(spark):
    docs, pairs = _chain(spark, 48)
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(docs, pairs, max_iters=2)
