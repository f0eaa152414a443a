"""Extraction throughput benchmark (docs/sec) on the deterministic
synthetic corpus — the BASELINE.json headline metric. Used by bench.py
and by the two-parallelism scaling evidence in BENCH/.

The corpus is staged to parquet once and read back for the timed pass:
timing a createDataFrame(pandas) input would serialize the whole corpus
into the task closures (round 1's "task of very large size" warnings)
and measure local-collection scan, not the parquet-scan shape the
production job has.
"""

from __future__ import annotations

import os
import tempfile
import time

from ocr_spark.extract.pipeline import extract_pages


def stage_corpus(spark, n_docs: int) -> str:
    """Write the deterministic fixture corpus to a reusable parquet dir
    (keyed by size; gen_corpus is seeded so reuse is exact)."""
    staging = os.path.join(tempfile.gettempdir(), f"ocr_spark_bench_pages_{n_docs}")
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        from ocr_spark.fixtures import pages_df

        pages_df(spark, n_docs).write.mode("overwrite").parquet(staging)
    return staging


def extraction_throughput(spark, n_docs: int | None = None) -> float:
    n_docs = n_docs or int(os.environ.get("SPARK_GRAFT_EXTRACT_DOCS", "16000"))
    staging = stage_corpus(spark, n_docs)
    # materialize the input once so scan/IO cost is excluded from the
    # timed pass — the metric is EXTRACTION throughput (same isolation
    # the round-1 number used, minus the createDataFrame task bloat).
    # repartition before caching: a small parquet dir reads back as 1-2
    # splits, which would serialize the pre-exchange stage of the run
    par = spark.sparkContext.defaultParallelism
    pages = spark.read.parquet(staging).repartition(par * 2).persist()
    pages.count()
    best = 0.0
    for _ in range(3):  # best-of-3: shared-host noise perturbs single shots ±30%
        t0 = time.perf_counter()
        n = extract_pages(pages).count()
        dt = time.perf_counter() - t0
        assert n == n_docs
        best = max(best, n / dt)
    pages.unpersist()
    return round(best, 2)
