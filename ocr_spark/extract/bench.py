"""Extraction throughput benchmark (docs/sec) on the deterministic
synthetic corpus — the BASELINE.json headline metric. Used by bench.py
and by the two-parallelism scaling evidence in BENCH/."""

from __future__ import annotations

import os
import time

from ocr_spark.extract.pipeline import extract_pages


def extraction_throughput(spark, n_docs: int | None = None) -> float:
    n_docs = n_docs or int(os.environ.get("SPARK_GRAFT_EXTRACT_DOCS", "16000"))
    from ocr_spark.fixtures import pages_df

    pages = pages_df(spark, n_docs)
    # materialize the input once so generation cost is excluded from the
    # timed extraction pass
    pages = pages.persist()
    pages.count()
    t0 = time.perf_counter()
    n = extract_pages(pages).count()
    dt = time.perf_counter() - t0
    pages.unpersist()
    return round(n / dt, 2)
