"""Kill/resume semantics (FIXTURES.md §3): after K of N buckets commit,
a resumed run recomputes exactly N-K buckets, committed checksums are
unchanged, and the final output is complete and golden-correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.fixtures import golden_df, pages_df
from ocr_spark.operators.lineage import (
    read_metrics,
    run_complete,
    run_extraction,
    run_rollup_complete,
    size_class_latches,
)
from ocr_spark.operators.partitioning import with_size_buckets

N_DOCS = 300
K = 5


@pytest.fixture(scope="module")
def pages(spark):
    p = pages_df(spark, N_DOCS).persist()
    p.count()
    yield p
    p.unpersist()


def test_kill_resume(spark, pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lineage_run"))
    n_buckets = (
        with_size_buckets(pages.select("url", "html", "text"))
        .select("bucket")
        .distinct()
        .count()
    )
    assert n_buckets > K

    # phase 1: "killed" after K bucket commits
    s1 = run_extraction(spark, pages, out, run_id="r1", max_buckets=K)
    assert s1["buckets_processed"] == K
    m1 = read_metrics(spark, out).filter(F.col("run_id") == "r1")
    committed1 = {
        (r.partition_id, r.checksum, r.input_count) for r in m1.collect()
    }
    assert len(committed1) == K
    assert not run_complete(spark, out, "r1", n_buckets)

    # phase 2: resume — must recompute exactly N-K buckets
    s2 = run_extraction(spark, pages, out, run_id="r1")
    assert s2["buckets_processed"] == n_buckets - K
    assert run_complete(spark, out, "r1", n_buckets)

    m2 = read_metrics(spark, out).filter(F.col("run_id") == "r1")
    all_rows = {(r.partition_id, r.checksum, r.input_count) for r in m2.collect()}
    assert len(all_rows) == n_buckets
    # idempotent markers: phase-1 commits unchanged
    assert committed1 <= all_rows
    # totals reconcile
    assert sum(c for _, _, c in all_rows) == N_DOCS

    # phase 3: re-run of a complete run is a no-op
    s3 = run_extraction(spark, pages, out, run_id="r1")
    assert s3["buckets_processed"] == 0

    # output complete and golden-correct
    data = spark.read.parquet(f"{out}/extracted")
    assert data.count() == N_DOCS
    g = golden_df(spark, N_DOCS)
    bad = (
        data.join(g, "url")
        .filter(F.col("extracted_text") != F.col("golden_text"))
        .count()
    )
    assert bad == 0


def test_size_class_rollup(spark, pages, tmp_path_factory):
    """Nested finish scopes: after a partial run the per-class latches
    report mixed progress that sums to the flat view; after resume every
    class latch closes and the roll-up agrees with run_complete."""
    out = str(tmp_path_factory.mktemp("lineage_rollup"))
    bucketed = with_size_buckets(pages.select("url", "html", "text"))
    n_buckets = bucketed.select("bucket").distinct().count()

    run_extraction(spark, pages, out, run_id="r2", max_buckets=K)
    latches = size_class_latches(spark, out, "r2", bucketed).collect()
    assert sum(r.n_expected for r in latches) == n_buckets
    assert sum(r.n_committed for r in latches) == K
    assert not run_rollup_complete(spark, out, "r2", bucketed)

    run_extraction(spark, pages, out, run_id="r2")
    latches = size_class_latches(spark, out, "r2", bucketed).collect()
    assert all(r.complete for r in latches)
    assert run_rollup_complete(spark, out, "r2", bucketed)
    assert run_complete(spark, out, "r2", n_buckets)
