"""Structured Streaming ops driven to completion on parquet-backed
streams; each must agree with its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans import QUERIES, load_all
from ocr_spark.streaming.ingest import dedup_on_arrival, session_windows, tumbling_counts

load_all()


def test_tumbling_matches_batch(spark, sf_dir):
    q = tumbling_counts(spark, sf_dir, name="t_tumbling")
    try:
        q.processAllAvailable()
        stream_rows = {
            (r.window_start, r.event_type): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM t_tumbling").collect()
        }
    finally:
        q.stop()
    batch_rows = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in QUERIES["q19_tumbling_window"](spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_session_window_totals(spark, sf_dir):
    q = session_windows(spark, sf_dir, name="t_sessions")
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT sum(n_events) AS n FROM t_sessions").collect()[0].n
    finally:
        q.stop()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out == n_events


def test_dedup_on_arrival(spark, sf_dir):
    q = dedup_on_arrival(spark, sf_dir, name="t_dedup")
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT sum(n) AS n FROM t_dedup").collect()[0].n
    finally:
        q.stop()
    distinct_ids = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.countDistinct("event_id").alias("n"))
        .collect()[0]
        .n
    )
    assert out == distinct_ids


def test_value_milestones_stateful(spark, sf_dir):
    """applyInPandasWithState stream == batch window-cumsum twin."""
    from ocr_spark.streaming.ingest import value_milestones, value_milestones_batch

    q = value_milestones(spark, sf_dir, name="milestones_t")
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.milestone, r.cum_cents)
            for r in spark.table("milestones_t").collect()
        }
    finally:
        q.stop()
    want = {
        (r.user_id, r.milestone, r.cum_cents)
        for r in value_milestones_batch(spark, sf_dir).collect()
    }
    assert want, "fixture produced no milestones — threshold too high"
    assert got == want


def test_streaming_extract_matches_batch(spark, tmp_path_factory):
    """The streaming extraction pipeline must produce the same per-url
    digest rows as the batch pipeline over the same page files."""
    from pyspark.sql import functions as F

    from ocr_spark.extract.pipeline import extract_pages
    from ocr_spark.fixtures import pages_df
    from ocr_spark.streaming.ingest import streaming_extract

    pages_dir = str(tmp_path_factory.mktemp("stream_pages"))
    pages = pages_df(spark, 120)
    pages.write.mode("overwrite").parquet(pages_dir)

    q = streaming_extract(spark, pages_dir, name="extract_stream_t")
    try:
        q.processAllAvailable()
        got = {
            (r.url, r.branch, r.n_blocks_kept, r.n_bytes)
            for r in spark.table("extract_stream_t").collect()
        }
    finally:
        q.stop()

    want = {
        (r.url, r.branch, r.n_blocks_kept, r.n_bytes)
        for r in extract_pages(spark.read.parquet(pages_dir))
        .select("url", "branch", "n_blocks_kept", F.octet_length("extracted_text").alias("n_bytes"))
        .collect()
    }
    assert got == want
