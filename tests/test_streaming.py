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


def _stage_event_files(spark, sf_dir, tmpdir, splits, shuffle_ranges=False):
    """Stage the events table as multiple single-file writes, one per
    event-time range, with increasing mtimes so the file source's
    oldest-first ordering drains them as separate micro-batches in the
    given range order."""
    import glob
    import os
    import shutil
    import time as _time

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("tsx", F.col("ts").cast("timestamp"))
    )
    bounds = ev.selectExpr(
        *[f"percentile(cast(tsx AS DOUBLE), {p}) AS p{i}" for i, p in enumerate(splits)]
    ).collect()[0]
    cuts = [None] + [bounds[i] for i in range(len(splits))] + [None]
    ranges = list(range(len(cuts) - 1))
    if shuffle_ranges:
        ranges = ranges[::-1]  # later time ranges arrive FIRST
    for seq, i in enumerate(ranges):
        part = ev
        if cuts[i] is not None:
            part = part.filter(F.col("tsx").cast("double") > cuts[i])
        if cuts[i + 1] is not None:
            part = part.filter(F.col("tsx").cast("double") <= cuts[i + 1])
        tmp = os.path.join(tmpdir, f"_stage{seq}")
        part.drop("tsx").coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(tmpdir, f"events_{seq:03d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + seq * 60, 1_700_000_000 + seq * 60))
        _time.sleep(0.05)


def test_value_milestones_multibatch_ordered(spark, sf_dir, tmp_path_factory):
    """Event-time-partitioned arrival (the crawl-ingest deployment
    shape), one file per trigger => three micro-batches; the stateful
    accumulation must still equal the batch window-cumsum twin."""
    from ocr_spark.streaming.ingest import value_milestones, value_milestones_batch

    d = str(tmp_path_factory.mktemp("ms_ordered"))
    _stage_event_files(spark, sf_dir, d, splits=[0.33, 0.66])
    q = value_milestones(spark, d, name="ms_mb", max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        assert q.lastProgress is not None
        got = {
            (r.user_id, r.milestone, r.cum_cents)
            for r in spark.table("ms_mb").collect()
        }
    finally:
        q.stop()
    want = {
        (r.user_id, r.milestone, r.cum_cents)
        for r in value_milestones_batch(spark, sf_dir).collect()
    }
    assert want and got == want


def test_value_milestones_disordered_arrival_raises(spark, sf_dir, tmp_path_factory):
    """If a later micro-batch delivers events BEHIND a group's event-time
    high-water mark, the operator must fail loudly, not accumulate in
    arrival order (silent divergence from the batch truth)."""
    import pytest

    from ocr_spark.streaming.ingest import value_milestones

    d = str(tmp_path_factory.mktemp("ms_disordered"))
    _stage_event_files(spark, sf_dir, d, splits=[0.5], shuffle_ranges=True)
    q = value_milestones(spark, d, name="ms_dis", max_files_per_trigger=1)
    try:
        with pytest.raises(Exception, match="out-of-order arrival"):
            q.processAllAvailable()
            if q.exception() is not None:
                raise q.exception()
    finally:
        q.stop()


# --- kafka:// source seam (unit-level: no broker/connector in-sandbox) --------


def test_kafka_uri_parse_and_dispatch():
    import pytest as _pytest

    from ocr_spark.streaming.ingest import _parse_kafka_uri

    assert _parse_kafka_uri("kafka://h1:9092/events") == ("h1:9092", "events")
    assert _parse_kafka_uri("kafka://h1:9092,h2:9092/crawl.events") == (
        "h1:9092,h2:9092",
        "crawl.events",
    )
    for bad in ("kafka://justhost", "kafka:///topic", "kafka://h:9092/"):
        with _pytest.raises(ValueError):
            _parse_kafka_uri(bad)


def test_kafka_route_reaches_connector(spark):
    """A kafka:// events_src must dispatch to the connector source: in
    this jar-less sandbox that surfaces as the DATA_SOURCE_NOT_FOUND
    error for 'kafka' (proving the seam routed there), never a
    file-source path error."""
    import pytest as _pytest

    from ocr_spark.streaming.ingest import read_events_stream

    with _pytest.raises(Exception, match="(?i)kafka"):
        read_events_stream(spark, "kafka://h1:9092/events")
