"""Structured Streaming variants of the batch operators.

The reference is a batch-to-completion runtime with no streaming, but two
of its event semantics map directly (SURVEY.md §1.3):
  IDEM events ("first satisfy wins", `/root/reference/src/event/hc/
  hc-event.c:202-208`)  -> dedup-on-arrival (dropDuplicates within the
  watermark);
  LATCH counters        -> windowed stateful counts.

Each helper returns a started query writing to an in-memory sink; callers
(tests, demos) use ``q.processAllAvailable()`` to drive a parquet-backed
stream to completion synchronously. On a cluster the same plans run
against file/Kafka sources unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str):
    # the file source requires a directory: stream the sf dir, glob-
    # filtered to the events file(s)
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir if sf_dir.endswith("/") else sf_dir + "/")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def tumbling_counts(spark: SparkSession, sf_dir: str, name: str = "tumbling_out"):
    """Streaming twin of q19_tumbling_window (1h windows, 2h watermark)."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )


def session_windows(spark: SparkSession, sf_dir: str, name: str = "sessions_out"):
    """Session windows with a 30-minute gap — the streaming twin of
    q09_sessionize's lag+cumsum construction."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events")
    )
    return (
        agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    )


def dedup_on_arrival(spark: SparkSession, sf_dir: str, name: str = "dedup_out"):
    """IDEM-event semantics: the first event_id wins, later duplicates are
    silently dropped (state bounded by the watermark)."""
    events = read_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts", "2 hours")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        deduped.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
