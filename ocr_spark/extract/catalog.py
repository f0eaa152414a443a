"""Extraction-pipeline catalog entries (rows-only driver checks — the
pipeline's real correctness gate is the golden byte-diff in
tests/test_extract_golden.py; these entries prove the Spark plumbing
end-to-end under the driver's smoke harness).

The fixture corpus is generated deterministically in-memory (seeded,
FIXTURES.md) — results are stable across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.extract.pipeline import extract_pages
from ocr_spark.operators.partitioning import skew_report
from ocr_spark.plans import register

_N_DOCS = 200


def _fixture_pages(spark: SparkSession) -> DataFrame:
    from ocr_spark.fixtures import pages_df

    return pages_df(spark, _N_DOCS)


@register("x01_extract_pipeline")
def x01_extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline over the fixture corpus; deterministic digest rows."""
    out = extract_pages(_fixture_pages(spark))
    return out.select(
        "url",
        "branch",
        "n_blocks_kept",
        F.octet_length("extracted_text").alias("n_bytes"),
        F.md5(F.hex("extracted_text")).alias("digest"),
    ).orderBy("url")


@register("x02_golden_match")
def x02_golden_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-branch golden byte-identity rate (must be 1.0 everywhere)."""
    from ocr_spark.fixtures import golden_df

    out = extract_pages(_fixture_pages(spark))
    g = golden_df(spark, _N_DOCS)
    # golden set is dimension-sized at any corpus scale -> broadcast,
    # never shuffle the extracted side for the verification join
    joined = out.join(F.broadcast(g), "url")
    return (
        joined.groupBy(F.col("golden_branch").alias("branch"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.avg((F.col("extracted_text") == F.col("golden_text")).cast("double")), 6
            ).alias("byte_match_rate"),
            F.round(
                F.avg((F.col("n_blocks_kept") == F.col("golden_n_blocks")).cast("double")), 6
            ).alias("block_count_match_rate"),
        )
        .orderBy("branch")
    )


@register("x03_skew_report")
def x03_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-class histogram of the fixture corpus (partitioning diagnostic)."""
    return skew_report(_fixture_pages(spark))


@register("x04_multimodal_features")
def x04_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary feature extraction plumbing (stubbed decode) over the
    fixture payloads; deterministic rows-only check."""
    from ocr_spark.operators.multimodal import image_features

    pages = _fixture_pages(spark).filter(F.col("html").isNotNull())
    feats = image_features(pages.select("url", F.col("html").alias("payload")))
    return feats.select(
        "url", "n_bytes", "width", "height", "n_channels", "error"
    ).orderBy("url")


@register("x05_frame_sample")
def x05_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many frame expansion plumbing (video sampling shape)."""
    from ocr_spark.operators.multimodal import sample_frames

    pages = _fixture_pages(spark).filter(F.col("html").isNotNull())
    return sample_frames(pages.select("url", F.col("html").alias("payload"))).orderBy(
        "url", "frame_idx"
    )


@register("x06_audio_windows")
def x06_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality windowing plumbing (stubbed decode) over fixture
    payloads; deterministic rows-only check."""
    from ocr_spark.operators.multimodal import audio_windows

    pages = _fixture_pages(spark).filter(F.col("html").isNotNull())
    return audio_windows(pages.select("url", F.col("html").alias("payload"))).orderBy(
        "url", "win_idx"
    )
