"""Training-sample chunking: split documents into fixed-size token
windows with overlap — the context-length packing prep every LLM
training pipeline runs between cleaning and tokenization.

Pure column expressions: token split, window-start generation
(sequence), posexplode, slice, join — narrow throughout, zero shuffle,
zero Python. A 100 TB chunking pass is one codegen'd scan whose output
is larger than its input (overlap factor window/stride); the only knob
that matters at scale is writing the chunks partitioned by the same
url/doc bucketing as the source so downstream sampling stays
co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import TOKENS_SQL, norm_tokens
from ocr_spark.plans import register
from ocr_spark.sources.io import load_table

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """One row per (doc, chunk): chunk_idx, token offset, chunk length,
    md5 digest of the space-joined chunk (the digest stands in for the
    chunk text so the driver compare stays value-hashable)."""
    toks = docs.select("doc_id", norm_tokens(text_col).alias("ts")).filter(
        F.size("ts") > 0
    )
    starts = F.sequence(F.lit(0), F.size("ts") - 1, F.lit(stride))
    chunks = toks.select(
        "doc_id", F.size("ts").alias("n_tokens"), "ts",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    chunk = F.slice(F.col("ts"), F.col("start_tok") + 1, window)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_digest"),
    )


@register(
    "p01_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter({TOKENS_SQL.format(col='text')}, t -> t <> '') AS ts
      FROM documents
    ), starts AS (
      SELECT doc_id, ts,
             unnest(range(0, len(ts), {CHUNK_STRIDE})) AS start_tok,
             unnest(range(0, CAST(ceil(len(ts) / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_idx
      FROM toks WHERE len(ts) > 0
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(start_tok AS INT) AS start_tok,
           CAST(len(ts[start_tok + 1 : start_tok + {CHUNK_TOKENS}]) AS INT)
             AS n_chunk_tokens,
           md5(array_to_string(ts[start_tok + 1 : start_tok + {CHUNK_TOKENS}], ' '))
             AS chunk_digest
    FROM starts
    """,
)
def p01_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load_table(spark, sf_dir, "documents"))
