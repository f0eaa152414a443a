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


def chunk_token_arrays(
    toks: DataFrame,
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Chunk any (doc_id, ts: array<string>) frame: one row per
    (doc, chunk) with chunk_idx, token offset, chunk length, md5 digest
    of the space-joined chunk (the digest stands in for the chunk text
    so the driver compare stays value-hashable)."""
    toks = toks.filter(F.size("ts") > 0)
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


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    return chunk_token_arrays(
        docs.select("doc_id", norm_tokens(text_col).alias("ts")), window, stride
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


# --- sequence packing ---------------------------------------------------------

PACK_CAP = 64  # context budget in tokens (2 full chunks)
PACK_GROUPS = 8


def pack_chunks(chunks: DataFrame) -> DataFrame:
    """Next-fit sequence packing of chunks into context windows — the
    packing step between chunking and tokenization that keeps training
    batches dense.

    Global greedy packing is inherently sequential, so the distributed
    shape salts chunks into ``PACK_GROUPS`` independent groups (hash of
    doc_id) and packs each group in parallel with a deterministic
    next-fit over (doc_id, chunk_idx) order — the waste bound vs global
    next-fit is at most one partially-filled bin per group, and at
    corpus scale groups ~ cores so the loss is negligible. The per-group
    pass is an Arrow-batched applyInPandas (the sanctioned stateful
    pattern, like the s04 latch); everything upstream/downstream stays
    JVM. Integer token counts only, so the DuckDB recursive-CTE oracle
    reproduces every bin assignment exactly."""
    import pandas as pd

    from ocr_spark.functions.text import hex60

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        bins = []
        bin_idx, running = 0, 0
        for i, n in enumerate(pdf["n_chunk_tokens"]):
            n = int(n)
            if i == 0:
                running = n
            elif running + n > PACK_CAP:
                bin_idx += 1
                running = n
            else:
                running += n
            bins.append(bin_idx)
        pdf = pdf.assign(bin_idx=bins)
        return pdf[["doc_id", "chunk_idx", "pack_group", "bin_idx", "n_chunk_tokens"]]

    withg = chunks.withColumn(
        "pack_group",
        F.pmod(hex60(F.col("doc_id").cast("string")), F.lit(PACK_GROUPS)).cast("int"),
    )
    return withg.groupBy("pack_group").applyInPandas(
        pack,
        "doc_id long, chunk_idx int, pack_group int, bin_idx int, n_chunk_tokens int",
    )


def pack_packed_ctes_sql(chunk_ctes: str) -> str:
    """CTE body (for a WITH RECURSIVE) extending any chain ending in
    ``chunks(doc_id, chunk_idx, n, pack_group)`` with the deterministic
    next-fit packing recursion, ending in CTE ``packed(doc_id,
    chunk_idx, pack_group, bin_idx, n_chunk_tokens)`` — shared by
    p02/p03 (the final packed frame) and p06 (shard rollup)."""
    return f"""{chunk_ctes}, g AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY pack_group
                     ORDER BY doc_id, chunk_idx) AS INT) AS rn
      FROM chunks
    ), pack(pack_group, rn, bin_idx, running) AS (
      SELECT pack_group, rn, 0, n FROM g WHERE rn = 1
      UNION ALL
      SELECT g.pack_group, g.rn,
             CASE WHEN p.running + g.n > {PACK_CAP} THEN p.bin_idx + 1
                  ELSE p.bin_idx END,
             CASE WHEN p.running + g.n > {PACK_CAP} THEN g.n
                  ELSE p.running + g.n END
      FROM pack p JOIN g ON g.pack_group = p.pack_group AND g.rn = p.rn + 1
    ), packed AS (
      SELECT g.doc_id, g.chunk_idx, g.pack_group,
             CAST(p.bin_idx AS INT) AS bin_idx, g.n AS n_chunk_tokens
      FROM g JOIN pack p ON p.pack_group = g.pack_group AND p.rn = g.rn
    )"""


def pack_oracle_wrap_sql(chunk_ctes: str) -> str:
    """Full packing oracle over any ``chunks`` CTE chain."""
    return f"""
    WITH RECURSIVE {pack_packed_ctes_sql(chunk_ctes)}
    SELECT doc_id, chunk_idx, pack_group, bin_idx, n_chunk_tokens
    FROM packed
    """


def _pack_oracle_sql() -> str:
    from ocr_spark.functions.text import hex60_sql

    grp = f"{hex60_sql('CAST(doc_id AS VARCHAR)')} % {PACK_GROUPS}"
    return pack_oracle_wrap_sql(f"""toks AS (
      SELECT doc_id, list_filter({TOKENS_SQL.format(col='text')}, t -> t <> '') AS ts
      FROM documents
    ), starts AS (
      SELECT doc_id, ts,
             unnest(range(0, len(ts), {CHUNK_STRIDE})) AS start_tok,
             unnest(range(0, CAST(ceil(len(ts) / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_idx
      FROM toks WHERE len(ts) > 0
    ), chunks AS (
      SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             CAST(len(ts[start_tok + 1 : start_tok + {CHUNK_TOKENS}]) AS INT) AS n,
             CAST({grp} AS INT) AS pack_group
      FROM starts
    )""")


@register("p02_sequence_pack", oracle=_pack_oracle_sql())
def p02_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = chunk_documents(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "chunk_idx", "n_chunk_tokens"
    )
    return pack_chunks(chunks)


# --- domain-weighted dataset mixing -------------------------------------------

# Per-domain sampling weights in thousandths (integer so the keep
# decision is exact integer math on both engines): a three-tier mixture
# — low-trust hosts keep 20%, mid 50%, high 90% — assigned
# deterministically by host index.  Real pipelines read these from a
# curation config table; the shape (small weights table joined to the
# corpus) is identical.
MIX_HOSTS = 97
MIX_WEIGHTS_MILLS = (200, 500, 900)


def domain_mix_sample(pages, weights):
    """Deterministic domain-weighted downsampling: keep a page iff
    hex60(url) mod 1000 < its host's weight (thousandths).  Reports
    per-host totals so the mixture is auditable.

    Scale shape: the weights config is tiny at any corpus size →
    broadcast join, no shuffle of page rows; the keep decision is a
    pure column expression (md5-derived, so the same page always gets
    the same verdict — the sample is idempotent across restarts and
    incremental crawls, the same property the north rule's
    checkpoint/restart story relies on); the per-host audit agg
    partial-aggregates map-side to one row per host.
    """
    from ocr_spark.functions.text import hex60

    keep = F.pmod(hex60(F.col("url")), F.lit(1000)) < F.col("w_mills")
    return (
        pages.join(F.broadcast(weights), "host")
        .select("host", "w_mills", keep.cast("int").alias("kept"))
        .groupBy("host", "w_mills")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
        )
    )


def _mix_oracle_sql() -> str:
    from ocr_spark.functions.text import hex60_sql

    w = ", ".join(str(m) for m in MIX_WEIGHTS_MILLS)
    return f"""
    WITH pages AS (
      SELECT 'site' || CAST(doc_id % {MIX_HOSTS} AS VARCHAR) || '.example' AS host,
             'https://site' || CAST(doc_id % {MIX_HOSTS} AS VARCHAR) || '.example/p/'
             || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ), weights AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS host,
             ([{w}])[CAST(k % 3 AS INT) + 1] AS w_mills
      FROM range(0, {MIX_HOSTS}) t(k)
    )
    SELECT p.host, w.w_mills,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {hex60_sql('url')} % 1000 < w.w_mills
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM pages p JOIN weights w USING (host)
    GROUP BY p.host, w.w_mills
    """


@register("p04_domain_mix", oracle=_mix_oracle_sql())
def p04_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("site"), F.pmod(F.col("doc_id"), F.lit(MIX_HOSTS)).cast("string"), F.lit(".example")
    )
    pages = docs.select(
        host.alias("host"),
        F.concat(
            F.lit("https://site"),
            F.pmod(F.col("doc_id"), F.lit(MIX_HOSTS)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    mills = F.array(*[F.lit(m) for m in MIX_WEIGHTS_MILLS])
    weights = spark.range(MIX_HOSTS).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
        F.element_at(mills, F.pmod(F.col("id"), F.lit(3)).cast("int") + 1).alias("w_mills"),
    )
    return domain_mix_sample(pages, weights)


# --- deterministic training-order shuffle (p07) -------------------------------

# A training run consumes the corpus in a pseudo-random order that must
# be (a) reproducible run-to-run (data-parallel workers slice the order
# by step index, so all of them must derive the SAME permutation), (b)
# fresh per epoch, and (c) source-interleaved so no training window is a
# single-source block. The naive expression — row_number() OVER (ORDER
# BY hash) — forces every row through ONE partition; the per-source
# variant — PARTITION BY source — creates one giant partition per
# source (sources are few). Neither survives 100 TB.
ORDER_EPOCHS = 2
ORDER_BUCKETS = 64


def training_order(
    docs: DataFrame,
    epochs: int = ORDER_EPOCHS,
    buckets: int = ORDER_BUCKETS,
) -> DataFrame:
    """Per-epoch deterministic shuffle with source interleave, computed
    as a bucketed two-phase rank so no partition exceeds ~1/buckets of
    its source:

    1. every (epoch, doc) gets a shuffle hash h = hex60(epoch ':'
       doc_id) and a bucket = h mod buckets;
    2. bucket sizes aggregate to a dimension-sized (epochs x sources x
       buckets) offset table — exclusive cumsum over bucket within
       (epoch, source) — which broadcast-joins back;
    3. rank within (epoch, source, bucket) is a window over ~n/buckets
       rows; global per-source rank = offset + within-bucket rank, an
       identity with row_number() ordered by (bucket, h, doc_id) — the
       oracle checks exactly that equivalence;
    4. sources interleave arithmetically: global_step = rank *
       n_sources + src_idx, so consecutive steps rotate sources without
       any cross-source exchange.

    Raising `buckets` is the only scale knob (4096 at 100 TB); the
    offset table stays broadcastable (epochs x sources x buckets rows).
    """
    from pyspark.sql import Window as W

    from ocr_spark.functions.text import hex60

    e = (
        docs.select("doc_id", "source")
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))))
        .withColumn(
            "h",
            hex60(
                F.concat_ws(
                    ":", F.col("epoch").cast("string"), F.col("doc_id").cast("string")
                )
            ),
        )
        .withColumn("bucket", F.pmod(F.col("h"), F.lit(buckets)).cast("int"))
    )
    counts = e.groupBy("epoch", "source", "bucket").agg(F.count(F.lit(1)).alias("n"))
    w_off = W.partitionBy("epoch", "source").orderBy("bucket")
    offsets = counts.select(
        "epoch",
        "source",
        "bucket",
        (F.sum("n").over(w_off) - F.col("n")).alias("off"),
    )
    w_rank = W.partitionBy("epoch", "source", "bucket").orderBy("h", "doc_id")
    ranked = e.join(F.broadcast(offsets), ["epoch", "source", "bucket"]).withColumn(
        "rk", F.row_number().over(w_rank)
    )
    # dimension-table windows: single-partition by construction, but they
    # run over the distinct-source aggregate (a handful of rows), never
    # the corpus — the plan test pins that distinction
    w_src = W.partitionBy(F.lit(1)).orderBy("source")
    w_all = W.partitionBy(F.lit(1))
    dim = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(w_src) - 1).alias("src_idx"),
            F.count(F.lit(1)).over(w_all).alias("n_src"),
        )
    )
    return ranked.join(F.broadcast(dim), "source").select(
        F.col("epoch").cast("int").alias("epoch"),
        "doc_id",
        "source",
        ((F.col("off") + F.col("rk") - 1) * F.col("n_src") + F.col("src_idx"))
        .cast("long")
        .alias("global_step"),
    )


def _order_oracle_sql() -> str:
    from ocr_spark.functions.text import hex60_sql

    h = hex60_sql("CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH e AS (
      SELECT doc_id, source, CAST(epoch AS INT) AS epoch, {h} AS h
      FROM documents, range(0, {ORDER_EPOCHS}) t(epoch)
    ), dim AS (
      SELECT source,
             row_number() OVER (ORDER BY source) - 1 AS src_idx,
             count(*) OVER () AS n_src
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT epoch, doc_id, e.source,
           CAST((row_number() OVER (PARTITION BY epoch, e.source
                                    ORDER BY h % {ORDER_BUCKETS}, h, doc_id) - 1)
                * n_src + src_idx AS BIGINT) AS global_step
    FROM e JOIN dim ON e.source = dim.source
    """


@register("p07_training_order", oracle=_order_oracle_sql())
def p07_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return training_order(load_table(spark, sf_dir, "documents"))
