"""End-to-end curation funnel: the composition story.

A real training-data pipeline is not isolated operators — it is a
staged funnel (language filter → length filter → exact dedup →
benchmark decontamination) where each stage's survivor set feeds the
next and the per-stage attrition is the primary curation report
(C4/CCNet/Gopher all publish exactly this table).  ``p05`` composes
four already-gated verdicts into the running-conjunction survival
counts, verified end to end against one DuckDB oracle — evidence that
the operators compose, not just pass alone.

Reference analogue: the reference chains its task graph the same way —
the output event of one EDT is the dependence of the next
(`/root/reference/examples/cholesky/cholesky.c:197-199` chains
POTRF→TRSM→GEMM); here the chained objects are curation verdicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import (
    DECONTAM_BENCH_MOD,
    DECONTAM_WINDOW,
    decontam_stats,
)
from ocr_spark.plans import register
from ocr_spark.sources.io import load_table

FUNNEL_LANGS = ("en", "de", "fr")
FUNNEL_MIN_CHARS = 100
FUNNEL_MAX_CHARS = 520


def curation_funnel(docs: DataFrame) -> DataFrame:
    """Per-stage survivor counts for the running conjunction of:
    s1 target language, s2 length band, s3 exact-dedup canonical copy
    (min doc_id per identical text), s4 decontaminated (not in the
    held-out benchmark slice and sharing no 13-gram with it).

    Scale shape: the flags are one narrow pass plus two joins the
    individual entries already justified at scale (canonical = one
    hash-groupBy carrying one row per distinct text; decontam =
    broadcast benchmark set, d13); the funnel itself aggregates to a
    single row of counters (map-side combined) and explodes to the
    5-row report — nothing here adds a shuffle beyond its components.
    """
    canon = docs.groupBy(F.md5("text").alias("h2")).agg(
        F.min("doc_id").alias("keep_id")
    )
    decon = decontam_stats(docs).select("doc_id", "contaminated")
    is_bench = F.pmod(F.col("doc_id"), F.lit(DECONTAM_BENCH_MOD)) == 0
    flags = (
        docs.join(canon, F.md5(docs["text"]) == canon["h2"])
        .join(decon, "doc_id", "left")
        .select(
            F.col("lang").isin(*FUNNEL_LANGS).alias("f1"),
            F.col("n_chars").between(FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS).alias("f2"),
            (F.col("doc_id") == F.col("keep_id")).alias("f3"),
            (~is_bench & ~F.coalesce(F.col("contaminated"), F.lit(False))).alias("f4"),
        )
    )
    c = lambda col: F.sum(col.cast("long"))  # noqa: E731
    totals = flags.agg(
        F.count(F.lit(1)).alias("s0"),
        c(F.col("f1")).alias("s1"),
        c(F.col("f1") & F.col("f2")).alias("s2"),
        c(F.col("f1") & F.col("f2") & F.col("f3")).alias("s3"),
        c(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4")).alias("s4"),
    )
    stages = F.array(
        *[
            F.struct(F.lit(name).alias("stage"), F.col(col).alias("n_surviving"))
            for name, col in (
                ("s0_all", "s0"),
                ("s1_language", "s1"),
                ("s2_length", "s2"),
                ("s3_exact_dedup", "s3"),
                ("s4_decontam", "s4"),
            )
        ]
    )
    return totals.select(F.explode(stages).alias("r")).select("r.stage", "r.n_surviving")


def _funnel_oracle_sql() -> str:
    from ocr_spark.operators.dedup import _decontam_oracle_sql  # CTE source

    langs = ", ".join(f"'{l}'" for l in FUNNEL_LANGS)
    w, m = DECONTAM_WINDOW, DECONTAM_BENCH_MOD
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS ts
      FROM documents
    ), win AS (
      SELECT doc_id, md5(array_to_string(ts[s + 1 : s + {w}], ' ')) AS h
      FROM (SELECT doc_id, ts, unnest(range(0, len(ts) - {w} + 1)) AS s
            FROM toks WHERE len(ts) >= {w})
    ), bench AS (
      SELECT DISTINCT h FROM win WHERE doc_id % {m} = 0
    ), contam AS (
      SELECT DISTINCT win.doc_id FROM win JOIN bench USING (h)
      WHERE win.doc_id % {m} <> 0
    ), canon AS (
      SELECT md5(text) AS h2, min(doc_id) AS keep_id FROM documents GROUP BY md5(text)
    ), flags AS (
      SELECT (d.lang IN ({langs})) AS f1,
             (d.n_chars BETWEEN {FUNNEL_MIN_CHARS} AND {FUNNEL_MAX_CHARS}) AS f2,
             (d.doc_id = c.keep_id) AS f3,
             (d.doc_id % {m} <> 0 AND ct.doc_id IS NULL) AS f4
      FROM documents d
      JOIN canon c ON md5(d.text) = c.h2
      LEFT JOIN contam ct ON d.doc_id = ct.doc_id
    ), t AS (
      SELECT count(*) AS s0,
             CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
             CAST(sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
      FROM flags
    )
    SELECT 's0_all' AS stage, s0 AS n_surviving FROM t
    UNION ALL SELECT 's1_language', s1 FROM t
    UNION ALL SELECT 's2_length', s2 FROM t
    UNION ALL SELECT 's3_exact_dedup', s3 FROM t
    UNION ALL SELECT 's4_decontam', s4 FROM t
    """


@register("p05_curation_funnel", oracle=_funnel_oracle_sql())
def p05_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_funnel(load_table(spark, sf_dir, "documents"))
