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


# --- p08: DSIR importance resampling ------------------------------------------

DSIR_BUCKETS = 512
DSIR_SCALE = 10_000
DSIR_TARGET_LANG = "en"


def importance_resample(
    docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    buckets: int = DSIR_BUCKETS,
    barrier: bool = True,
) -> DataFrame:
    """DSIR (Xie et al. 2023, arXiv:2302.03169): select raw data whose
    hashed-n-gram profile matches a target distribution, by importance
    weight w(x) = p_target(x) / q_raw(x) over hashed unigram+bigram
    bucket counts, then resample proportionally to w.

    Fixed-point variant for cross-engine exactness: per-bucket ratio in
    basis points r_bp[h] = floor(SCALE·(n_t[h]+1)·(tot_r+B) /
    ((n_r[h]+1)·(tot_t+B))) (Laplace +1), per-doc weight = the mean
    bucket ratio of its grams (integer div), and the resample is the
    p04 idempotent coin: keep iff u·max_w < w·SCALE with
    u = hex60('dsir|'||doc_id) mod SCALE — proportional-to-weight
    Bernoulli, same verdict on every restart/incremental run.  Integer
    bound: the ratio product ≤ SCALE·tot_r², exact in int64 up to
    ~3e7 grams; past that the production path computes log-space
    doubles (rank-stable) or DECIMAL(38) — the gate stays exact.

    Scale shape: TWO corpus passes (t17's shape) — the bucket-count agg
    map-side-combines to ≤B rows per mapper, and scoring broadcast-joins
    the B-row ratio table then folds to one row per doc (the only
    corpus-sized exchange); totals derive from the B-row count table
    (1-row broadcast), never a third scan.  ``barrier`` localCheckpoints
    the two reused intermediates — counts (≤B rows) and the per-doc
    scores (one row/doc, the p03 barrier class) — because Catalyst
    re-executes shared subplans per consumer: unbarriered, the
    gram-explode runs ~8x (counts→{ratio,totals}, scored→{max,final});
    barriered it runs exactly twice (12.9 s → 2.9 s min-of-3 at sf0.1,
    together with the token pre-projection above).
    Pass ``barrier=False`` only to inspect the full logical plan.
    """
    from ocr_spark.functions.text import hex60, norm_tokens
    from ocr_spark.operators.textstats import _bigrams

    # Pre-project the token array into a bound column BEFORE the bigram
    # HOF: a lambda that references the raw split+filter expression
    # re-evaluates it per element (the known lambda-CSE pitfall),
    # turning the gram stream O(tokens^2) per doc — measured 12x slower
    # at sf0.1 (7.1 s -> 0.4 s for the explode).
    base = docs.select("doc_id", "lang", norm_tokens("text").alias("ts"))
    ts = F.col("ts")
    h = base.select(
        "doc_id",
        "lang",
        F.explode(F.concat(ts, _bigrams(ts))).alias("gm"),
    ).select(
        "doc_id", "lang", F.pmod(hex60("gm"), F.lit(buckets)).alias("hb")
    )
    counts = h.groupBy("hb").agg(
        F.count(F.lit(1)).alias("n_r"),
        F.sum((F.col("lang") == target_lang).cast("long")).alias("n_t"),
    )
    if barrier:
        counts = counts.localCheckpoint()
    tot = counts.agg(
        F.sum("n_r").alias("tot_r"), F.sum("n_t").alias("tot_t")
    )
    ratio = (
        docs.sparkSession.range(buckets)
        .select(F.col("id").alias("hb"))
        .join(counts, "hb", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "hb",
            F.expr(
                f"({DSIR_SCALE} * (coalesce(n_t, 0) + 1) * (tot_r + {buckets}))"
                f" div ((coalesce(n_r, 0) + 1) * (tot_t + {buckets}))"
            ).alias("r_bp"),
        )
    )
    scored = (
        h.join(F.broadcast(ratio), "hb")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum("r_bp").alias("sr"),
        )
        .select("doc_id", "n_grams", F.expr("sr div n_grams").alias("w_bp"))
    )
    if barrier:
        scored = scored.localCheckpoint()
    mx = scored.agg(F.max("w_bp").alias("max_bp"))
    u = F.pmod(
        hex60(F.concat(F.lit("dsir|"), F.col("doc_id").cast("string"))),
        F.lit(DSIR_SCALE),
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("w_bp"), F.lit(-1).cast("long")).alias("w_bp"),
            (
                F.col("w_bp").isNotNull()
                & (u * F.col("max_bp") < F.col("w_bp") * F.lit(DSIR_SCALE))
            ).alias("keep"),
        )
    )


def _dsir_oracle_sql(
    target_lang: str = DSIR_TARGET_LANG,
    buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> str:
    from ocr_spark.functions.text import hex60_sql
    from ocr_spark.operators.textstats import _BIGRAMS_SQL, _TOKS

    coin = hex60_sql("'dsir|' || CAST(d.doc_id AS VARCHAR)")
    return f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS} AS ts FROM documents
    ), g AS (
      SELECT doc_id, lang,
             unnest(list_concat(ts, {_BIGRAMS_SQL.format(ts='ts')})) AS gm
      FROM t
    ), h AS (
      SELECT doc_id, lang, {hex60_sql('gm')} % {buckets} AS hb FROM g
    ), cnt AS (
      SELECT hb, count(*) AS n_r,
             CAST(sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_t
      FROM h GROUP BY hb
    ), tot AS (
      SELECT CAST(sum(n_r) AS BIGINT) AS tot_r,
             CAST(sum(n_t) AS BIGINT) AS tot_t
      FROM cnt
    ), ratio AS (
      SELECT k AS hb,
             ({scale} * (COALESCE(n_t, 0) + 1) * (tot_r + {buckets}))
             // ((COALESCE(n_r, 0) + 1) * (tot_t + {buckets})) AS r_bp
      FROM range(0, {buckets}) r(k)
      LEFT JOIN cnt ON cnt.hb = k
      CROSS JOIN tot
    ), scored AS (
      SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
             CAST(sum(r_bp) AS BIGINT) // count(*) AS w_bp
      FROM h JOIN ratio USING (hb) GROUP BY doc_id
    ), mx AS (
      SELECT max(w_bp) AS max_bp FROM scored
    )
    SELECT d.doc_id,
           COALESCE(n_grams, 0) AS n_grams,
           CAST(COALESCE(w_bp, -1) AS BIGINT) AS w_bp,
           (w_bp IS NOT NULL
            AND ({coin} % {scale}) * max_bp < w_bp * {scale}) AS keep
    FROM documents d
    LEFT JOIN scored s ON d.doc_id = s.doc_id
    CROSS JOIN mx
    """


@register("p08_importance_resample", oracle=_dsir_oracle_sql())
def p08_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return importance_resample(load_table(spark, sf_dir, "documents"))


# --- p09: CCNet perplexity buckets ---------------------------------------------


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020,
    arXiv:1911.00359): per-language tercile thresholds over the t17 LM
    likelihood score; head = the best-scoring third (highest likelihood
    ≙ lowest perplexity), tail = the worst, -1 no-evidence docs land in
    tail by construction.

    Thresholds are DISCRETE quantiles (the smallest score whose
    per-language cumulative count reaches 1/3 resp. 2/3), so both
    engines compare integers only — no interpolated percentile whose
    float rounding could diverge.

    Scale shape: scoring is t17's (broadcast model, one per-doc fold);
    the threshold window runs over the COMPRESSED (lang, lm_mills)
    count table — bounded by distinct scores per language, never corpus
    rows, so there is no giant per-language partition — and the
    ≤n_langs-row threshold table broadcasts back onto the scored
    stream.  No corpus-sized window or extra shuffle beyond t17's fold.
    """
    from pyspark.sql import Window

    from ocr_spark.operators.textstats import lm_likelihood

    scored = lm_likelihood(docs).join(docs.select("doc_id", "lang"), "doc_id")
    cnt = scored.groupBy("lang", "lm_mills").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy("lm_mills")
    cum = cnt.select(
        "lang",
        "lm_mills",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n"),
    )
    thr = cum.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("lm_mills"))).alias("t1"),
        F.min(
            F.when(F.col("cum") * 3 >= F.col("n") * 2, F.col("lm_mills"))
        ).alias("t2"),
    )
    return (
        scored.join(F.broadcast(thr), "lang")
        .select(
            "doc_id",
            "lang",
            "lm_mills",
            F.when(F.col("lm_mills") > F.col("t2"), "head")
            .when(F.col("lm_mills") > F.col("t1"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


def _ppl_buckets_oracle_sql() -> str:
    from ocr_spark.operators.textstats import LM_SCORED_CTES

    return f"""
    WITH {LM_SCORED_CTES},
    scs AS (
      SELECT l.doc_id, d.lang, l.lm_mills
      FROM lmscore l JOIN documents d USING (doc_id)
    ), cnt2 AS (
      SELECT lang, lm_mills, count(*) AS c FROM scs GROUP BY lang, lm_mills
    ), cum AS (
      SELECT lang, lm_mills,
             sum(c) OVER (PARTITION BY lang ORDER BY lm_mills) AS cum,
             sum(c) OVER (PARTITION BY lang) AS n
      FROM cnt2
    ), thr AS (
      SELECT lang,
             min(CASE WHEN cum * 3 >= n THEN lm_mills END) AS t1,
             min(CASE WHEN cum * 3 >= n * 2 THEN lm_mills END) AS t2
      FROM cum GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.lm_mills,
           CASE WHEN s.lm_mills > t.t2 THEN 'head'
                WHEN s.lm_mills > t.t1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scs s JOIN thr t USING (lang)
    """


@register("p09_perplexity_buckets", oracle=_ppl_buckets_oracle_sql())
def p09_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return perplexity_buckets(load_table(spark, sf_dir, "documents"))
