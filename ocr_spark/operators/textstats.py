"""Text analysis operators: token stats, quality scoring, language
heuristic, fingerprinting. All pure column expressions (JVM-side,
whole-stage codegen) — a 100 TB pass over `documents` is one scan with
zero shuffle and zero Python.

Oracle portability notes:
  - no unicode-class regexes (Java regex and RE2 disagree on '\\u'
    escapes); the CJK heuristic uses the UTF-8-bytes/chars ratio instead
    (octet_length/length in Spark == strlen/length in DuckDB);
  - stopword ratio over a tiny explicit stopword list (both engines
    filter the same token array).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import TOKENS_SQL, hex60, hex60_sql, norm_tokens
from ocr_spark.functions.text import lang_id_ngram_sql
from ocr_spark.plans import register
from ocr_spark.sources.io import load_table

STOPWORDS = ("the", "a", "of", "and", "to")
_STOP_SQL = "('" + "','".join(STOPWORDS) + "')"
_TOKS = f"list_filter({TOKENS_SQL.format(col='text')}, t -> t <> '')"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = norm_tokens(text_col)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
                )
                / F.size(toks),
            ).otherwise(0.0),
            4,
        ).alias("avg_token_len"),
    )


@register(
    "t01_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT)                 AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT)  AS n_uniq_tokens,
           round(CASE WHEN len(toks) > 0
                 THEN list_sum([CAST(length(tok) AS DOUBLE) FOR tok IN toks]) / len(toks)
                 ELSE 0.0 END, 4)                 AS avg_token_len
    FROM t
    """,
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents"))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio / repetition quality features + a composite
    score in [0,1] (C4/Gopher-style cheap filters, relationally expressed)."""
    toks = norm_tokens(text_col)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    uniq_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    len_ok = (F.length(text_col) >= 100) & (F.length(text_col) <= 20000)
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.least(stop_ratio * 4, F.lit(0.3))
        + F.least(uniq_ratio, F.lit(0.3))
    )
    return docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


@register(
    "t02_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), f AS (
      SELECT doc_id,
             CAST(length(text) AS INT) AS n_chars,
             CAST(len(toks) AS INT) AS n_tokens,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_filter(toks, t -> t IN {_STOP_SQL})) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS uniq_ratio,
             (length(text) >= 100 AND length(text) <= 20000) AS len_ok
      FROM t
    )
    SELECT doc_id, n_chars, n_tokens,
           round(stop_ratio, 6) AS stopword_ratio,
           round(uniq_ratio, 6) AS uniq_ratio,
           round((CASE WHEN len_ok THEN 0.4 ELSE 0.0 END)
                 + least(stop_ratio * 4, 0.3)
                 + least(uniq_ratio, 0.3), 6) AS quality_score
    FROM f
    """,
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"))


def lang_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap script/language heuristic:
    byte-per-char ratio separates CJK (~3) from latin (~1); the English
    stopword share separates en from other latin scripts."""
    toks = norm_tokens(text_col)
    n_tok = F.size(toks)
    the_share = F.when(
        n_tok > 0, F.size(F.filter(toks, lambda t: t == "the")) / n_tok
    ).otherwise(0.0)
    byte_ratio = F.when(
        F.length(text_col) > 0,
        F.octet_length(text_col) / F.length(text_col),
    ).otherwise(1.0)
    guess = (
        F.when(byte_ratio >= 2.0, "cjk")
        .when(the_share >= 0.02, "en")
        .otherwise("latin-other")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        F.round(byte_ratio, 4).alias("byte_ratio"),
        F.round(the_share, 6).alias("the_share"),
        guess.alias("lang_guess"),
    )


@register(
    "t03_lang_guess",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id, lang AS declared_lang,
           round(CASE WHEN length(text) > 0
                 THEN CAST(strlen(text) AS DOUBLE) / length(text) ELSE 1.0 END, 4) AS byte_ratio,
           round(CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, t -> t = 'the')) AS DOUBLE) / len(toks)
                 ELSE 0.0 END, 6) AS the_share,
           CASE WHEN (CASE WHEN length(text) > 0
                      THEN CAST(strlen(text) AS DOUBLE) / length(text) ELSE 1.0 END) >= 2.0
                THEN 'cjk'
                WHEN (CASE WHEN len(toks) > 0
                      THEN CAST(len(list_filter(toks, t -> t = 'the')) AS DOUBLE) / len(toks)
                      ELSE 0.0 END) >= 0.02
                THEN 'en'
                ELSE 'latin-other' END AS lang_guess
    FROM t
    """,
)
def t03_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_guess(load_table(spark, sf_dir, "documents"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the canonical token join (whitespace-
    normalized content identity) + a 60-bit integer form for compact
    storage/joins."""
    canon = F.array_join(norm_tokens(text_col), " ")
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fp_md5"),
        hex60(canon).alias("fp60"),
    )


@register(
    "t04_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_aggregate({_TOKS}, 'string_agg', ' ') AS canon FROM documents
    )
    SELECT doc_id, md5(canon) AS fp_md5, {hex60_sql('canon')} AS fp60 FROM t
    """,
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


def title_neardups(docs: DataFrame, max_dist: int = 8) -> DataFrame:
    """Edit-distance near-dup pairs over document "titles" (first 64
    chars of the first line; levenshtein is JVM built-in), blocked on
    the 12-char title prefix: candidates meet only inside a prefix
    block, so the join is block-local, never all-pairs. The blocking is
    part of the operator's definition (typo-style near-dups diverge
    late in the string) and the oracle applies the identical rule —
    token-count blocking measured 115s at sf0.1 vs ~2s with prefix
    blocks."""
    title = F.substring(F.trim(F.substring_index("text", "\n", 1)), 1, 64)
    t = docs.select(
        "doc_id",
        title.alias("title"),
        F.substring(title, 1, 12).alias("bk"),
    ).filter(F.length("title") > 0)
    a = t.select(
        F.col("doc_id").alias("doc_a"), F.col("title").alias("title_a"), F.col("bk")
    )
    b = t.select(
        F.col("doc_id").alias("doc_b"), F.col("title").alias("title_b"), F.col("bk")
    )
    return (
        a.join(b, "bk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("title_a", "title_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


@register(
    "t05_title_editdist",
    # Spark levenshtein counts code points, DuckDB's counts UTF-8 BYTES
    # (levenshtein('é','') = 2) — strip non-ASCII on BOTH sides first
    # (w01's fix, wavefront.py) so byte == codepoint and the oracle is
    # exact on any corpus, not just the pure-ASCII testdata.
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS text
      FROM documents
    ), t AS (
      SELECT doc_id,
             substr(trim(split_part(text, chr(10), 1)), 1, 64) AS title,
             substr(substr(trim(split_part(text, chr(10), 1)), 1, 64), 1, 12) AS bk
      FROM d
      WHERE length(substr(trim(split_part(text, chr(10), 1)), 1, 64)) > 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.title, b.title) AS edit_dist
    FROM t a JOIN t b ON a.bk = b.bk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= 8
    """,
)
def t05_title_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", r"[^\x00-\x7F]", "")
    )
    return title_neardups(docs)


@register(
    "t06_langid_ngram",
    oracle=f"""
    SELECT doc_id, lang AS declared_lang,
           {lang_id_ngram_sql('text')} AS lang_id
    FROM documents
    """,
)
def t06_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram + script-class language-ID (Cavnar-Trenkle-style
    profile intersection; t03 is the cheaper byte-ratio heuristic).
    Entirely JVM-side length/replace/regexp math — scoring replicated
    bit-for-bit by the DuckDB oracle."""
    from ocr_spark.functions.text import lang_id_ngram

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        lang_id_ngram(F.col("text")).alias("lang_id"),
    )


def hash_split(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    key hash (hex60 mod 100: <90 train, <95 val, else test). Unlike
    rand()-based sampling this is reproducible across runs, partitioning
    changes, and engines — the property a training-data pipeline needs
    so a re-extraction never silently reshuffles the eval split."""
    bucket = F.pmod(hex60(F.col(key_col).cast("string")), F.lit(100))
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split)


@register(
    "q26_hash_split",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             CASE WHEN {hex60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
                  WHEN {hex60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, count(*) AS n FROM s GROUP BY lang, split
    """,
)
def q26_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- PII detection + redaction ------------------------------------------------

# Patterns deliberately use only syntax Java regex and RE2 share
# (char classes, bounded repeats, \d, \b) — see module docstring.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII scrub: count + redact email addresses and NANP-style
    phone numbers, emit the redacted digest so downstream joins can use
    the clean text identity. One scan, zero shuffle, zero Python —
    regexp_count/regexp_replace are JVM codegen'd, which is the only
    acceptable cost profile for a full-corpus scrub pass at 100 TB.
    Swap-in point for richer detectors (NER models) is a pandas-UDF
    stage with this exact output schema."""
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_digest"),
    )


@register(
    "t07_pii_redact",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 555-867-5309 x' || CAST(doc_id AS VARCHAR)
                  ELSE text END AS text
      FROM documents
    ), red AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                            '{PHONE_RE}', '[PHONE]', 'g') AS clean,
             CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones
      FROM enriched
    )
    SELECT doc_id, n_emails, n_phones,
           CAST(length(clean) AS INT) AS clean_len,
           md5(clean) AS clean_digest
    FROM red
    """,
)
def t07_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The testdata corpus is synthetic word soup with no real PII, so a
    deterministic contact line is appended to every 7th doc BY BOTH
    ENGINES (same expression in the oracle) — the detector/redactor is
    exercised on true positives and true negatives alike."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-867-5309 x"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pii_redact(enriched)


# --- vocabulary heavy-hitters -------------------------------------------------

VOCAB_TOPK = 10


def vocab_topk(docs: DataFrame, k: int = VOCAB_TOPK) -> DataFrame:
    """Top-k most frequent tokens per language — the vocabulary-building
    pass of tokenizer training. Token explode is narrow; the (lang,
    token) count is map-side combined, so the exchange carries one row
    per distinct (lang, token) per mapper; the per-lang top-k is a
    window over the (small) distinct-token table, never the corpus. At
    100 TB vocab counting is THE canonical heavy-hitter job — the exact
    form here is oracle-able; a count-min/space-saving sketch drops in
    for single-pass approximate mode. Ties broken lexicographically for
    cross-engine determinism."""
    from pyspark.sql import Window as W

    toks = docs.select("lang", F.explode(norm_tokens("text")).alias("tok"))
    counts = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "tok", "rank", "n")
    )


@register(
    "t08_vocab_topk",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({_TOKS}) AS tok FROM documents
    ), counts AS (
      SELECT lang, tok, count(*) AS n FROM toks GROUP BY lang, tok
    )
    SELECT lang, tok,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC) AS INT)
             AS rank,
           n
    FROM counts
    QUALIFY rank <= {VOCAB_TOPK}
    """,
)
def t08_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(load_table(spark, sf_dir, "documents"))


# --- stratified sampling ------------------------------------------------------

# per-language keep rates in permille: downsample the dominant language,
# keep the tail — the language-mix rebalancing step of corpus curation
STRATA_PERMILLE = {"en": 400, "de": 1000, "es": 1000, "fr": 1000, "zh": 700}
DEFAULT_PERMILLE = 1000


def stratified_sample(docs: DataFrame, rates: dict[str, int] | None = None) -> DataFrame:
    """Deterministic per-stratum sampling: keep a doc iff
    hex60(doc_id) mod 1000 < rate_permille(lang). Like q26's split,
    selection depends only on the key hash — reproducible across runs,
    partitioning, and engines (rand()/sampleBy are neither), which is
    what makes a resampled corpus diffable. One narrow scan, no
    shuffle; the rate table is a literal CASE, not a join."""
    rates = rates or STRATA_PERMILLE
    bucket = F.pmod(hex60(F.col("doc_id").cast("string")), F.lit(1000))
    rate = F.lit(DEFAULT_PERMILLE)
    for lang, pm in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pm)).otherwise(rate)
    return docs.withColumn("keep", bucket < rate)


def _strata_rate_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {pm}" for lang, pm in sorted(STRATA_PERMILLE.items())
    )
    return f"CASE {whens} ELSE {DEFAULT_PERMILLE} END"


@register(
    "q29_stratified_sample",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN {hex60_sql("CAST(doc_id AS VARCHAR)")} % 1000
                              < {_strata_rate_sql()}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents GROUP BY lang
    """,
)
def q29_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        )
    )


# --- pandas UDAF surface ------------------------------------------------------


def chars_sum_udaf():
    """GROUPED_AGG pandas UDAF (Arrow-batched aggregate) — the UDAF
    surface of the rubric. Integer sum, so the result is exact and
    oracle-comparable regardless of partition order (a float UDAF could
    not be). At scale a pandas UDAF aggregate has NO partial-agg
    map-side combine (all group rows cross to Python) — built-in JVM
    aggregates remain the hot-path choice; this entry exists to prove
    the surface with exact semantics, like the reference's user-space
    reductions prove its EDT contract."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _sum_chars(v):
        return int(v.sum())

    def _count_rows(v):
        return int(len(v))

    # the module's `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf cannot resolve — attach real ones
    ann = {"v": pd.Series, "return": int}
    _sum_chars.__annotations__ = dict(ann)
    _count_rows.__annotations__ = dict(ann)
    return pandas_udf(_sum_chars, "long"), pandas_udf(_count_rows, "long")


@register(
    "x07_pandas_udaf",
    oracle="""
    SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def x07_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() — both outputs come from the pandas surface
    sum_udaf, count_udaf = chars_sum_udaf()
    return docs.groupBy("lang").agg(
        sum_udaf(F.col("n_chars")).alias("total_chars"),
        count_udaf(F.col("n_chars")).alias("n_docs"),
    )


# --- URL canonicalization -----------------------------------------------------


def url_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Host extraction + per-host page stats — the URL-keyed side of
    crawl curation (host budgets, per-site dedup). Pure regexp column
    expressions (the pattern is in the Java∩RE2 dialect so the oracle
    replicates it literally); one map-side-combined aggregate."""
    # authority pattern (t14/t15's): resolves a host even for pathless
    # URLs like https://host — the old ^[a-z]+://([^/]+)/ required a
    # trailing slash and silently yielded '' for them
    host = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/?#]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://[^/?#]+(/.*)$", 1)
    return (
        pages.select(host.alias("host"), path.alias("path"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("path").alias("n_paths"),
            F.max(F.length("path")).alias("max_path_len"),
        )
    )


@register(
    "t09_url_stats",
    oracle="""
    WITH urls AS (
      SELECT 'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/p/'
             || CAST(doc_id AS VARCHAR) || '/v' || CAST(doc_id % 3 AS VARCHAR) AS url
      FROM documents
    ), u AS (
      SELECT regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS host,
             regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/.*)$', 1) AS path
      FROM urls
    )
    SELECT host, count(*) AS n_pages,
           count(DISTINCT path) AS n_paths,
           CAST(max(length(path)) AS INT) AS max_path_len
    FROM u GROUP BY host
    """,
)
def t09_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs over deterministic synthetic urls derived from doc_id (the
    documents table has no url column; both engines derive the same
    urls)."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(
            F.lit("https://site"),
            F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
            F.lit("/v"),
            F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
        ).alias("url")
    )
    return url_stats(urls)


# --- BM25 relevance scoring ---------------------------------------------------

# Okapi BM25 with the odds-form idf (N - df + 0.5)/(df + 0.5) instead of
# its logarithm: ln() is the one term whose libm implementations can
# differ between the JVM and DuckDB in the last ulp, while +,-,*,/ on
# doubles are IEEE-exact in both — the odds form is strictly monotone in
# the standard idf, so ranking is unchanged and every score is
# bit-reproducible cross-engine (same trick family as the integer-cents
# aggregates).  Scores are emitted RAW (no rounding): identical doubles
# canonicalize identically.
BM25_TERMS = ("hash", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(docs: DataFrame, terms=BM25_TERMS, text_col: str = "text") -> DataFrame:
    """Per-doc BM25 relevance for a fixed query — the retrieval-scoring
    pass of a training-data curation pipeline (select documents relevant
    to a topic seed query).

    Scale shape: per-doc tf via array HOFs (narrow, no explode, no
    shuffle); corpus stats (N, avgdl, per-term df) are ONE aggregated
    row cross-joined back via broadcast — the whole operator is one
    narrow pass plus a scalar-sized exchange, at any corpus size."""
    toks = norm_tokens(text_col)

    def _tf(term: str):
        # NB: a 2-arg lambda would make F.filter pass (element, index) —
        # the closure factory keeps it unary with the term bound early
        return F.size(F.filter(F.col("ts"), lambda t: t == F.lit(term)))

    tf_cols = [_tf(term).alias(f"tf{i}") for i, term in enumerate(terms)]
    base = docs.select("doc_id", toks.alias("ts")).select(
        "doc_id", F.size("ts").alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.count(F.when(F.col(f"tf{i}") > 0, 1)).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl") / F.col("n_docs")
    one_minus_b = round(1.0 - BM25_B, 10)
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}")
        idf = (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5)) / (
            F.col(f"df{i}") + F.lit(0.5)
        )
        denom = tf + (
            F.lit(BM25_K1) * (F.lit(one_minus_b) + (F.lit(BM25_B) * (F.col("dl") / avgdl)))
        )
        term_score = idf * ((tf * F.lit(BM25_K1 + 1.0)) / denom)
        score = term_score if score is None else score + term_score
    return (
        j.select("doc_id", "dl", score.alias("bm25"))
        .filter(F.col("bm25") > 0)
    )


def _bm25_oracle_sql(terms=BM25_TERMS) -> str:
    one_minus_b = round(1.0 - BM25_B, 10)
    tf_defs = ",\n             ".join(
        f"CAST(len(list_filter(toks, t -> t = '{term}')) AS INT) AS tf{i}"
        for i, term in enumerate(terms)
    )
    df_defs = ",\n             ".join(
        f"count(CASE WHEN tf{i} > 0 THEN 1 END) AS df{i}" for i in range(len(terms))
    )
    term_exprs = []
    for i in range(len(terms)):
        idf = f"((n_docs - df{i}) + CAST(0.5 AS DOUBLE)) / (df{i} + CAST(0.5 AS DOUBLE))"
        denom = (
            f"tf{i} + (CAST({BM25_K1} AS DOUBLE) * (CAST({one_minus_b} AS DOUBLE) "
            f"+ (CAST({BM25_B} AS DOUBLE) * (dl / avgdl))))"
        )
        term_exprs.append(
            f"(({idf}) * ((tf{i} * CAST({BM25_K1 + 1.0} AS DOUBLE)) / ({denom})))"
        )
    score = " + ".join(term_exprs)
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id, CAST(len(toks) AS INT) AS dl,
             {tf_defs}
      FROM t
    ),
    stats AS (
      SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl,
             {df_defs}
      FROM base
    ),
    scored AS (
      SELECT doc_id, dl, total_dl / n_docs AS avgdl, n_docs,
             {", ".join(f"tf{i}" for i in range(len(terms)))},
             {", ".join(f"df{i}" for i in range(len(terms)))}
      FROM base CROSS JOIN stats
    )
    SELECT doc_id, dl, {score} AS bm25
    FROM scored WHERE ({score}) > 0
    """


@register("t10_bm25", oracle=_bm25_oracle_sql())
def t10_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_scores(load_table(spark, sf_dir, "documents"))


# --- BPE-style pre-tokenizer counting ----------------------------------------

# GPT-2-family pre-tokenizer shape, restricted to the Java-regex ∩ RE2
# common syntax (no lookahead/lookbehind — the same constraint t07's PII
# patterns live under): contraction suffixes, letter runs, digit runs,
# non-space symbol runs. Both engines tokenize identically because both
# regex engines are leftmost-first over these alternations. Whitespace
# is an EXPLICIT char class, not \s: Java's \s includes vertical tab,
# RE2's does not, so \s-containing classes tokenize VT text differently
# cross-engine; the explicit list is identical in both.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r']+"


def bpe_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token counts under a BPE-ish pre-tokenizer vs whitespace —
    the context-budget planner's view of a corpus (LLM token costs track
    the sub-word count, not the whitespace count).

    Narrow single pass (regexp_extract_all + array ops, JVM-side); the
    tokens-per-word ratio is the raw long/long division (bit-identical
    IEEE expression in DuckDB)."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    ws = norm_tokens(text_col)
    n_bpe = F.size(bpe)
    n_ws = F.size(ws)
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).alias("n_uniq_bpe"),
        n_ws.alias("n_ws_tokens"),
        F.when(n_ws > 0, n_bpe.cast("double") / n_ws).otherwise(0.0).alias(
            "tokens_per_word"
        ),
    )


@register(
    "t11_bpe_token_count",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}') AS bpe,
             {_TOKS} AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(bpe) AS INT)                AS n_bpe_tokens,
           CAST(len(list_distinct(bpe)) AS INT) AS n_uniq_bpe,
           CAST(len(ws) AS INT)                 AS n_ws_tokens,
           CASE WHEN len(ws) > 0
                THEN CAST(len(bpe) AS DOUBLE) / len(ws) ELSE 0.0 END
             AS tokens_per_word
    FROM t
    """,
)
def t11_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_stats(load_table(spark, sf_dir, "documents"))


# --- intra-document repetition metrics (Gopher-style) -------------------------

# Complements d07 (INTER-document duplicated grams): these are the
# within-document repetition rules of Gopher/FineWeb-class filters —
# templated or degenerate pages repeat their own lines and bigrams.
REP_DUP_LINE_MAX = 0.30
REP_TOP_BIGRAM_MAX = 0.20


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc intra-document repetition: duplicate-line fraction and the
    share of the most frequent word bigram. Narrow single pass — lines
    and bigrams live in per-row arrays, aggregated with HOFs; no explode,
    no shuffle at any corpus size. Fractions are raw int/int divisions
    (bit-identical IEEE expressions in DuckDB)."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    n_uniq_lines = F.size(F.array_distinct(lines))
    toks = norm_tokens(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # top-bigram share via explode + two-level agg, NOT a per-row
    # "count each distinct bigram inside the array" fold — that fold is
    # O(len²) per document in the interpreted HOF evaluator, which a
    # single long page turns into a straggler; the exploded agg is
    # map-side combined and linear
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_uniq_lines).cast("double") / n_lines
    ).otherwise(0.0)
    line_stats = docs.select(
        "doc_id", n_lines.alias("n_lines"), dup_line_frac.alias("dup_line_frac")
    )
    bg_stats = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("n_bg"))
    )
    j = line_stats.join(bg_stats, "doc_id", "left")
    top_bg_share = F.when(
        F.col("n_bg").isNotNull() & (F.col("n_bg") > 0),
        F.col("top_bg").cast("double") / F.col("n_bg"),
    ).otherwise(0.0)
    return j.select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        top_bg_share.alias("top_bigram_share"),
        (
            (F.col("dup_line_frac") <= REP_DUP_LINE_MAX)
            & (top_bg_share <= REP_TOP_BIGRAM_MAX)
        ).alias("passes_repetition"),
    )


@register(
    "t12_repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter([trim(l) FOR l IN string_split(text, chr(10))], l -> l <> '') AS ls,
             {_TOKS} AS toks
      FROM documents
    ), b AS (
      SELECT doc_id, ls,
             CASE WHEN len(toks) >= 2
                  THEN [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
                  ELSE [] END AS bg
      FROM t
    ), f AS (
      SELECT doc_id,
             CAST(len(ls) AS INT) AS n_lines,
             CASE WHEN len(ls) > 0
                  THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
                  ELSE 0.0 END AS dup_line_frac,
             CASE WHEN len(bg) > 0
                  THEN CAST(list_max([len(list_filter(bg, x -> x = d)) FOR d IN list_distinct(bg)]) AS DOUBLE) / len(bg)
                  ELSE 0.0 END AS top_bigram_share
      FROM b
    )
    SELECT doc_id, n_lines, dup_line_frac, top_bigram_share,
           (dup_line_frac <= {REP_DUP_LINE_MAX} AND top_bigram_share <= {REP_TOP_BIGRAM_MAX})
             AS passes_repetition
    FROM f
    """,
)
def t12_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


# --- domain blocklist filtering ----------------------------------------------

# Deterministic synthetic blocklist: every 7th site domain (UT1-style
# domain lists block whole registrable domains; subdomains inherit the
# block).  Derived from a range() on both engines — no external data.
BLOCKLIST_MOD = 7
SITE_HOSTS = 97  # t09's host universe


def blocklist_filter(pages: DataFrame, blocklist: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-page domain-blocklist verdict: blocked iff the url's host OR
    any parent domain (one label stripped; real lists are registrable-
    domain grain so depth 1 suffices for host.domain.tld) appears in the
    blocklist.

    Scale shape: real blocklists (UT1, adult/malware lists) are a few
    million domains — megabytes — so the list side is ALWAYS broadcast;
    the corpus side explodes a bounded candidate-suffix array (2 rows
    per page) and broadcast-joins with no shuffle of page rows.  The
    left join back is on the same narrow lineage, so the whole verdict
    is shuffle-free end to end.
    """
    # authority pattern must not require a path: https://evil.example
    # (no trailing slash) still has a host to block (ADVICE r04)
    host = F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/?#]+)", 1)
    pages_h = pages.select("doc_id", host.alias("host"))
    cand = pages_h.select(
        "doc_id",
        F.explode(
            F.array(F.col("host"), F.regexp_replace("host", r"^[^.]+\.", ""))
        ).alias("c"),
    )
    hits = (
        cand.join(F.broadcast(blocklist), cand["c"] == blocklist["dom"])
        .select("doc_id")
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return pages_h.join(hits, "doc_id", "left").select(
        "doc_id", "host", F.coalesce(F.col("blocked"), F.lit(False)).alias("blocked")
    )


@register(
    "t14_blocklist_filter",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN 'cdn' || CAST(doc_id % 11 AS VARCHAR) || '.' ELSE '' END
             || 'site' || CAST(doc_id % {SITE_HOSTS} AS VARCHAR) || '.example' AS host
      FROM documents
    ), block AS (
      SELECT 'site' || CAST(k AS VARCHAR) || '.example' AS dom
      FROM range(0, {SITE_HOSTS}) t(k) WHERE k % {BLOCKLIST_MOD} = 0
    ), cand AS (
      SELECT doc_id, unnest([host, regexp_replace(host, '^[^.]+\\.', '')]) AS c
      FROM urls
    ), hit AS (
      SELECT DISTINCT doc_id FROM cand JOIN block ON c = dom
    )
    SELECT u.doc_id, u.host, h.doc_id IS NOT NULL AS blocked
    FROM urls u LEFT JOIN hit h USING (doc_id)
    """,
)
def t14_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic url universe extends t09's with a deterministic cdnN.
    subdomain tier so parent-domain (suffix) matching is exercised, not
    just exact host equality."""
    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(
                F.pmod(F.col("doc_id"), F.lit(5)) == 0,
                F.concat(F.lit("cdn"), F.pmod(F.col("doc_id"), F.lit(11)).cast("string"), F.lit(".")),
            ).otherwise(F.lit("")),
            F.lit("site"),
            F.pmod(F.col("doc_id"), F.lit(SITE_HOSTS)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    blocklist = (
        spark.range(SITE_HOSTS)
        .filter(F.pmod(F.col("id"), F.lit(BLOCKLIST_MOD)) == 0)
        .select(F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example")).alias("dom"))
    )
    return blocklist_filter(pages, blocklist)


# --- URL canonicalization (crawl-frontier / dedup key) ------------------------


def canonicalize_url(url) -> "F.Column":
    """Crawl-canonical form: lowercase scheme+host, strip a leading
    www., strip the https default port, drop the #fragment, and remove
    utm_* tracking params (collapsing separators).  Pure regexp column
    expressions in the Java∩RE2 common dialect — no backreferences
    (Java writes $1 where RE2 writes \\1, so any capture-group
    replacement would diverge cross-engine).
    """
    c = url if not isinstance(url, str) else F.col(url)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(c, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":443$", ""
    )
    rest = F.regexp_extract(c, r"^[A-Za-z]+://[^/?#]+([^#]*)", 1)
    # two passes, no backrefs: utm param followed by another param keeps
    # the leading ?/& for the successor; a trailing utm param takes its
    # leading ?/& with it.
    rest1 = F.regexp_replace(rest, r"utm_[a-z]+=[^&]*&", "")
    rest2 = F.regexp_replace(rest1, r"[?&]utm_[a-z]+=[^&]*$", "")
    return F.concat(scheme, F.lit("://"), host, rest2)


# Path collapses pairs of docs (doc_id % 250) so canonicalization-dedup
# is observable: n_pages > 1 for collided canonical urls.
CANON_PATH_MOD = 250

_CANON_URL_SQL = f"""
      'HTTPS://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
      || 'Site' || CAST(doc_id % {SITE_HOSTS} AS VARCHAR) || '.Example:443/p/'
      || CAST(doc_id % {CANON_PATH_MOD} AS VARCHAR)
      || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&id=' || CAST(doc_id % 7 AS VARCHAR)
              WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=y'
              ELSE '' END
      || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END
"""


@register(
    "t15_url_canonicalize",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {_CANON_URL_SQL} AS url FROM documents
    ), canon AS (
      SELECT lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
             || regexp_replace(regexp_replace(
                  lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                  '^www\\.', ''), ':443$', '')
             -- 'g' flags are load-bearing: Spark regexp_replace is
             -- replace-ALL, DuckDB defaults to first-match-only, and a
             -- url can carry several utm_* params (ADVICE r04)
             || regexp_replace(regexp_replace(
                  regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^#]*)', 1),
                  'utm_[a-z]+=[^&]*&', '', 'g'), '[?&]utm_[a-z]+=[^&]*$', '', 'g')
             AS canonical_url
      FROM urls
    )
    SELECT canonical_url, count(*) AS n_pages
    FROM canon GROUP BY canonical_url
    """,
)
def t15_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy deterministic urls (upper-case scheme/host, www., :443,
    utm params in leading/trailing positions, fragments) -> canonical
    form -> per-canonical page count.  The groupBy is the only shuffle
    and carries one row per canonical url."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"),
            F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.lit("Site"),
            F.pmod(F.col("doc_id"), F.lit(SITE_HOSTS)).cast("string"),
            F.lit(".Example:443/p/"),
            F.pmod(F.col("doc_id"), F.lit(CANON_PATH_MOD)).cast("string"),
            F.when(
                F.pmod(F.col("doc_id"), F.lit(3)) == 0,
                F.concat(F.lit("?utm_source=x&id="), F.pmod(F.col("doc_id"), F.lit(7)).cast("string")),
            )
            .when(
                F.pmod(F.col("doc_id"), F.lit(3)) == 1,
                F.concat(F.lit("?id="), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"), F.lit("&utm_campaign=y")),
            )
            .otherwise(F.lit("")),
            F.when(F.pmod(F.col("doc_id"), F.lit(4)) == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url"),
    )
    return urls.select(canonicalize_url(F.col("url")).alias("canonical_url")).groupBy(
        "canonical_url"
    ).agg(F.count(F.lit(1)).alias("n_pages"))


# --- model-based quality filtering (fastText-style linear classifier) ---------

# Hashed bag-of-words linear scorer: every modern curation pipeline has a
# learned quality-filter tier (fastText in CCNet/LLaMA, DCLM's
# classifier) distinct from the t02 heuristics.  The model here is a
# 64-bucket hashing-trick linear layer with deterministic "trained"
# weights derived from the bucket index (a real deployment broadcasts a
# weights table loaded from a model artifact — the shape is identical).
# Weights are INTEGER thousandths and the per-doc accumulation is an
# integer sum (order-free, so the shuffle's nondeterministic reduce
# order cannot perturb the logit); the only floating-point ops are one
# division and one addition per doc, IEEE-identical cross-engine.
QC_BUCKETS = 64
QC_BIAS_MILLS = -5


def quality_classifier(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """logit = bias + mean token weight under the hashing trick;
    keep = logit > 0.

    Scale shape: the weight table is model-sized (fixed, tiny) →
    broadcast; token explode is narrow; the per-doc integer sum
    partial-aggregates map-side so one row per doc crosses the wire.
    """
    toks = docs.select(
        "doc_id", F.explode(norm_tokens("text")).alias("tok")
    ).select("doc_id", F.pmod(hex60(F.col("tok")), F.lit(QC_BUCKETS)).alias("bucket"))
    scored = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("w_mills").alias("sw"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    logit = F.lit(QC_BIAS_MILLS) / F.lit(1000.0) + F.col("sw") / (
        F.lit(1000.0) * F.col("n_toks")
    )
    base = docs.select("doc_id")
    return (
        base.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(logit, F.lit(QC_BIAS_MILLS / 1000.0)).alias("logit"),
        )
        .select("doc_id", "logit", (F.col("logit") > 0).alias("keep"))
    )


def _qc_weights(spark: SparkSession) -> DataFrame:
    """Deterministic per-bucket weights in thousandths: ((b*37) % 21 - 10) * 30."""
    return spark.range(QC_BUCKETS).select(
        F.col("id").alias("bucket"),
        ((F.pmod(F.col("id") * 37, F.lit(21)) - 10) * 30).alias("w_mills"),
    )


@register(
    "t16_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter({{toks}}, t -> t <> '')) AS tok
      FROM documents
    ), feats AS (
      SELECT doc_id, {hex60_sql('tok')} % {QC_BUCKETS} AS bucket FROM toks
    ), weights AS (
      SELECT k AS bucket, ((k * 37) % 21 - 10) * 30 AS w_mills
      FROM range(0, {QC_BUCKETS}) t(k)
    ), scored AS (
      SELECT doc_id, sum(w_mills) AS sw, count(*) AS n_toks
      FROM feats JOIN weights USING (bucket) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE({QC_BIAS_MILLS} / 1000.0 + sw / (1000.0 * n_toks),
                    {QC_BIAS_MILLS} / 1000.0) AS logit,
           COALESCE({QC_BIAS_MILLS} / 1000.0 + sw / (1000.0 * n_toks),
                    {QC_BIAS_MILLS} / 1000.0) > 0 AS keep
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """.replace("{toks}", TOKENS_SQL.format(col="text")),
)
def t16_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_classifier(docs, _qc_weights(spark))


# --- n-gram LM likelihood scoring (CCNet tier) --------------------------------

# Pruned-LM size and fixed-point scale. CCNet scores documents by
# perplexity under a KenLM model trained on a trusted corpus and drops
# the tail; the cross-engine-exact analogue here replaces log-space
# float perplexity with integer conditional-frequency mills (floor
# division only — no transcendental whose last ulp could differ between
# libm and DuckDB), and the KenLM pruning step with a top-K bigram
# table. Unseen bigrams score 0 mills (the smoothing floor).
LM_TOPK = 2048
LM_SCALE = 1_000_000


def _bigrams(tokens: Column) -> Column:
    """Adjacent word-bigram strings from a token array; [] under 2 tokens.

    DuckDB twin: ``[ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))]``.
    """
    idx = F.when(
        F.size(tokens) >= 2, F.sequence(F.lit(1), F.size(tokens) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(tokens, i), F.element_at(tokens, i + 1)
        ),
    )


_BIGRAMS_SQL = (
    "CASE WHEN len({ts}) >= 2 THEN "
    "[{ts}[i] || ' ' || {ts}[i+1] FOR i IN range(1, len({ts}))] "
    "ELSE [] END"
)


def lm_likelihood(docs: DataFrame, topk: int = LM_TOPK) -> DataFrame:
    """Per-doc n-gram LM likelihood score in integer mills.

    Model build: corpus bigram occurrences aggregate twice (by bigram,
    by prefix word) — both map-side-combined exchanges carry one row per
    distinct key per mapper; the pruned model is the global top-K
    bigrams by count, taken with ``orderBy().limit()`` so Catalyst plans
    ``TakeOrderedAndProject`` (per-partition partial top-K, no full-sort
    shuffle), each carrying mills = floor(SCALE * c(w1 w2) / c(w1 ·)).
    Scoring: the corpus explodes its bigrams (narrow), broadcast-joins
    the K-row model, and folds back to one row per doc (partial agg).
    The only corpus-sized exchange is the doc_id fold; the model is
    driver-bounded at K rows. Docs with <2 tokens score -1 ("no
    evidence"), distinct from a genuine 0 ("all bigrams unseen").
    """
    # token array pre-projected into a bound column before the bigram
    # HOF — a lambda over the raw split expression re-evaluates it per
    # element (the p08 lambda-CSE trap, O(tokens^2) when the plan
    # context stops hiding it)
    bgs = docs.select("doc_id", norm_tokens("text").alias("ts")).select(
        "doc_id", F.explode(_bigrams(F.col("ts"))).alias("bg")
    )
    occ = bgs.select("bg", F.substring_index("bg", " ", 1).alias("w1"))
    c2 = occ.groupBy("bg", "w1").agg(F.count(F.lit(1)).alias("n2"))
    c1 = occ.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    model = (
        c2.join(c1, "w1")
        .orderBy(F.desc("n2"), F.asc("bg"))
        .limit(topk)
        .select("bg", F.expr(f"({LM_SCALE} * n2) div n1").alias("mills"))
    )
    scored = (
        bgs.join(F.broadcast(model), "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("mills"), F.lit(0))).alias("sm"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("sm div n_bigrams").alias("lm_mills"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("lm_mills", F.lit(-1).cast("long")).alias("lm_mills"),
        )
    )


# Shared oracle CTE chain ending in `lmscore(doc_id, n_bigrams, lm_mills)`
# — one row per document, -1 lm_mills for docs with <2 tokens. Reused by
# the t17 gate and the CCNet perplexity-bucket split (p09).
LM_SCORED_CTES = f"""
    t AS (
      SELECT doc_id, {_TOKS} AS ts FROM documents
    ), bgs AS (
      SELECT doc_id, unnest({_BIGRAMS_SQL.format(ts='ts')}) AS bg FROM t
    ), occ AS (
      SELECT bg, split_part(bg, ' ', 1) AS w1 FROM bgs
    ), c2 AS (
      SELECT bg, w1, count(*) AS n2 FROM occ GROUP BY bg, w1
    ), c1 AS (
      SELECT w1, count(*) AS n1 FROM occ GROUP BY w1
    ), model AS (
      SELECT bg, ({LM_SCALE} * n2) // n1 AS mills
      FROM c2 JOIN c1 USING (w1)
      ORDER BY n2 DESC, bg ASC LIMIT {LM_TOPK}
    ), scored AS (
      SELECT doc_id,
             CAST(count(*) AS INT) AS n_bigrams,
             CAST(sum(COALESCE(mills, 0)) AS BIGINT)
               // count(*) AS lm_mills
      FROM bgs LEFT JOIN model USING (bg) GROUP BY doc_id
    ), lmscore AS (
      SELECT d.doc_id,
             COALESCE(n_bigrams, 0) AS n_bigrams,
             CAST(COALESCE(lm_mills, -1) AS BIGINT) AS lm_mills
      FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    )
"""


@register(
    "t17_lm_likelihood",
    oracle=f"""
    WITH {LM_SCORED_CTES}
    SELECT doc_id, n_bigrams, lm_mills FROM lmscore
    """,
)
def t17_lm_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_likelihood(load_table(spark, sf_dir, "documents"))
