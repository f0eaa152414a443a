"""Column-level text helpers, all JVM-side (whole-stage codegen'd).

Portability contract with the DuckDB oracle:
  - tokenization = split on runs of whitespace after trim, empties dropped
    (`string_split_regex(trim(x), '\\s+')` on the DuckDB side);
  - 60-bit content hash = first 15 hex chars of md5, parsed base-16
    (`CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` on the DuckDB
    side) — md5 is the only hash both engines share; xxhash64 exists only
    in Spark, DuckDB's hash() is a different algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text; [] for empty/blank input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def hex60(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash shared bit-for-bit with DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hex60_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`hex60` (for oracle generation)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def shingles3(tokens: Column) -> Column:
    """Overlapping word 3-gram shingles from a token array.

    DuckDB twin: ``[ts[i]||' '||ts[i+1]||' '||ts[i+2] FOR i IN range(1, len(ts)-1)]``.
    Returns [] when fewer than 3 tokens.
    """
    idx = F.when(
        F.size(tokens) >= 3, F.sequence(F.lit(1), F.size(tokens) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(tokens, i), F.element_at(tokens, i + 1), F.element_at(tokens, i + 2)
        ),
    )


SHINGLES3_SQL = (
    "CASE WHEN len({ts}) >= 3 THEN "
    "[{ts}[i] || ' ' || {ts}[i+1] || ' ' || {ts}[i+2] FOR i IN range(1, len({ts}) - 1)] "
    "ELSE [] END"
)

TOKENS_SQL = "string_split_regex(trim({col}), '\\s+')"


# --- n-gram language-ID ------------------------------------------------------

# Char-trigram profiles (lowercased). Deliberately tiny and literal so the
# DuckDB oracle replicates scoring bit-for-bit with length/replace math.
LANG_TRIGRAMS: dict[str, list[str]] = {
    "en": ["the", "qui", "jum", "laz", "bro"],
    "de": ["sch", "der", "den", "übe", "uch"],
    "fr": ["ren", "rap", "ess", "quê", "nné"],
}
# Script ranges as literal character classes (valid in both Java regex and
# DuckDB RE2): kana -> ja, CJK ideographs -> zh, Cyrillic -> ru, Arabic -> ar.
SCRIPT_CLASSES = {
    "ja": "[ぁ-ゟ゠-ヿ]",
    "zh": "[一-鿿]",
    "ru": "[а-яё]",
    "ar": "[ء-ۿ]",
}


def _occurrences(t, g: str):
    """Occurrence count of literal trigram g in t (length/replace math —
    identical expression in DuckDB)."""
    from pyspark.sql import functions as F

    return (F.length(t) - F.length(F.replace(t, F.lit(g)))) / len(g)


def lang_id_ngram(text_col):
    """Language guess: script classes first (kana/CJK/Cyrillic/Arabic),
    else argmax of per-language char-trigram occurrence counts
    (Cavnar–Trenkle-style profile intersection, tiny fixed profiles);
    'und' when nothing scores. Deterministic tie-break by language code
    order en < de < fr."""
    from pyspark.sql import functions as F

    t = F.lower(text_col)
    scripts = {
        lang: F.regexp_count(t, F.lit(cls)) for lang, cls in SCRIPT_CLASSES.items()
    }
    scores = {
        lang: sum(_occurrences(t, g) for g in grams)
        for lang, grams in LANG_TRIGRAMS.items()
    }
    best_latin = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]) & (scores["en"] > 0),
            F.lit("en"),
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] > 0), F.lit("de"))
        .when(scores["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return (
        F.when(scripts["ja"] > 0, F.lit("ja"))
        .when(scripts["zh"] > 0, F.lit("zh"))
        .when(scripts["ru"] > 0, F.lit("ru"))
        .when(scripts["ar"] > 0, F.lit("ar"))
        .otherwise(best_latin)
    )


def lang_id_ngram_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`lang_id_ngram`."""
    t = f"lower({text_expr})"
    occ = lambda g: f"(length({t}) - length(replace({t}, '{g}', ''))) / {len(g)}"  # noqa: E731
    score = {
        lang: " + ".join(occ(g) for g in grams) for lang, grams in LANG_TRIGRAMS.items()
    }
    sc = {lang: f"len(regexp_extract_all({t}, '{cls}'))" for lang, cls in SCRIPT_CLASSES.items()}
    return f"""
    CASE WHEN {sc['ja']} > 0 THEN 'ja'
         WHEN {sc['zh']} > 0 THEN 'zh'
         WHEN {sc['ru']} > 0 THEN 'ru'
         WHEN {sc['ar']} > 0 THEN 'ar'
         WHEN ({score['en']}) >= ({score['de']}) AND ({score['en']}) >= ({score['fr']})
              AND ({score['en']}) > 0 THEN 'en'
         WHEN ({score['de']}) >= ({score['fr']}) AND ({score['de']}) > 0 THEN 'de'
         WHEN ({score['fr']}) > 0 THEN 'fr'
         ELSE 'und' END
    """
