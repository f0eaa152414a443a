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
