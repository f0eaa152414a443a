"""Order-insensitive DataFrame↔DuckDB comparison (mirror of the driver's
correctness gate; used by pytest and tools/compare_oracle.py)."""

from __future__ import annotations

import math


def norm_cell(v) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def register_duckdb_views(con, sf_dir: str, tables) -> None:
    for t in tables:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def compare(sdf, con, sql: str) -> str | None:
    """Return None on match, else a short mismatch description."""
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return f"rowcount spark={len(s_rows)} duck={len(d_rows)}"
    cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return f"value mismatch, first diffs: {diffs}"
    return None
