"""w02: tiled Cholesky factorization — the reference's second flagship
dataflow (`/root/reference/examples/cholesky/cholesky.c:197-199` runs a
tiled right-looking Cholesky where each step spawns POTRF / TRSM / GEMM
tile tasks gated on their neighbours' outputs).

Spark re-expression: tiles are DataFrame rows; each k-panel round runs
the three kernel stages as Arrow-batched mapInPandas over the tile set,
with the factored panel broadcast to the trailing update (the trailing
tiles are the big side at scale — they never shuffle; only the
O(matrix-width) panel moves).  Each stage output is
localCheckpoint()-ed, so lineage stays one round deep (the d06/g01/w01
pattern) and a restart resumes from the last materialized panel.

Cross-engine exactness: every kernel uses scalar Python float loops in
a FIXED evaluation order — each element's k-fold subtracts terms in
ascending global k, split across panel rounds exactly like the scalar
left-looking algorithm — and IEEE doubles (+,-,*,/ and correctly
rounded sqrt) behave identically in CPython, the JVM, and DuckDB.  The
oracle is generated SQL computing the same formulas column-by-column
through MATERIALIZED CTEs (lateral-alias chains would inline
exponentially), bit-identical to both the scalar reference and the
tiled distributed run (pinned by tests/test_cholesky.py).

The input matrix is deterministic: A = M·Mᵀ + n·I with splitmix-derived
integer M — every A entry is an exact small integer, so both engines
start from identical doubles.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.plans import register

CHOL_N = 24
CHOL_TILE = 8

_TILE_SCHEMA = "ti int, tj int, block array<double>"


def _mix(i: int, j: int) -> int:
    z = (i * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + 0xD6E8FEB86659FD93) % (1 << 64)
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
    z ^= z >> 31
    return (z % 7) - 3


def gen_spd_matrix(n: int = CHOL_N) -> list[list[int]]:
    """Exact-integer SPD matrix: A = M·Mᵀ + n·I (diagonally dominant)."""
    m = [[_mix(i, k) for k in range(n)] for i in range(n)]
    return [
        [
            sum(m[i][k] * m[j][k] for k in range(n)) + (n if i == j else 0)
            for j in range(n)
        ]
        for i in range(n)
    ]


def scalar_cholesky(a: list[list[int]]) -> list[list[float]]:
    """Reference-order scalar factorization (the order every tiled
    kernel must reproduce): per element, terms subtracted in ascending
    k, left-to-right."""
    n = len(a)
    lo = [[0.0] * n for _ in range(n)]
    for j in range(n):
        acc = float(a[j][j])
        for k in range(j):
            acc = acc - lo[j][k] * lo[j][k]
        lo[j][j] = math.sqrt(acc)
        for i in range(j + 1, n):
            acc = float(a[i][j])
            for k in range(j):
                acc = acc - lo[i][k] * lo[j][k]
            lo[i][j] = acc / lo[j][j]
    return lo


def _potrf(blk: list[float], t: int) -> list[float]:
    """Factor a diagonal tile in place (scalar order)."""
    out = list(blk)
    for c in range(t):
        acc = out[c * t + c]
        for k in range(c):
            acc = acc - out[c * t + k] * out[c * t + k]
        out[c * t + c] = math.sqrt(acc)
        for r in range(c + 1, t):
            acc2 = out[r * t + c]
            for k in range(c):
                acc2 = acc2 - out[r * t + k] * out[c * t + k]
            out[r * t + c] = acc2 / out[c * t + c]
    for c in range(t):  # zero the (never-read) upper triangle
        for r in range(c):
            out[r * t + c] = 0.0
    return out


def _trsm(blk: list[float], lkk: list[float], t: int) -> list[float]:
    """Solve L_ik · L_kkᵀ-triangular system column-by-column."""
    out = list(blk)
    for c in range(t):
        for r in range(t):
            acc = out[r * t + c]
            for k in range(c):
                acc = acc - out[r * t + k] * lkk[c * t + k]
            out[r * t + c] = acc / lkk[c * t + c]
    return out


def _gemm_sub(blk: list[float], lik: list[float], ljk: list[float], t: int) -> list[float]:
    """blk -= L_ik · L_jkᵀ, subtracting per κ in ascending order."""
    out = list(blk)
    for r in range(t):
        for c in range(t):
            acc = out[r * t + c]
            for k in range(t):
                acc = acc - lik[r * t + k] * ljk[c * t + k]
            out[r * t + c] = acc
    return out


def _np_potrf(blk, t: int):
    """Vectorized POTRF, bit-identical to _potrf: each column's k-terms
    are subtracted as whole-column rank-1 updates in ascending k, so
    every element sees the exact same IEEE op sequence as the scalar
    loop (numpy elementwise multiply/subtract are individually correctly
    rounded; nothing is fused or reassociated)."""
    import numpy as np

    out = np.array(blk, dtype=np.float64).reshape(t, t)
    for c in range(t):
        acc = out[c, c]
        for k in range(c):
            acc = acc - out[c, k] * out[c, k]
        d = math.sqrt(acc)
        out[c, c] = d
        col = out[c + 1 :, c].copy()
        for k in range(c):
            col = col - out[c + 1 :, k] * out[c, k]
        out[c + 1 :, c] = col / d
    for c in range(t):
        out[: c, c] = 0.0
    return out.ravel().tolist()


def _np_trsm(blk, lkk, t: int):
    """Vectorized TRSM (whole column per step, ascending k) — see
    _np_potrf for the exactness argument."""
    import numpy as np

    out = np.array(blk, dtype=np.float64).reshape(t, t)
    l = np.array(lkk, dtype=np.float64).reshape(t, t)
    for c in range(t):
        col = out[:, c].copy()
        for k in range(c):
            col = col - out[:, k] * l[c, k]
        out[:, c] = col / l[c, c]
    return out.ravel().tolist()


def _np_gemm_sub(blk, lik, ljk, t: int):
    """Vectorized blk -= L_ik · L_jkᵀ as t rank-1 (outer-product)
    subtractions in ascending k — per element the identical ascending-k
    IEEE fold as _gemm_sub, t² elements per step instead of one."""
    import numpy as np

    out = np.array(blk, dtype=np.float64).reshape(t, t)
    a = np.array(lik, dtype=np.float64).reshape(t, t)
    b = np.array(ljk, dtype=np.float64).reshape(t, t)
    for k in range(t):
        out = out - np.outer(a[:, k], b[:, k])
    return out.ravel().tolist()


def _kernel(fn):
    import pandas as pd

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = {"ti": [], "tj": [], "block": []}
            for row in pdf.itertuples(index=False):
                out["ti"].append(row.ti)
                out["tj"].append(row.tj)
                out["block"].append(fn(row))
            yield pd.DataFrame(out)

    return run


def tiled_cholesky(
    spark: SparkSession,
    n: int = CHOL_N,
    tile: int = CHOL_TILE,
    vectorized: bool = True,
) -> DataFrame:
    """(i, j, l): the lower-triangular Cholesky factor, computed by the
    tiled POTRF → TRSM → GEMM panel iteration.

    ``vectorized=True`` (default) runs the numpy fixed-order kernels —
    bit-identical to the scalar loops (tests/test_cholesky.py pins both
    against each other and the oracle), ~tile² faster per element;
    ``vectorized=False`` keeps the scalar loops as the oracle-pinned
    reference mode."""
    a = gen_spd_matrix(n)
    nt = n // tile
    rows = [
        (
            ti,
            tj,
            [float(a[ti * tile + r][tj * tile + c]) for r in range(tile) for c in range(tile)],
        )
        for ti in range(nt)
        for tj in range(ti + 1)
    ]
    tiles = spark.createDataFrame(rows, _TILE_SCHEMA)

    t = tile
    if vectorized:
        potrf = _kernel(lambda row: _np_potrf(row.block, t))
        trsm = _kernel(lambda row: _np_trsm(row.block, row.lkk, t))
        gemm = _kernel(lambda row: _np_gemm_sub(row.block, row.lik, row.ljk, t))
    else:
        potrf = _kernel(lambda row: _potrf(list(row.block), t))
        trsm = _kernel(lambda row: _trsm(list(row.block), list(row.lkk), t))
        gemm = _kernel(lambda row: _gemm_sub(list(row.block), list(row.lik), list(row.ljk), t))

    done: list[DataFrame] = []
    for k in range(nt):
        kk = (
            tiles.filter((F.col("ti") == k) & (F.col("tj") == k))
            .mapInPandas(potrf, _TILE_SCHEMA)
            .localCheckpoint(eager=True)
        )
        done.append(kk)
        panel = tiles.filter((F.col("tj") == k) & (F.col("ti") > k))
        trailing = tiles.filter(F.col("tj") > k)
        if k == nt - 1:
            break
        lkk = kk.select(F.col("block").alias("lkk"))
        panel = (
            panel.crossJoin(F.broadcast(lkk))
            .mapInPandas(trsm, _TILE_SCHEMA)
            .localCheckpoint(eager=True)
        )
        done.append(panel)
        lik = panel.select(F.col("ti").alias("pi"), F.col("block").alias("lik"))
        ljk = panel.select(F.col("ti").alias("pj"), F.col("block").alias("ljk"))
        tiles = (
            trailing.join(F.broadcast(lik), trailing.ti == lik.pi)
            .join(F.broadcast(ljk), trailing.tj == ljk.pj)
            .select("ti", "tj", "block", "lik", "ljk")
            .mapInPandas(gemm, _TILE_SCHEMA)
            .localCheckpoint(eager=True)
        )

    result = done[0]
    for d in done[1:]:
        result = result.unionByName(d)
    pos = F.posexplode("block")
    out = result.select("ti", "tj", pos.alias("pos", "l"))
    i = F.col("ti") * tile + (F.col("pos") / tile).cast("int")
    j = F.col("tj") * tile + F.pmod(F.col("pos"), tile)
    return out.select(i.alias("i"), j.alias("j"), "l").filter(F.col("j") <= F.col("i"))


def _cholesky_oracle_sql(n: int = CHOL_N) -> str:
    """Column-chained MATERIALIZED CTEs (c{j} = list of column j's
    factor elements); each element's expression subtracts its k-terms
    in the same ascending order as the scalar/tiled computation, so
    every double is bit-identical."""
    a = gen_spd_matrix(n)
    ctes = []
    for j in range(n):

        def elem(i: int) -> str:
            e = f"CAST({a[i][j]} AS DOUBLE)"
            for k in range(j):
                e = f"({e} - (c{k}[{i - k + 1}] * c{k}[{j - k + 1}]))"
            return e

        prev = ", ".join(f"c{k}" for k in range(j))
        prevsel = (prev + ", ") if prev else ""
        src = f" FROM m{j - 1}" if j else ""
        ctes.append(
            f"m{j}d AS MATERIALIZED (SELECT {prevsel}sqrt({elem(j)}) AS d{j}{src})"
        )
        offs = ", ".join(f"({elem(i)}) / d{j}" for i in range(j + 1, n))
        lst = f"list_prepend(d{j}, [{offs}])" if offs else f"[d{j}]"
        ctes.append(f"m{j} AS MATERIALIZED (SELECT {prevsel}{lst} AS c{j} FROM m{j}d)")
    unions = " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, c{j}[{i - j + 1}] AS l FROM m{n - 1}"
        for j in range(n)
        for i in range(j, n)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


@register("w02_tiled_cholesky", oracle=_cholesky_oracle_sql())
def w02_tiled_cholesky(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiled_cholesky(spark)
