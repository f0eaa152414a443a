"""w02 tiled Cholesky: the tiled POTRF/TRSM/GEMM panel iteration must
reproduce the scalar reference factorization BIT-FOR-BIT (same IEEE
operation order), reconstruct A, and keep lineage bounded."""

from __future__ import annotations

from ocr_spark.operators.tiled_cholesky import (
    CHOL_N,
    gen_spd_matrix,
    scalar_cholesky,
    tiled_cholesky,
)
from ocr_spark.plans import QUERIES, load_all

load_all()


def test_tiled_matches_scalar_bitwise(spark):
    a = gen_spd_matrix(CHOL_N)
    want = scalar_cholesky(a)
    got = {(r.i, r.j): r.l for r in tiled_cholesky(spark).collect()}
    assert len(got) == CHOL_N * (CHOL_N + 1) // 2
    for (i, j), v in got.items():
        assert v == want[i][j], (i, j, v, want[i][j])


def test_factor_reconstructs_matrix(spark):
    a = gen_spd_matrix(CHOL_N)
    lo = {(r.i, r.j): r.l for r in tiled_cholesky(spark).collect()}
    get = lambda i, k: lo.get((i, k), 0.0)
    for i in range(CHOL_N):
        for j in range(i + 1):
            recon = sum(get(i, k) * get(j, k) for k in range(CHOL_N))
            assert abs(recon - a[i][j]) < 1e-8 * max(1.0, abs(a[i][j]))


def test_cholesky_lineage_bounded(spark, sf_dir):
    df = QUERIES["w02_tiled_cholesky"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "MapInPandas" not in plan  # every panel round checkpointed
