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


def test_np_kernels_bit_identical_to_scalar():
    """The vectorized kernels must reproduce the scalar fixed-order IEEE
    op sequence exactly — element-for-element equality (==, not allclose)
    on a 32x32 tile with adversarial magnitude spread."""
    from ocr_spark.operators.tiled_cholesky import (
        _gemm_sub, _mix, _np_gemm_sub, _np_potrf, _np_trsm, _potrf, _trsm,
    )

    t = 32
    # SPD-ish diagonal-dominant block for potrf; raw mixes for the rest
    m = [[float(_mix(i, k)) for k in range(t)] for i in range(t)]
    spd = [
        sum(m[i][k] * m[j][k] for k in range(t)) + (3 * t if i == j else 0)
        for i in range(t) for j in range(t)
    ]
    raw = [float(_mix(i, j + 77)) * 1e-3 + float(_mix(j, i)) for i in range(t) for j in range(t)]
    lkk = _potrf(spd, t)

    assert _np_potrf(spd, t) == _potrf(spd, t)
    assert _np_trsm(raw, lkk, t) == _trsm(raw, lkk, t)
    assert _np_gemm_sub(spd, raw, raw, t) == _gemm_sub(spd, raw, raw, t)
