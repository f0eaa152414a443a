"""q21 numeric gate: the sketches are engine-specific (no DuckDB hash
twin by design) but their published error bounds are checkable against
the exact twins — HLL++ relative standard deviation for
approx_count_distinct, and the rank-error guarantee of the
Greenwald-Khanna variant behind percentile_approx(accuracy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans import QUERIES, load_all
from ocr_spark.sources.io import load_table

load_all()

HLL_RSD = 0.05  # approx_count_distinct default relative standard deviation
PCT_ACCURACY = 10000  # accuracy used by q21 → rank error <= n / accuracy


def test_q21_sketches_within_error_bounds(spark, sf_dir):
    approx = {r.l_returnflag: r for r in QUERIES["q21_approx_sketches"](spark, sf_dir).collect()}

    li = load_table(spark, sf_dir, "lineitem")
    # rank-error window: n/accuracy ranks from the sketch guarantee,
    # plus 2 ranks of slack for the exact side's linear interpolation
    # (the sketch returns actual data values; interpolated exact
    # quantiles can sit strictly between two adjacent values)
    min_n = min(
        r.n for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    rank_eps = 1.0 / PCT_ACCURACY + 2.0 / min_n
    qs = {"p50": 0.5, "p95": 0.95, "p99": 0.99}
    exact_cols = [F.count_distinct("l_partkey").alias("nd")]
    for name, p in qs.items():
        lo = max(0.0, p - 2 * rank_eps)
        hi = min(1.0, p + 2 * rank_eps)
        exact_cols.append(F.expr(f"percentile(l_extendedprice, {lo})").alias(f"{name}_lo"))
        exact_cols.append(F.expr(f"percentile(l_extendedprice, {hi})").alias(f"{name}_hi"))
    exact = {r.l_returnflag: r for r in li.groupBy("l_returnflag").agg(*exact_cols).collect()}

    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        # HLL++: |approx - exact| / exact within 4 standard deviations
        rel = abs(a.approx_parts - e.nd) / e.nd
        assert rel <= 4 * HLL_RSD, f"{flag}: HLL rel error {rel:.3f}"
        # percentile_approx: value must sit between the exact quantiles
        # at p ± 2/accuracy (interpolated exact percentile brackets the
        # rank-error window)
        for name in qs:
            got = getattr(a, f"{name}_price")
            lo, hi = getattr(e, f"{name}_lo"), getattr(e, f"{name}_hi")
            assert lo - 1e-9 <= got <= hi + 1e-9, f"{flag} {name}: {got} not in [{lo}, {hi}]"
