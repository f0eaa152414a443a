"""Vector math over ``array<float|double>`` columns, JVM-side via
higher-order functions (no Python crossing).

``F.aggregate`` is a sequential left fold, so the floating-point addition
order is deterministic and matches DuckDB's sequential list kernels —
which is what makes the cosine oracle comparison exact rather than
ulp-fuzzy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
