"""Oracle output-typing guard (VERDICT r04 'Next round' #1).

Rule: no uncast integer aggregate may reach an oracle output column.
DuckDB types a windowed/grouped ``sum(BIGINT)`` as HUGEINT, which the
driver's Arrow/pandas canonicalization renders as decimal128 / float64
("100931.0") — a value-hash mismatch against Spark's BIGINT even when
the row sets are identical (the two-round s04 red). The local gate's
native ``fetchall()`` hides this, so the guard checks the DuckDB
logical result types directly: HUGEINT/UHUGEINT may never appear in an
oracle's output schema.
"""

from __future__ import annotations

import pytest

from ocr_spark.plans import ORACLE, load_all

load_all()

BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_output_has_no_hugeint(name, duck):
    rel = duck.sql(ORACLE[name])
    offenders = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ).upper() in BANNED
    ]
    assert not offenders, (
        f"{name}: oracle output column(s) {offenders} are HUGEINT — "
        "Arrow canonicalization will hash-mismatch Spark's BIGINT; "
        "CAST the aggregate (s04 postmortem, VERDICT r04 #1)"
    )
