"""Differential test: every catalog query with an oracle must match DuckDB
exactly (row count + schema + order-insensitive values) at sf0.001 — the
local twin of the driver's CORRECTNESS gate. Rows-only queries must at
least execute and return a stable schema.

This is the test the reference never had: an independent-engine check on
top of its per-feature unit tests (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from ocr_spark.oracle import compare
from ocr_spark.plans import ORACLE, QUERIES, load_all

load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_query(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    if name in ORACLE:
        mismatch = compare(sdf, duck, ORACLE[name])
        assert mismatch is None, f"{name}: {mismatch}"
    else:
        rows = sdf.count()
        assert rows >= 0
        assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_callable():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, sql in entrymod.oracle_sql().items():
        assert name in qs
        assert "SELECT" in sql.upper()
