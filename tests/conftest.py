from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.session import build_session  # noqa: E402
from ocr_spark.sources.io import TESTDATA_TABLES  # noqa: E402
from ocr_spark.oracle import register_duckdb_views  # noqa: E402

SF_DIR = os.environ.get("OCR_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session("ocr_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    register_duckdb_views(con, SF_DIR, TESTDATA_TABLES)
    return con


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
