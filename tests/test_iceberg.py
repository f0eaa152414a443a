"""Iceberg integration gate (BASELINE.json: Iceberg tables partitioned
by days(warc_ts)/bucket(url)).

The sandbox ships no iceberg-spark-runtime jar, so the full round-trip
(tools/iceberg_smoke.py: DDL with the production partition spec, append,
read_pages, partition-metadata assertion, write_extracted sink) runs
only where the jar is present; what always runs is the seam contract —
conf shape, graceful parquet fallback, jar detection.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from ocr_spark.sources.io import (
    ICEBERG_CATALOG,
    PAGES_PARTITION_SPEC,
    iceberg_jar_present,
    iceberg_session_conf,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_session_conf_shape(tmp_path):
    conf = iceberg_session_conf(str(tmp_path))
    assert conf[f"spark.sql.catalog.{ICEBERG_CATALOG}"].endswith("SparkCatalog")
    assert conf[f"spark.sql.catalog.{ICEBERG_CATALOG}.warehouse"] == str(tmp_path)
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
    assert PAGES_PARTITION_SPEC == "days(warc_ts), bucket(16, url)"


def test_read_pages_falls_back_to_parquet(spark, tmp_path):
    """Without a wired catalog, read_pages(table=...) must serve the
    parquet path rather than fail."""
    from ocr_spark.fixtures import pages_df
    from ocr_spark.sources.io import read_pages

    p = str(tmp_path / "pages_pq")
    pages_df(spark, 10).write.mode("overwrite").parquet(p)
    back = read_pages(spark, p, table="ocr.db.pages")
    assert back.count() == 10


@pytest.mark.skipif(
    not iceberg_jar_present(), reason="iceberg-spark-runtime jar not on classpath"
)
def test_iceberg_round_trip():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "iceberg_smoke.py"), "50"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0 and "ICEBERG_OK" in proc.stdout, (
        proc.stdout[-2000:] + proc.stderr[-2000:]
    )


def test_write_extracted_iceberg_branch_partitions(spark, monkeypatch):
    """Jar-free gate for the Iceberg write branch: when the catalog conf
    is wired and partition_by is given, writeTo().partitionedBy(...) must
    be applied before createOrReplace() (regression: the branch used to
    silently create an unpartitioned table), and append() must NOT try
    to re-partition an existing table."""
    from ocr_spark.fixtures import pages_df
    from ocr_spark.sources.io import write_extracted

    calls = []

    class FakeWriter:
        def partitionedBy(self, *cols):
            calls.append(("partitionedBy", [str(c) for c in cols]))
            return self

        def createOrReplace(self):
            calls.append(("createOrReplace", None))

        def append(self):
            calls.append(("append", None))

    df = pages_df(spark, 3)
    # patch the concrete DataFrame class (pyspark 4 routes the public
    # pyspark.sql.DataFrame to a classic/connect subclass)
    monkeypatch.setattr(type(df), "writeTo", lambda self, table: FakeWriter())
    monkeypatch.setattr(
        "ocr_spark.sources.io._iceberg_available", lambda spark: True
    )

    write_extracted(df, "/unused", mode="overwrite",
                    partition_by=["lang"], table="ocr.db.pages")
    assert calls[0][0] == "partitionedBy" and "lang" in calls[0][1][0]
    assert calls[1][0] == "createOrReplace"

    calls.clear()
    write_extracted(df, "/unused", mode="append",
                    partition_by=["lang"], table="ocr.db.pages")
    assert calls == [("append", None)]
