"""Iceberg integration smoke: create the pages table with the production
partition spec (days(warc_ts), bucket(16, url)), append the fixture
corpus, read it back through read_pages, and verify the partition spec
took effect via the table's partitions metadata.

Requires an iceberg-spark-runtime jar (bundled with pyspark or via
SPARK_GRAFT_ICEBERG_JAR). Exits 0 printing ICEBERG_OK on success;
exits 3 printing ICEBERG_UNAVAILABLE when the jar is missing (the
sandbox case — tests/test_iceberg.py skips on it).

Usage: python tools/iceberg_smoke.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.sources.io import (  # noqa: E402
    PAGES_TABLE,
    create_pages_table,
    iceberg_jar_present,
    iceberg_session_conf,
    read_pages,
    write_extracted,
)


def main() -> int:
    if not iceberg_jar_present():
        print("ICEBERG_UNAVAILABLE")
        return 3
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from ocr_spark.fixtures import pages_df
    from ocr_spark.session import build_session

    warehouse = tempfile.mkdtemp(prefix="ocr_iceberg_wh_")
    conf = iceberg_session_conf(warehouse)
    jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if jar:
        conf["spark.jars"] = jar
    spark = build_session("iceberg-smoke", cores=4, extra_conf=conf)

    create_pages_table(spark)
    pages = pages_df(spark, n_rows)
    pages.writeTo(PAGES_TABLE).append()

    back = read_pages(spark, path="", table=PAGES_TABLE)
    assert back.count() == n_rows, "round-trip row count mismatch"
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang"}

    # the partition spec must actually shape the layout: the partitions
    # metadata table carries (warc_ts_day, url_bucket) tuples
    parts = spark.sql(f"SELECT partition FROM {PAGES_TABLE}.partitions").collect()
    assert parts, "no partitions recorded"
    fields = parts[0].partition.asDict()
    assert "warc_ts_day" in fields and "url_bucket" in fields, fields

    # the Iceberg sink path of write_extracted
    write_extracted(
        back.limit(5), path="", mode="overwrite", table=f"{PAGES_TABLE}_copy"
    )
    assert spark.table(f"{PAGES_TABLE}_copy").count() == 5

    spark.stop()
    print("ICEBERG_OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
