"""Bucketed-table co-located joins (the brief's "bucketing for
co-located joins"; production shape: the pages table is bucketed
`bucket(16, url)` in Iceberg, sources/io.py::PAGES_PARTITION_SPEC).

Writing both sides bucketed by the join key must let the join execute
with NO exchange on either side — at 100 TB this is the difference
between a url-keyed verification join shuffling the whole corpus and a
bucket-local merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is fixed at session start; point the
    # catalog's default database at a temp location via a dedicated db
    db = "bucketing_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    from ocr_spark.fixtures import pages_df

    pages = pages_df(spark, 200).select("url", "lang", F.octet_length("html").alias("n"))
    golden = pages.select("url", F.lit(1).alias("flag"))

    (pages.write.mode("overwrite").bucketBy(8, "url").sortBy("url")
        .saveAsTable(f"{warehouse}.pages_b"))
    (golden.write.mode("overwrite").bucketBy(8, "url").sortBy("url")
        .saveAsTable(f"{warehouse}.golden_b"))

    a = spark.table(f"{warehouse}.pages_b")
    b = spark.table(f"{warehouse}.golden_b")
    # disable broadcast so the co-location (not a broadcast) is what
    # removes the exchange
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = a.join(b, "url").groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
        assert j.count() > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    join_part = plan.split("HashAggregate")[-1]  # everything below the agg
    assert "SortMergeJoin" in plan
    # the join subtree reads both bucketed tables with no exchange
    n_exchanges_below_join = join_part.count("Exchange hashpartitioning(url")
    assert n_exchanges_below_join == 0, plan[:4000]
