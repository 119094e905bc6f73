"""LIVE JDBC execution (not mocks): Spark bundles embedded Derby for
the Hive metastore, so the JDBC datastore path can actually run —
write through Spark's JDBC sink, read back through read_datastore's
query pushdown, and exercise the partitioned-read options that are the
100 TB ingestion path."""

from __future__ import annotations

import pytest

from etly_spark.config import Source
from etly_spark.sources.datastore import read_datastore

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_roundtrip_with_query_pushdown(spark, derby_url):
    src = spark.range(0, 100).selectExpr("id AS ID", "concat('name-', id) AS NAME")
    (
        src.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "PEOPLE")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    ds = Source(
        name="SELECT ID, NAME FROM PEOPLE WHERE ID < 10",
        type="datastore",
        ds_config={
            "DriverName": "jdbc",
            "Parameters": {"url": derby_url, "driver": DRIVER},
        },
    )
    rows = sorted(r.ID for r in read_datastore(spark, ds).collect())
    assert rows == list(range(10))  # the WHERE ran inside the database


def test_jdbc_partitioned_read(spark, derby_url):
    """partitionColumn/bounds/numPartitions → N parallel JDBC cursors,
    the shape that scales an ingest across executors."""
    src = spark.range(0, 1000).selectExpr("id AS ID", "id * 2 AS V")
    (
        src.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "WIDE")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    ds = Source(
        name="WIDE",  # bare table name → SELECT * defaulting
        type="datastore",
        ds_config={
            "DriverName": "jdbc",
            "Parameters": {
                "url": derby_url,
                "driver": DRIVER,
                "partitionColumn": "ID",
                "lowerBound": "0",
                "upperBound": "1000",
                "numPartitions": "4",
            },
        },
    )
    df = read_datastore(spark, ds)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.agg({"V": "sum"}).collect()[0][0] == sum(i * 2 for i in range(1000))
