"""Catalog shim tests: Parquet backend now, Iceberg when the jar exists.

The Iceberg test is gated on runtime detection (``iceberg_available``) —
it SKIPS in this offline sandbox (no iceberg-spark-runtime jar,
SURVEY.md §1.4) and lights up unchanged on a real cluster with the jar on
the classpath, exercising write/createOrReplace/append/read through the
same interface the engine uses.
"""

from __future__ import annotations

import pytest

from linkgraph.catalog import (
    IcebergCatalog,
    ParquetCatalog,
    get_catalog,
    iceberg_available,
)


def test_parquet_catalog_roundtrip(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    cat.write(df, "t")
    got = cat.table("t")
    assert got.count() == 100
    assert {r["id"] for r in got.collect()} == set(range(100))


def test_parquet_catalog_resolves_dot_parquet_suffix(spark):
    # driver testdata ships as <name>.parquet files; the catalog must find
    # them under the bare table name
    cat = ParquetCatalog(spark, "/root/testdata/sf0.001")
    assert cat.table("nation").count() == 25


def test_get_catalog_picks_parquet_for_paths(spark, tmp_path):
    assert isinstance(get_catalog(spark, str(tmp_path)), ParquetCatalog)


def test_get_catalog_prefers_iceberg_when_jar_present(spark):
    # bare catalog name: Iceberg iff the runtime is on the classpath
    cat = get_catalog(spark, "lgcat")
    if iceberg_available(spark):
        assert isinstance(cat, IcebergCatalog)
    else:
        assert isinstance(cat, ParquetCatalog)


def test_iceberg_catalog_roundtrip_when_jar_present(spark, tmp_path):
    """Write -> read -> append through IcebergCatalog against a local
    hadoop-type catalog. Skips without the runtime jar."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath (offline sandbox)")
    # Iceberg catalogs initialize lazily, so runtime conf is sufficient
    spark.conf.set("spark.sql.catalog.lgtest", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lgtest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lgtest.warehouse", str(tmp_path / "warehouse"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lgtest.db")
    cat = IcebergCatalog(spark, "lgtest", "db")
    df = spark.range(50).selectExpr("id", "CAST(id AS STRING) AS s")
    cat.write(df, "t")  # createOrReplace
    assert cat.table("t").count() == 50
    cat.write(df, "t", mode="append")
    assert cat.table("t").count() == 100
