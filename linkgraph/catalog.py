"""Catalog shim: Parquet paths offline, Iceberg tables when the jar exists.

The north-star input is an Iceberg table of web pages (BASELINE.json
``input_hint``), but no Iceberg runtime jar ships in this offline sandbox
(SURVEY.md §1.4 probe). This shim keeps all table I/O behind one interface so
the identical engine code runs against either backend:

- ``ParquetCatalog(root)`` — ``table("pages")`` → ``spark.read.parquet(root/pages)``
- ``IcebergCatalog(catalog, db)`` — ``table("pages")`` → ``spark.table("cat.db.pages")``
  (requires ``iceberg-spark-runtime`` on the classpath; auto-detected).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ParquetCatalog:
    """Path-based catalog: one parquet directory (or file) per table."""

    spark: SparkSession
    root: str

    def path(self, name: str) -> str:
        # existence via the Hadoop FS, not os.path: the root is routinely
        # hdfs:///s3a:// on a cluster, where a driver-local exists() is
        # always False and '<name>.parquet' dirs would silently stop
        # resolving (fs_exists degrades to the local fs for plain paths)
        from linkgraph.engine import fs_exists

        for cand in (
            os.path.join(self.root, name),
            os.path.join(self.root, f"{name}.parquet"),
        ):
            if fs_exists(self.spark, cand):
                return cand
        return os.path.join(self.root, name)

    def table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(os.path.join(self.root, name))


@dataclass
class IcebergCatalog:
    """Iceberg catalog backend (north-star path; needs the runtime jar)."""

    spark: SparkSession
    catalog: str
    database: str

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.database}.{name}"

    def table(self, name: str) -> DataFrame:
        return self.spark.table(self._ident(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        writer = df.writeTo(self._ident(name))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def get_catalog(spark: SparkSession, root_or_catalog: str, database: str = "db"):
    """Pick the Iceberg catalog when available, else the Parquet-path one."""
    if "://" not in root_or_catalog and os.path.sep not in root_or_catalog and iceberg_available(spark):
        return IcebergCatalog(spark, root_or_catalog, database)
    return ParquetCatalog(spark, root_or_catalog)
