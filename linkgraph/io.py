"""Small shared IO helpers: schema-pinned parquet reads that treat a
missing path as absent state (first poll, fresh deployment) while letting
every real failure propagate, and a staged-swap committed write for state
directories that are atomically replaced between polls."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet_or_none(
    spark: SparkSession, path: str, schema: str | object
) -> DataFrame | None:
    """Read a parquet path with a pinned schema; None if the path does not
    exist yet. Any other read failure (permissions, corrupt footer, wrong
    FS) propagates — state resets must be explicit, never an error
    swallowed into "start over"."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        return None


def read_parquet_or_empty(
    spark: SparkSession, path: str, schema: str | object
) -> DataFrame:
    df = read_parquet_or_none(spark, path, schema)
    return df if df is not None else spark.createDataFrame([], schema)


def committed_overwrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Replace the state directory at ``path`` with ``df``'s rows without a
    window where a crash leaves a HALF-WRITTEN directory that a later read
    mistakes for complete state.

    Plain ``mode("overwrite")`` deletes the old directory first and then
    writes part files into it — a driver killed mid-write leaves a
    readable-but-partial parquet dir, which for the stable id dictionary
    means silently renumbered vertices on the next poll. Protocol here:
    write to ``path.staging`` (crash -> old state intact), delete old,
    rename staging into place (crash between the two -> recovered by
    ``read_committed``). The caller must have broken any lazy dependency
    of ``df`` on ``path`` itself (localCheckpoint) before calling."""
    from linkgraph.engine import fs_delete, fs_rename

    staging = path.rstrip("/") + ".staging"
    fs_delete(spark, staging)
    df.write.mode("overwrite").parquet(staging)
    fs_delete(spark, path)
    if not fs_rename(spark, staging, path):
        raise IOError(f"committed_overwrite: rename {staging} -> {path} failed")


def read_committed_or_none(
    spark: SparkSession, path: str, schema: str | object
) -> DataFrame | None:
    """Read state written by ``committed_overwrite``, completing a swap a
    crash interrupted: if ``path`` is missing but ``path.staging`` exists
    (death between delete and rename), the staging dir — which is always
    fully written before the old dir is touched — is renamed into place
    first."""
    from linkgraph.engine import fs_exists, fs_rename

    staging = path.rstrip("/") + ".staging"
    # adopt staging only if its write COMPLETED (_SUCCESS marker) — a crash
    # mid-staging-write leaves a partial dir that must never become state
    if not fs_exists(spark, path) and fs_exists(spark, f"{staging}/_SUCCESS"):
        fs_rename(spark, staging, path)
    return read_parquet_or_none(spark, path, schema)
