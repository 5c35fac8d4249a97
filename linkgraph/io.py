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
    write to ``path.staging``, rename the old dir ASIDE (never a recursive
    delete of live state: a kill mid-delete would leave a readable-but-
    partial ``path`` that a reader mistakes for complete), rename staging
    into place, then delete the aside copy. At every kill point ``path``
    either does not exist or is a COMPLETE state dir, and a complete
    staging survives for ``read_committed_or_none`` to adopt. The caller
    must have broken any lazy dependency of ``df`` on ``path`` itself
    (localCheckpoint) before calling."""
    from linkgraph.engine import fs_delete, fs_exists, fs_rename

    base = path.rstrip("/")
    staging, aside = base + ".staging", base + ".old"
    fs_delete(spark, staging)
    df.write.mode("overwrite").parquet(staging)
    fs_delete(spark, aside)  # residue from an earlier crash after its swap
    if fs_exists(spark, path) and not fs_rename(spark, path, aside):
        raise IOError(f"committed_overwrite: rename {path} -> {aside} failed")
    if not fs_rename(spark, staging, path):
        raise IOError(f"committed_overwrite: rename {staging} -> {path} failed")
    fs_delete(spark, aside)


def read_committed_or_none(
    spark: SparkSession, path: str, schema: str | object
) -> DataFrame | None:
    """Read state written by ``committed_overwrite``, completing a swap a
    crash interrupted: if ``path`` is missing but ``path.staging`` exists
    (death between the two renames), the staging dir — which is always
    fully written before the old dir is touched — is adopted. A refused
    adoption rename RAISES rather than degrading to "state absent": an
    implicit reset would reassign every id from 0."""
    from linkgraph.engine import fs_exists, fs_rename

    base = path.rstrip("/")
    staging = base + ".staging"
    if not fs_exists(spark, path):
        # adopt staging only if its write COMPLETED (_SUCCESS marker) — a
        # crash mid-staging-write leaves a partial dir that must never
        # become state (the old state, if any, is then still at `path`)
        if fs_exists(spark, f"{staging}/_SUCCESS"):
            if not fs_rename(spark, staging, path):
                raise IOError(
                    f"read_committed: completed staging {staging} exists but "
                    f"rename -> {path} failed; refusing to reset state"
                )
        elif fs_exists(spark, f"{base}.old/_SUCCESS"):
            # crash exactly between the two renames with staging ALSO
            # incomplete cannot happen (staging completes first), but a
            # stranded complete .old with no path and no staging means
            # manual intervention beat us here — restore it rather than
            # resetting ids
            if not fs_rename(spark, f"{base}.old", path):
                raise IOError(
                    f"read_committed: rename {base}.old -> {path} failed; "
                    "refusing to reset state"
                )
    return read_parquet_or_none(spark, path, schema)
