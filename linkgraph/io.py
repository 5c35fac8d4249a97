"""Small shared IO helpers: schema-pinned parquet reads that treat a
missing path as absent state (first poll, fresh deployment) while letting
every real failure propagate, and a staged-swap committed write for state
directories that are atomically replaced between polls."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Commit marker written by committed_overwrite itself after the staging
# parquet write completes. Deliberately NOT Spark's _SUCCESS: clusters
# commonly run with mapreduce.fileoutputcommitter.marksuccessfuljobs=false
# (the default recommendation on s3a), and keying crash recovery off a
# marker someone else may have turned off would silently downgrade
# "adopt the completed staging dir" to "state absent" — the exact id reset
# this module exists to prevent. Files starting with "_" are ignored by
# parquet readers, so the marker rides along through the renames.
_COMMIT_MARKER = "_LG_COMMITTED"

# Optional JSON sidecar committed atomically with a state dir's rows (see
# committed_overwrite(meta=...)).
_STATE_META = "_LG_STATE_META.json"


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


def _is_committed(spark: SparkSession, d: str) -> bool:
    from linkgraph.engine import fs_exists

    return fs_exists(spark, f"{d}/{_COMMIT_MARKER}")


def _recover_swap(spark: SparkSession, path: str) -> None:
    """Complete a swap a crash interrupted, WRITER-side only: if ``path``
    is missing but a COMMITTED ``path.staging`` exists (death between the
    two renames), rename it into place; a stranded committed ``path.old``
    with neither path nor staging (manual intervention) is likewise
    restored. A refused recovery rename RAISES rather than degrading to
    "state absent": an implicit reset would reassign every id from 0."""
    from linkgraph.engine import fs_exists, fs_rename

    base = path.rstrip("/")
    if fs_exists(spark, path):
        return
    staging, aside = base + ".staging", base + ".old"
    if _is_committed(spark, staging):
        if not fs_rename(spark, staging, path):
            raise IOError(
                f"recover_swap: committed staging {staging} exists but "
                f"rename -> {path} failed; refusing to reset state"
            )
    elif _is_committed(spark, aside):
        if not fs_rename(spark, aside, path):
            raise IOError(
                f"recover_swap: rename {aside} -> {path} failed; "
                "refusing to reset state"
            )


def committed_overwrite(
    spark: SparkSession, df: DataFrame, path: str, meta: dict | None = None
) -> None:
    """Replace the state directory at ``path`` with ``df``'s rows without a
    window where a crash leaves a HALF-WRITTEN directory that a later read
    mistakes for complete state.

    Plain ``mode("overwrite")`` deletes the old directory first and then
    writes part files into it — a driver killed mid-write leaves a
    readable-but-partial parquet dir, which for the stable id dictionary
    means silently renumbered vertices on the next poll. Protocol here:
    complete any swap a previous crash interrupted, write to
    ``path.staging`` and stamp it with our own commit marker (NOT Spark's
    ``_SUCCESS``, which marksuccessfuljobs=false deployments suppress),
    rename the old dir ASIDE (never a recursive delete of live state: a
    kill mid-delete would leave a readable-but-partial ``path`` that a
    reader mistakes for complete), rename staging into place, then delete
    the aside copy. At every kill point ``path`` either does not exist or
    is a COMPLETE state dir, and a committed staging survives for the next
    write (or ``read_committed_or_none``) to pick up. All filesystem
    mutation lives HERE — readers never rename, so a concurrent reader
    cannot steal an in-flight swap's staging dir out from under this
    writer. The caller must have broken any lazy dependency of ``df`` on
    ``path`` itself (localCheckpoint) before calling.

    ``meta``: optional JSON sidecar committed ATOMICALLY with the rows
    (written into staging before the marker, so it rides the same
    renames; "_"-prefixed → invisible to parquet readers). Used by the
    incremental polls to stamp state with the LinkStore watermark it was
    derived from — the gate that keeps a crash between the store merge
    and a state commit from silently invalidating a later warm/delta
    path (``read_state_meta``)."""
    from linkgraph.engine import fs_delete, fs_exists, fs_rename, fs_write_text

    base = path.rstrip("/")
    staging, aside = base + ".staging", base + ".old"
    # a committed staging left by a crash between renames is the LIVE
    # state — complete that swap before deleting anything
    _recover_swap(spark, path)
    fs_delete(spark, staging)  # partial residue only, after recovery
    df.write.mode("overwrite").parquet(staging)
    if meta is not None:
        import json

        fs_write_text(spark, f"{staging}/{_STATE_META}", json.dumps(meta))
    fs_write_text(spark, f"{staging}/{_COMMIT_MARKER}", "")
    fs_delete(spark, aside)  # residue from an earlier crash after its swap
    if fs_exists(spark, path) and not fs_rename(spark, path, aside):
        raise IOError(f"committed_overwrite: rename {path} -> {aside} failed")
    if not fs_rename(spark, staging, path):
        raise IOError(f"committed_overwrite: rename {staging} -> {path} failed")
    fs_delete(spark, aside)


def read_committed_or_none(
    spark: SparkSession, path: str, schema: str | object
) -> DataFrame | None:
    """Read state written by ``committed_overwrite`` WITHOUT mutating the
    filesystem: if ``path`` is missing but a COMMITTED ``path.staging``
    (or, failing that, a committed stranded ``path.old``) exists, that dir
    is read IN PLACE; the next ``committed_overwrite`` renames it back into
    position. Keeping readers side-effect-free means a monitoring session
    reading the same state dir can never race an in-flight writer's swap
    and strand it mid-rename. (A reader that overlaps the swap window may
    get a lazy DataFrame whose files move before its action runs — that
    surfaces as a read error on the READER, never corrupted state; callers
    that hold results across a subsequent write must localCheckpoint, as
    the incremental loop does.) A partial staging dir — no commit marker —
    is never served."""
    from linkgraph.engine import fs_exists

    base = path.rstrip("/")
    if not fs_exists(spark, path):
        for candidate in (base + ".staging", base + ".old"):
            if _is_committed(spark, candidate):
                return read_parquet_or_none(spark, candidate, schema)
        return None
    return read_parquet_or_none(spark, path, schema)


def read_state_meta(spark: SparkSession, path: str) -> dict | None:
    """The JSON sidecar committed with a state dir by
    ``committed_overwrite(meta=...)``; None if the dir (or its sidecar)
    is absent. Same reader discipline as ``read_committed_or_none``:
    never mutates, serves a committed staging/old dir in place."""
    import json

    from linkgraph.engine import fs_exists, fs_read_text

    base = path.rstrip("/")
    for candidate in (path, base + ".staging", base + ".old"):
        if candidate == path:
            if not fs_exists(spark, path):
                continue
        elif not _is_committed(spark, candidate):
            continue
        meta_path = f"{candidate}/{_STATE_META}"
        if fs_exists(spark, meta_path):
            return json.loads(fs_read_text(spark, meta_path))
        return None
    return None
