"""Staged-swap state writes (linkgraph.io) + cache-lifetime regressions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _rows(spark, path):
    return {(r["id"], r["url"]) for r in spark.read.parquet(path).collect()}


def test_committed_overwrite_roundtrip_and_replace(spark, tmp_path):
    from linkgraph.io import committed_overwrite, read_committed_or_none

    path = str(tmp_path / "state")
    assert read_committed_or_none(spark, path, "id long, url string") is None

    v1 = spark.createDataFrame([(0, "a"), (1, "b")], "id long, url string")
    committed_overwrite(spark, v1, path)
    assert _rows(spark, path) == {(0, "a"), (1, "b")}
    # no staging residue after a clean commit
    assert not os.path.exists(path + ".staging")

    v2 = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "id long, url string")
    committed_overwrite(spark, v2, path)
    got = read_committed_or_none(spark, path, "id long, url string")
    assert {(r["id"], r["url"]) for r in got.collect()} == {(0, "a"), (1, "b"), (2, "c")}


def test_read_committed_recovers_interrupted_swap(spark, tmp_path):
    """Crash between delete(old) and rename(staging): the completed staging
    dir must be adopted; a PARTIAL staging (no _SUCCESS) must not be."""
    from linkgraph.io import read_committed_or_none

    path = str(tmp_path / "state")
    staging = path + ".staging"
    # simulate: staging fully written (Spark emits _SUCCESS), old dir deleted
    spark.createDataFrame([(7, "x")], "id long, url string").write.parquet(staging)
    assert os.path.exists(f"{staging}/_SUCCESS")
    got = read_committed_or_none(spark, path, "id long, url string")
    assert [(r["id"], r["url"]) for r in got.collect()] == [(7, "x")]
    assert os.path.isdir(path) and not os.path.exists(staging)

    # partial staging: marker removed -> must NOT be adopted
    path2 = str(tmp_path / "state2")
    staging2 = path2 + ".staging"
    spark.createDataFrame([(9, "y")], "id long, url string").write.parquet(staging2)
    os.remove(f"{staging2}/_SUCCESS")
    assert read_committed_or_none(spark, path2, "id long, url string") is None
    assert os.path.isdir(staging2)  # left for inspection, not deleted


def test_read_parquet_or_empty_missing_and_present(spark, tmp_path):
    from linkgraph.io import read_parquet_or_empty

    missing = str(tmp_path / "nope")
    df = read_parquet_or_empty(spark, missing, "a int, b string")
    assert df.count() == 0 and df.columns == ["a", "b"]

    p = str(tmp_path / "yes")
    spark.createDataFrame([(1, "z")], "a int, b string").write.parquet(p)
    assert read_parquet_or_empty(spark, p, "a int, b string").count() == 1


def test_assign_vertex_ids_releases_cache(spark):
    """The two-phase dense rank must not leave a persisted DataFrame
    behind: the incremental loop calls it once per poll for the life of
    the driver, and SQL CacheManager entries are never garbage-collected
    (localCheckpoint blocks, by contrast, are cleaned when the DataFrame
    is — only the CacheManager leak matters here)."""
    from linkgraph.build import assign_vertex_ids

    cm = spark._jsparkSession.sharedState().cacheManager()
    was_empty = cm.isEmpty()
    for _ in range(3):
        out = assign_vertex_ids(
            spark.createDataFrame([(f"u{i}",) for i in range(100)], "url string"),
            partitions=4,
        )
        assert out.count() == 100
    if was_empty:
        assert cm.isEmpty(), "assign_vertex_ids leaked a CacheManager entry"
