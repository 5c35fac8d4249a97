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


def _mark_committed(d):
    """Stamp a dir the way committed_overwrite does after its staging write."""
    from linkgraph.io import _COMMIT_MARKER

    with open(os.path.join(d, _COMMIT_MARKER), "w"):
        pass


def test_read_committed_recovers_interrupted_swap(spark, tmp_path):
    """Crash between the two swap renames: the committed staging dir must be
    served IN PLACE by readers (no filesystem mutation — a concurrent reader
    must never steal an in-flight writer's staging mid-swap) and renamed
    back into position by the next WRITE; a partial staging (no commit
    marker) must never become state. Adoption keys off our own marker, not
    Spark's _SUCCESS, which marksuccessfuljobs=false deployments suppress."""
    from linkgraph.io import committed_overwrite, read_committed_or_none

    path = str(tmp_path / "state")
    staging = path + ".staging"
    # simulate a committed staging on a marksuccessfuljobs=false cluster:
    # no _SUCCESS, but our marker is present
    spark.createDataFrame([(7, "x")], "id long, url string").write.parquet(staging)
    os.remove(f"{staging}/_SUCCESS")
    _mark_committed(staging)
    got = read_committed_or_none(spark, path, "id long, url string")
    assert [(r["id"], r["url"]) for r in got.collect()] == [(7, "x")]
    # the read was side-effect-free: staging still in place, path absent
    assert os.path.isdir(staging) and not os.path.exists(path)

    # the next WRITE completes the interrupted swap before staging anew
    committed_overwrite(
        spark, spark.createDataFrame([(8, "x2")], "id long, url string"), path
    )
    assert os.path.isdir(path) and not os.path.exists(staging)
    got = read_committed_or_none(spark, path, "id long, url string")
    assert [(r["id"], r["url"]) for r in got.collect()] == [(8, "x2")]

    # partial staging: Spark's _SUCCESS alone (crash before our marker)
    # must NOT be adopted; the OLD state (still at path under the
    # rename-aside protocol) keeps being served
    path2 = str(tmp_path / "state2")
    staging2 = path2 + ".staging"
    spark.createDataFrame([(9, "y")], "id long, url string").write.parquet(staging2)
    assert os.path.exists(f"{staging2}/_SUCCESS")
    assert read_committed_or_none(spark, path2, "id long, url string") is None
    assert os.path.isdir(staging2)  # left for inspection, not deleted
    spark.createDataFrame([(1, "old")], "id long, url string").write.parquet(path2)
    got2 = read_committed_or_none(spark, path2, "id long, url string")
    assert [(r["id"], r["url"]) for r in got2.collect()] == [(1, "old")]


def test_committed_overwrite_clears_aside_residue(spark, tmp_path):
    """Crash after the swap but before deleting path.old: the residue is
    ignored by readers (path wins) and cleaned by the next commit."""
    from linkgraph.io import committed_overwrite, read_committed_or_none

    path = str(tmp_path / "state")
    spark.createDataFrame([(5, "new")], "id long, url string").write.parquet(path)
    spark.createDataFrame([(4, "old")], "id long, url string").write.parquet(path + ".old")

    got = read_committed_or_none(spark, path, "id long, url string")
    assert [(r["id"], r["url"]) for r in got.collect()] == [(5, "new")]

    committed_overwrite(
        spark, spark.createDataFrame([(6, "v3")], "id long, url string"), path
    )
    assert not os.path.exists(path + ".old") and not os.path.exists(path + ".staging")
    got = read_committed_or_none(spark, path, "id long, url string")
    assert [(r["id"], r["url"]) for r in got.collect()] == [(6, "v3")]

    # stranded COMMITTED .old with neither path nor staging: served in
    # place by readers (no mutation), restored by the next write
    path3 = str(tmp_path / "state3")
    spark.createDataFrame([(8, "w")], "id long, url string").write.parquet(path3 + ".old")
    _mark_committed(path3 + ".old")
    got = read_committed_or_none(spark, path3, "id long, url string")
    assert [(r["id"], r["url"]) for r in got.collect()] == [(8, "w")]
    assert os.path.isdir(path3 + ".old") and not os.path.exists(path3)
    committed_overwrite(
        spark, spark.createDataFrame([(9, "w2")], "id long, url string"), path3
    )
    assert os.path.isdir(path3) and not os.path.exists(path3 + ".old")
    got = read_committed_or_none(spark, path3, "id long, url string")
    assert [(r["id"], r["url"]) for r in got.collect()] == [(9, "w2")]


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
    else:
        # session-scoped fixtures had already cached something, so the
        # in-session assertion above proved nothing — run the check in a
        # pristine JVM where isEmpty() is decisive (a reintroduced leak
        # must fail CI regardless of test ordering)
        import subprocess
        import sys

        code = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from linkgraph.build import assign_vertex_ids
out = assign_vertex_ids(
    spark.createDataFrame([(f"u{{i}}",) for i in range(100)], "url string"),
    partitions=4,
)
assert out.count() == 100
assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), "leak"
print("CACHE_OK")
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
        )
        assert proc.returncode == 0 and "CACHE_OK" in proc.stdout, proc.stderr[-2000:]
