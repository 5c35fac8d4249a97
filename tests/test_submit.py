"""Packaging gate: the spark-submit --py-files path the north rule mandates.

The job script is copied to a temp cwd whose parent does NOT contain the
repo, so the ``linkgraph`` import can only be satisfied by the zip shipped
via --py-files — exactly how a cluster submission resolves it.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_zip(tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "linkgraph.zip")
    assert os.path.exists(zip_path)

    edges_dir = str(tmp_path / "edges")
    os.makedirs(edges_dir)
    pq.write_table(
        pa.table(
            {
                "src_id": pa.array([0, 1, 2, 2, 3], type=pa.int64()),
                "dst_id": pa.array([1, 2, 0, 3, 0], type=pa.int64()),
            }
        ),
        os.path.join(edges_dir, "part-0.parquet"),
    )

    iso = str(tmp_path / "jobdir")
    os.makedirs(iso)
    shutil.copy(os.path.join(REPO, "jobs", "run_pagerank.py"), iso)
    out = str(tmp_path / "ranks")
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", zip_path,
            "run_pagerank.py",
            "--edges", edges_dir, "--out", out, "--iters", "3", "--eps", "0",
        ],
        cwd=iso, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    rows = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    assert rows == 4  # vertices 0..3


def test_spark_submit_local_cluster_matches_local(tmp_path):
    """Multi-JVM evidence in the suite: the same spark-submit --py-files
    job on REAL executor JVMs (local-cluster mode — separate heaps,
    executor-side Python workers importing linkgraph from the shipped
    zip, block-manager shuffle) produces ranks identical to single-JVM
    local mode within 1e-12. This exercises every executor boundary that
    local[N] fakes."""
    import duckdb
    import pytest

    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "linkgraph.zip")

    edges_dir = str(tmp_path / "edges")
    os.makedirs(edges_dir)
    import numpy as np  # noqa: F401  (synth dependency)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from linkgraph.synth import wiki_vote_like_edges

    e = wiki_vote_like_edges()
    pq.write_table(
        pa.table(
            {
                "src_id": e[:, 0].astype("int64"),
                "dst_id": e[:, 1].astype("int64"),
            }
        ),
        os.path.join(edges_dir, "part-0.parquet"),
    )

    iso = str(tmp_path / "jobdir")
    os.makedirs(iso)
    shutil.copy(os.path.join(REPO, "jobs", "run_pagerank.py"), iso)

    from linkgraph.algos.pagerank import _sem_disk_root

    scratch_root = _sem_disk_root()
    scratch_before = set(os.listdir(scratch_root))

    lc_conf = ["--driver-memory", "4g", "--conf", "spark.executor.memory=2048m"]
    outs = {}
    for label, master, conf, extra in (
        ("local", "local[4]", [], []),
        ("lc", "local-cluster[2,2,2048]", lc_conf, []),
        # sem kernel on real executor JVMs with a shared el2fg image: the
        # executor-side Python workers read the image, publish compiled
        # blocks to the per-user host scratch, and must produce the same
        # ranks as the sql kernel in local mode
        (
            "lc_sem",
            "local-cluster[2,2,2048]",
            lc_conf,
            ["--kernel", "sem", "--layout-dir", str(tmp_path / "sem_img")],
        ),
    ):
        out = str(tmp_path / f"ranks_{label}")
        env = dict(os.environ, SPARK_GRAFT_MASTER=master, SPARK_GRAFT_CPUS="4")
        proc = subprocess.run(
            [
                "spark-submit", "--master", master, "--py-files", zip_path,
                "--conf", "spark.ui.enabled=false", *conf,
                "run_pagerank.py",
                "--edges", edges_dir, "--out", out, "--iters", "5", "--eps", "0",
                *extra,
            ],
            cwd=iso, env=env, capture_output=True, text=True, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        outs[label] = out

    for other in ("lc", "lc_sem"):
        diff = duckdb.sql(
            f"""SELECT COUNT(*), MAX(ABS(a.rank - b.rank))
            FROM read_parquet('{outs["local"]}/*.parquet') a
            JOIN read_parquet('{outs[other]}/*.parquet') b USING (id)"""
        ).fetchone()
        assert diff[0] == 200 and diff[1] < 1e-12, (other, diff)

    # the sem run's workers must have published compiled blocks to the
    # per-user host scratch (the store engaging IS the thing under test —
    # a silent no-op would hide the multi-executor miss-path cost)
    published = [
        d for d in set(os.listdir(scratch_root)) - scratch_before
        if any(
            p.startswith("part")
            for p in os.listdir(os.path.join(scratch_root, d))
        )
    ]
    assert published, f"sem run published no compiled blocks under {scratch_root}"


def test_spark_submit_incremental_loop_local_cluster(tmp_path):
    """The continuous-crawl job end-to-end on REAL executor JVMs: poll 1
    cold-ranks the initial crawl; poll 2 (new page files appended) resumes
    the stream checkpoint, keeps every existing url's id, and warm-starts
    from poll 1's ranks. This drives streaming ingest + staged state swap
    + stable dictionary + warm-start through the exact spark-submit
    --py-files / local-cluster path the north rule mandates."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "linkgraph.zip")

    def pages_table(urls_links: dict, ts: datetime.datetime):
        urls = list(urls_links)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array([ts] * len(urls), type=pa.timestamp("us")),
                "html": pa.array(
                    [
                        (
                            "<html><body>"
                            + "".join(f'<a href="{t}">x</a>' for t in urls_links[u])
                            + "</body></html>"
                        ).encode()
                        for u in urls
                    ],
                    type=pa.binary(),
                ),
                "text": pa.array([""] * len(urls), type=pa.string()),
                "lang": pa.array(["en"] * len(urls), type=pa.string()),
            }
        )

    u = [f"https://s{i}.example/" for i in range(8)]
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    crawl1 = {x: [u[(i + 1) % 8], u[(i + 3) % 8]] for i, x in enumerate(u)}
    pq.write_table(
        pages_table(crawl1, datetime.datetime(2024, 5, 1)),
        os.path.join(pages_dir, "batch1.parquet"),
    )

    iso = str(tmp_path / "jobdir")
    os.makedirs(iso)
    shutil.copy(os.path.join(REPO, "jobs", "run_incremental.py"), iso)
    state = str(tmp_path / "state")
    master = "local-cluster[2,2,2048]"
    env = dict(os.environ, SPARK_GRAFT_MASTER=master, SPARK_GRAFT_CPUS="4")

    def poll() -> dict:
        proc = subprocess.run(
            [
                "spark-submit", "--master", master, "--py-files", zip_path,
                "--conf", "spark.ui.enabled=false",
                "--driver-memory", "4g", "--conf", "spark.executor.memory=2048m",
                "run_incremental.py",
                "--pages", pages_dir, "--state", state,
                "--polls", "1", "--eps", "1e-6", "--partitions", "4",
            ],
            cwd=iso, env=env, capture_output=True, text=True, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        import json

        return json.loads(line)

    m1 = poll()
    assert m1["urls"] == 8 and m1["edges"] > 0 and not m1["warm_started"]
    dict1 = dict(
        duckdb.sql(f"SELECT url, id FROM read_parquet('{state}/dict/*.parquet')").fetchall()
    )

    # second crawl batch: two NEW pages linking into the old graph
    nu = ["https://new0.example/", "https://new1.example/"]
    crawl2 = {nu[0]: [u[0], nu[1]], nu[1]: [u[4]]}
    pq.write_table(
        pages_table(crawl2, datetime.datetime(2024, 6, 1)),
        os.path.join(pages_dir, "batch2.parquet"),
    )
    m2 = poll()
    assert m2["warm_started"] and m2["urls"] == 10 and m2["iterations"] >= 1

    dict2 = dict(
        duckdb.sql(f"SELECT url, id FROM read_parquet('{state}/dict/*.parquet')").fetchall()
    )
    for url, vid in dict1.items():
        assert dict2[url] == vid, f"{url} renumbered {vid} -> {dict2[url]}"
    ranks = duckdb.sql(
        f"SELECT COUNT(*), MIN(rank) FROM read_parquet('{state}/ranks/*.parquet')"
    ).fetchone()
    assert ranks[0] == 10 and ranks[1] > 0
