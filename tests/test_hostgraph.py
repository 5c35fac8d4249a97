"""Host-level link-graph roll-up (linkgraph/hostgraph.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def url_pairs(spark):
    rows = [
        # a.example -> b.example three times (weight 3), via distinct pages
        ("https://a.example/p1", "https://b.example/x"),
        ("https://a.example/p2", "https://b.example/y"),
        ("https://a.example/p2", "https://b.example/y"),  # duplicate link row
        # b -> a once
        ("https://b.example/x", "https://a.example/p1"),
        # intra-host (dropped by default)
        ("https://a.example/p1", "https://a.example/p2"),
        # port is NOT part of the host (same site, different listener)
        ("https://a.example:8443/p9", "https://c.example/"),
        # unparseable endpoints (dropped)
        ("notaurl", "https://b.example/x"),
        ("https://a.example/p1", ""),
    ]
    return spark.createDataFrame(rows, "src_url string, dst_url string")


def test_host_edges_rollup_exact(spark, url_pairs):
    from linkgraph.hostgraph import host_edges

    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges(url_pairs).collect()
    }
    assert got == {
        ("a.example", "b.example"): 3.0,
        ("b.example", "a.example"): 1.0,
        ("a.example", "c.example"): 1.0,
    }


def test_host_edges_keep_intra(spark, url_pairs):
    from linkgraph.hostgraph import host_edges

    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges(url_pairs, keep_intra=True).collect()
    }
    assert got[("a.example", "a.example")] == 1.0
    assert got[("a.example", "b.example")] == 3.0


def test_host_pagerank_equals_weighted_kernel_on_rolled_graph(spark, url_pairs):
    """host_pagerank == the weighted sql kernel run directly on the
    hand-rolled host graph: the dictionary + join plumbing adds nothing."""
    from linkgraph.algos import pagerank
    from linkgraph.hostgraph import host_pagerank

    got = {
        r["host"]: r["rank"]
        for r in host_pagerank(spark, url_pairs, max_iters=8, eps=0.0).collect()
    }
    # expected host graph (test_host_edges_rollup_exact), hosts sorted ->
    # ids: a.example=0, b.example=1, c.example=2
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (1, 0, 1.0), (0, 2, 1.0)],
        "src_id long, dst_id long, weight double",
    )
    verts = spark.range(3).selectExpr("id")
    res = pagerank(
        spark, edges, vertices=verts, max_iters=8, eps=0.0, weight_col="weight"
    )
    want = {r["id"]: r["rank"] for r in res.state.select("id", "rank").collect()}
    name_to_id = {"a.example": 0, "b.example": 1, "c.example": 2}
    assert set(got) == set(name_to_id)
    for host, rank in got.items():
        assert np.isclose(rank, want[name_to_id[host]], rtol=0, atol=1e-12)


def test_hostagg_refuses_to_guess_on_meta_mismatch(spark, tmp_path):
    """HostAgg's touched-bucket fast path is gated on its meta proving the
    partials are exactly one merge behind; ANY mismatch (stale
    merged_through from a crash between store.merge and agg.refresh, or a
    bucket-count change from split()) forces a full rebuild that restores
    exact equality with the batch roll-up."""
    import datetime

    from linkgraph.hostgraph import HostAgg, host_edges
    from linkgraph.linkstore import LinkStore

    ts = datetime.datetime(2024, 6, 1)
    rows = [
        (f"https://s{i % 5}.example/p{i}", ts, "fp0", f"https://s{(i + 1) % 5}.example/p{i + 1}")
        for i in range(40)
    ]
    store = LinkStore(spark, str(tmp_path / "links"), buckets=8)
    spark.createDataFrame(
        rows, "src_url string, warc_ts timestamp, crawl_fp string, dst_url string"
    ).coalesce(1).write.parquet(f"{store.deltas_dir}/d=0")
    m = store.merge()
    assert m["new_rows"] == 40

    def batch():
        return {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in host_edges(store.current_pairs()).collect()
        }

    agg = HostAgg(spark, str(tmp_path / "hostagg"))
    r1 = agg.refresh(store, m["touched_buckets"], expected_merged_through=-1)
    assert r1["rebuilt"]  # first use: no meta
    got1 = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in agg.host_edges().collect()
    }
    assert got1 == batch() != {}

    # matched meta + nothing new: the fast path runs and touches nothing
    r2 = agg.refresh(store, [], expected_merged_through=store.merged_through())
    assert not r2["rebuilt"] and r2["refreshed_buckets"] == 0

    # crash-between-merge-and-refresh shape: agg meta is behind the
    # expected watermark -> full rebuild, not a guess at which buckets
    agg._write_meta(-5, store.buckets)
    r3 = agg.refresh(store, [], expected_merged_through=store.merged_through())
    assert r3["rebuilt"]

    # split() shape: bucket count changed under the partials -> rebuild
    agg._write_meta(store.merged_through(), store.buckets * 2)
    r4 = agg.refresh(store, [3], expected_merged_through=store.merged_through())
    assert r4["rebuilt"]
    got4 = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in agg.host_edges().collect()
    }
    assert got4 == batch()


def test_hostagg_crash_repair_and_reader_fallback(spark, tmp_path):
    """Rename-aside crash safety: a crash stranded mid-swap must never
    lose the roll-up. Three shapes: (1) full rebuild died between its two
    renames (parts/ gone, complete pre-rebuild partials in parts.old) —
    the READER serves parts.old and the next refresh repairs it; (2) an
    incremental bucket swap died after moving a bucket aside — the next
    refresh restores it; (3) an aside left behind NEXT TO a live bucket
    (crash after the staged rename) is garbage-collected, not restored
    over the newer live dir."""
    import datetime
    import shutil

    from linkgraph.hostgraph import HostAgg, host_edges
    from linkgraph.linkstore import LinkStore

    ts = datetime.datetime(2024, 6, 1)
    rows = [
        (f"https://s{i % 5}.example/p{i}", ts, "fp0",
         f"https://s{(i + 1) % 5}.example/p{i + 1}")
        for i in range(40)
    ]
    store = LinkStore(spark, str(tmp_path / "links"), buckets=8)
    spark.createDataFrame(
        rows, "src_url string, warc_ts timestamp, crawl_fp string, dst_url string"
    ).coalesce(1).write.parquet(f"{store.deltas_dir}/d=0")
    store.merge()

    want = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in host_edges(store.current_pairs()).collect()
    }
    agg = HostAgg(spark, str(tmp_path / "hostagg"))
    agg.refresh(store, [], expected_merged_through=-1)

    def rolled():
        return {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in agg.host_edges().collect()
        }

    # (1) full-rebuild crash between the two renames
    shutil.move(agg.parts_dir, agg.old_dir)
    assert rolled() == want != {}  # reader fallback, not an empty roll-up
    r = agg.refresh(store, [], expected_merged_through=store.merged_through())
    assert not r["rebuilt"]  # repair restored the state meta describes
    assert rolled() == want

    # (2) incremental bucket-swap crash: one bucket stranded aside
    import os

    names = [n for n in os.listdir(agg.parts_dir) if n.startswith("lb=")]
    assert names
    os.makedirs(agg.aside_dir, exist_ok=True)
    shutil.move(
        os.path.join(agg.parts_dir, names[0]),
        os.path.join(agg.aside_dir, names[0]),
    )
    agg.refresh(store, [], expected_merged_through=store.merged_through())
    assert rolled() == want

    # (3) stale aside next to a live bucket: dropped, live wins
    shutil.copytree(
        os.path.join(agg.parts_dir, names[0]),
        os.path.join(agg.aside_dir, names[0]),
    )
    agg.refresh(store, [], expected_merged_through=store.merged_through())
    assert not os.path.exists(os.path.join(agg.aside_dir, names[0]))
    assert rolled() == want
