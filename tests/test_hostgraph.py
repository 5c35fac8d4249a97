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
