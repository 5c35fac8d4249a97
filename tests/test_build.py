"""t2-ish build tests: latest-snapshot dedup, id determinism, degrees."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.build import (
    assign_vertex_ids,
    build_graph,
    latest_snapshot,
    symmetrize,
)
from linkgraph.extract import extract_links
from linkgraph.synth import gen_pages, gen_pages_pdf


@pytest.fixture(scope="module")
def pages(spark):
    return gen_pages(spark, 300, partitions=4).cache()


@pytest.fixture(scope="module")
def graph(spark, pages):
    return build_graph(pages, partitions=4)


def test_latest_snapshot_unique_latest(spark, pages):
    snap = latest_snapshot(pages).toPandas()
    assert snap.url.is_unique
    full = pages.toPandas()
    latest = full.groupby("url").warc_ts.max()
    assert (snap.set_index("url").warc_ts == latest).all()


def test_assign_ids_scalable_equals_window(spark, pages):
    urls = pages.select("url").distinct()
    a = assign_vertex_ids(urls, scalable=True, partitions=5).toPandas().sort_values("id").reset_index(drop=True)
    b = assign_vertex_ids(urls, scalable=False).toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)
    assert a.id.tolist() == list(range(len(a)))
    assert a.url.is_monotonic_increasing


def test_ids_stable_under_repartition(spark, pages):
    urls = pages.select("url").distinct()
    a = assign_vertex_ids(urls.repartition(13), scalable=True, partitions=3).toPandas()
    b = assign_vertex_ids(urls.coalesce(1), scalable=True, partitions=7).toPandas()
    assert a.sort_values("url").id.tolist() == b.sort_values("url").id.tolist()


def test_graph_matches_pure_python_build(spark, graph):
    """Edge set == pure-pandas reference build from the same pages."""
    pdf = gen_pages_pdf(300)
    latest = pdf.sort_values(["url", "warc_ts"]).groupby("url").last().reset_index()
    pairs = set()
    for _, row in latest.iterrows():
        for dst in extract_links(row.html, row.url):
            if dst != row.url:
                pairs.add((row.url, dst))
    urls = sorted({u for p in pairs for u in p} | set(latest.url))
    ids = {u: i for i, u in enumerate(urls)}
    expected_edges = {(ids[s], ids[d]) for s, d in pairs}

    got_vertices = graph.vertices.toPandas().sort_values("id")
    assert got_vertices.url.tolist() == urls
    got_edges = {
        (r.src_id, r.dst_id) for r in graph.edges.toPandas().itertuples()
    }
    assert got_edges == expected_edges
    # degrees consistent
    out_deg = pd.Series([s for s, _ in got_edges]).value_counts()
    for r in got_vertices.itertuples():
        assert r.out_deg == out_deg.get(r.id, 0)


def test_symmetrize_no_self_loops_and_symmetric(spark, graph):
    sym = symmetrize(graph.edges).toPandas()
    pairs = {(r.src_id, r.dst_id) for r in sym.itertuples()}
    assert all((d, s) in pairs for s, d in pairs)
    assert all(s != d for s, d in pairs)


def test_edges_sorted_within_partitions(spark, graph):
    parts = graph.edges.rdd.glom().collect()
    for rows in parts:
        keys = [(r.src_id, r.dst_id) for r in rows]
        assert keys == sorted(keys)
