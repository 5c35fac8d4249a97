"""t0: generator determinism (FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np

from linkgraph.extract import extract_text
from linkgraph.synth import (
    gen_pages_pdf,
    gen_pages_rows,
    hub_stress_edges,
    wiki_vote_like_edges,
)


def test_pages_deterministic_and_byte_identical():
    a = gen_pages_pdf(100)
    b = gen_pages_pdf(100)
    assert a.equals(b)
    assert all(extract_text(h) == t for h, t in zip(a.html, a.text))


def test_pages_rows_partition_independent():
    # generating a subset of indices yields the same rows as the full run
    full = gen_pages_pdf(100)
    part = gen_pages_rows(np.arange(30, 60), 100)
    merged = full[full.url.isin(part.url)].reset_index(drop=True)
    assert merged.equals(part.reset_index(drop=True))


def test_pages_duplicate_crawls_exist():
    pdf = gen_pages_pdf(200)
    dup_urls = pdf.url.value_counts()
    assert (dup_urls == 2).sum() == 10  # i % 20 == 7 -> 10 of 200
    # duplicate row is exactly 1 day earlier with different html
    for url in dup_urls[dup_urls == 2].index[:3]:
        rows = pdf[pdf.url == url].sort_values("warc_ts")
        assert (rows.warc_ts.iloc[1] - rows.warc_ts.iloc[0]).days == 1
        assert rows.html.iloc[0] != rows.html.iloc[1]


def test_fixture_graphs_deterministic():
    a, b = wiki_vote_like_edges(), wiki_vote_like_edges()
    assert np.array_equal(a, b)
    assert a.shape[1] == 2 and len(a) > 500
    h = hub_stress_edges()
    out_deg = np.bincount(h[:, 0], minlength=5000)
    in_deg = np.bincount(h[:, 1], minlength=5000)
    assert out_deg[0] == 4000 and in_deg[0] >= 4000
