"""Deterministic synthetic inputs (FIXTURES.md §1, §3).

Three generators, all pure functions of (seed, index) so they distribute
over executors without any layout dependence:

- ``pages``: the mandated Common-Crawl-style input table
  (url, warc_ts, html, text, lang) — BASELINE.json ``input_hint``. Hub skew
  is generated on purpose via preferential attachment toward site0 urls.
- ``wiki_vote_like``: standalone 200-vertex digraph fixture (seed 4242) for
  the t3 exact/allclose golden gates (BASELINE.json: "wiki-Vote/twitter-style
  adjacency fixtures").
- ``hub_stress``: 5000-vertex graph with one extreme hub (seed 777) for
  vertex-cut + salted-aggregation tests.

Determinism rule: per-row ``numpy.random.default_rng([seed, i])`` — no
global RNG state, no wall clock, so any subset of rows generated on any
executor is byte-identical to a single-process run.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from linkgraph.extract import extract_text

PAGES_SEED = 42
N_SITES = 50
BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_LANGS = ["en", "de", "fr", "es", "zh"]


def page_url(i: int) -> str:
    return f"https://site{i % N_SITES}.example/p{i}"


def _page_html(i: int, n_pages: int, variant: int) -> bytes:
    """Deterministic HTML for page ``i`` (variant 1 = earlier duplicate crawl)."""
    rng = np.random.default_rng([PAGES_SEED, i, variant])
    k = int(min(rng.zipf(1.5), 40))
    anchors = []
    site0_count = (n_pages + N_SITES - 1) // N_SITES  # pages with i % 50 == 0
    for j in range(k):
        roll = rng.random()
        if roll < 0.02:
            href = f"https://external{j}.example/"
        else:
            if rng.random() < 0.30 and site0_count > 0:
                t = int(rng.integers(0, site0_count)) * N_SITES  # hub skew
            else:
                t = int(rng.integers(0, n_pages))
            if roll < 0.04:  # ~2% root-relative path
                href = f"/p{t}"
            else:
                href = page_url(t)
            if roll >= 0.04 and rng.random() < 0.01:
                href += "#frag"
        anchors.append(f'<a href="{href}">link {j}</a>')
    filler = " ".join(
        f"w{int(w)}" for w in rng.integers(0, 1000, size=int(rng.integers(5, 40)))
    )
    html = (
        f"<html><head><title>Page {i} v{variant}</title>"
        f"<script>var x={i};</script><style>p{{color:red}}</style></head>"
        f"<body><p>{filler}</p>{''.join(anchors)}</body></html>"
    )
    return html.encode("utf-8")


def gen_pages_rows(indices: np.ndarray, n_pages: int) -> pd.DataFrame:
    """Pages rows for the given page indices (pure; executor-safe)."""
    rows: list[tuple] = []
    for i in indices:
        i = int(i)
        url = page_url(i)
        ts = BASE_TS + dt.timedelta(seconds=137 * i)
        html = _page_html(i, n_pages, variant=0)
        rows.append((url, ts, html, extract_text(html), _LANGS[i % 5]))
        if i % 20 == 7:  # ~5%: second, earlier duplicate crawl, different html
            dup_html = _page_html(i, n_pages, variant=1)
            rows.append(
                (
                    url,
                    ts - dt.timedelta(days=1),
                    dup_html,
                    extract_text(dup_html),
                    _LANGS[i % 5],
                )
            )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def gen_pages_pdf(n_pages: int) -> pd.DataFrame:
    """Whole pages table as pandas (tests / oracle; small N only)."""
    return gen_pages_rows(np.arange(n_pages), n_pages)


def gen_pages(spark: SparkSession, n_pages: int, partitions: int | None = None) -> DataFrame:
    """Distributed pages table via mapInPandas over spark.range.

    Each task generates only its slice of indices; per-row seeding makes the
    result independent of the partitioning.
    """
    parts = partitions or max(2, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_pages_rows(pdf["id"].to_numpy(), n_pages)

    return (
        spark.range(0, n_pages, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


# ------------------------------------------------------------ graph fixtures

def wiki_vote_like_edges() -> np.ndarray:
    """200-vertex digraph fixture, seed 4242 (FIXTURES.md §3).

    Zipf out-degrees on vertices 0..189 with uniform destinations, a
    deterministic ring (i -> (i*7+1) % 200) for connectivity, vertices
    190..199 rewired into two directed 5-cliques detached from the rest,
    and ~15 dangling (outdeg 0) vertices. Self-loops removed, deduplicated.
    Returns an (E, 2) int64 array sorted by (src, dst).
    """
    rng = np.random.default_rng(4242)
    edges: list[tuple[int, int]] = []
    for v in range(190):
        deg = int(min(rng.zipf(2.0), 60))
        for d in rng.integers(0, 190, size=deg):
            edges.append((v, int(d)))
    for i in range(200):
        edges.append((i, (i * 7 + 1) % 200))
    # rewire: detach 190..199 into two 5-cliques
    edges = [(s, d) for (s, d) in edges if s < 190 and d < 190]
    for block in (range(190, 195), range(195, 200)):
        for u in block:
            for w in block:
                if u != w:
                    edges.append((u, w))
    dangling = rng.choice(190, size=15, replace=False)
    dangling_set = set(int(x) for x in dangling)
    edges = [(s, d) for (s, d) in edges if s not in dangling_set]
    arr = np.array(sorted(set((s, d) for s, d in edges if s != d)), dtype=np.int64)
    return arr


WIKI_VOTE_N = 200


def hub_stress_edges() -> np.ndarray:
    """5000-vertex graph with one extreme hub (seed 777; FIXTURES.md §3)."""
    rng = np.random.default_rng(777)
    edges: list[tuple[int, int]] = []
    hub_neighbors = rng.choice(np.arange(1, 5000), size=4000, replace=False)
    for d in hub_neighbors:
        edges.append((0, int(d)))   # out_deg(0) = 4000
        edges.append((int(d), 0))   # in_deg(0) = 4000
    for v in range(1, 5000):
        deg = int(min(rng.zipf(2.0), 20))
        for d in rng.integers(0, 5000, size=deg):
            edges.append((v, int(d)))
    arr = np.array(sorted(set((s, d) for s, d in edges if s != d)), dtype=np.int64)
    return arr


HUB_STRESS_N = 5000


def edges_df(spark: SparkSession, arr: np.ndarray, partitions: int = 8) -> DataFrame:
    """(E,2) numpy edge array -> edges(src_id, dst_id) DataFrame."""
    pdf = pd.DataFrame({"src_id": arr[:, 0], "dst_id": arr[:, 1]})
    schema = StructType(
        [StructField("src_id", LongType(), False), StructField("dst_id", LongType(), False)]
    )
    return spark.createDataFrame(pdf, schema=schema).repartition(partitions)
