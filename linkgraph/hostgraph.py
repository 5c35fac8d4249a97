"""Host-level link graph: the standard web-link-analysis roll-up.

The page→page graph at crawl scale (10^12 documents) is rarely consumed
raw; the canonical derived product (Common Crawl publishes exactly this)
is the host→host graph: both endpoints collapsed to their url host, edge
weight = number of page-level links between the two hosts, intra-host
links dropped by default (they dominate raw counts and carry no
cross-site endorsement signal), then weighted PageRank over the roll-up
for host authority.

Scale shape: the roll-up is ONE map-side-combined groupBy — hosts are
10^3-10^4× fewer than pages, so everything downstream (dictionary,
iteration state) runs on a graph orders of magnitude smaller than the
page graph; the only O(pages) pass is the initial projection, which
pushes down to a two-column scan. Host extraction is a JVM-side
``regexp_extract`` (no Python), with the regex shared VERBATIM with the
DuckDB oracle (driver_queries.q_host_pagerank) so both engines cut hosts
identically. Mega-host in-degree skew (the wikipedia problem) reuses the
PageRank kernel's hybrid salted aggregation via ``salted=True``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.conventions import PR_DAMPING, PR_EPS, PR_MAX_ITERS

# scheme://host, host ended by '/', ':', '?' or '#' — the PORT is
# deliberately not part of the host (one site, different listener). Plain
# ASCII regex — identical semantics under Java regex (Spark) and RE2
# (DuckDB), which the oracle cross-check depends on. Urls are already
# normalize_url()'d (lowercase scheme+host) by the extraction layer.
HOST_RE = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def host_col(col: Column) -> Column:
    """Host of a normalized url ('' when the url has no parseable host)."""
    return F.regexp_extract(col, HOST_RE, 1)


def host_edges(
    url_pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    keep_intra: bool = False,
) -> DataFrame:
    """(src_host, dst_host, weight) roll-up of a page-level url pair table.

    weight = COUNT of page links between the hosts (double — it feeds the
    weighted-PageRank kernel directly). Unparseable endpoints are dropped;
    intra-host edges are dropped unless ``keep_intra``.
    """
    pairs = url_pairs.select(
        host_col(F.col(src_col)).alias("src_host"),
        host_col(F.col(dst_col)).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not keep_intra:
        pairs = pairs.filter(F.col("src_host") != F.col("dst_host"))
    return pairs.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def host_pagerank(
    spark: SparkSession,
    url_pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    keep_intra: bool = False,
    damping: float = PR_DAMPING,
    eps: float = PR_EPS,
    max_iters: int = PR_MAX_ITERS,
    partitions: int | None = None,
    salted: bool = False,
) -> DataFrame:
    """Weighted PageRank over the host roll-up; returns (host, rank).

    Pipeline: roll-up (one combined groupBy) → dense host dictionary
    (build.assign_vertex_ids, the scalable two-phase rank) → the existing
    weighted sql kernel → join ranks back to host strings. The dictionary
    and iteration state are O(hosts), not O(pages).
    """
    from linkgraph.algos import pagerank
    from linkgraph.build import assign_vertex_ids

    hedges = host_edges(
        url_pairs, src_col=src_col, dst_col=dst_col, keep_intra=keep_intra
    ).persist()
    try:
        hosts = hedges.select(F.col("src_host").alias("url")).unionByName(
            hedges.select(F.col("dst_host").alias("url"))
        )
        hdict = assign_vertex_ids(hosts, partitions=partitions or 32)
        src_ids = hdict.select(
            F.col("url").alias("src_host"), F.col("id").alias("src_id")
        )
        dst_ids = hdict.select(
            F.col("url").alias("dst_host"), F.col("id").alias("dst_id")
        )
        id_edges = (
            hedges.join(src_ids, "src_host")
            .join(dst_ids, "dst_host")
            .select("src_id", "dst_id", "weight")
        )
        res = pagerank(
            spark,
            id_edges,
            vertices=hdict.select("id"),
            damping=damping,
            eps=eps,
            max_iters=max_iters,
            partitions=partitions,
            salted=salted,
            weight_col="weight",
        )
        return res.state.join(hdict, "id").select(
            F.col("url").alias("host"), "rank"
        )
    finally:
        hedges.unpersist()
