"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``linkgraph`` package (SURVEY.md §7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the link graph derived from sf0.001.

    Loads the driver's sf0.001 parquet, builds the deterministic edge view
    (linkgraph.driver_queries.lineitem_edges), runs the superstep engine's
    PageRank to convergence, returns the top-10 vertices (id, rank).
    """
    from linkgraph.algos import pagerank
    from linkgraph.driver_queries import lineitem_edges

    edges = lineitem_edges(spark, SF_SMOKE_DIR)
    result = pagerank(spark, edges, max_iters=20, eps=1e-6)
    return (
        result.state.select("id", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from linkgraph.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    from linkgraph.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
