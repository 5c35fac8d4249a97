"""Deterministic large-graph generator for benchmarks.

Generates a power-law-ish digraph entirely with JVM-side column expressions
(no Python in the loop): edge i gets a uniform src and a dst skewed toward
low vertex ids (hub skew), via xxhash64-derived uniforms. Fully
deterministic, distributed, O(|E|) with no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_B = 1 << 30


def _uniform(col, seed: int):
    """Deterministic uniform [0,1) from a long column."""
    return F.pmod(F.xxhash64(col + F.lit(seed)), F.lit(_B)) / F.lit(float(_B))


def gen_bench_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    skew: float = 2.5,
    partitions: int | None = None,
) -> DataFrame:
    """~n_edges distinct directed edges over [0, n_vertices) with dst skew.

    dst = floor(V * u^skew) concentrates in-degree on low ids (hubs);
    src is uniform. Self-loops dropped, duplicates removed.
    """
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_edges, numPartitions=parts)
    edges = base.select(
        F.floor(_uniform(F.col("id"), 1) * n_vertices).cast("long").alias("src_id"),
        F.floor(F.pow(_uniform(F.col("id"), 2), F.lit(skew)) * n_vertices)
        .cast("long")
        .alias("dst_id"),
    )
    return edges.filter(F.col("src_id") != F.col("dst_id")).distinct()
