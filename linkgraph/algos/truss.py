"""k-truss decomposition (SURVEY.md §2.1 A10 extension).

The k-truss is the maximal subgraph in which every edge participates in at
least k-2 triangles (counted within the subgraph) — the standard
cohesive-community primitive one step up from k-core. Peeling: recompute
per-edge triangle support, drop under-supported edges, repeat. Support
shrinks monotonically, so the edge COUNT alone detects the fixpoint, and
extra rounds past convergence are idempotent (fixed-round runs are
exact-matchable, the same trick as the k-core oracle).

Scale shape: the state is the canonical undirected edge list (a < b);
each round is one wedge self-join (the triangle-counting join, degree-
bounded by the same orientation argument as algos/triangles.py) plus a
support groupBy — all shuffle-partitioned joins, no driver-side loops
over data, one scalar action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.engine import RunResult, SuperstepEngine

TRUSS_K = 4


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _edge_support(und: DataFrame) -> DataFrame:
    """(a, b, support): triangles through each edge of the canonical
    undirected edge list, via the oriented wedge join (x<y<z)."""
    e_xy = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e_yz = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e_xz = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e_xy.join(e_yz, "y").join(e_xz, ["x", "z"])
    sides = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
    )
    return sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))


def truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int = TRUSS_K,
    max_iters: int = 100,
    fixed_rounds: int | None = None,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
) -> RunResult:
    """Peel to the k-truss; result state = surviving canonical edges (a, b).

    ``fixed_rounds`` runs exactly that many synchronous peel rounds (for
    oracle-matched queries); otherwise peel to the count-stable fixpoint.
    """
    engine = engine or SuperstepEngine(spark)
    und0 = _canonical_undirected(edges)
    min_support = k - 2

    def step(und: DataFrame, iteration: int) -> DataFrame:
        sup = _edge_support(und)
        return (
            und.join(sup, ["a", "b"], "left")
            .filter(F.coalesce("support", F.lit(0)) >= min_support)
            .select("a", "b")
        )

    prev: dict[str, int] = {}

    def should_stop(und: DataFrame, iteration: int) -> tuple[bool, dict]:
        # peeling is monotone (edges only ever leave), so a stable count
        # IS a stable edge set
        n = und.count()
        stop = prev.get("n") == n
        prev["n"] = n
        return stop, {"edges": n}

    return engine.run(
        und0,
        step,
        max_iters=fixed_rounds if fixed_rounds is not None else max_iters,
        should_stop=None if fixed_rounds is not None else should_stop,
        resume=resume,
    )
