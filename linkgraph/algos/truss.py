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
    undirected edge list.

    Wedges are generated at the LOW-DEGREE endpoint of each edge
    (degree-ordered orientation, same hub-safety argument as
    algos/triangles.py): a hub of degree d contributes wedges only for its
    few higher-degree neighbors, never d^2 — an id-ordered wedge join
    would go quadratic at a high-id hub on a web graph. Orientation is a
    counting heuristic only; the support values are orientation-invariant,
    so the DuckDB oracle's plain x<y<z join matches exactly."""
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # (deg, id) as a STRUCT (lexicographic order) — exact for 64-bit ids,
    # unlike a packed deg*2^31+id long (same fix as algos/triangles.py)
    key = deg.select("id", F.struct(F.col("deg").alias("d"), F.col("id").alias("i")).alias("key"))
    ka = key.select(F.col("id").alias("a"), F.col("key").alias("key_a"))
    kb = key.select(F.col("id").alias("b"), F.col("key").alias("key_b"))
    oriented = (
        und.join(ka, "a")
        .join(kb, "b")
        .select(
            F.when(F.col("key_a") < F.col("key_b"), F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.greatest("key_a", "key_b").alias("key_hi"),
        )
    )
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("key_hi").alias("kv"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("key_hi").alias("kw"))
    wedges = e1.join(e2, "u").filter(F.col("kv") < F.col("kw")).select("u", "v", "w")
    closer = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closer, ["v", "w"])
    sides = (
        tri.select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .unionAll(tri.select(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")))
        .unionAll(tri.select(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")))
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
    from linkgraph.build import resolve_partitions

    partitions = resolve_partitions(spark, edges, None)
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

    def _decide(m: dict, iteration: int) -> bool:
        # peeling is monotone (edges only ever leave), so a stable count
        # IS a stable edge set
        n = m["edges"]
        stop = prev.get("n") == n
        prev["n"] = n
        return stop

    from linkgraph.engine import ObservedStop

    # edge count observed on the round's own materialization — no extra job
    should_stop = ObservedStop(metrics=lambda: {"edges": F.count(F.lit(1))}, decide=_decide)

    return engine.run(
        und0,
        step,
        max_iters=fixed_rounds if fixed_rounds is not None else max_iters,
        should_stop=None if fixed_rounds is not None else should_stop,
        resume=resume,
        shuffle_partitions=partitions,
    )
