"""Breadth-first search (hop distance) as a frontier vertex program.

SURVEY.md §2.1 A10 lists BFS among the reference's additional vertex
programs (upstream `flash-graph/libgraph-algs`); it is the canonical
demonstration that the superstep kernel generalizes beyond the four
target programs — the step function is the same gather (edges ⋈ frontier)
→ combine (min) → apply (coalesce) shape as WCC, with the frontier
carrying exactly one BFS level per superstep.

Convention (pinned here, encoded in the oracle):

- directed traversal over out-edges (pass ``symmetrize(edges)`` for the
  undirected variant);
- ``dist(source) = 0``; unreached vertices report ``dist = -1`` (no NULLs
  so exact-match value hashing is stable);
- multiple sources allowed — dist is the hop distance to the nearest.

Scale notes: the frontier semi-restricts the gather join each superstep
(level-synchronous BFS touches each edge at most once over the whole
run); edges are pre-partitioned on the gather key so no edge-side
shuffle repeats per superstep.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import gather_layout, resolve_partitions, vertex_ids_from_edges
from linkgraph.engine import RunResult, SuperstepEngine, make_changed_stop

_should_stop = make_changed_stop("newly_reached")


def bfs(
    spark: SparkSession,
    edges: DataFrame,
    sources: Sequence[int],
    vertices: DataFrame | None = None,
    max_iters: int = 10_000,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> RunResult:
    """Level-synchronous BFS; result state = (id, dist, changed)."""
    engine = engine or SuperstepEngine(spark)
    partitions = resolve_partitions(spark, edges, partitions)
    e = gather_layout(edges, partitions)
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(e)
    src_set = {int(s) for s in sources}
    is_src = F.col("id").isin(list(src_set))
    state0 = ids.select(
        "id",
        F.when(is_src, F.lit(0)).otherwise(F.lit(-1)).cast("long").alias("dist"),
        is_src.alias("changed"),
    )

    def step(state: DataFrame, iteration: int) -> DataFrame:
        frontier = state.filter(F.col("changed")).select(
            F.col("id").alias("src_id"), F.col("dist").alias("fdist")
        )
        msgs = (
            e.join(frontier, "src_id")
            .groupBy("dst_id")
            .agg((F.min("fdist") + F.lit(1)).alias("cand"))
        )
        newly = F.col("dist").eqNullSafe(F.lit(-1)) & F.col("cand").isNotNull()
        return (
            state.join(msgs, state["id"] == msgs["dst_id"], "left")
            .select(
                state["id"],
                F.when(newly, F.col("cand")).otherwise(F.col("dist")).cast("long").alias("dist"),
                newly.alias("changed"),
            )
        )

    try:
        return engine.run(
            state0, step, max_iters=max_iters, should_stop=_should_stop, resume=resume,
            shuffle_partitions=partitions,
        )
    finally:
        # unconditional: an exception mid-run must not leak the O(E) cache
        e.unpersist()
