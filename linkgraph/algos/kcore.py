"""k-core decomposition (membership for a fixed k) as a delta-peel
vertex program.

SURVEY.md §2.1 A10 lists k-core among the reference's additional programs
(upstream `flash-graph/libgraph-algs/kcore.cpp`); like BFS it reuses the
superstep kernel unchanged.

Semantics (synchronous peel, pinned here and in the unrolled SQL oracle):
on the deduplicated symmetrized simple graph, start with every vertex
active; each round, simultaneously deactivate every active vertex whose
degree within the currently-active subgraph is < k; fixpoint = the k-core.

Implementation is the *delta* form — a removal only affects its
neighbors, so each round ships messages from the just-removed set only
(`sym ⋈ doomed → groupBy(dst).count()`) and decrements a maintained
degree, instead of recounting every vertex's degree. Work per round is
proportional to edges incident to removals (FlashGraph's
``activate_vertices`` selective-computation pattern, FAST'15 §3.3), which
is the property that makes peeling viable at crawl scale where tail
rounds remove a vanishing fraction of vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import (
    resolve_partitions,
    symmetrized_gather_layout,
    vertex_ids_from_edges,
)
from linkgraph.engine import ObservedStop, RunResult, SuperstepEngine

# pending peels counted on the round's own materialization
# (engine.ObservedStop) — no extra job per round
_should_stop = ObservedStop(
    metrics=lambda: {
        "pending_removals": F.sum(
            (F.col("active") & (F.col("deg") < F.col("k"))).cast("long")
        )
    },
    decide=lambda m, it: int(m["pending_removals"] or 0) == 0,
)


def kcore(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    vertices: DataFrame | None = None,
    max_iters: int = 10_000,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> RunResult:
    """Peel to the k-core; result state = (id, deg, active, k).

    ``active`` marks k-core membership at fixpoint; ``deg`` is the
    degree within the active subgraph (only meaningful for active rows).
    """
    engine = engine or SuperstepEngine(spark)
    partitions = resolve_partitions(spark, edges, partitions)
    sym = symmetrized_gather_layout(edges, partitions)  # ONE shuffle
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)
    deg0 = sym.groupBy(F.col("src_id").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    state0 = (
        ids.join(deg0, "id", "left")
        .select(
            "id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.lit(True).alias("active"),
            F.lit(int(k)).alias("k"),
        )
    )

    def step(state: DataFrame, iteration: int) -> DataFrame:
        doomed = state.filter(F.col("active") & (F.col("deg") < F.col("k"))).select(
            F.col("id").alias("src_id")
        )
        dec = (
            sym.join(doomed, "src_id")
            .groupBy("dst_id")
            .agg(F.count(F.lit(1)).alias("dec"))
        )
        survives = F.col("active") & (F.col("deg") >= F.col("k"))
        return (
            state.join(dec, state["id"] == dec["dst_id"], "left")
            .select(
                state["id"],
                F.when(
                    survives, F.col("deg") - F.coalesce(F.col("dec"), F.lit(0))
                ).otherwise(F.lit(0)).cast("long").alias("deg"),
                survives.alias("active"),
                state["k"],
            )
        )

    try:
        return engine.run(
            state0, step, max_iters=max_iters, should_stop=_should_stop, resume=resume,
            shuffle_partitions=partitions,
        )
    finally:
        # unconditional: an exception mid-run must not leak the O(E) cache
        sym.unpersist()
