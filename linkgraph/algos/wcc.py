"""Weakly connected components (SURVEY.md §2.1 A2).

Convention: digraph treated as undirected; comp0(v) = v; iterate
comp(v) = min(comp(v), min over neighbors' comp) to fixpoint; output =
min vertex id per component. Exact-match acceptance.

Spark mapping: symmetrize once (loop-invariant, persisted); per superstep a
**frontier-restricted** gather — only vertices whose comp changed last
round send messages (SURVEY.md A6: FlashGraph's ``activate_vertices``),
which collapses the tail iterations' work; terminate when the changed
count hits 0 (one scalar action per superstep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import gather_layout, symmetrize, vertex_ids_from_edges
from linkgraph.engine import RunResult, SuperstepEngine


def _should_stop(new_state: DataFrame, iteration: int) -> tuple[bool, dict]:
    changed = new_state.agg(
        F.sum(F.col("changed").cast("long")).alias("c")
    ).first()["c"]
    return (changed == 0), {"changed": int(changed or 0)}


def wcc(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 200,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> RunResult:
    """Run WCC to fixpoint; result state = (id, comp, changed)."""
    engine = engine or SuperstepEngine(spark)
    partitions = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # loop-invariant; pre-partitioned + pre-sorted on the gather key so
    # per-superstep joins reuse the layout with no Sort (build.gather_layout)
    sym = gather_layout(symmetrize(edges), partitions)
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)
    state0 = ids.select(
        "id", F.col("id").alias("comp"), F.lit(True).alias("changed")
    )

    def step(state: DataFrame, iteration: int) -> DataFrame:
        frontier = state.filter(F.col("changed")).select(
            F.col("id").alias("src_id"), F.col("comp").alias("src_comp")
        )
        msgs = (
            sym.join(frontier, "src_id")
            .groupBy("dst_id")
            .agg(F.min("src_comp").alias("cand"))
        )
        return (
            state.join(msgs, state["id"] == msgs["dst_id"], "left")
            .select(
                state["id"],
                F.least(state["comp"], F.coalesce(F.col("cand"), state["comp"])).alias("comp"),
                (F.coalesce(F.col("cand"), state["comp"]) < state["comp"]).alias("changed"),
            )
        )

    result = engine.run(
        state0, step, max_iters=max_iters, should_stop=_should_stop, resume=resume
    )
    sym.unpersist()
    return result
