"""Synchronous label propagation (SURVEY.md §2.1 A3).

Convention: label0(v) = v; per superstep every vertex takes the most
frequent label among its in+out neighbors' labels from the PREVIOUS
superstep (synchronous update), ties broken by the smallest label;
isolated vertices keep their label; fixed iteration count (default 10 —
synchronous LP can oscillate, so a pinned count makes results
exact-matchable). Exact-match acceptance.

Spark mapping (SURVEY.md G4): two-level aggregation —
groupBy(dst, label).count() then groupBy(dst).agg(min(struct(-cnt, label)))
— both phases get Spark's map-side partial aggregation (the message
combiner), and the struct-min trick avoids a window shuffle for the
argmax-with-tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import (
    resolve_partitions,
    symmetrized_gather_layout,
    vertex_ids_from_edges,
)
from linkgraph.conventions import LP_ITERS
from linkgraph.engine import RunResult, SuperstepEngine, make_changed_stop

# never stops (fixed iterations are the pinned convention); emits the
# per-round changed-label count — synchronous LP's oscillation failure
# mode is only visible through this at crawl scale. Observed on the
# round's own materialization (engine.ObservedStop) after an interleaved
# A/B measured the round-3 separate-action form at ~12% of lp_3iter
# (min 9.8s vs 8.8s on the 5M-edge bench graph) — telemetry is now free.
_telemetry_fn = make_changed_stop("changed_labels", stop_on_zero=False)


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iters: int = LP_ITERS,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    partitions: int | None = None,
    telemetry: bool = True,
) -> RunResult:
    """Run LP for a fixed number of supersteps; result state =
    (id, label, changed).

    ``telemetry`` (default on) logs the changed-label count per round into
    the engine metrics, observed on the superstep's own materialization —
    zero extra Spark jobs (engine.ObservedStop).
    """
    engine = engine or SuperstepEngine(spark)
    partitions = resolve_partitions(spark, edges, partitions)
    # loop-invariant; pre-partitioned + pre-sorted on the gather key so
    # per-superstep joins reuse the layout with no Sort (build.gather_layout)
    sym = symmetrized_gather_layout(edges, partitions)  # ONE shuffle
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)
    state0 = ids.select("id", F.col("id").alias("label"), F.lit(False).alias("changed"))

    def step(state: DataFrame, iteration: int) -> DataFrame:
        nb_labels = sym.join(
            state.select(F.col("id").alias("src_id"), "label"), "src_id"
        ).select("dst_id", "label")
        counts = nb_labels.groupBy("dst_id", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        winners = counts.groupBy("dst_id").agg(
            F.min(F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("label").alias("label"))).alias("w")
        ).select("dst_id", F.col("w.label").alias("new_label"))
        return (
            state.join(winners, state["id"] == winners["dst_id"], "left")
            .select(
                state["id"],
                F.coalesce(F.col("new_label"), state["label"]).alias("label"),
                (
                    F.col("new_label").isNotNull()
                    & (F.col("new_label") != state["label"])
                ).alias("changed"),
            )
        )

    try:
        return engine.run(
            state0,
            step,
            max_iters=iters,
            should_stop=_telemetry_fn if telemetry else None,
            resume=resume,
        )
    finally:
        # unconditional: an exception mid-run must not leak the O(E) cache
        sym.unpersist()
