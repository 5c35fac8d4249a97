"""Synchronous label propagation (SURVEY.md §2.1 A3).

Convention: label0(v) = v; per superstep every vertex takes the most
frequent label among its in+out neighbors' labels from the PREVIOUS
superstep (synchronous update), ties broken by the smallest label;
isolated vertices keep their label; fixed iteration count (default 10 —
synchronous LP can oscillate, so a pinned count makes results
exact-matchable). Exact-match acceptance.

Spark mapping (SURVEY.md G4): three interchangeable aggregation kernels
(identical pinned results; equivalence pytest-pinned):

- ``two_level``: groupBy(dst, label).count() then
  groupBy(dst).agg(min(struct(-cnt, label))) — both phases get Spark's
  map-side partial aggregation (the message combiner), and the struct-min
  trick avoids a window shuffle for the argmax-with-tie-break. Costs TWO
  per-superstep exchanges, and in early supersteps (labels still ~unique)
  BOTH carry ~|E| rows: the (dst,label) partial agg can't combine rows
  whose labels differ, so E1 ≈ |E|, and the distinct (dst,label) pairs
  feeding E2 are also ≈ |E|.
- ``mode``: groupBy(dst).agg(F.mode(label, deterministic=True)) — Spark's
  deterministic mode breaks frequency ties by the LOWEST value, exactly
  this kernel's pinned tie-break, so the argmax collapses into the one
  aggregate. ONE exchange per superstep, keyed on dst; partial_mode merges
  per-dst label→count maps map-side, so the exchange carries one map entry
  per distinct (dst,label) per map-side partition — the same volume as
  two_level's E1, with E2 gone. (ObjectHashAggregate, not codegen; the
  sort-based fallback above 128 groups/partition is the measured cost.)
- ``repart``: repartition(partitions, dst) then both two_level aggs —
  HashPartitioning(dst) satisfies the clustered distribution of BOTH
  groupings, so the two aggs and the winners join are all partition-local:
  ONE exchange per superstep carrying exactly |E| rows (no map-side
  combine), but every operator stays whole-stage-codegen.

Default: ``repart``, pinned by the interleaved A/B in BENCH/BASELINE.md
("LP aggregation kernel A/B"): min 0.64x of two_level at 3 supersteps and
0.52x at 8 on the 5M-edge bench graph — one exchange per superstep beats
map-side combining even late in convergence, because on a src-partitioned
gather layout a dst's edges are scattered and the (dst,label) combine
rarely fires, while the argmax exchange it saves is ~|E| rows early.
``mode`` measured 1.7x SLOWER in both regimes (the ObjectHashAggregate
sort-based fallback above 128 groups/partition re-sorts the gathered
labels every superstep) — refuted, kept for the record.
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
    agg: str = "repart",
) -> RunResult:
    """Run LP for a fixed number of supersteps; result state =
    (id, label, changed).

    ``telemetry`` (default on) logs the changed-label count per round into
    the engine metrics, observed on the superstep's own materialization —
    zero extra Spark jobs (engine.ObservedStop).

    ``agg``: per-superstep aggregation kernel — "repart" (default, A/B
    winner), "two_level", or "mode"; identical results (see module
    docstring).
    """
    if agg not in ("two_level", "mode", "repart"):
        raise ValueError(f"unknown LP aggregation kernel: {agg!r}")
    engine = engine or SuperstepEngine(spark)
    partitions = resolve_partitions(spark, edges, partitions)
    # loop-invariant; pre-partitioned + pre-sorted on the gather key so
    # per-superstep joins reuse the layout with no Sort (build.gather_layout)
    sym = symmetrized_gather_layout(edges, partitions)  # ONE shuffle
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)
    state0 = ids.select("id", F.col("id").alias("label"), F.lit(False).alias("changed"))

    def _two_level_winners(nb_labels: DataFrame) -> DataFrame:
        counts = nb_labels.groupBy("dst_id", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return counts.groupBy("dst_id").agg(
            F.min(F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("label").alias("label"))).alias("w")
        ).select("dst_id", F.col("w.label").alias("new_label"))

    def step(state: DataFrame, iteration: int) -> DataFrame:
        nb_labels = sym.join(
            state.select(F.col("id").alias("src_id"), "label"), "src_id"
        ).select("dst_id", "label")
        if agg == "mode":
            winners = nb_labels.groupBy("dst_id").agg(
                F.mode("label", True).alias("new_label")
            )
        elif agg == "repart":
            winners = _two_level_winners(
                nb_labels.repartition(partitions, "dst_id")
            )
        else:
            winners = _two_level_winners(nb_labels)
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
