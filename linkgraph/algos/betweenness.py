"""Betweenness centrality — sampled Brandes as batched vertex programs.

SURVEY.md §2.1 A10 lists betweenness among the reference's upstream
programs (`UPSTREAM flash-graph/libgraph-algs/`); with SCC landed it was
the last named program gap. Semantics: unnormalized directed betweenness

    bc(v) = Σ_{s ∈ pivots} Σ_{t ≠ s,v} σ_st(v) / σ_st

over unit-weight shortest paths. With ``pivots`` = all vertices this is
EXACT Brandes; with a sample it is the standard unbiased estimator
(Brandes & Pich 2007) — the only form that makes sense at web scale,
where exactness costs |V| traversals.

Spark shape — **all pivots traverse simultaneously**: state is keyed
``(pivot, id)``, so one level-synchronous BFS loop advances every
pivot's frontier at once (k·|V| state rows, the batching that amortizes
Spark's per-superstep overhead across sources), computing ``dist`` and
the shortest-path count ``sigma``. The backward sweep then walks levels
deepest-first: nodes at depth L push ``sigma_v/sigma_w · (1 + delta_w)``
to their depth-(L-1) predecessors through the REVERSED gather layout —
one join + combiner-reduced aggregation per level, exactly the
dependency accumulation of Brandes' algorithm. Levels are bounded by the
BFS depth actually reached (web graphs: tens).

Floats: sigma/delta are float64 (path counts overflow int64 on dense
graphs); determinism holds because both sweeps are sum-combiners over
fixed multisets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import gather_layout, resolve_partitions, reverse_edges, vertex_ids_from_edges
from linkgraph.engine import RunResult, SuperstepEngine, make_changed_stop

_changed_stop = make_changed_stop("frontier")


def betweenness(
    spark: SparkSession,
    edges: DataFrame,
    pivots: Sequence[int],
    vertices: DataFrame | None = None,
    max_iters: int = 10_000,
    partitions: int | None = None,
) -> RunResult:
    """Sampled Brandes betweenness; result state = (id, bc).

    ``pivots``: source sample (pass every vertex id for exact Brandes).
    The pivot set is driver-side metadata (like BFS sources); at scale a
    few hundred sampled pivots estimate within a few percent.
    """
    engine = SuperstepEngine(spark)
    partitions = resolve_partitions(spark, edges, partitions)
    e0 = (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )
    fwd = gather_layout(e0, partitions)
    rev = gather_layout(reverse_edges(e0), partitions)
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)
    # deduped: a repeated pivot would double its (pivot, id) state rows,
    # compounding sigma every BFS level (2^depth inflation, silently wrong)
    piv_df = spark.createDataFrame(
        [(p,) for p in sorted({int(p) for p in pivots})], "pivot long"
    )

    is_src = F.col("id") == F.col("pivot")
    state0 = ids.crossJoin(F.broadcast(piv_df)).select(
        "pivot",
        "id",
        F.when(is_src, F.lit(0)).otherwise(F.lit(-1)).cast("long").alias("dist"),
        F.when(is_src, F.lit(1.0)).otherwise(F.lit(0.0)).alias("sigma"),
        is_src.alias("changed"),
    )

    # ---- forward sweep: multi-source BFS carrying shortest-path counts.
    # A vertex's sigma is the sum of its predecessors' sigmas, all of which
    # sit exactly one level up — so sigma is final the moment the frontier
    # reaches it (level-synchronous BFS discovers all preds together).
    def fwd_step(state: DataFrame, iteration: int) -> DataFrame:
        frontier = state.filter(F.col("changed")).select(
            "pivot", F.col("id").alias("src_id"), F.col("sigma").alias("fsigma")
        )
        # message keys renamed: msgs derives from state, so joining on
        # state["pivot"] == msgs["pivot"] is an ambiguous self-join
        msgs = (
            fwd.join(frontier, "src_id")
            .groupBy(
                F.col("pivot").alias("m_pivot"), F.col("dst_id").alias("m_id")
            )
            .agg(F.sum("fsigma").alias("sig_in"))
        )
        joined = state.join(
            msgs,
            (state["pivot"] == msgs["m_pivot"]) & (state["id"] == msgs["m_id"]),
            "left",
        )
        newly = (state["dist"] == -1) & F.col("sig_in").isNotNull()
        return joined.select(
            state["pivot"],
            state["id"],
            F.when(newly, F.lit(iteration)).otherwise(state["dist"]).cast("long").alias("dist"),
            F.when(newly, F.col("sig_in")).otherwise(state["sigma"]).alias("sigma"),
            newly.alias("changed"),
        )

    try:
        bfs_res = engine.run(
            state0, fwd_step, max_iters=max_iters, should_stop=_changed_stop,
            shuffle_partitions=partitions,
        )
        levels = bfs_res.state.filter(F.col("dist") >= 0).select(
            "pivot", "id", "dist", "sigma"
        ).localCheckpoint(eager=True)
        max_depth = levels.agg(F.max("dist")).first()[0] or 0

        # ---- backward sweep: dependency accumulation, deepest level first.
        # delta(v) = Σ_{w : v→w, dist(w)=dist(v)+1} sigma(v)/sigma(w) · (1+delta(w))
        delta = levels.select(
            "pivot", "id", "dist", "sigma", F.lit(0.0).alias("delta")
        ).localCheckpoint(eager=True)
        for depth in range(int(max_depth), 0, -1):
            w_nodes = delta.filter(F.col("dist") == depth).select(
                "pivot",
                F.col("id").alias("src_id"),  # reversed layout: w is the source
                ((1.0 + F.col("delta")) / F.col("sigma")).alias("w_term"),
            )
            msgs = (
                rev.join(w_nodes, "src_id")
                .groupBy(
                    F.col("pivot").alias("m_pivot"), F.col("dst_id").alias("m_id")
                )
                .agg(F.sum("w_term").alias("terms"))
            )
            joined = delta.join(
                msgs,
                (delta["pivot"] == msgs["m_pivot"]) & (delta["id"] == msgs["m_id"]),
                "left",
            )
            is_pred = delta["dist"] == depth - 1
            delta = joined.select(
                delta["pivot"],
                delta["id"],
                delta["dist"],
                delta["sigma"],
                F.when(
                    is_pred & F.col("terms").isNotNull(),
                    delta["sigma"] * F.col("terms"),
                )
                .otherwise(delta["delta"])
                .alias("delta"),
            ).localCheckpoint(eager=True)

        bc = (
            delta.filter(F.col("id") != F.col("pivot"))
            .groupBy("id")
            .agg(F.sum("delta").alias("bc"))
        )
        out = ids.join(bc, "id", "left").select(
            "id", F.coalesce("bc", F.lit(0.0)).alias("bc")
        )
        return RunResult(
            state=out,
            iterations=bfs_res.iterations + int(max_depth),
            # deepest BFS level actually reached from any pivot — callers
            # that compare against a depth-capped oracle need this to tell
            # "oracle too shallow" apart from a real mismatch
            metrics=bfs_res.metrics + [{"bc_max_depth": int(max_depth)}],
        )
    finally:
        fwd.unpersist()
        rev.unpersist()
