"""HITS — hubs & authorities (Kleinberg 1999) as a superstep program.

Link-analysis sibling of PageRank over the same gather machinery
(SURVEY.md §2.1): a web-scale link-graph engine's second classic ranking.
Convention pinned in linkgraph/conventions.py: synchronous/Jacobi update —

    auth_k = A^T hub_norm_{k-1}      hub_k = A auth_norm_{k-1}

where hub_norm/auth_norm are the previous state's scores L1-normalized at
iteration start (scalars computed by re-scanning the materialized
checkpointed state — O(V), no gather recompute). Jacobi rather than
Gauss-Seidel so the two gathers are independent: each superstep is one
pass over the forward layout plus one over the reversed layout, with no
intra-step dependency that would force Catalyst to compute the forward
gather subtree twice.

Scale shape: BOTH gather directions get their own loop-invariant
``build.gather_layout`` (forward edges keyed on src, reversed edges keyed
on dst-as-src), so each superstep's two joins are streaming sort-merge
joins with one message Exchange each — the same single-shuffle-per-gather
plan as PageRank, just twice per superstep. Normalization scalars ride a
1-row broadcast crossJoin (no single-partition window, no driver action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import gather_layout, resolve_partitions, reverse_edges, vertex_ids_from_edges
from linkgraph.conventions import HITS_ITERS
from linkgraph.engine import RunResult, SuperstepEngine


def _l1_normalized(state: DataFrame) -> DataFrame:
    """(id, hub_n, auth_n): previous scores L1-normalized via a 1-row
    broadcast — the norm re-scans only the materialized state, never the
    gather subtree."""
    norms = state.agg(
        F.sum("hub").alias("__nh"), F.sum("auth").alias("__na")
    )
    # nullif guards the edgeless-graph corner (all scores gathered to 0):
    # a zero norm yields 0-scores, not NaN propagation
    return state.crossJoin(F.broadcast(norms)).select(
        "id",
        F.coalesce(F.col("hub") / F.nullif("__nh", F.lit(0.0)), F.lit(0.0)).alias("hub_n"),
        F.coalesce(F.col("auth") / F.nullif("__na", F.lit(0.0)), F.lit(0.0)).alias("auth_n"),
    )


def hits(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iters: int = HITS_ITERS,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
    partitions: int | None = None,
) -> RunResult:
    """Run fixed-iteration HITS; result state = (id, hub, auth) holding the
    RAW gathered sums of the final iteration (bounded: inputs are
    normalized each iteration). L1-normalize for presentation —
    ``normalized_scores`` does exactly that."""
    engine = engine or SuperstepEngine(spark)
    partitions = resolve_partitions(spark, edges, partitions)
    fwd = gather_layout(edges, partitions)
    rev = gather_layout(reverse_edges(edges), partitions)
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)
    state0 = ids.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    )

    def step(state: DataFrame, iteration: int) -> DataFrame:
        st = _l1_normalized(state)
        # auth(v) = sum of normalized hub over in-neighbors (forward gather)
        auth_msgs = (
            fwd.join(
                st.select(F.col("id").alias("src_id"), "hub_n"), "src_id"
            )
            .groupBy("dst_id")
            .agg(F.sum("hub_n").alias("auth_raw"))
        )
        # hub(v) = sum of normalized auth over out-neighbors (reversed gather)
        hub_msgs = (
            rev.join(
                st.select(F.col("id").alias("src_id"), "auth_n"), "src_id"
            )
            .groupBy("dst_id")
            .agg(F.sum("auth_n").alias("hub_raw"))
        )
        return (
            state.select("id")
            .join(hub_msgs, state["id"] == hub_msgs["dst_id"], "left")
            .drop("dst_id")
            .join(auth_msgs, state["id"] == auth_msgs["dst_id"], "left")
            .select(
                state["id"],
                F.coalesce("hub_raw", F.lit(0.0)).alias("hub"),
                F.coalesce("auth_raw", F.lit(0.0)).alias("auth"),
            )
        )

    try:
        return engine.run(
            state0, step, max_iters=iters, should_stop=None, resume=resume,
            shuffle_partitions=partitions,
        )
    finally:
        # unconditional: an exception mid-run must not leak the O(E) caches
        fwd.unpersist()
        rev.unpersist()


def normalized_scores(state: DataFrame) -> DataFrame:
    """Final presentation: (id, hub, auth) L1-normalized (0, not NaN, on an
    edgeless graph)."""
    norms = state.agg(F.sum("hub").alias("__nh"), F.sum("auth").alias("__na"))
    return state.crossJoin(F.broadcast(norms)).select(
        "id",
        F.coalesce(F.col("hub") / F.nullif("__nh", F.lit(0.0)), F.lit(0.0)).alias("hub"),
        F.coalesce(F.col("auth") / F.nullif("__na", F.lit(0.0)), F.lit(0.0)).alias("auth"),
    )
