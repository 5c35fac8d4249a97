"""PageRank (SURVEY.md §2.1 A1) — two superstep kernels.

Convention (pinned in linkgraph/conventions.py; oracle-matched):
pull-based, d=0.85, r0 = 1-d, r(v) = (1-d) + d * Σ_{u→v} r(u)/outdeg(u),
dangling vertices contribute nothing; converge on max |Δr| < eps.

Kernel V1 "pure-SQL": gather = edges ⋈ state on src_id, combine =
groupBy(dst_id).sum (Spark's partial aggregation IS the message combiner),
apply = left join back + coalesce default. Fully Catalyst/AQE-optimized.

Kernel V2 "CSR gather-scatter" (BASELINE.json north_star): edges carry a
``part`` routing column; per superstep a cogrouped ``applyInPandas`` builds
a per-partition CSR block as Arrow/numpy arrays and runs a sparse
gather-scatter (SpMV) emitting partial (dst_id, contrib) sums, followed by
a shuffle-reduce. High-degree hubs are vertex-cut: their edge lists are
split across partitions by hash(dst) and their state rows replicated to
every partition (linkgraph/skew.py). V2 ≡ V1 within 1e-12 on fixtures.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import vertex_ids_from_edges
from linkgraph.conventions import (
    HUB_OUTDEG_THRESHOLD,
    PR_DAMPING,
    PR_EPS,
    PR_MAX_ITERS,
    SALT_BUCKETS,
)
from linkgraph.engine import RunResult, SuperstepEngine
from linkgraph.skew import salted_agg


def _initial_state(edges: DataFrame, vertices: DataFrame | None, damping: float) -> DataFrame:
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)
    out_deg = edges.groupBy(F.col("src_id").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    return ids.join(out_deg, "id", "left").select(
        "id",
        F.lit(1.0 - damping).alias("rank"),
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
    )


def _apply(state: DataFrame, msgs: DataFrame, damping: float) -> DataFrame:
    """apply step: new rank + old rank kept for the convergence action."""
    return (
        state.join(msgs, state["id"] == msgs["dst_id"], "left")
        .select(
            state["id"],
            (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce(F.col("sum_contrib"), F.lit(0.0))).alias("rank"),
            state["out_deg"],
            state["rank"].alias("prev_rank"),
        )
    )


def _stop_fn(eps: float):
    def should_stop(new_state: DataFrame, iteration: int) -> tuple[bool, dict]:
        delta = new_state.agg(
            F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("d")
        ).first()["d"]
        return (delta is not None and delta < eps), {"max_delta": delta}

    return should_stop


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = PR_DAMPING,
    eps: float = PR_EPS,
    max_iters: int = PR_MAX_ITERS,
    kernel: str = "sql",
    partitions: int | None = None,
    salted: bool = False,
    hub_threshold: int = HUB_OUTDEG_THRESHOLD,
    engine: SuperstepEngine | None = None,
    resume: bool = False,
) -> RunResult:
    """Run PageRank to convergence; result state = (id, rank, out_deg, prev_rank)."""
    engine = engine or SuperstepEngine(spark)
    partitions = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Loop-invariant edge table: hash-partition by the gather key ONCE and
    # persist. Every superstep's join then reuses this partitioning (the
    # plan shows InMemoryTableScan feeding ShuffledHashJoin with no
    # Exchange) — only the small vertex-state side shuffles per iteration.
    # This is the Spark analogue of FlashGraph keeping the graph image
    # partitioned across SSDs while vertex state moves (FAST'15 §3.6).
    edges = edges.select("src_id", "dst_id").repartition(partitions, "src_id").persist()
    state0 = _initial_state(edges, vertices, damping).withColumn(
        "prev_rank", F.lit(0.0)
    )

    if kernel == "sql":
        step = _make_sql_step(edges, damping, salted)
    elif kernel == "csr":
        step = _make_csr_step(spark, edges, damping, partitions, hub_threshold)
    else:
        raise ValueError(f"unknown kernel {kernel!r}")

    result = engine.run(
        state0, step, max_iters=max_iters, should_stop=_stop_fn(eps), resume=resume
    )
    edges.unpersist()
    return result


# ------------------------------------------------------------------ kernel V1

def _make_sql_step(edges: DataFrame, damping: float, salted: bool):
    def step(state: DataFrame, iteration: int) -> DataFrame:
        contribs = state.filter(F.col("out_deg") > 0).select(
            F.col("id").alias("src_id"),
            (F.col("rank") / F.col("out_deg")).alias("contrib"),
        )
        gathered = edges.join(contribs, "src_id").select("dst_id", "contrib")
        if salted:
            msgs = salted_agg(
                gathered, key="dst_id", value="contrib", agg="sum", buckets=SALT_BUCKETS
            ).withColumnRenamed("contrib", "sum_contrib")
        else:
            msgs = gathered.groupBy("dst_id").agg(F.sum("contrib").alias("sum_contrib"))
        return _apply(state, msgs, damping)

    return step


# ------------------------------------------------------------------ kernel V2

def _csr_spmv_factory(damping: float):
    """Cogrouped-map kernel: (edge block, state block) -> partial dst sums.

    Builds the partition's CSR view with numpy (sorted src ids +
    searchsorted gather), scatters contributions with bincount — no Python
    per-row work; Arrow columnar in/out (SURVEY.md X3).
    """

    def csr_spmv(edge_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(edge_pdf) == 0 or len(state_pdf) == 0:
            return pd.DataFrame({"dst_id": pd.Series(dtype="int64"),
                                 "contrib": pd.Series(dtype="float64")})
        ids = state_pdf["id"].to_numpy(dtype=np.int64)
        vals = state_pdf["contrib"].to_numpy(dtype=np.float64)
        order = np.argsort(ids, kind="stable")
        ids, vals = ids[order], vals[order]
        src = edge_pdf["src_id"].to_numpy(dtype=np.int64)
        dst = edge_pdf["dst_id"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(ids, src)
        pos = np.clip(pos, 0, len(ids) - 1)
        hit = ids[pos] == src
        contrib = np.where(hit, vals[pos], 0.0)
        uniq_dst, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=contrib, minlength=len(uniq_dst))
        return pd.DataFrame({"dst_id": uniq_dst, "contrib": sums})

    return csr_spmv


def _make_csr_step(
    spark: SparkSession,
    edges: DataFrame,
    damping: float,
    partitions: int,
    hub_threshold: int,
):
    # Routing (computed once; loop-invariant): normal src -> part by id hash,
    # hub src -> vertex-cut across partitions by hash(dst_id).
    out_deg = edges.groupBy(F.col("src_id").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    hubs = out_deg.filter(F.col("deg") > hub_threshold).select("id").persist()
    n_hubs = hubs.count()
    hub_src = hubs.withColumnRenamed("id", "src_id").withColumn("__hub", F.lit(True))
    edges_parts = (
        edges.join(F.broadcast(hub_src), "src_id", "left")
        .withColumn(
            "part",
            F.when(
                F.col("__hub").isNotNull(),
                F.pmod(F.xxhash64("dst_id"), F.lit(partitions)),
            )
            .otherwise(F.pmod(F.col("src_id"), F.lit(partitions)))
            .cast("int"),
        )
        .select("src_id", "dst_id", "part")
        .repartition(partitions, "part")
        .persist()
    )
    edges_parts.count()
    parts_df = spark.range(partitions).select(F.col("id").cast("int").alias("part"))
    kernel = _csr_spmv_factory(damping)

    def step(state: DataFrame, iteration: int) -> DataFrame:
        contribs = state.filter(F.col("out_deg") > 0).select(
            "id", (F.col("rank") / F.col("out_deg")).alias("contrib")
        )
        normal = contribs.join(F.broadcast(hubs), "id", "left_anti").withColumn(
            "part", F.pmod(F.col("id"), F.lit(partitions)).cast("int")
        )
        if n_hubs:
            # replicate hub state to every partition (vertex-cut)
            hub_state = (
                contribs.join(F.broadcast(hubs), "id", "left_semi")
                .crossJoin(F.broadcast(parts_df))
                .select("id", "contrib", "part")
            )
            routed = normal.unionByName(hub_state)
        else:
            routed = normal
        partials = (
            edges_parts.groupBy("part")
            .cogroup(routed.groupBy("part"))
            .applyInPandas(kernel, schema="dst_id long, contrib double")
        )
        msgs = partials.groupBy("dst_id").agg(F.sum("contrib").alias("sum_contrib"))
        return _apply(state, msgs, damping)

    return step
