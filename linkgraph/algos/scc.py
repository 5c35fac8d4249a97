"""Strongly connected components (SURVEY.md §2.1 A10).

The reference's program family lists SCC among the upstream vertex programs
(`UPSTREAM flash-graph/libgraph-algs/` — SURVEY.md §2.1 A10; the FlashGraph
paper benchmarks SCC on the twitter/page graphs). Semantics pinned here:
``comp(v)`` = the minimum vertex id in v's strongly connected component
(mutual-reachability equivalence class) on the directed simple graph.
Exact-match acceptance; oracle = recursive-CTE mutual reachability.

Algorithm: the **coloring / forward-backward** method (Orzan's distributed
SCC, the standard formulation for BSP engines) with trimming:

repeat until every vertex is assigned:
  1. TRIM — iteratively assign every vertex whose in-degree or out-degree
     within the unassigned subgraph is 0 to its own singleton SCC (such a
     vertex can't be mutually reachable with anything). Collapses the
     forest-like fringe of a web graph (the majority of its vertices) for
     the cost of a degree aggregation per round.
  2. COLOR — forward min-propagation to fixpoint: ``color(v)`` = min
     unassigned id that reaches v. Roots are vertices with
     ``color(v) == v``. Same superstep shape as WCC, directed.
  3. BACKWARD — from every root simultaneously, propagate a mark through
     REVERSED edges restricted to vertices of the same color. Marked
     vertices are mutually reachable with their root (root reaches them
     forward by the color, they reach the root by the mark):
     ``comp = color``. Assign and remove; unassigned vertices go back to 1.

Every phase is frontier-restricted (changed/newly-marked vertices only
message — FlashGraph's ``activate_vertices``), every fixpoint runs on the
loop-invariant ``build.gather_layout`` edge caches, and the per-vertex
assignment accumulates through ``localCheckpoint`` so driver-side lineage
stays bounded across phases. Worst case (a long path that survives
trimming... it can't — paths trim away; a long CYCLE resolves in one
color+backward sweep) is a chain of cycles: one outer phase per cycle
"layer", the known bound of FW-BW-style methods; real web graphs finish in
a handful of phases (one giant SCC + trimmable fringe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.build import gather_layout, resolve_partitions, reverse_edges, vertex_ids_from_edges
from linkgraph.engine import RunResult, SuperstepEngine, make_changed_stop

_changed_stop = make_changed_stop("changed")


def scc(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_phases: int = 100,
    max_iters: int = 10_000,
    partitions: int | None = None,
    ckpt_dir: str | None = None,
    resume: bool = False,
) -> RunResult:
    """Run SCC to completion; result state = (id, comp).

    ``max_phases`` bounds outer color+backward phases, ``max_iters`` each
    inner fixpoint. Raises if either bound is hit before every vertex is
    assigned (a partial SCC labeling is not a weaker answer — it is wrong).

    Resume is PHASE-level: with ``ckpt_dir`` each completed outer phase
    durably writes (assigned, remaining) + ``_meta.json`` carrying a
    fingerprint of the input edge set; ``resume=True`` restarts after the
    latest completed phase — and REFUSES a checkpoint whose fingerprint
    does not match the current graph (a stale checkpoint from another
    run would silently mix two graphs' labelings). A fresh run
    (``resume=False``) purges any prior ``scc_phase=*`` state first. All
    checkpoint IO goes through the Hadoop FileSystem, so ``ckpt_dir``
    may live on cluster shared storage. Lineage inside a phase is
    truncated by the engine's localCheckpoint as usual.
    """
    import json
    import os

    from linkgraph.engine import (
        fs_delete,
        fs_exists,
        fs_list_names,
        fs_read_text,
        fs_write_text,
    )

    engine = SuperstepEngine(spark)
    partitions = resolve_partitions(spark, edges, partitions)
    e0 = (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )
    fwd = gather_layout(e0, partitions)  # keyed on src_id (forward gather)
    rev = gather_layout(reverse_edges(e0), partitions)
    ids = vertices.select("id") if vertices is not None else vertex_ids_from_edges(edges)

    assigned = spark.createDataFrame([], "id long, comp long")
    remaining = ids.localCheckpoint(eager=True)
    total_iters = 0
    metrics: list[dict] = []
    start_phase = 1

    fingerprint = None
    if ckpt_dir:
        # one O(E) action: the input's identity, stored with every phase
        from linkgraph.build import edge_fingerprint

        n, chk = edge_fingerprint(e0)
        fingerprint = {"n_edges": n, "checksum": chk}

    if ckpt_dir and not resume:
        # fresh run: leftover phases from a previous run (same dir,
        # possibly a DIFFERENT graph) must not survive to be resumed later
        for name in fs_list_names(spark, ckpt_dir):
            if name.startswith("scc_phase="):
                fs_delete(spark, os.path.join(ckpt_dir, name))

    if resume and ckpt_dir:
        done = []
        for name in fs_list_names(spark, ckpt_dir):
            if name.startswith("scc_phase=") and fs_exists(
                spark, os.path.join(ckpt_dir, name, "_meta.json")
            ):
                done.append(int(name.split("=")[1]))
        if done:
            latest = max(done)
            base = os.path.join(ckpt_dir, f"scc_phase={latest}")
            meta = json.loads(fs_read_text(spark, os.path.join(base, "_meta.json")))
            if meta.get("fingerprint") != fingerprint:
                raise RuntimeError(
                    f"scc resume refused: checkpoint at {base} was written "
                    f"for a different edge set ({meta.get('fingerprint')} "
                    f"!= {fingerprint})"
                )
            assigned = spark.read.parquet(os.path.join(base, "assigned"))
            remaining = spark.read.parquet(os.path.join(base, "remaining"))
            start_phase = latest + 1
            metrics.append({"phase": latest, "stage": "resumed"})

    def _checkpoint_phase(phase: int) -> tuple[DataFrame, DataFrame]:
        base = os.path.join(ckpt_dir, f"scc_phase={phase}")
        assigned.write.mode("overwrite").parquet(os.path.join(base, "assigned"))
        remaining.write.mode("overwrite").parquet(os.path.join(base, "remaining"))
        fs_write_text(
            spark,
            os.path.join(base, "_meta.json"),
            json.dumps({"phase": phase, "fingerprint": fingerprint}),
        )
        # re-read: the durable copy replaces the in-memory lineage
        return (
            spark.read.parquet(os.path.join(base, "assigned")),
            spark.read.parquet(os.path.join(base, "remaining")),
        )

    try:
        for phase in range(start_phase, max_phases + 1):
            if remaining.isEmpty():
                break

            # ---- 1. TRIM singleton SCCs (in-deg 0 or out-deg 0) ----------
            while True:
                rem_src = remaining.select(F.col("id").alias("src_id"))
                rem_dst = remaining.select(F.col("id").alias("dst_id"))
                live = (
                    fwd.join(rem_src, "src_id", "left_semi")
                    .join(rem_dst, "dst_id", "left_semi")
                )
                has_out = live.select(F.col("src_id").alias("id")).distinct()
                has_in = live.select(F.col("dst_id").alias("id")).distinct()
                keep = has_out.join(has_in, "id", "left_semi")
                # materialized once: consumed by the count, the assigned
                # union, and the remaining anti-join below (3x the join
                # pipeline otherwise)
                trivial = remaining.join(keep, "id", "left_anti").localCheckpoint(
                    eager=True
                )
                n_trivial = trivial.count()
                metrics.append({"phase": phase, "stage": "trim", "assigned": n_trivial})
                if n_trivial == 0:
                    break
                assigned = assigned.unionByName(
                    trivial.select("id", F.col("id").alias("comp"))
                ).localCheckpoint(eager=True)
                remaining = remaining.join(trivial, "id", "left_anti").localCheckpoint(
                    eager=True
                )
            if remaining.isEmpty():
                break

            # live edge set of this phase (both endpoints unassigned and
            # non-trivial); phase-invariant across the two fixpoints below
            rem_src = remaining.select(F.col("id").alias("src_id"))
            rem_dst = remaining.select(F.col("id").alias("dst_id"))
            live_fwd = (
                fwd.join(rem_src, "src_id", "left_semi")
                .join(rem_dst, "dst_id", "left_semi")
                .persist()
            )
            live_rev = (
                rev.join(rem_dst.withColumnRenamed("dst_id", "src_id"), "src_id", "left_semi")
                .join(rem_src.withColumnRenamed("src_id", "dst_id"), "dst_id", "left_semi")
                .persist()
            )
            try:
                # ---- 2. COLOR: forward min-propagation to fixpoint -------
                color0 = remaining.select(
                    "id", F.col("id").alias("color"), F.lit(True).alias("changed")
                )

                def color_step(state: DataFrame, iteration: int) -> DataFrame:
                    frontier = state.filter(F.col("changed")).select(
                        F.col("id").alias("src_id"), F.col("color").alias("src_color")
                    )
                    msgs = (
                        live_fwd.join(frontier, "src_id")
                        .groupBy("dst_id")
                        .agg(F.min("src_color").alias("cand"))
                    )
                    return (
                        state.join(msgs, state["id"] == msgs["dst_id"], "left")
                        .select(
                            state["id"],
                            F.least(
                                state["color"],
                                F.coalesce(F.col("cand"), state["color"]),
                            ).alias("color"),
                            (
                                F.coalesce(F.col("cand"), state["color"])
                                < state["color"]
                            ).alias("changed"),
                        )
                    )

                colored = engine.run(
                    color0, color_step, max_iters=max_iters, should_stop=_changed_stop,
                    shuffle_partitions=partitions,
                )
                total_iters += colored.iterations

                # ---- 3. BACKWARD within color classes --------------------
                mark0 = colored.state.select(
                    "id",
                    "color",
                    (F.col("color") == F.col("id")).alias("mark"),
                    (F.col("color") == F.col("id")).alias("changed"),
                )

                def back_step(state: DataFrame, iteration: int) -> DataFrame:
                    frontier = state.filter(F.col("changed")).select(
                        F.col("id").alias("src_id"), F.col("color").alias("fcolor")
                    )
                    # a vertex is newly marked only by a mark of ITS OWN
                    # color — but marks of SEVERAL colors can reach the same
                    # vertex in one superstep (marking stays in-class,
                    # messages do not: an out-neighbor of a different color
                    # still messages us). The combiner must therefore be
                    # per (dst, fcolor) — a plain min over fcolor can drop
                    # the matching color behind a lower foreign one and
                    # permanently split the SCC. distinct() dedups with
                    # map-side combining; the color match then happens in
                    # the join condition itself.
                    msgs = (
                        live_rev.join(frontier, "src_id")
                        .select(
                            F.col("dst_id").alias("m_id"),
                            F.col("fcolor").alias("m_color"),
                        )
                        .distinct()
                    )
                    joined = state.join(
                        msgs,
                        (state["id"] == msgs["m_id"])
                        & (state["color"] == msgs["m_color"]),
                        "left",
                    )
                    newly = ~F.col("mark") & F.col("m_color").isNotNull()
                    return joined.select(
                        state["id"],
                        state["color"],
                        (F.col("mark") | newly).alias("mark"),
                        newly.alias("changed"),
                    )

                marked = engine.run(
                    mark0, back_step, max_iters=max_iters, should_stop=_changed_stop,
                    shuffle_partitions=partitions,
                )
                total_iters += marked.iterations

                done = marked.state.filter(F.col("mark")).select(
                    "id", F.col("color").alias("comp")
                )
                n_done = done.count()
                metrics.append({"phase": phase, "stage": "backward", "assigned": n_done})
                if n_done == 0:  # defensive: roots always mark themselves
                    raise RuntimeError("scc: backward sweep assigned nothing")
                assigned = assigned.unionByName(done).localCheckpoint(eager=True)
                remaining = remaining.join(done, "id", "left_anti").localCheckpoint(
                    eager=True
                )
            finally:
                live_fwd.unpersist()
                live_rev.unpersist()
            if ckpt_dir:
                assigned, remaining = _checkpoint_phase(phase)

        if not remaining.isEmpty():
            raise RuntimeError(
                f"scc did not assign every vertex within max_phases={max_phases}"
            )
        return RunResult(state=assigned, iterations=total_iters, metrics=metrics)
    finally:
        fwd.unpersist()
        rev.unpersist()
