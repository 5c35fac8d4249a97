"""Sem-kernel per-superstep breakdown: state-shuffle vs Arrow vs numpy.

Produces the numbers in BENCH/BASELINE.md's "Sem kernel per-superstep
breakdown" section. Times (5 reps, median) at one parallelism level:

  route : routed-state shuffle only (groupBy part + scalar agg) — the
          per-superstep Exchange of O(V) vertex-state rows
  arrow : applyInPandas with a NO-OP kernel over the routed state —
          route + Arrow serialize/deserialize + Python worker dispatch
          (edge-block cache untouched)
  spmv  : the real sem kernel (worker-cached parquet edge blocks + numpy
          gather/bincount), combine collapsed to a scalar
  step  : full superstep (spmv + message combine + apply join +
          localCheckpoint) — what the scaling bench times

Usage: SPARK_GRAFT_CPUS=32 python jobs/diag_sem.py [--partitions 32]
       [--vertices 1000000] [--edges 50000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=50_000_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from linkgraph.algos.pagerank import (
        _initial_state,
        _make_sem_step,
        _route_state,
        _routed_edges,
        _sem_spmv_factory,
    )
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    parts = args.partitions
    spark = get_spark(app_name=f"semdiag-{cpus}", shuffle_partitions=parts,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    edges = (
        gen_bench_edges(spark, args.vertices, args.edges)
        .select("src_id", "dst_id")
        .repartition(parts, "src_id")
        .persist()
    )
    n_edges = edges.count()
    state = (
        _initial_state(edges, None, 0.85)
        .withColumn("prev_rank", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    layout_dir = tempfile.mkdtemp(prefix="semdiag_")
    step = _make_sem_step(spark, edges, 0.85, parts, 10_000, layout_dir)

    edges_parts, hubs, n_hubs = _routed_edges(edges, parts, 10_000)
    parts_df = spark.range(parts).select(F.col("id").cast("int").alias("part"))
    contribs = state.filter(F.col("out_deg") > 0).select(
        "id", (F.col("rank") / F.col("out_deg")).alias("contrib")
    )
    routed = _route_state(contribs, hubs, n_hubs, parts_df, parts)

    def noop(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"dst_id": pdf["id"].head(0), "contrib": pdf["contrib"].head(0)}
        )

    edge_parts = frozenset(
        r["part"]
        for r in spark.read.parquet(layout_dir).select("part").distinct().collect()
    )
    real_kernel = _sem_spmv_factory(0.85, 999_999, layout_dir, edge_parts)
    spmv_df = routed.groupBy("part").applyInPandas(
        real_kernel, schema="dst_id long, contrib double"
    )

    jobs = {
        "route": lambda: routed.groupBy("part")
        .agg(F.count(F.lit(1)))
        .agg(F.sum("count(1)"))
        .collect(),
        "arrow": lambda: routed.groupBy("part")
        .applyInPandas(noop, schema="dst_id long, contrib double")
        .agg(F.count(F.lit(1)))
        .collect(),
        "spmv": lambda: spmv_df.agg(F.sum("contrib")).collect(),
        "step": lambda: step(state, 1).localCheckpoint(eager=True),
    }

    for fn in jobs.values():  # warmup (codegen, block-cache build)
        fn()

    res: dict = {"cpus": cpus, "partitions": parts, "n_edges": n_edges, "n_hubs": n_hubs}
    for name, fn in jobs.items():
        times = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            fn()
            times.append(round(time.monotonic() - t0, 3))
        res[name] = times
        res[name + "_med"] = sorted(times)[len(times) // 2]
    print(json.dumps(res))

    shutil.rmtree(layout_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
