"""Single-configuration PageRank benchmark worker.

Run under a fixed parallelism (the scaling harness launches this twice):

    SPARK_GRAFT_CPUS=8 python jobs/bench_pagerank.py --vertices 1000000 \
        --edges 10000000 --iters 5 --kernel sql

Prints one JSON line with per-iteration seconds and derived throughput
(edges traversed/sec, iterations/hour). Packaged the spark-submit way:
``spark-submit --py-files linkgraph.zip jobs/bench_pagerank.py ...`` works
identically (SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--kernel", choices=["sql", "csr", "sem"], default="sql")
    ap.add_argument("--salted", action="store_true")
    ap.add_argument("--partitions", type=int, default=0, help="csr kernel parts")
    args = ap.parse_args()

    from linkgraph.algos import pagerank
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"bench-pagerank-{cpus}",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = gen_bench_edges(spark, args.vertices, args.edges).persist()
    n_edges = edges.count()  # materialize before timing

    t0 = time.monotonic()
    res = pagerank(
        spark,
        edges,
        max_iters=args.iters,
        eps=0.0,
        kernel=args.kernel,
        salted=args.salted,
        partitions=args.partitions or 2 * cpus,
    )
    total = time.monotonic() - t0
    per_iter = [m["seconds"] for m in res.metrics]
    # steady-state = MINIMUM after dropping two warmup iterations
    # (JIT/codegen/persist materialization). The sandbox VM shows bursty
    # hypervisor CPU-steal stalls of 10-50 s that land on random supersteps
    # (see BENCH/BASELINE.md); every superstep does identical work, so the
    # minimum is the noise-floor estimate of true per-superstep cost — the
    # same rationale as timeit's min-of-repeats.
    steady = sorted(per_iter[2:]) if len(per_iter) > 3 else sorted(per_iter)
    sec_per_iter = steady[0]
    print(
        json.dumps(
            {
                "cpus": cpus,
                "kernel": args.kernel,
                "n_vertices": args.vertices,
                "n_edges": n_edges,
                "iters": args.iters,
                "total_sec": round(total, 3),
                "per_iter_sec": [round(s, 3) for s in per_iter],
                "steady_sec_per_iter": round(sec_per_iter, 3),
                "edges_per_sec": round(n_edges / sec_per_iter, 1),
                "iters_per_hour": round(3600.0 / sec_per_iter, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
