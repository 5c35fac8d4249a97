"""Skew stress benchmark: hub-heavy graph, mitigation ON vs OFF.

Graph: both endpoints power-law-skewed (src AND dst hubs), so both skew
paths matter: the reduce-side dst hot key (salted aggregation) and the
giant src edge list (vertex-cut splitting in the CSR kernel).

Appends a section to BENCH/BASELINE.md.

Usage: python jobs/bench_skew.py [--vertices 1000000] [--edges 20000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--skew", type=float, default=4.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph.algos import pagerank
    from linkgraph.benchgen import _uniform
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="bench-skew",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_v, n_e, s = args.vertices, args.edges, args.skew
    base = spark.range(0, n_e, numPartitions=64)
    edges = (
        base.select(
            F.floor(F.pow(_uniform(F.col("id"), 11), F.lit(s)) * n_v).cast("long").alias("src_id"),
            F.floor(F.pow(_uniform(F.col("id"), 12), F.lit(s)) * n_v).cast("long").alias("dst_id"),
        )
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .persist()
    )
    n_edges = edges.count()
    top = edges.groupBy("src_id").count().orderBy(F.desc("count")).limit(1).first()
    print(f"edges={n_edges}, max out-degree={top['count']} (src {top['src_id']})", flush=True)

    def steady(res):
        # min of post-warmup supersteps (noise floor under bursty
        # hypervisor CPU-steal — see BENCH/BASELINE.md protocol note)
        per = [m["seconds"] for m in res.metrics]
        tail = per[2:] if len(per) > 3 else per
        return min(tail)

    results = {}
    for name, kwargs in [
        ("sql_plain", {"kernel": "sql", "salted": False}),
        ("sql_salted", {"kernel": "sql", "salted": True}),
        ("csr_no_cut", {"kernel": "csr", "hub_threshold": 1 << 60}),
        ("csr_vertex_cut", {"kernel": "csr", "hub_threshold": 10_000}),
    ]:
        res = pagerank(spark, edges, max_iters=args.iters, eps=0.0, partitions=64, **kwargs)
        results[name] = {
            "steady_sec_per_iter": round(steady(res), 3),
            "per_iter": [round(m["seconds"], 2) for m in res.metrics],
        }
        print(f"{name}: {results[name]}", flush=True)

    section = [
        "",
        "## Skew stress (hub-heavy graph, mitigation ON vs OFF)",
        "",
        f"Graph: |V|={n_v:,}, |E|={n_edges:,}, src+dst skew exponent {s} "
        f"(max out-degree {top['count']:,}); PageRank {args.iters} supersteps, local[32].",
        "",
        "| variant | steady sec/superstep | per-iteration sec |",
        "| --- | --- | --- |",
    ]
    for name, r in results.items():
        section.append(
            f"| {name} | {r['steady_sec_per_iter']} | {r['per_iter']} |"
        )
    section += [
        "",
        "```json",
        json.dumps({"skew_bench": {"vertices": n_v, "edges": n_edges, **results}}),
        "```",
        "",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(section))
    print(f"appended skew section to {args.out}")


if __name__ == "__main__":
    main()
