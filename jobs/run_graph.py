"""Cluster job: any vertex program over an edge table (spark-submit).

    spark-submit --py-files linkgraph.zip jobs/run_graph.py \
        --algo wcc --edges /data/edges --out /data/comps [--ckpt /data/ckpt]

Algorithms: wcc, wcc_star, lp, triangles, bfs (--sources), kcore (--k),
hits (--iters), truss (--k), scc, betweenness (--sources = pivot sample).
PageRank has its own richer entry point (jobs/run_pagerank.py).
--edges accepts a parquet path or a bucketed edge image as table:NAME.
Build linkgraph.zip with: python tools/package.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True,
                    choices=["wcc", "wcc_star", "lp", "triangles", "bfs", "kcore",
                             "hits", "truss", "scc", "betweenness"])
    ap.add_argument("--edges", required=True,
                    help="parquet path (src_id, dst_id) or table:NAME edge image")
    ap.add_argument("--vertices", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--sources", default=None, help="comma-separated vertex ids (bfs)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from linkgraph.algos import (
        betweenness,
        bfs,
        hits,
        kcore,
        label_propagation,
        scc,
        triangle_counts,
        wcc,
        wcc_star,
    )
    from linkgraph.algos.hits import normalized_scores
    from linkgraph.algos.truss import TRUSS_K, truss
    from linkgraph.engine import SuperstepEngine
    from linkgraph.session import get_spark

    spark = get_spark(app_name=f"linkgraph-{args.algo}")
    if args.edges.startswith("table:"):
        from linkgraph.build import load_edge_image

        edges = load_edge_image(spark, args.edges[len("table:"):])
    else:
        edges = spark.read.parquet(args.edges)
    vertices = spark.read.parquet(args.vertices) if args.vertices else None
    engine = SuperstepEngine(spark, ckpt_dir=args.ckpt) if args.ckpt else None
    common = dict(vertices=vertices, engine=engine, resume=args.resume)

    if args.algo == "wcc":
        res = wcc(spark, edges, partitions=args.partitions, **common)
        out = res.state.select("id", "comp")
    elif args.algo == "wcc_star":
        res = wcc_star(spark, edges, **common)
        out = res.state.select("id", "comp")
    elif args.algo == "lp":
        res = label_propagation(
            spark, edges, partitions=args.partitions,
            **({"iters": args.iters} if args.iters else {}), **common,
        )
        out = res.state.select("id", "label")
    elif args.algo == "triangles":
        res = None
        out = triangle_counts(spark, edges, vertices=vertices)
    elif args.algo == "bfs":
        sources = [int(s) for s in (args.sources or "0").split(",")]
        res = bfs(spark, edges, sources=sources, partitions=args.partitions, **common)
        out = res.state.select("id", "dist")
    elif args.algo == "kcore":
        res = kcore(spark, edges, k=args.k or 3, partitions=args.partitions, **common)
        out = res.state.select("id", "deg", "active", "k")
    elif args.algo == "hits":
        res = hits(
            spark, edges, partitions=args.partitions,
            **({"iters": args.iters} if args.iters else {}), **common,
        )
        out = normalized_scores(res.state)
    elif args.algo == "scc":
        res = scc(spark, edges, vertices=vertices, partitions=args.partitions,
                  ckpt_dir=args.ckpt, resume=args.resume)
        out = res.state.select("id", "comp")
    elif args.algo == "betweenness":
        if not args.sources:
            raise SystemExit("betweenness needs --sources (comma-separated pivot ids)")
        if args.ckpt or args.resume:
            raise SystemExit("betweenness does not support --ckpt/--resume "
                             "(two-sweep loop; see linkgraph/algos/betweenness.py)")
        pivots = [int(s) for s in args.sources.split(",")]
        res = betweenness(spark, edges, pivots=pivots, vertices=vertices,
                          partitions=args.partitions)
        out = res.state.select("id", "bc")
    else:  # truss
        res = truss(spark, edges, k=args.k or TRUSS_K,
                    engine=engine, resume=args.resume)
        out = res.state.select("a", "b")

    out.write.mode("overwrite").parquet(args.out)
    iters = f"{res.iterations} supersteps -> " if res is not None else ""
    print(f"{args.algo}: {iters}{args.out}")


if __name__ == "__main__":
    main()
