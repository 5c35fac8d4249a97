"""Cluster job: pages table -> graph (edge + vertex tables).

    spark-submit --py-files linkgraph.zip jobs/run_build.py \
        --pages /data/pages --out /data/graph --partitions 4096
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=256)
    args = ap.parse_args()

    from linkgraph.build import build_graph
    from linkgraph.session import get_spark

    spark = get_spark(app_name="linkgraph-build")
    pages = spark.read.parquet(args.pages)
    g = build_graph(pages, partitions=args.partitions)
    g.edges.write.mode("overwrite").parquet(os.path.join(args.out, "edges"))
    g.vertices.write.mode("overwrite").parquet(os.path.join(args.out, "vertices"))
    print(f"graph written to {args.out}")


if __name__ == "__main__":
    main()
