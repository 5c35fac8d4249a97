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
    ap.add_argument(
        "--image-table",
        default=None,
        help="also write the bucketed edge image under this catalog table "
        "name (bucketBy+sortBy on src_id; cold jobs reading it via "
        "build.load_edge_image skip the initial O(E) edge shuffle)",
    )
    args = ap.parse_args()

    from linkgraph.build import build_graph, write_edge_image
    from linkgraph.session import get_spark

    spark = get_spark(app_name="linkgraph-build")
    pages = spark.read.parquet(args.pages)
    g = build_graph(pages, partitions=args.partitions)
    g.edges.write.mode("overwrite").parquet(os.path.join(args.out, "edges"))
    g.vertices.write.mode("overwrite").parquet(os.path.join(args.out, "vertices"))
    if args.image_table:
        write_edge_image(
            g.edges, os.path.join(args.out, "edge_image"), args.image_table,
            args.partitions,
        )
    print(f"graph written to {args.out}")


if __name__ == "__main__":
    main()
