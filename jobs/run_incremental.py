"""Continuous crawl → incremental re-rank driver (spark-submit friendly).

Each poll ingests any NEW page parquet files from --pages (streaming
availableNow with a durable source checkpoint — already-seen files are
skipped), refreshes the latest-crawl edge view, and re-ranks warm-started
from the previous poll's converged ranks. State (pair log, stable url→id
dictionary, ranks, stream checkpoint) lives under --state and survives
restarts.

    spark-submit --py-files linkgraph.zip jobs/run_incremental.py \
        --pages /data/warc_pages --state /data/rank_state \
        --polls 0 --interval 60      # 0 = poll forever

One JSON line per poll on stdout (urls, edges, iterations, seconds).
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
    ap.add_argument("--pages", required=True, help="directory of page parquet files")
    ap.add_argument("--state", required=True, help="state directory (any Hadoop-FS path)")
    ap.add_argument("--polls", type=int, default=1, help="number of polls; 0 = forever")
    ap.add_argument("--interval", type=float, default=60.0, help="seconds between polls")
    ap.add_argument("--eps", type=float, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument(
        "--link-store-buckets",
        type=int,
        default=0,
        help="0 = full-pairlog poll (view recomputed from all history); "
        ">0 = LinkStore poll with this CREATION bucket count (latest view "
        "maintained incrementally — O(new + touched buckets) per poll, the "
        "web-scale steady-state form). An existing store keeps its on-disk "
        "count, so a maybe_split() grown store reopens seamlessly",
    )
    ap.add_argument(
        "--host-rank",
        action="store_true",
        help="maintain the HOST-level roll-up + weighted host rank instead "
        "of the page rank (the A11 derived product, steady-state form: "
        "LinkStore merge + HostAgg touched-bucket partial refresh + "
        "warm-started weighted rank). Requires --link-store-buckets > 0.",
    )
    ap.add_argument(
        "--product",
        choices=["rank", "components", "triangles"],
        default="rank",
        help="which steady-state product the poll maintains (components/"
        "triangles are LinkStore-backed: warm/delta paths gated on the "
        "store's grow-only evidence + committed watermark; require "
        "--link-store-buckets > 0)",
    )
    args = ap.parse_args()
    if args.host_rank and args.link_store_buckets <= 0:
        ap.error("--host-rank requires --link-store-buckets > 0 (it is "
                 "LinkStore-backed by construction)")
    if args.product != "rank" and args.link_store_buckets <= 0:
        ap.error("--product components/triangles requires "
                 "--link-store-buckets > 0 (LinkStore-backed by construction)")
    if args.host_rank and args.product != "rank":
        ap.error("--host-rank and --product are mutually exclusive")

    from linkgraph.conventions import PR_EPS, PR_MAX_ITERS
    from linkgraph.incremental import (
        host_store_rank_poll,
        incremental_rank_poll,
        link_store_components_poll,
        link_store_rank_poll,
        link_store_triangles_poll,
    )
    from linkgraph.session import get_spark

    spark = get_spark(app_name="linkgraph-incremental")
    spark.sparkContext.setLogLevel("ERROR")

    kwargs = dict(
        eps=PR_EPS if args.eps is None else args.eps,
        max_iters=PR_MAX_ITERS if args.iters is None else args.iters,
        partitions=args.partitions,
    )
    poll = 0
    while True:
        poll += 1
        if args.host_rank:
            row = host_store_rank_poll(
                spark, args.pages, args.state,
                buckets=args.link_store_buckets, **kwargs,
            )
        elif args.product == "components":
            # --iters unset: let the poll's own default (200 WCC rounds)
            # apply — PR_MAX_ITERS is the RANK kernel's budget, and
            # silently halving the component-propagation budget makes
            # long-diameter graphs exhaust every poll without converging
            # (each committed non-converged, each next poll a cold start)
            comp_kw = {} if args.iters is None else {"max_iters": args.iters}
            row = link_store_components_poll(
                spark, args.pages, args.state,
                partitions=args.partitions,
                buckets=args.link_store_buckets, **comp_kw,
            )
        elif args.product == "triangles":
            row = link_store_triangles_poll(
                spark, args.pages, args.state,
                partitions=args.partitions, buckets=args.link_store_buckets,
            )
        elif args.link_store_buckets > 0:
            row = link_store_rank_poll(
                spark, args.pages, args.state,
                buckets=args.link_store_buckets, **kwargs,
            )
        else:
            row = incremental_rank_poll(spark, args.pages, args.state, **kwargs)
        print(json.dumps({"poll": poll, **row}), flush=True)
        if args.polls and poll >= args.polls:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
