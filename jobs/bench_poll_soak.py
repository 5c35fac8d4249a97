"""Incremental-poll soak: per-poll seconds vs corpus size, splits live.

The poll family's cost claim (O(new rows + touched buckets) maintenance,
warm-started rank — linkgraph/incremental.py) is correctness-fuzzed at
small n; this job measures it as a CURVE: one continuous crawl session of
--polls polls against a single LinkStore-backed state dir, each poll
appending --new-pages fresh pages and re-crawling --recrawl existing ones,
with ``maybe_split(--max-bucket-kb)`` running between polls exactly as the
ops loop would schedule it. Records per poll: wall seconds, corpus size,
new/touched-bucket counts, rank iterations, and any split events.

The flat(ish) per-poll series against a ~linearly growing corpus IS the
measured form of the claim; a naive full-rebuild poll would grow with the
corpus line. Appends a section to BENCH/BASELINE.md.

Usage: python jobs/bench_poll_soak.py [--polls 20] [--new-pages 400]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--polls", type=int, default=20)
    ap.add_argument("--initial-pages", type=int, default=2000)
    ap.add_argument("--new-pages", type=int, default=400)
    ap.add_argument("--recrawl", type=int, default=50)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--max-bucket-kb", type=int, default=512)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--max-iters", type=int, default=60)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    ap.add_argument("--no-md", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from linkgraph.linkstore import LinkStore
    from linkgraph.session import get_spark
    from linkgraph.synth import gen_pages_rows

    spark = get_spark(
        app_name="bench-poll-soak",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from linkgraph.incremental import link_store_rank_poll

    work = tempfile.mkdtemp(prefix="lg_poll_soak_")
    state = os.path.join(work, "state")
    series: list[dict] = []
    try:
        total = 0
        for poll in range(args.polls):
            if poll == 0:
                lo, hi = 0, args.initial_pages
            else:
                lo, hi = total, total + args.new_pages
            total = hi
            # fresh pages [lo, hi) + a deterministic recrawl slice of the
            # existing corpus (re-extracted, same content -> winner-max
            # replay exercises the idempotent path); n_pages context = hi
            # so link targets stay inside the current corpus
            idx = np.arange(lo, hi)
            if poll > 0 and args.recrawl:
                step = max(1, lo // args.recrawl)
                idx = np.concatenate([idx, np.arange(0, lo, step)[: args.recrawl]])
            pdf = gen_pages_rows(idx, hi)
            # ONE staging dir, appended per poll: the ingest is a streaming
            # FileStreamSource whose checkpoint tracks processed files — a
            # per-poll path would flip its basePath (the incremental tests'
            # staging convention)
            stage = os.path.join(work, "pages")
            spark.createDataFrame(pdf).coalesce(4).write.mode(
                "overwrite" if poll == 0 else "append"
            ).parquet(stage)

            t0 = time.monotonic()
            m = link_store_rank_poll(
                spark, stage, state,
                eps=args.eps, max_iters=args.max_iters,
                buckets=args.buckets,
            )
            wall = round(time.monotonic() - t0, 3)
            store = LinkStore.open_or_create(spark, f"{state}/links")
            split = store.maybe_split(args.max_bucket_kb * 1024)
            series.append({
                "poll": poll,
                "corpus_pages": total,
                "wall_sec": wall,
                "new_rows": m.get("new_rows"),
                "touched_buckets": m.get("touched_buckets"),
                "iterations": m.get("iterations"),
                "warm": bool(m.get("warm_started")),
                "buckets": split["buckets"],
                "split": bool(split.get("split")),
            })
            print(json.dumps(series[-1]), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out = {
        "polls": args.polls,
        "initial_pages": args.initial_pages,
        "new_pages": args.new_pages,
        "recrawl": args.recrawl,
        "series": series,
    }
    print(json.dumps(out))

    if not args.no_md:
        lines = [
            "",
            "## Incremental-poll soak at bench scale (round 6, r5 item #7)",
            "",
            f"One continuous session: {args.polls} polls against one LinkStore",
            f"state dir, poll 0 seeds {args.initial_pages} pages, each later poll",
            f"appends {args.new_pages} new pages and re-crawls {args.recrawl}",
            f"existing ones; `maybe_split({args.max_bucket_kb} KB)` runs between",
            f"polls (ops-loop schedule). Rank warm-starts from the previous",
            f"poll's state (eps={args.eps}).",
            "",
            "| poll | corpus pages | wall s | new rows | touched buckets | rank iters | buckets (split?) |",
            "| --- | --- | --- | --- | --- | --- | --- |",
        ]
        for s in series:
            lines.append(
                f"| {s['poll']} | {s['corpus_pages']:,} | {s['wall_sec']} | "
                f"{s['new_rows']} | {s['touched_buckets']} | {s['iterations']} | "
                f"{s['buckets']}{' (split)' if s['split'] else ''} |"
            )
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")
        print(f"appended soak section to {args.out}")


if __name__ == "__main__":
    main()
