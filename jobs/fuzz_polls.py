"""Randomized multi-poll crawl simulation over the steady-state loops.

The pytest suite drives each incremental poll loop through one scripted
3-poll history (cold → grow-only → re-crawl) with hand-placed link
structure. This job stresses the same protocols with RANDOM crawl
histories: per seed, a sequence of polls where each batch is a random mix
of

  - brand-new pages linking to randomly-chosen known urls (growth —
    exercises the warm/delta fast paths and the stable-dictionary extend),
  - re-crawls of random existing pages whose outlink set randomly gains
    and/or loses links (replacement — the winner rule and the grow-only
    gate must force cold paths),
  - tombstone kills (a re-crawl with zero links — retained-tombstone
    semantics must erase the page's edges from every product).

All four steady-state loops run side by side on the same growing pages
directory (each with its own state dir / LinkStore), and after EVERY poll
each loop is checked against the shared per-poll contract defined ONCE in
``jobs/_fuzz_common.py`` (the same contract the crash sweep enforces):
the store's latest view must equal the ground truth derived straight from
the pages directory, and the committed product must equal a from-scratch
batch recompute over the store's current pairs:

  - link_store_rank_poll        ranks ≡ batch pagerank     (atol 100·eps)
  - link_store_components_poll  labels ≡ batch wcc         (exact, by url)
  - link_store_triangles_poll   counts ≡ batch triangles   (exact, by url)
  - host_store_rank_poll        host ranks ≡ batch host_pagerank (atol)

Opt-in (not part of the default suite — minutes per seed):

    python jobs/fuzz_polls.py --seeds 4 --polls 4 --n0 50

Prints one JSON line per (seed, poll, loop); exits nonzero on mismatch.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _fuzz_common import PAGE_SCHEMA, html_doc, verify_poll  # noqa: E402

EPS = 1e-9


def random_batch(rng, spark, poll_no: int, known_urls: list[str], next_idx: int):
    """One random crawl batch; returns (DataFrame, next_idx)."""
    from linkgraph.synth import page_url

    rows = []
    # timedelta from a fixed base, NOT day=1+poll_no: the latter overflows
    # June's 30 days and crashes any --polls >= 30 run mid-sweep
    ts0 = dt.datetime(2024, 6, 1, 12, 0, 0) + dt.timedelta(days=poll_no)
    # growth: 2-5 new pages, each linking 1-3 random known urls (plus
    # occasionally a never-seen url — a dangling target)
    for _ in range(int(rng.integers(2, 6))):
        u = page_url(next_idx)
        next_idx += 1
        k = int(rng.integers(1, 4))
        targets = list(rng.choice(known_urls, size=min(k, len(known_urls)), replace=False))
        if rng.random() < 0.3:
            targets.append(page_url(next_idx + 1000))  # dangling
        rows.append((u, ts0 + dt.timedelta(seconds=len(rows)), html_doc(targets), "", "en"))
        known_urls.append(u)
    # replacement: with p=0.5, re-crawl 1-2 existing pages with a fresh
    # random outlink set (gains AND losses relative to whatever they had)
    if rng.random() < 0.5 and known_urls:
        for _ in range(int(rng.integers(1, 3))):
            u = str(rng.choice(known_urls))
            k = int(rng.integers(1, 4))
            targets = [t for t in rng.choice(known_urls, size=min(k, len(known_urls)), replace=False) if t != u]
            rows.append((u, ts0 + dt.timedelta(minutes=5, seconds=len(rows)), html_doc(targets), "", "en"))
    # kill: with p=0.3, tombstone one existing page
    if rng.random() < 0.3 and known_urls:
        u = str(rng.choice(known_urls))
        rows.append((u, ts0 + dt.timedelta(minutes=10, seconds=len(rows)), html_doc([]), "", "en"))
    return spark.createDataFrame(rows, PAGE_SCHEMA), next_idx


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument(
        "--seed0", type=int, default=1,
        help="first seed (sweep covers seed0..seed0+seeds-1; lets a later "
        "run extend an already-recorded sweep with fresh seeds only)",
    )
    ap.add_argument("--polls", type=int, default=4)
    ap.add_argument("--n0", type=int, default=50)
    args = ap.parse_args()

    from linkgraph.incremental import (
        host_store_rank_poll,
        link_store_components_poll,
        link_store_rank_poll,
        link_store_triangles_poll,
    )
    from linkgraph.linkstore import LinkStore
    from linkgraph.session import get_spark
    from linkgraph.synth import gen_pages

    spark = get_spark(app_name="fuzz-polls", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    splits = 0

    def check(seed, poll, loop, ok, detail=""):
        nonlocal failures
        if not ok:
            failures += 1
        print(json.dumps({"seed": seed, "poll": poll, "loop": loop, "ok": bool(ok), "detail": detail}))

    for seed in range(args.seed0, args.seed0 + args.seeds):
        rng = np.random.default_rng(seed)
        work = tempfile.mkdtemp(prefix=f"fuzz_polls_s{seed}_")
        stage = f"{work}/pages"
        states = {k: f"{work}/state_{k}" for k in ("rank", "comps", "tri", "host")}
        try:
            pages0 = gen_pages(spark, args.n0)
            known = [r["url"] for r in pages0.select("url").collect()]
            pages0.coalesce(1).write.mode("overwrite").parquet(stage)
            next_idx = 10_000 * seed

            for poll_no in range(1, args.polls + 1):
                if poll_no > 1:
                    batch, next_idx = random_batch(rng, spark, poll_no, known, next_idx)
                    batch.coalesce(1).write.mode("append").parquet(stage)
                    # ops-loop store maintenance interleaved at random: a
                    # split must be invisible to every poll product — it
                    # preserves merged_through (warm/delta gates stay
                    # valid), polls adopt the new count via open_or_create,
                    # and HostAgg detects the bucket-count change in its
                    # meta and rebuilds its partials rather than serving
                    # stale per-bucket roll-ups. Poll 2 always splits (so
                    # every seed exercises the path at least once); later
                    # polls split on the dice, compounding 8->16->32->64.
                    if poll_no == 2 or rng.random() < 0.3:
                        for st in states.values():
                            s = LinkStore.open_or_create(spark, f"{st}/links", buckets=8)
                            if s.merged_through() >= 0 and s.buckets < 64:
                                s.split(2)
                                splits += 1
                        print(json.dumps({"seed": seed, "poll": poll_no, "event": "split", "total_splits": splits}))

                # every loop: run the poll, then enforce the shared
                # per-poll contract (store == pages ground truth; product
                # == from-scratch batch recompute) from jobs/_fuzz_common —
                # ONE definition shared with the crash sweep, so the two
                # harnesses cannot drift apart.
                link_store_rank_poll(
                    spark, stage, states["rank"], eps=EPS, max_iters=300,
                    partitions=8, buckets=8,
                )
                ok, detail = verify_poll(spark, "rank", stage, states["rank"], EPS)
                check(seed, poll_no, "rank", ok, detail)

                link_store_components_poll(
                    spark, stage, states["comps"], max_iters=300, partitions=8, buckets=8
                )
                ok, detail = verify_poll(spark, "comps", stage, states["comps"], EPS)
                check(seed, poll_no, "comps", ok, detail)

                link_store_triangles_poll(
                    spark, stage, states["tri"], partitions=8, buckets=8
                )
                ok, detail = verify_poll(spark, "tri", stage, states["tri"], EPS)
                check(seed, poll_no, "tri", ok, detail)

                host_store_rank_poll(
                    spark, stage, states["host"], eps=EPS, max_iters=300,
                    partitions=8, buckets=8,
                )
                ok, detail = verify_poll(spark, "host", stage, states["host"], EPS)
                check(seed, poll_no, "host", ok, detail)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"seeds": args.seeds, "polls": args.polls, "n0": args.n0, "splits": splits, "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
