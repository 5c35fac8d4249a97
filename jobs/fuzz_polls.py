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
each loop's committed product is compared against a from-scratch batch
recompute over the store's current pairs:

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

EPS = 1e-9
PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _html(links: list[str]) -> bytes:
    body = "".join(f'<a href="{u}">l</a>' for u in links)
    return f"<html><body>{body}</body></html>".encode()


def random_batch(rng, spark, poll_no: int, known_urls: list[str], next_idx: int):
    """One random crawl batch; returns (DataFrame, next_idx)."""
    from linkgraph.synth import page_url

    rows = []
    ts0 = dt.datetime(2024, 6, 1 + poll_no, 12, 0, 0)
    # growth: 2-5 new pages, each linking 1-3 random known urls (plus
    # occasionally a never-seen url — a dangling target)
    for _ in range(int(rng.integers(2, 6))):
        u = page_url(next_idx)
        next_idx += 1
        k = int(rng.integers(1, 4))
        targets = list(rng.choice(known_urls, size=min(k, len(known_urls)), replace=False))
        if rng.random() < 0.3:
            targets.append(page_url(next_idx + 1000))  # dangling
        rows.append((u, ts0 + dt.timedelta(seconds=len(rows)), _html(targets), "", "en"))
        known_urls.append(u)
    # replacement: with p=0.5, re-crawl 1-2 existing pages with a fresh
    # random outlink set (gains AND losses relative to whatever they had)
    if rng.random() < 0.5 and known_urls:
        for _ in range(int(rng.integers(1, 3))):
            u = str(rng.choice(known_urls))
            k = int(rng.integers(1, 4))
            targets = [t for t in rng.choice(known_urls, size=min(k, len(known_urls)), replace=False) if t != u]
            rows.append((u, ts0 + dt.timedelta(minutes=5, seconds=len(rows)), _html(targets), "", "en"))
    # kill: with p=0.3, tombstone one existing page
    if rng.random() < 0.3 and known_urls:
        u = str(rng.choice(known_urls))
        rows.append((u, ts0 + dt.timedelta(minutes=10, seconds=len(rows)), _html([]), "", "en"))
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

    from pyspark.sql import functions as F

    from linkgraph.algos import pagerank, triangle_counts, wcc
    from linkgraph.build import pairs_to_edges
    from linkgraph.hostgraph import host_pagerank
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

                # ---- rank loop: converged ranks == batch pagerank (same
                # dict ids, same vertex set — the fixpoint is unique)
                link_store_rank_poll(
                    spark, stage, states["rank"], eps=EPS, max_iters=300,
                    partitions=8, buckets=8,
                )
                store = LinkStore(spark, f"{states['rank']}/links", buckets=None)
                d = spark.read.parquet(f"{states['rank']}/dict")
                edges = pairs_to_edges(store.current_pairs(), d)
                want = pagerank(
                    spark, edges, vertices=d.select("id"), eps=EPS, max_iters=300,
                    partitions=8,
                ).state.select("id", F.col("rank").alias("w"))
                got = spark.read.parquet(f"{states['rank']}/ranks")
                both = got.join(want, "id").toPandas()
                ok = len(both) == got.count() > 0 and np.allclose(
                    both["rank"].to_numpy(), both["w"].to_numpy(), rtol=0, atol=100 * EPS
                )
                check(seed, poll_no, "rank", ok)

                # ---- components loop: labels == batch wcc, by url
                link_store_components_poll(
                    spark, stage, states["comps"], max_iters=300, partitions=8, buckets=8
                )
                store = LinkStore(spark, f"{states['comps']}/links", buckets=None)
                d = spark.read.parquet(f"{states['comps']}/dict")
                edges = pairs_to_edges(store.current_pairs(), d)

                def by_url(labels):
                    return (
                        labels.join(d, "id")
                        .select(F.col("url").alias("u"), "comp")
                        .join(
                            d.select(F.col("id").alias("comp"), F.col("url").alias("cu")),
                            "comp",
                        )
                        .select("u", "cu")
                    )

                want_s = {(r["u"], r["cu"]) for r in by_url(wcc(spark, edges, partitions=8).state.select("id", "comp")).collect()}
                got_s = {(r["u"], r["cu"]) for r in by_url(spark.read.parquet(f"{states['comps']}/comps")).collect()}
                check(seed, poll_no, "comps", got_s == want_s and len(got_s) > 0)

                # ---- triangles loop: counts == batch triangle_counts, by url
                link_store_triangles_poll(
                    spark, stage, states["tri"], partitions=8, buckets=8
                )
                store = LinkStore(spark, f"{states['tri']}/links", buckets=None)
                d = spark.read.parquet(f"{states['tri']}/dict")
                edges = pairs_to_edges(store.current_pairs(), d)
                want_t = {
                    r["url"]: r["tri"]
                    for r in triangle_counts(spark, edges).join(d, "id").collect()
                }
                got_t = {
                    r["url"]: r["tri"]
                    for r in spark.read.parquet(f"{states['tri']}/tri").join(d, "id").collect()
                }
                check(seed, poll_no, "tri", got_t == want_t and len(got_t) > 0)

                # ---- host loop: host ranks == batch host_pagerank
                host_store_rank_poll(
                    spark, stage, states["host"], eps=EPS, max_iters=300,
                    partitions=8, buckets=8,
                )
                store = LinkStore(spark, f"{states['host']}/links", buckets=None)
                want_h = {
                    r["host"]: r["rank"]
                    for r in host_pagerank(
                        spark, store.current_pairs(), src_col="src_url",
                        dst_col="dst_url", eps=EPS, max_iters=300, partitions=8,
                    ).collect()
                }
                hd = spark.read.parquet(f"{states['host']}/hostdict")
                got_h = {
                    r["url"]: r["rank"]
                    for r in spark.read.parquet(f"{states['host']}/host_ranks")
                    .join(hd, "id")
                    .collect()
                }
                # the poll ranks over the STABLE host dictionary, so its
                # state is a superset of the batch reference: a host whose
                # last cross-host edge a tombstone/re-crawl removed stays
                # in the dict as an isolated vertex and must sit exactly at
                # the dangling fixpoint 1-d; live hosts must match batch.
                from linkgraph.conventions import PR_DAMPING

                stale = {h: r for h, r in got_h.items() if h not in want_h}
                ok = (
                    set(want_h) <= set(got_h)
                    and len(want_h) > 0
                    and all(abs(got_h[h] - want_h[h]) <= 100 * EPS for h in want_h)
                    and all(abs(r - (1.0 - PR_DAMPING)) <= 100 * EPS for r in stale.values())
                )
                check(
                    seed, poll_no, "host", ok,
                    detail="" if ok else f"stale={stale} missing={set(want_h)-set(got_h)}",
                )
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"seeds": args.seeds, "polls": args.polls, "n0": args.n0, "splits": splits, "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
