"""Systematic crash-injection sweep over the poll/store protocols.

The pytest suite proves recovery at HAND-PICKED crash windows (merge →
dict commit, meta delete → rename, mid-bucket-swap, mid-split). This job
removes the hand-picking: it arms a fault injector that raises at the
k-th FILESYSTEM MUTATION (fs_rename / fs_delete / fs_write_text /
fs_mkdirs — the primitives every commit protocol in the repo is built
from), sweeps k = 1, 2, 3, … until k exceeds the LARGEST mutation count any
poll in the history was observed to perform (counts vary per random
batch, so recovery replays run count-only instrumented and feed that
bound too), and after every injected "driver death" runs the recovery
replay and verifies BOTH:

  - the committed product equals a from-scratch batch recompute over the
    store's current pairs (rank / components / triangles / host loops),
  - the store's latest view equals the INDEPENDENT ground truth derived
    straight from the pages directory (latest_snapshot → extract links),
    so a store corrupted in a way the product check can't see (it reads
    through the store) still fails loudly.

Every crash point up to the maximum observed poll mutation count is
therefore exercised — including the ones nobody thought to name. A second phase sweeps the injector
through ``LinkStore.split`` and checks the roll-forward recovery.

Opt-in (minutes per flavor):

    python jobs/fuzz_crash.py --flavors rank,comps,tri,host --n0 30

Prints one JSON line per injected crash point; exits nonzero on mismatch.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _fuzz_common import PAGE_SCHEMA, html_doc, store_matches_pages, verify_poll  # noqa: E402

EPS = 1e-8
_MUTATORS = ("fs_rename", "fs_delete", "fs_write_text", "fs_mkdirs")


class InjectedCrash(Exception):
    """Stands in for a driver death at an arbitrary protocol step."""


class Injector:
    """Patch the repo's fs mutation helpers (in linkgraph.engine AND in
    linkgraph.linkstore, which from-imports them at module top) to raise
    InjectedCrash on the k-th call. Read helpers stay untouched — a crash
    never corrupts a read."""

    def __init__(self):
        import linkgraph.engine as eng
        import linkgraph.linkstore as ls

        self._mods = (eng, ls)
        self._orig = {m: {n: getattr(m, n) for n in _MUTATORS if hasattr(m, n)} for m in self._mods}
        self._k = None
        self._n = 0

    def arm(self, k: int | None) -> None:
        """k-th mutation raises; k=None counts mutations without raising
        (used on recovery replays so a crashed poll's FULL mutation count
        still feeds the sweep's termination bound)."""
        self._k, self._n = k, 0
        import linkgraph.engine as eng

        def wrap(fn):
            def inner(*a, **kw):
                self._n += 1
                if self._k is not None and self._n == self._k:
                    raise InjectedCrash(f"{fn.__name__} call #{self._k}")
                return fn(*a, **kw)

            return inner

        for name in _MUTATORS:
            w = wrap(self._orig[eng][name])
            for m in self._mods:
                if name in self._orig[m]:
                    setattr(m, name, w)

    def disarm(self) -> int:
        for m in self._mods:
            for name, fn in self._orig[m].items():
                setattr(m, name, fn)
        return self._n


def small_batch(rng, spark, round_no: int, known: list[str], next_idx: int):
    """One new page linking two random known urls, with p=0.5 a re-crawl
    rewriting a random page's outlinks and p=0.3 a tombstone kill —
    every structural event class per round, so every k lands on a poll
    doing real replacement work."""
    from linkgraph.synth import page_url

    ts0 = dt.datetime(2024, 6, 1, 12, 0, 0) + dt.timedelta(hours=round_no)
    rows = []
    u = page_url(next_idx)
    next_idx += 1
    t = list(rng.choice(known, size=min(2, len(known)), replace=False))
    rows.append((u, ts0, html_doc(t), "", "en"))
    known.append(u)
    if rng.random() < 0.5:
        ru = str(rng.choice(known[:-1]))
        rt = [x for x in rng.choice(known, size=2, replace=False) if x != ru]
        rows.append((ru, ts0 + dt.timedelta(minutes=1), html_doc(rt), "", "en"))
    if rng.random() < 0.3:
        ku = str(rng.choice(known[:-1]))
        rows.append((ku, ts0 + dt.timedelta(minutes=2), html_doc([]), "", "en"))
    return spark.createDataFrame(rows, PAGE_SCHEMA), next_idx


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flavors", default="rank,comps,tri,host")
    ap.add_argument(
        "--seed", type=int, default=0,
        help="history seed (combined with the flavor name; lets reruns "
        "sweep fresh crawl histories while staying reproducible)",
    )
    ap.add_argument("--n0", type=int, default=30)
    ap.add_argument("--max-k", type=int, default=200)
    ap.add_argument("--split-max-k", type=int, default=20)
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

    spark = get_spark(app_name="fuzz-crash", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    inj = Injector()
    failures = 0

    def report(flavor, k, crashed, ok, detail=""):
        nonlocal failures
        if not ok:
            failures += 1
        print(json.dumps({"flavor": flavor, "k": k, "crashed": bool(crashed), "ok": bool(ok), "detail": detail}))

    POLLS = {
        "rank": lambda stage, st: link_store_rank_poll(
            spark, stage, st, eps=EPS, max_iters=300, partitions=8, buckets=8
        ),
        "comps": lambda stage, st: link_store_components_poll(
            spark, stage, st, max_iters=300, partitions=8, buckets=8
        ),
        "tri": lambda stage, st: link_store_triangles_poll(
            spark, stage, st, partitions=8, buckets=8
        ),
        "host": lambda stage, st: host_store_rank_poll(
            spark, stage, st, eps=EPS, max_iters=300, partitions=8, buckets=8
        ),
    }

    # ---------------- phase 1: poll-protocol sweep, one flavor at a time
    for flavor in args.flavors.split(","):
        poll = POLLS[flavor]
        # zlib.crc32, not hash(): str hashing is salted per-process, which
        # would make a failing history unreproducible.
        rng = np.random.default_rng(
            (zlib.crc32(flavor.encode()) + args.seed) % (2**31)
        )
        work = tempfile.mkdtemp(prefix=f"fuzz_crash_{flavor}_")
        stage, st = f"{work}/pages", f"{work}/state"
        try:
            pages0 = gen_pages(spark, args.n0)
            known = [r["url"] for r in pages0.select("url").collect()]
            pages0.coalesce(1).write.mode("overwrite").parquet(stage)
            next_idx = 50_000
            poll(stage, st)  # clean bootstrap
            ok, detail = verify_poll(spark, flavor, stage, st, EPS)
            report(flavor, 0, False, ok, detail)

            # mutation counts vary per random batch (re-crawls/tombstones
            # touch more buckets), so "this poll didn't reach k" does NOT
            # mean no poll can: track the max count ever observed —
            # recovery replays run count-only instrumented so crashed
            # polls contribute their FULL count — and stop only once k
            # exceeds it.
            max_seen = 0
            for k in range(1, args.max_k + 1):
                batch, next_idx = small_batch(rng, spark, k, known, next_idx)
                batch.coalesce(1).write.mode("append").parquet(stage)
                inj.arm(k)
                crashed = False
                try:
                    poll(stage, st)
                except InjectedCrash:
                    crashed = True
                finally:
                    n_obs = inj.disarm()
                max_seen = max(max_seen, n_obs)
                if crashed:
                    inj.arm(None)  # count-only: observe the replay too
                    try:
                        poll(stage, st)  # the recovery replay
                    finally:
                        max_seen = max(max_seen, inj.disarm())
                ok, detail = verify_poll(spark, flavor, stage, st, EPS)
                report(flavor, k, crashed, ok, detail)
                if not crashed and k > max_seen:
                    # k exceeded the largest mutation count ANY poll in
                    # this history performed: every crash point observed
                    # reachable for this flavor has been injected
                    break
        finally:
            shutil.rmtree(work, ignore_errors=True)

    # ---------------- phase 2: split roll-forward sweep (fresh store per k
    # so the bucket count stays fixed — a crashed split completes on the
    # next open, so reusing one store would double B every round)
    for k in range(1, args.split_max_k + 1):
        work = tempfile.mkdtemp(prefix=f"fuzz_crash_split{k}_")
        stage, st = f"{work}/pages", f"{work}/state"
        try:
            gen_pages(spark, args.n0).coalesce(1).write.mode("overwrite").parquet(stage)
            link_store_rank_poll(spark, stage, st, eps=EPS, max_iters=300, partitions=8, buckets=8)
            store = LinkStore(spark, f"{st}/links", buckets=None)
            inj.arm(k)
            crashed = False
            try:
                store.split(2)
            except InjectedCrash:
                crashed = True
            finally:
                inj.disarm()
            # recovery: re-open rolls a marked split forward
            reopened = LinkStore.open_or_create(spark, f"{st}/links", buckets=8)
            ok = store_matches_pages(spark, reopened, stage) and reopened.buckets in (8, 16)
            # a follow-up poll over the recovered store must still be exact
            if ok:
                gen_pages(spark, args.n0 + 5).coalesce(1).write.mode("append").parquet(stage)
                link_store_rank_poll(spark, stage, st, eps=EPS, max_iters=300, partitions=8, buckets=8)
                ok, detail = verify_poll(spark, "rank", stage, st, EPS)
            else:
                detail = "store != ground truth after split recovery"
            report("split", k, crashed, ok, detail if not ok else "")
            if not crashed:
                break
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
