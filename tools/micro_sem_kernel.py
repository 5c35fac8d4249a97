"""Microbench: candidate sem-kernel inner loops under parallel DRAM load.

Simulates concurrent block tasks (multiprocessing, one block each, shapes
matching the 1M-vertex / 50M-edge / 32-partition diag config). Variants
are INTERLEAVED round-robin inside every process so bursty host CPU-steal
hits all variants equally (the repo's interleaved-A/B methodology —
sequential per-variant runs measured 2-5x swings on this host).

Variants:
  A  current: contrib = vals[src_inv]; bincount(dst_inv, weights=contrib)
  B  chunked bincount accumulate (bounded temp, O(V_p) partial add/chunk)
  D  dst-sorted edges at compile: gather + add.reduceat (no random scatter)
  F  D + np.take(..., out=) into a preallocated buffer (no temp alloc)

(int32 uniq arrays don't appear in the inner loop at all — they cut the
image size and load time, not the superstep — so they're not a variant.)

Usage: python tools/micro_sem_kernel.py [--procs 32] [--reps 9]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import time

import numpy as np

VARIANTS = ("A", "B", "D", "F")


def worker(n_v, n_e, reps, seed, out_q):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_v, n_e, dtype=np.int64)
    dst = rng.integers(0, n_v, n_e, dtype=np.int64)
    order = np.lexsort((dst, src))  # layout order: sorted by (src, dst)
    src, dst = src[order], dst[order]
    src_uniq, src_inv = np.unique(src, return_inverse=True)
    dst_uniq, dst_inv = np.unique(dst, return_inverse=True)
    src_inv = src_inv.astype(np.int32)
    dst_inv = dst_inv.astype(np.int32)
    vals_by_src = rng.random(len(src_uniq))
    n_dst = len(dst_uniq)

    # compile-time prep for D/F: re-sort by dst, row starts per dst
    d_order = np.argsort(dst_inv, kind="stable")
    src_inv_d = src_inv[d_order]
    dst_sorted = dst_inv[d_order]
    row_starts = np.searchsorted(dst_sorted, np.arange(n_dst, dtype=np.int32))
    buf = np.empty(n_e)

    times = {v: [] for v in VARIANTS}
    checks = {}
    for _ in range(reps):
        for v in VARIANTS:
            t0 = time.perf_counter()
            if v == "A":
                contrib = vals_by_src[src_inv]
                sums = np.bincount(dst_inv, weights=contrib, minlength=n_dst)
            elif v == "B":
                sums = np.zeros(n_dst)
                CH = 1 << 20
                for lo in range(0, n_e, CH):
                    sl = slice(lo, lo + CH)
                    sums += np.bincount(dst_inv[sl],
                                        weights=vals_by_src[src_inv[sl]],
                                        minlength=n_dst)
            elif v == "D":
                contrib = vals_by_src[src_inv_d]
                sums = np.add.reduceat(contrib, row_starts)
            elif v == "F":
                np.take(vals_by_src, src_inv_d, out=buf)
                sums = np.add.reduceat(buf, row_starts)
            times[v].append(time.perf_counter() - t0)
            checks[v] = float(sums.sum())
    out_q.put((times, checks))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=32)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=1_560_000)  # per block
    ap.add_argument("--reps", type=int, default=9)
    args = ap.parse_args()

    q = mp.Queue()
    procs = [
        mp.Process(target=worker,
                   args=(args.vertices, args.edges, args.reps, 1000 + i, q))
        for i in range(args.procs)
    ]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()

    base = None
    for v in VARIANTS:
        mins = [min(times[v]) for times, _ in results]
        meds = [sorted(times[v])[len(times[v]) // 2] for times, _ in results]
        m = float(np.median(mins))
        base = base or m
        print(f"{v}: med-of-min={m*1e3:.1f}ms med-of-med={np.median(meds)*1e3:.1f}ms "
              f"vs A={m/base:.2f}x")
    ck = {v: {round(c[v], 6) for _, c in results} for v in VARIANTS}
    agree = all(ck[v] == ck["A"] for v in VARIANTS)
    print(f"checksums agree across variants: {agree}")


if __name__ == "__main__":
    main()
