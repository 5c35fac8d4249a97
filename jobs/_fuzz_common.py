"""Shared pieces of the fuzz harness family (fuzz_polls / fuzz_crash).

Both harnesses drive the same four steady-state poll loops and enforce the
same output contract after every poll; keeping the contract in ONE place
means a change to a poll's semantics (e.g. the stale-host rule) cannot
silently leave the two harnesses enforcing different things.

The contract, per loop (state dir ``st``):

  - the store's latest view equals the INDEPENDENT ground truth derived
    straight from the pages directory (latest_snapshot → extract links) —
    a store corrupted in a way the product check can't see still fails,
  - the committed product equals a from-scratch batch recompute over the
    store's current pairs:
      rank   ranks ≡ batch pagerank            (atol = 100·eps)
      comps  labels ≡ batch wcc                (exact, compared by url)
      tri    counts ≡ batch triangle_counts    (exact, compared by url)
      host   live host ranks ≡ batch host_pagerank (atol); hosts kept only
             by the stable dictionary (stale) sit exactly at the dangling
             fixpoint 1-d.
"""

from __future__ import annotations

import numpy as np

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def html_doc(links: list[str]) -> bytes:
    body = "".join(f'<a href="{u}">l</a>' for u in links)
    return f"<html><body>{body}</body></html>".encode()


def store_matches_pages(spark, store, stage: str) -> bool:
    """Store latest view == ground truth derived from the pages dir alone."""
    from linkgraph.build import extract_link_pairs, latest_snapshot

    pages = spark.read.parquet(stage)
    want = {
        (r["src_url"], r["dst_url"])
        for r in extract_link_pairs(latest_snapshot(pages)).distinct().collect()
    }
    got = {(r["src_url"], r["dst_url"]) for r in store.current_pairs().collect()}
    return got == want


def _store_dict_edges(spark, st: str):
    from linkgraph.build import pairs_to_edges
    from linkgraph.linkstore import LinkStore

    store = LinkStore(spark, f"{st}/links", buckets=None)
    d = spark.read.parquet(f"{st}/dict")
    return store, d, pairs_to_edges(store.current_pairs(), d)


def verify_rank(spark, st: str, eps: float, atol: float) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    from linkgraph.algos import pagerank

    _, d, edges = _store_dict_edges(spark, st)
    want = pagerank(
        spark, edges, vertices=d.select("id"), eps=eps, max_iters=300, partitions=8
    ).state.select("id", F.col("rank").alias("w"))
    got = spark.read.parquet(f"{st}/ranks")
    both = got.join(want, "id").toPandas()
    ok = len(both) == got.count() > 0 and np.allclose(
        both["rank"].to_numpy(), both["w"].to_numpy(), rtol=0, atol=atol
    )
    return ok, "" if ok else "ranks diverge"


def verify_comps(spark, st: str) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    from linkgraph.algos import wcc

    _, d, edges = _store_dict_edges(spark, st)

    def by_url(labels):
        return (
            labels.join(d, "id")
            .select(F.col("url").alias("u"), "comp")
            .join(d.select(F.col("id").alias("comp"), F.col("url").alias("cu")), "comp")
            .select("u", "cu")
        )

    want = {
        (r["u"], r["cu"])
        for r in by_url(wcc(spark, edges, partitions=8).state.select("id", "comp")).collect()
    }
    got = {(r["u"], r["cu"]) for r in by_url(spark.read.parquet(f"{st}/comps")).collect()}
    return (got == want and len(got) > 0), "" if got == want else "comps diverge"


def verify_tri(spark, st: str) -> tuple[bool, str]:
    from linkgraph.algos import triangle_counts

    _, d, edges = _store_dict_edges(spark, st)
    want = {r["url"]: r["tri"] for r in triangle_counts(spark, edges).join(d, "id").collect()}
    got = {
        r["url"]: r["tri"]
        for r in spark.read.parquet(f"{st}/tri").join(d, "id").collect()
    }
    return (got == want and len(got) > 0), "" if got == want else "tri diverge"


def verify_host(spark, st: str, eps: float, atol: float) -> tuple[bool, str]:
    """Live hosts must match the batch recompute; hosts retained only by
    the stable dictionary (their last cross-host edge was removed by a
    tombstone/re-crawl) must sit exactly at the dangling fixpoint 1-d."""
    from linkgraph.conventions import PR_DAMPING
    from linkgraph.hostgraph import host_pagerank
    from linkgraph.linkstore import LinkStore

    store = LinkStore(spark, f"{st}/links", buckets=None)
    want = {
        r["host"]: r["rank"]
        for r in host_pagerank(
            spark, store.current_pairs(), src_col="src_url", dst_col="dst_url",
            eps=eps, max_iters=300, partitions=8,
        ).collect()
    }
    hd = spark.read.parquet(f"{st}/hostdict")
    got = {
        r["url"]: r["rank"]
        for r in spark.read.parquet(f"{st}/host_ranks").join(hd, "id").collect()
    }
    stale = {h: r for h, r in got.items() if h not in want}
    ok = (
        set(want) <= set(got)
        and len(want) > 0
        and all(abs(got[h] - want[h]) <= atol for h in want)
        and all(abs(r - (1.0 - PR_DAMPING)) <= atol for r in stale.values())
    )
    return ok, "" if ok else f"host ranks diverge: stale={stale} missing={set(want) - set(got)}"


def verify_poll(spark, flavor: str, stage: str, st: str, eps: float) -> tuple[bool, str]:
    """The full per-poll contract: store ground truth + the flavor's
    product-vs-batch check. ``flavor`` in {rank, comps, tri, host}."""
    from linkgraph.linkstore import LinkStore

    store = LinkStore(spark, f"{st}/links", buckets=None)
    if not store_matches_pages(spark, store, stage):
        return False, "store != pages ground truth"
    atol = 100 * eps
    if flavor == "rank":
        return verify_rank(spark, st, eps, atol)
    if flavor == "comps":
        return verify_comps(spark, st)
    if flavor == "tri":
        return verify_tri(spark, st)
    if flavor == "host":
        return verify_host(spark, st, eps, atol)
    raise ValueError(f"unknown poll flavor {flavor!r}")
