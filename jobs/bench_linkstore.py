"""Link-store scaling evidence: poll cost vs crawl HISTORY.

The claim under test (linkgraph/linkstore.py): refreshing the
latest-crawl view from the append-only pair log costs O(history) per
poll — every crawl ever appended is re-scanned — while the LinkStore
merge costs O(new rows + touched buckets), bounded by the current corpus
and independent of how many times the corpus has been re-crawled.

Protocol: one fixed corpus (--pages N synthetic pages), seeded with
H ∈ --history-levels FULL re-crawls (history = H × corpus rows; the
corpus itself never changes size), then ONE identical small poll
(--recrawl pages re-crawled with one added link) is timed under both
variants:

- pairlog: ingest + ``current_edge_pairs(full log).count()`` — the view
  refresh the naive poll performs;
- linkstore: ingest + ``merge()`` + ``current_pairs().count()``.

Refresh counts are min-of---repeats; the merge is one-shot by design
(its cost is included in the store's refresh seconds). The signal is the
TREND across H: pairlog refresh grows ~linearly with history, the store
stays flat. Appends a section to BENCH/BASELINE.md.

Usage: python jobs/bench_linkstore.py [--pages 10000] [--recrawl 20]
       [--history-levels 1,3,9] [--buckets 64]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def run_level(spark, n_pages: int, history: int, recrawl: int, buckets: int, repeats: int) -> dict:
    from pyspark.sql import functions as F

    from linkgraph.io import read_parquet_or_empty
    from linkgraph.linkstore import PAIR_COLS, LinkStore
    from linkgraph.streaming import current_edge_pairs, run_edge_ingest_once
    from linkgraph.synth import gen_pages

    work = tempfile.mkdtemp(prefix=f"lsbench_h{history}_")
    try:
        stage = os.path.join(work, "pages")
        log_state = os.path.join(work, "log_state")
        store = LinkStore(spark, os.path.join(work, "links"), buckets=buckets)

        base = gen_pages(spark, n_pages).localCheckpoint(eager=True)
        # seed: the initial crawl + (history-1) full re-crawls — identical
        # html, later warc_ts, so each seeds a full-corpus winner turnover
        for h in range(history):
            crawl = base.withColumn(
                "warc_ts", F.col("warc_ts") + F.expr(f"INTERVAL {h} DAYS")
            )
            crawl.coalesce(4).write.mode("append").parquet(stage)
            run_edge_ingest_once(
                spark, stage, f"{log_state}/pairlog", f"{log_state}/ingest_ckpt"
            )
            store.ingest(stage)
            store.merge()

        # timed polls: SMALL re-crawls (the steady-state shape). The merge
        # is one-shot per poll, and this host has multi-second steal
        # phases — so run `repeats` successive polls over DISJOINT url
        # slices and gate on the min (same estimator as the other
        # protocols).
        all_urls = [
            r["url"]
            for r in base.select("url").orderBy("url").limit(recrawl * repeats).collect()
        ]
        pairlog_secs, merge_secs, count_secs, touched = [], [], [], 0
        log_rows = n_view = 0
        for p in range(repeats):
            urls = all_urls[p * recrawl : (p + 1) * recrawl]
            poll = (
                base.filter(F.col("url").isin(urls))
                .withColumn("warc_ts", F.col("warc_ts") + F.expr(f"INTERVAL {1000 + p} DAYS"))
                .withColumn(
                    "html",
                    F.concat(F.col("html"), F.lit(f'<a href="{urls[0]}">x</a>'.encode())),
                )
            )
            poll.coalesce(1).write.mode("append").parquet(stage)

            run_edge_ingest_once(
                spark, stage, f"{log_state}/pairlog", f"{log_state}/ingest_ckpt"
            )
            log = read_parquet_or_empty(spark, f"{log_state}/pairlog", PAIR_COLS)
            log_rows = log.count()
            s, n_view = _timed(lambda: current_edge_pairs(log).count())
            pairlog_secs.append(s)

            store.ingest(stage)
            merge_sec, mstats = _timed(store.merge)
            merge_secs.append(merge_sec)
            touched = max(touched, len(mstats["touched_buckets"]))
            s, n_store = _timed(lambda: store.current_pairs().count())
            count_secs.append(s)
            assert n_view == n_store, f"view mismatch: log={n_view} store={n_store}"

        return {
            "history": history,
            "n_pages": n_pages,
            "log_rows": log_rows,
            "view_pairs": n_view,
            "pairlog_refresh_sec": round(min(pairlog_secs), 3),
            "store_refresh_sec": round(min(merge_secs) + min(count_secs), 3),
            "store_merge_sec": round(min(merge_secs), 3),
            "touched_buckets": touched,
            "buckets": buckets,
            "poll_repeats": repeats,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=10_000)
    ap.add_argument("--recrawl", type=int, default=20)
    ap.add_argument("--history-levels", default="1,3,9")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    from linkgraph.session import get_spark

    spark = get_spark(app_name="bench-linkstore")
    spark.sparkContext.setLogLevel("ERROR")

    levels = [int(x) for x in args.history_levels.split(",")]
    rows = []
    for h in levels:
        r = run_level(spark, args.pages, h, args.recrawl, args.buckets, args.repeats)
        rows.append(r)
        print(json.dumps(r), flush=True)

    base = rows[0]
    lines = [
        "",
        "## Link-store poll cost vs crawl history (fixed corpus)",
        "",
        f"One corpus of {args.pages:,} pages is re-crawled in full H times",
        "(history = H x corpus rows; the graph itself never grows), then an",
        f"identical {args.recrawl}-page poll is timed under both incremental",
        "variants. The pairlog variant re-derives the latest view from the",
        "FULL log each poll — its refresh grows with history; the LinkStore",
        "merge reads only the poll's touched buckets — bounded by the",
        "current corpus, flat in history. This is the steady-state regime a",
        "continuous crawl lives in: history grows without bound, the corpus",
        "doesn't.",
        "",
        "| history | log rows | pairlog refresh s | store refresh s (merge) | touched buckets | pairlog vs H=" + str(levels[0]) + " | store vs H=" + str(levels[0]) + " |",
        "| --- | --- | --- | --- | --- | --- | --- |",
    ]
    for r in rows:
        lines.append(
            f"| {r['history']} | {r['log_rows']:,} | {r['pairlog_refresh_sec']} | "
            f"{r['store_refresh_sec']} ({r['store_merge_sec']}) | "
            f"{r['touched_buckets']}/{r['buckets']} | "
            f"{r['pairlog_refresh_sec'] / base['pairlog_refresh_sec']:.2f}x | "
            f"{r['store_refresh_sec'] / base['store_refresh_sec']:.2f}x |"
        )
    lines += ["", "Raw JSON:", "", "```json"]
    lines += [json.dumps(r) for r in rows]
    lines += ["```", ""]
    with open(args.out, "a") as f:
        f.write("\n".join(lines))
    print(f"appended link-store section to {args.out}")


if __name__ == "__main__":
    main()
