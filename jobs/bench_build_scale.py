"""Build-pipeline scale linearity: pages/sec as the corpus grows 16x.

The extraction/build stage is the one Python-boundary-heavy pipeline
stage (html -> links via pandas UDFs, then dictionary + edge assembly),
so it is the crawl-scale risk the kernel benchmarks don't cover: if
per-page cost grew with corpus size (dictionary rank growing
superlinearly, UDF batch shape degrading, plan regrowth), a
10^12-document build would die even though every superstep kernel
scales. The claim under test: build cost is O(pages/cores) — pages/sec
holds as the corpus grows 16x at fixed local[32].

Protocol mirrors jobs/bench_edge_scale.py: 3 levels (5k -> 20k -> 80k
pages), min-of-2 whole-build runs per level with raw samples recorded,
one fresh worker process per level so JVM/persist state never leaks
across levels. Partition count scales with the data (one task per ~300
pages, the deployment rule — at crawl scale this is "thousands of
tasks", never "one task per core"), which is itself part of the
linearity claim. Page GENERATION (synth.gen_pages) is materialized to
parquet before the clock starts; the timed region is read -> extraction
UDFs -> latest-crawl dedup -> dictionary -> edge table count, i.e. the
pipeline a crawl build actually runs.

Appends a "Build-pipeline scale linearity" section to BENCH/BASELINE.md.

Usage: python jobs/bench_build_scale.py [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEVELS = [5_000, 20_000, 80_000]

_WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from linkgraph.build import build_graph
from linkgraph.session import get_spark
from linkgraph.synth import gen_pages

pages_n = {pages}
partitions = {partitions}
repeats = {repeats}
spark = get_spark(app_name=f"bench-build-{{pages_n}}",
                  shuffle_partitions=partitions,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")

stage = {stage!r}
gen_pages(spark, pages_n).write.mode("overwrite").parquet(stage)
pages = spark.read.parquet(stage)

# untimed warm-up build on a slice: JIT + codegen + Arrow worker spin-up,
# so level-to-level comparisons measure the pipeline, not process warm-up
build_graph(pages.limit(500), partitions=4).edges.count()

runs, n_edges, n_vertices = [], 0, 0
for _ in range(repeats):
    t0 = time.monotonic()
    g = build_graph(pages, partitions=partitions)
    n_edges = g.edges.count()
    n_vertices = g.vertices.count()
    runs.append(round(time.monotonic() - t0, 3))
    g.edges.unpersist()

best = min(runs)
print(json.dumps({{
    "pages": pages_n, "partitions": partitions, "build_runs": runs,
    "build_sec": best, "n_vertices": n_vertices, "n_edges": n_edges,
    "pages_per_sec": round(pages_n / best, 1),
    "links_per_sec": round(n_edges / best, 1),
}}))
"""


def run_level(pages: int, args) -> dict:
    partitions = max(16, pages // 312)  # one task per ~300 pages
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    env.pop("SPARK_GRAFT_MASTER", None)  # single-JVM local[32]
    with tempfile.TemporaryDirectory(prefix="lg_buildscale_") as td:
        code = _WORKER.format(
            repo=REPO, pages=pages, partitions=partitions,
            repeats=args.repeats, stage=os.path.join(td, "pages"),
        )
        last_err = ""
        for attempt in range(2):
            out = subprocess.run(
                [sys.executable, "-c", code],
                env=env, capture_output=True, text=True, cwd=REPO,
            )
            if out.returncode == 0:
                for line in reversed(out.stdout.strip().splitlines()):
                    if line.startswith("{"):
                        return json.loads(line)
                last_err = "no JSON line in worker stdout"
            else:
                last_err = "\n".join(out.stderr.strip().splitlines()[-30:])
            print(f"build level {pages} attempt {attempt + 1} failed", flush=True)
        raise RuntimeError(
            f"build bench failed at pages={pages}; stderr tail:\n{last_err}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    rows = []
    for pages in LEVELS:
        r = run_level(pages, args)
        rows.append(r)
        print(f"[build] pages={pages:,} best={r['build_sec']}s "
              f"pages/sec={r['pages_per_sec']:,.0f} edges={r['n_edges']:,}",
              flush=True)

    base = rows[0]["pages_per_sec"]
    lines = [
        "",
        "## Build-pipeline scale linearity: pages/sec vs corpus size (fixed parallelism)",
        "",
        "The extraction/build stage (html -> links pandas UDFs -> latest-crawl",
        "dedup -> dictionary -> edge table) is the Python-boundary risk at",
        "crawl scale; the kernels' linearity says nothing about it. Protocol:",
        "local[32], 3 corpus sizes growing 16x, min-of-2 whole-build runs in a",
        "fresh worker process per level (untimed 500-page warm-up build",
        "absorbs JIT/Arrow spin-up); partitions scale with the data (one task",
        "per ~300 pages — the deployment rule). Page generation is staged to",
        "parquet before the clock starts. The claim: build cost is",
        "O(pages/cores) — pages/sec holds as the corpus grows.",
        "",
        "| pages | partitions | best build sec | pages/sec | links/sec | edges | vs smallest |",
        "| --- | --- | --- | --- | --- | --- | --- |",
    ]
    for r in rows:
        rel = r["pages_per_sec"] / base
        lines.append(
            f"| {r['pages']:,} | {r['partitions']} | {r['build_sec']} | "
            f"{r['pages_per_sec']:,.0f} | {r['links_per_sec']:,.0f} | "
            f"{r['n_edges']:,} | {rel:.2f}x |"
        )
    lines += ["", "Raw JSON (both runs per level):", "", "```json"]
    for r in rows:
        lines.append(json.dumps(r))
    lines += ["```", ""]
    with open(args.out, "a") as f:
        f.write("\n".join(lines))
    print(f"appended build-scale section to {args.out}")


if __name__ == "__main__":
    main()
