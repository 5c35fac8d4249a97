"""Round-6 optimization measurement harness (NOT the driver bench).

``bench.py`` is frozen for measurement; this file holds the extra
instrumentation the optimization round used, so its numbers are
reproducible (OPTIMIZATION_r06.md cites them):

- interleaved A/B of the in-loop gather-partition count (the
  scale-adaptive ``build.adaptive_partitions`` choice vs the session's
  2x-cores constant) for the four superstep programs;
- wcc_star fixpoint wall (the restructured oriented small-star);
- noop-sink-isolated timings of the sf_* corpus/similarity headliners
  (guide §1.4 — time the computation, not the sink).

Arms are interleaved within ONE session and reported as raw runs + min:
cross-run deltas on this VM are host-CPU-steal noise (the repo's A/B
protocol since r4).

Usage: python bench_extra.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))


def main() -> None:
    from linkgraph.algos import label_propagation, pagerank, pagerank_delta, wcc, wcc_star
    from linkgraph.benchgen import gen_bench_edges
    from linkgraph.build import adaptive_partitions
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="linkgraph-bench-extra",
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    res: dict[str, object] = {"cpus": CPUS, "sf_dir": SF_DIR}
    runs: dict[str, list[float]] = {}

    def t(tag: str, fn) -> None:
        sc.setJobDescription(tag)
        t0 = time.monotonic()
        fn()
        runs.setdefault(tag, []).append(round(time.monotonic() - t0, 3))
        sc.setJobDescription(None)

    edges = gen_bench_edges(spark, 500_000, 5_000_000).persist()
    n_edges = edges.count()
    adaptive = adaptive_partitions(spark, n_edges)
    res["bench_edges"] = n_edges
    res["adaptive_partitions"] = adaptive
    session_sp = 2 * CPUS

    pagerank(spark, edges, max_iters=3, eps=0.0)  # warmup (JIT, cache)

    # ---- in-loop partition-count A/B (adaptive vs session constant)
    for rnd in range(ROUNDS):
        arms = [adaptive, session_sp]
        if rnd % 2:
            arms.reverse()
        for p in arms:
            t(f"pr_sql_5iter@{p}", lambda: pagerank(spark, edges, max_iters=5, eps=0.0, partitions=p))
            t(f"delta_conv@{p}", lambda: pagerank_delta(spark, edges, threshold=1e-4, max_iters=300, partitions=p))
            t(f"wcc@{p}", lambda: wcc(spark, edges, partitions=p))
            t(f"lp3@{p}", lambda: label_propagation(spark, edges, iters=3, partitions=p))

    # ---- wcc_star (oriented small-star; adaptive partitions internal)
    for _ in range(ROUNDS):
        t("wcc_star", lambda: wcc_star(spark, edges))

    # ---- sf_* headliners, noop-isolated
    from linkgraph.driver_queries import q_host_pagerank
    from linkgraph.simsearch import q_knn_ivf
    from linkgraph.textops import q_doc_minhash_lsh_candidates, q_doc_simhash

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for _ in range(ROUNDS):
        t("sf_doc_simhash_noop", lambda: noop(q_doc_simhash(spark, SF_DIR)))
        t("sf_doc_minhash_lsh_noop", lambda: noop(q_doc_minhash_lsh_candidates(spark, SF_DIR)))
        t("sf_knn_ivf_noop", lambda: noop(q_knn_ivf(spark, SF_DIR)))
        t("sf_host_pagerank_noop", lambda: noop(q_host_pagerank(spark, SF_DIR)))

    res["runs"] = runs
    res["min"] = {k: min(v) for k, v in runs.items()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
