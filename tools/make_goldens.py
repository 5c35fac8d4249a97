"""Generate the committed fixture graph + goldens (FIXTURES.md §3).

Goldens are produced by the pure-Python oracle at the pinned conventions
(linkgraph/conventions.py): PageRank eps=1e-10 / 100 iters; WCC to fixpoint;
LP 10 synchronous iterations; per-vertex triangle counts. The Spark engine
is tested against these exact files (t3 gates).

Run: python tools/make_goldens.py   (writes tests/fixtures/*.csv)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from linkgraph import oracle  # noqa: E402
from linkgraph.synth import WIKI_VOTE_N, wiki_vote_like_edges  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    edges = wiki_vote_like_edges()
    pd.DataFrame(edges, columns=["src_id", "dst_id"]).to_csv(
        os.path.join(OUT, "wiki_vote_like.csv"), index=False
    )
    n = WIKI_VOTE_N

    ranks, iters = oracle.pagerank(edges, n)
    pd.DataFrame({"id": np.arange(n), "rank": ranks}).to_csv(
        os.path.join(OUT, "golden_pagerank.csv"), index=False, float_format="%.17g"
    )
    print(f"pagerank: {iters} iterations, sum={ranks.sum():.6f}")

    comp = oracle.wcc(edges, n)
    pd.DataFrame({"id": np.arange(n), "comp": comp}).to_csv(
        os.path.join(OUT, "golden_wcc.csv"), index=False
    )
    print(f"wcc: {len(set(comp.tolist()))} components")

    labels = oracle.label_propagation(edges, n)
    pd.DataFrame({"id": np.arange(n), "label": labels}).to_csv(
        os.path.join(OUT, "golden_labels.csv"), index=False
    )
    print(f"lp: {len(set(labels.tolist()))} labels")

    tri = oracle.triangle_counts(edges, n)
    pd.DataFrame({"id": np.arange(n), "tri": tri}).to_csv(
        os.path.join(OUT, "golden_triangles.csv"), index=False
    )
    print(f"tc: global={tri.sum() // 3}")


if __name__ == "__main__":
    main()
