"""The four FlashGraph vertex programs as Spark DataFrame programs
(SURVEY.md §2.1 A1–A4)."""

from linkgraph.algos.betweenness import betweenness
from linkgraph.algos.bfs import bfs
from linkgraph.algos.hits import hits
from linkgraph.algos.kcore import kcore
from linkgraph.algos.labelprop import label_propagation
from linkgraph.algos.pagerank import pagerank, pagerank_delta
from linkgraph.algos.scc import scc
from linkgraph.algos.triangles import triangle_counts
from linkgraph.algos.wcc import wcc, wcc_star

__all__ = [
    "pagerank",
    "pagerank_delta",
    "wcc",
    "wcc_star",
    "label_propagation",
    "triangle_counts",
    "bfs",
    "kcore",
    "hits",
    "scc",
    "betweenness",
]
