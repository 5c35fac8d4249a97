"""linkgraph — a PySpark-native link-graph analytics engine.

Re-expresses FlashGraph's vertex-program semantics (PageRank, weakly
connected components, label propagation, triangle counting — SURVEY.md §2.1)
as iterative DataFrame transforms over a columnar edge table derived from
Common-Crawl-style web pages (BASELINE.json ``north_rule`` / ``input_hint``).

Spark-first design: everything is DataFrame/Catalyst; Python executes only
inside vectorized Arrow UDFs (extraction, CSR SpMV kernel). No RDDs, no
per-row Python UDFs anywhere.
"""

from linkgraph import conventions  # noqa: F401

__version__ = "0.1.0"
