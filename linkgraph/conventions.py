"""Pinned algorithm conventions — single source of truth.

The reference checkout at /root/reference is empty (SURVEY.md §0), so the
free variables of the four vertex programs (SURVEY.md §2.1) are pinned HERE
and shared by BOTH the Spark engine and the pure-Python oracle
(linkgraph/oracle.py). Tests compare the two; do not change one side
without regenerating goldens.

Conventions (SURVEY.md §2.1 A1–A4):

- PageRank: pull-based, damping ``d = 0.85``, init ``r0 = 1 - d`` for every
  vertex, per superstep ``r(v) = (1-d) + d * sum_{u->v} r(u)/outdeg(u)``.
  Dangling vertices (outdeg 0) contribute nothing (classic FlashGraph
  ``pagerank.cpp`` formulation: sum over graph ~= |V|, NOT normalized to 1).
  Converge when ``max |delta r| < PR_EPS`` or after ``PR_MAX_ITERS``.
- WCC: digraph treated as undirected; ``comp0(v) = v``; iterate
  ``comp(v) = min(comp(v), min over neighbors)`` to fixpoint. Exact match.
- Label propagation: ``label0(v) = v``; synchronous supersteps;
  ``label_{t+1}(v) = argmax_label count(labels of in+out neighbors at t)``,
  ties broken by SMALLEST label; isolated vertices keep their label; fixed
  ``LP_ITERS`` iterations (synchronous LP may oscillate — fixed count makes
  the result exact-matchable). Exact match.
- Triangle counting: per-vertex triangle count on the deduplicated
  symmetrized simple graph (self-loops removed). Global count = sum/3.
  Exact match.
"""

# PageRank
PR_DAMPING: float = 0.85
PR_INIT: float = 1.0 - PR_DAMPING  # 0.15
PR_EPS: float = 1e-10
PR_MAX_ITERS: int = 100

# Label propagation
LP_ITERS: int = 10

# HITS (hubs & authorities) — synchronous/Jacobi update: both gathers read
# the PREVIOUS state (auth_k from hub_{k-1}, hub_k from auth_{k-1}), each
# side L1-normalized at iteration start; final scores L1-normalized.
# Jacobi (not Gauss-Seidel) keeps each superstep a single pass over both
# edge layouts with no intra-step dependency (no double-computed subtree).
HITS_ITERS: int = 5

# Engine defaults
CHECKPOINT_EVERY: int = 5
DEFAULT_SHUFFLE_PARTITIONS: int = 32

# Skew handling (SURVEY.md §4.3)
HUB_OUTDEG_THRESHOLD: int = 1 << 14  # split src vertices with outdeg > this
SALT_BUCKETS: int = 16               # salted two-phase aggregation fan-out
