"""Host-level link graph: the standard web-link-analysis roll-up.

The page→page graph at crawl scale (10^12 documents) is rarely consumed
raw; the canonical derived product (Common Crawl publishes exactly this)
is the host→host graph: both endpoints collapsed to their url host, edge
weight = number of page-level links between the two hosts, intra-host
links dropped by default (they dominate raw counts and carry no
cross-site endorsement signal), then weighted PageRank over the roll-up
for host authority.

Scale shape: the roll-up is ONE map-side-combined groupBy — hosts are
10^3-10^4× fewer than pages, so everything downstream (dictionary,
iteration state) runs on a graph orders of magnitude smaller than the
page graph; the only O(pages) pass is the initial projection, which
pushes down to a two-column scan. Host extraction is a JVM-side
``regexp_extract`` (no Python), with the regex shared VERBATIM with the
DuckDB oracle (driver_queries.q_host_pagerank) so both engines cut hosts
identically. Mega-host in-degree skew (the wikipedia problem) reuses the
PageRank kernel's hybrid salted aggregation via ``salted=True``.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.conventions import PR_DAMPING, PR_EPS, PR_MAX_ITERS

# scheme://host, host ended by '/', ':', '?' or '#' — the PORT is
# deliberately not part of the host (one site, different listener). Plain
# ASCII regex — identical semantics under Java regex (Spark) and RE2
# (DuckDB), which the oracle cross-check depends on. Urls are already
# normalize_url()'d (lowercase scheme+host) by the extraction layer.
HOST_RE = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def host_col(col: Column) -> Column:
    """Host of a normalized url ('' when the url has no parseable host)."""
    return F.regexp_extract(col, HOST_RE, 1)


def host_edges(
    url_pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    keep_intra: bool = False,
) -> DataFrame:
    """(src_host, dst_host, weight) roll-up of a page-level url pair table.

    weight = COUNT of page links between the hosts (double — it feeds the
    weighted-PageRank kernel directly). Unparseable endpoints are dropped;
    intra-host edges are dropped unless ``keep_intra``.
    """
    # NOTE (r6): fanning the pair view out to the cores before the regex
    # (a round-robin repartition up to defaultParallelism when the scan
    # has fewer partitions — the single-row-group small-file case) was
    # tried and REFUTED by an interleaved noop-sink A/B at sf0.1: the
    # shuffle of the url strings costs more than the single-task regex it
    # parallelizes (min 2.1s plain vs 2.7s fanned); the extraction stays
    # chained on the scan.
    pairs = url_pairs.select(
        host_col(F.col(src_col)).alias("src_host"),
        host_col(F.col(dst_col)).alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not keep_intra:
        pairs = pairs.filter(F.col("src_host") != F.col("dst_host"))
    return pairs.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def host_pagerank(
    spark: SparkSession,
    url_pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    keep_intra: bool = False,
    damping: float = PR_DAMPING,
    eps: float = PR_EPS,
    max_iters: int = PR_MAX_ITERS,
    partitions: int | None = None,
    salted: bool = False,
) -> DataFrame:
    """Weighted PageRank over the host roll-up; returns (host, rank).

    Pipeline: roll-up (one combined groupBy) → dense host dictionary
    (build.assign_vertex_ids, the scalable two-phase rank) → the existing
    weighted sql kernel → join ranks back to host strings. The dictionary
    and iteration state are O(hosts), not O(pages).
    """
    hedges = host_edges(
        url_pairs, src_col=src_col, dst_col=dst_col, keep_intra=keep_intra
    ).persist()
    try:
        return _rank_host_edges(
            spark,
            hedges,
            damping=damping,
            eps=eps,
            max_iters=max_iters,
            partitions=partitions,
            salted=salted,
        )
    finally:
        hedges.unpersist()


def _rank_host_edges(
    spark: SparkSession,
    hedges: DataFrame,
    damping: float,
    eps: float,
    max_iters: int,
    partitions: int | None,
    salted: bool,
    init_ranks: DataFrame | None = None,
    hdict: DataFrame | None = None,
):
    """Weighted rank over a (src_host, dst_host, weight) roll-up; returns
    (host, rank) when ``hdict`` is None, else the engine RunResult on the
    caller's dictionary ids (the incremental poll needs both the result
    metadata and id-keyed state it can warm-start the next poll from)."""
    from linkgraph.algos import pagerank
    from linkgraph.build import adaptive_partitions, assign_vertex_ids

    return_strings = hdict is None
    if partitions is None:
        # scale-adaptive: the roll-up is orders of magnitude smaller than
        # the page corpus (hosts, not pages), so the dictionary build and
        # every superstep should run at a partition count sized to IT —
        # one count action on the (persisted) roll-up; at sf0.1 this
        # resolves to 1 and the 3 fixed iterations run as 1-task stages
        # instead of paying the session's 64-task floor per superstep.
        partitions = adaptive_partitions(spark, hedges.count(), row_bytes=64)
    if hdict is None:
        hosts = hedges.select(F.col("src_host").alias("url")).unionByName(
            hedges.select(F.col("dst_host").alias("url"))
        )
        # at partitions == 1 the scalable two-phase rank degenerates to a
        # single-partition window anyway — take the direct window path and
        # skip the range-partition + per-partition-count jobs (identical
        # ids; the equivalence is pytest-pinned in test_build)
        hdict = assign_vertex_ids(
            hosts, scalable=partitions > 1, partitions=partitions
        )
    src_ids = hdict.select(
        F.col("url").alias("src_host"), F.col("id").alias("src_id")
    )
    dst_ids = hdict.select(
        F.col("url").alias("dst_host"), F.col("id").alias("dst_id")
    )
    id_edges = (
        hedges.join(src_ids, "src_host")
        .join(dst_ids, "dst_host")
        .select("src_id", "dst_id", "weight")
    )
    res = pagerank(
        spark,
        id_edges,
        vertices=hdict.select("id"),
        damping=damping,
        eps=eps,
        max_iters=max_iters,
        partitions=partitions,
        salted=salted,
        weight_col="weight",
        init_ranks=init_ranks,
    )
    if not return_strings:
        return res
    return res.state.join(hdict, "id").select(
        F.col("url").alias("host"), "rank"
    )


class HostAgg:
    """Incrementally-maintained host-edge roll-up over a ``LinkStore``.

    The batch roll-up (``host_edges``) scans the FULL latest-crawl pair
    view every time — an O(current corpus) pass per poll, which is the one
    remaining corpus-sized cost in the steady-state host-rank loop. This
    store removes it by keeping **per-bucket partials**: for each LinkStore
    bucket ``lb``, the host roll-up of just that bucket's winner rows,
    stored hive-partitioned under ``root/parts/lb=K``. Because every
    src_url lives entirely in one bucket (lb is a function of src_url),
    both the per-src distinct over (src_url, dst_url) and the host
    collapse are bucket-local, so

        Σ_buckets partial(bucket)  ==  batch roll-up,  EXACTLY

    (integer counts — no float summation-order concern). After a merge
    only the touched buckets' winner rows changed, so ``refresh`` reads
    ONLY those partitions of the store (partition-pruned) and rewrites
    ONLY those partial dirs: per-poll cost O(touched-bucket bytes), never
    O(corpus).

    Validity is tracked refuse-don't-guess style in ``root/_meta``
    ({"merged_through": N, "buckets": B}, matching the store state the
    partials reflect). ``refresh`` applies the touched-bucket fast path
    only when the meta proves the partials are exactly one merge behind
    (same bucket count, merged_through equal to the store's pre-merge
    watermark); on ANY mismatch — first use, a crash between the store's
    merge and this refresh, a ``split()`` having changed the bucket
    universe — it rebuilds every partial from the store rather than
    guessing which buckets might be stale. A crash mid-refresh leaves meta
    un-advanced, which the next poll detects the same way; wasteful,
    never wrong (the same degradation contract as losing LinkStore meta).
    All swaps are rename-aside, never a recursive delete of live state
    (LinkStore's protocol): ``_repair_asides`` restores any dir a crash
    stranded mid-swap, and ``host_edges`` falls back to the complete
    pre-rebuild ``parts.old`` if a full-rebuild swap died between its
    renames — a reader never sees an empty roll-up where data exists.
    """

    _PART_SCHEMA = "src_host string, dst_host string, w long, lb int"

    def __init__(self, spark: SparkSession, root: str, keep_intra: bool = False):
        self.spark = spark
        self.root = root.rstrip("/")
        self.parts_dir = f"{self.root}/parts"
        self.staging_dir = f"{self.root}/parts.staging"
        self.old_dir = f"{self.root}/parts.old"
        self.aside_dir = f"{self.root}/parts.aside"
        self.meta_path = f"{self.root}/_meta"
        self.keep_intra = keep_intra

    def _repair_asides(self) -> None:
        """Complete any swap a crash interrupted (same invariants as
        ``LinkStore._repair_asides``). Whole-dir first: a full rebuild
        that died between its two renames left the complete PRE-rebuild
        partials in ``parts.old`` — restore them (meta was not advanced,
        so they are the state meta describes; the rebuild re-runs).
        Then per-bucket: an incremental swap that died between its
        renames left that bucket's pre-swap content in ``parts.aside`` —
        restore it (stale at worst, and the meta mismatch forces the
        full rebuild right after)."""
        from linkgraph.engine import fs_exists, fs_rename, fs_restore_asides

        if not fs_exists(self.spark, self.parts_dir) and fs_exists(
            self.spark, self.old_dir
        ):
            if not fs_rename(self.spark, self.old_dir, self.parts_dir):
                raise IOError(
                    f"HostAgg: repair rename {self.old_dir} -> {self.parts_dir} failed"
                )
        fs_restore_asides(self.spark, self.parts_dir, self.aside_dir, "HostAgg")

    def _read_meta(self) -> dict | None:
        from linkgraph.engine import fs_exists, fs_read_text

        if not fs_exists(self.spark, self.meta_path):
            return None
        return json.loads(fs_read_text(self.spark, self.meta_path))

    def _write_meta(self, merged_through: int, buckets: int) -> None:
        from linkgraph.engine import fs_delete, fs_rename, fs_write_text

        tmp = self.meta_path + ".tmp"
        fs_write_text(
            self.spark,
            tmp,
            json.dumps({"merged_through": merged_through, "buckets": buckets}),
        )
        fs_delete(self.spark, self.meta_path)
        if not fs_rename(self.spark, tmp, self.meta_path):
            raise IOError(f"HostAgg: rename {tmp} -> {self.meta_path} failed")

    def _bucket_partials(self, store, touched: list[int] | None) -> DataFrame:
        """Host roll-up partials of the store's winner rows, bucket-local:
        same per-src distinct + host filters as the batch path
        (store.current_pairs() -> host_edges), with lb carried through —
        lb is a function of src_url, so bucket-local distinct == the
        global distinct restricted to the bucket."""
        rows = store._read_latest(touched).filter(F.col("dst_url").isNotNull())
        pairs = rows.select("lb", "src_url", "dst_url").distinct()
        hosts = pairs.select(
            "lb",
            host_col(F.col("src_url")).alias("src_host"),
            host_col(F.col("dst_url")).alias("dst_host"),
        ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
        if not self.keep_intra:
            hosts = hosts.filter(F.col("src_host") != F.col("dst_host"))
        return hosts.groupBy("lb", "src_host", "dst_host").agg(
            F.count(F.lit(1)).alias("w")
        )

    def refresh(self, store, touched: list[int], expected_merged_through: int) -> dict:
        """Bring the partials current with ``store`` (called after its
        merge). ``expected_merged_through`` is the store's merged_through
        BEFORE that merge — the watermark these partials must already
        reflect for the touched-bucket fast path to be sound."""
        from linkgraph.engine import fs_delete, fs_exists, fs_mkdirs, fs_rename

        self._repair_asides()
        meta = self._read_meta()
        incremental = (
            meta is not None
            and int(meta["buckets"]) == store.buckets
            and int(meta["merged_through"]) == expected_merged_through
        )
        if not incremental:
            # refuse-don't-guess: rebuild every partial from the store.
            # Swap is rename-aside, never a recursive delete of live
            # state: a crash between the renames leaves the complete
            # pre-rebuild partials in parts.old for _repair_asides (and
            # host_edges' read fallback) — meta is only advanced after
            # the swap, so the restored state is the state meta describes
            fs_delete(self.spark, self.staging_dir)
            self._bucket_partials(store, None).write.partitionBy("lb").mode(
                "overwrite"
            ).parquet(self.staging_dir)
            fs_delete(self.spark, self.old_dir)
            if fs_exists(self.spark, self.parts_dir) and not fs_rename(
                self.spark, self.parts_dir, self.old_dir
            ):
                raise IOError(
                    f"HostAgg: rename {self.parts_dir} -> {self.old_dir} failed"
                )
            if not fs_rename(self.spark, self.staging_dir, self.parts_dir):
                raise IOError(
                    f"HostAgg: rename {self.staging_dir} -> {self.parts_dir} failed"
                )
            fs_delete(self.spark, self.old_dir)
            self._write_meta(store.merged_through(), store.buckets)
            return {"rebuilt": True, "refreshed_buckets": store.buckets}

        touched = sorted(int(k) for k in touched)
        if touched:
            fs_delete(self.spark, self.staging_dir)
            self._bucket_partials(store, touched).write.partitionBy("lb").mode(
                "overwrite"
            ).parquet(self.staging_dir)
            fs_mkdirs(self.spark, self.parts_dir)
            fs_mkdirs(self.spark, self.aside_dir)
            for k in touched:
                name = f"lb={k}"
                live = f"{self.parts_dir}/{name}"
                staged = f"{self.staging_dir}/{name}"
                aside = f"{self.aside_dir}/{name}"
                # a touched bucket can legitimately produce ZERO partial
                # rows (all tombstones / intra-host / unparseable) — the
                # stale live dir must still go; rename-aside instead of
                # delete so a crash mid-swap never loses the bucket (at
                # most one bucket is mid-swap; the next refresh repairs
                # it and the meta mismatch forces a rebuild)
                fs_delete(self.spark, aside)
                if fs_exists(self.spark, live) and not fs_rename(
                    self.spark, live, aside
                ):
                    raise IOError(f"HostAgg: rename {live} -> {aside} failed")
                if fs_exists(self.spark, staged) and not fs_rename(
                    self.spark, staged, live
                ):
                    raise IOError(f"HostAgg: rename {staged} -> {live} failed")
                fs_delete(self.spark, aside)
            fs_delete(self.spark, self.staging_dir)
        self._write_meta(store.merged_through(), store.buckets)
        return {"rebuilt": False, "refreshed_buckets": len(touched)}

    def host_edges(self) -> DataFrame:
        """The full (src_host, dst_host, weight) roll-up: one hash agg over
        the partials — O(host edges), with no page-corpus scan. Exactly
        equal to ``host_edges(store.current_pairs())`` (integer partials).

        Reader-side crash fallback (non-mutating, the io.py reader
        discipline): if a full rebuild died between its two renames,
        ``parts/`` is missing but the complete pre-rebuild partials sit
        in ``parts.old`` — serve those (they are the state ``_meta``
        still describes) instead of silently returning an empty roll-up.
        A reader overlapping an INCREMENTAL bucket swap can still miss at
        most the one mid-swap bucket until the next refresh repairs it —
        the same stated window as LinkStore's readers."""
        from linkgraph.engine import fs_exists
        from linkgraph.io import read_parquet_or_empty

        src = self.parts_dir
        if not fs_exists(self.spark, src) and fs_exists(self.spark, self.old_dir):
            src = self.old_dir
        parts = read_parquet_or_empty(self.spark, src, self._PART_SCHEMA)
        return parts.groupBy("src_host", "dst_host").agg(
            F.sum("w").cast("double").alias("weight")
        )
