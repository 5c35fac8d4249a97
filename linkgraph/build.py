"""Edge-table build pipeline (SURVEY.md §2.1 A8, §3.2 lifecycle 2).

Replaces the reference's ``el2fg`` converter (edge-list text → binary
adjacency image + vertex index): here the "graph image" is a columnar edge
table, range-partitioned by ``src_id`` and sorted ``(src_id, dst_id)``
within partitions — the Parquet layout that gives each superstep sequential
columnar reads, mirroring FlashGraph's sequential-I/O vertex scheduling
(FAST'15 §3.5).

Pipeline:  pages → latest-crawl dedup → link extraction (Arrow UDF) →
url normalization → deterministic url→id dictionary → (src_id, dst_id)
dedup → degrees → sorted layout.

Determinism rule: vertex ids are dense ranks over ``ORDER BY url`` —
layout-independent, so exact-match goldens survive any repartitioning.
``monotonically_increasing_id`` is never used (partition-layout-dependent).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.extract import extract_links_udf


@dataclass
class Graph:
    """vertices(id, url, out_deg, in_deg) + edges(src_id, dst_id)."""

    vertices: DataFrame
    edges: DataFrame


def latest_snapshot(pages: DataFrame) -> DataFrame:
    """Latest crawl per url (W1: row_number over warc_ts desc).

    Ties on (url, warc_ts) are broken by md5(html) DESC — a deterministic
    key the streaming ingest log can carry verbatim (``crawl_fp``), so the
    batch pipeline and ``streaming.current_edge_pairs`` resolve the same
    crawl on a timestamp collision.
    """
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc(F.md5("html")))
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def extract_link_pairs(pages: DataFrame) -> DataFrame:
    """pages → (src_url, dst_url) pairs, one row per extracted link."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(extract_links_udf(F.col("html"), F.col("url"))).alias("dst_url"),
        )
    )


def assign_vertex_ids(urls: DataFrame, scalable: bool = True, partitions: int = 32) -> DataFrame:
    """Deterministic dense ids: rank of url in global sorted order.

    ``scalable=False``: single-partition window (fine ≤1e8 rows).
    ``scalable=True`` (default): two-phase parallel dense rank — range-
    partition by url, count rows per partition (tiny collect), compute
    per-partition offsets, then a per-partition-local row_number + offset.
    Output is identical (ids follow global url order) but no single-task
    bottleneck — this is the crawl-scale path (SURVEY.md §7 "hard parts").
    """
    urls = urls.select("url").distinct()
    if not scalable:
        w = Window.orderBy("url")
        return urls.select(
            (F.row_number().over(w) - F.lit(1)).cast("long").alias("id"), "url"
        ).localCheckpoint(eager=True)  # same contract as the scalable path:
        # callers receive a materialized dictionary they can reuse freely
    ranged = (
        urls.repartitionByRange(partitions, "url")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = ranged.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    w = Window.partitionBy("__pid").orderBy("url")
    out = (
        ranged.join(F.broadcast(offset_df), "__pid")
        .select(
            (F.row_number().over(w) - F.lit(1) + F.col("__offset")).cast("long").alias("id"),
            "url",
        )
        # eager materialization so the ranged cache can be released NOW:
        # a lazy return would pin the persist() for the session's lifetime
        # (CacheManager entries survive GC), which leaks one O(V) cache per
        # call — fatal for the per-poll incremental loop. Also guarantees
        # the ids downstream plans see are computed exactly once.
        .localCheckpoint(eager=True)
    )
    ranged.unpersist()
    return out


def extend_vertex_ids(
    existing: DataFrame, urls: DataFrame, scalable: bool = True, partitions: int = 32
) -> DataFrame:
    """STABLE incremental url→id dictionary: urls already in ``existing``
    keep their ids; unseen urls get fresh dense ids above the current max
    (assign_vertex_ids on just the novel urls, shifted).

    This is what makes warm-started re-ranking possible on a continuous
    crawl: a from-scratch ``assign_vertex_ids`` over the grown url
    universe would RENUMBER every vertex (dense rank shifts when any url
    sorts earlier), silently mis-seeding ``pagerank(init_ranks=...)``.
    Returns the extended dictionary (id, url); ids are never reused or
    reassigned, so rank/component state keyed by id stays valid across
    polls. The max-id lookup is one bounded driver scalar."""
    new_urls = (
        urls.select("url").distinct().join(existing.select("url"), "url", "left_anti")
    )
    row = existing.agg(F.max("id").alias("m")).first()
    base = -1 if row["m"] is None else int(row["m"])
    fresh = assign_vertex_ids(new_urls, scalable=scalable, partitions=partitions)
    fresh = fresh.select((F.col("id") + F.lit(base + 1)).cast("long").alias("id"), "url")
    return existing.select("id", "url").unionByName(fresh)


def pairs_to_edges(pairs: DataFrame, dictionary: DataFrame) -> DataFrame:
    """THE edge-derivation rule, shared by the batch build and the
    incremental poll so the two paths cannot silently diverge: map both
    endpoints of each (src_url, dst_url) pair through the id dictionary
    (inner joins — a pair with an unmapped endpoint is dropped), remove
    self-loops, and dedup parallel links."""
    return (
        pairs.join(
            dictionary.select(F.col("url").alias("src_url"), F.col("id").alias("src_id")),
            "src_url",
        )
        .join(
            dictionary.select(F.col("url").alias("dst_url"), F.col("id").alias("dst_id")),
            "dst_url",
        )
        .select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )


def build_graph(
    pages: DataFrame,
    partitions: int = 32,
    scalable_ids: bool = True,
) -> Graph:
    """Full build: pages table → Graph(vertices, edges).

    The vertex universe is the union of page urls and link-target urls
    (targets without a page survive as dangling vertices — outdeg 0).
    """
    snap = latest_snapshot(pages).persist()  # consumed twice (urls + links)
    pairs = extract_link_pairs(snap).persist()

    url_universe = snap.select("url").unionByName(
        pairs.select(F.col("dst_url").alias("url"))
    )
    # already materialized (assign_vertex_ids localCheckpoints its output)
    # — a second .persist() here would store the O(V) id table twice
    dictionary = assign_vertex_ids(url_universe, scalable=scalable_ids, partitions=partitions)

    edges = (
        pairs_to_edges(pairs, dictionary)
        .repartitionByRange(partitions, "src_id")
        .sortWithinPartitions("src_id", "dst_id")
        .persist()
    )

    out_deg = edges.groupBy(F.col("src_id").alias("id")).agg(F.count(F.lit(1)).alias("out_deg"))
    in_deg = edges.groupBy(F.col("dst_id").alias("id")).agg(F.count(F.lit(1)).alias("in_deg"))
    vertices = (
        dictionary.join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .select(
            "id",
            "url",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )
    # materialize the edge cache BEFORE dropping its upstream caches:
    # edges is persisted but lazy, so unpersisting pairs/snap first would
    # make the caller's first action re-run the whole-corpus extraction
    # UDF pass (the dominant build cost) from the raw pages a second time
    edges.count()
    pairs.unpersist()
    snap.unpersist()
    return Graph(vertices=vertices.persist(), edges=edges)


def write_edge_image(
    edges: DataFrame, path: str, table: str, buckets: int
) -> None:
    """Persist the edge table as a **bucketed graph image**: parquet
    bucketed AND sorted by the gather key, registered as an external table.

    This is the durable analogue of ``gather_layout`` — the on-disk form
    FlashGraph's ``el2fg`` image plays (FAST'15 §3.1): partitioning is
    baked into storage, so a COLD job's first gather join needs no initial
    O(E) repartition of the edges (the one remaining cold-start shuffle of
    the range-partitioned layout). ``bucketBy`` uses the same Murmur3 hash
    as ``repartition(n, col)``, so the bucketed scan's reported
    HashPartitioning(src_id, buckets) satisfies the gather join's
    distribution directly.

    The pre-``repartition`` on the bucket key makes each task hold exactly
    one bucket → ONE file per bucket, which is what lets Spark also report
    the ``sortBy`` ordering at scan time (multi-file buckets forfeit it).
    """
    (
        edges.select("src_id", "dst_id")
        .repartition(buckets, "src_id")
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, "src_id")
        .sortBy("src_id", "dst_id")
        .saveAsTable(table)
    )


def load_edge_image(spark, table: str) -> DataFrame:
    """Read a ``write_edge_image`` table, tagging the DataFrame with its
    bucket count so ``gather_layout`` (and kernels that adopt the image's
    partitioning) can skip the redundant repartition+sort. The tag rides
    the Python object only — any further transformation drops it and the
    normal (re-layout) path engages, which is always correct."""
    df = spark.table(table)
    n_buckets = None
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r["col_name"].strip() == "Num Buckets":
            n_buckets = int(r["data_type"])
            break
    df._lg_bucket_count = n_buckets
    return df


def edge_fingerprint(
    edges: DataFrame, cols: tuple[str, ...] = ("src_id", "dst_id")
) -> tuple[int, str]:
    """(count, order-insensitive checksum) identity of an edge multiset —
    ONE aggregation action. The shared definition for every subsystem that
    refuses stale artifacts built from a different graph (sem layout
    manifest, scc phase checkpoints); sum runs in decimal space because in
    ANSI mode a sum of full-range xxhash64 longs overflows."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).cast("string").alias("chk"),
    ).first()
    return int(row["n"]), row["chk"]


# Adaptive gather-partition sizing (guide-style scale adaptivity: derive
# the count from the input, never from a constant tuned to one box).
# - MIN_EDGES_PER_TASK is the small-graph floor: below it, per-superstep
#   task-scheduling dominates compute, so tiny graphs iterate in few/one
#   task(s) per stage (interleaved A/B on the 5M-edge bench graph:
#   in-loop 64 -> 32 partitions cut the sql steady superstep 0.60-0.75 ->
#   0.40-0.46 s and delta-convergence 38 -> 23 s; a 2k-edge host graph
#   resolves to 1 instead of paying 64-task stages per superstep).
# - The cap is max(cluster parallelism, 256 MB-sized partition count):
#   mid-size graphs use every core once per stage wave; at crawl scale
#   the bytes term takes over and bounds per-task state (guide §2.2's
#   "fewer, larger partitions" once shuffles dominate).
MIN_EDGES_PER_TASK = 150_000
EDGE_ROW_BYTES = 16  # two int64 columns; weight columns only add ~50%
TARGET_PARTITION_BYTES = 256 << 20


def adaptive_partitions(spark, n_rows: int, row_bytes: int = EDGE_ROW_BYTES) -> int:
    """Scale-adaptive partition count for ``n_rows`` gather-layout rows."""
    by_task_floor = max(1, -(-int(n_rows) // MIN_EDGES_PER_TASK))
    cap = max(
        spark.sparkContext.defaultParallelism,
        -(-(int(n_rows) * row_bytes) // TARGET_PARTITION_BYTES),
    )
    return min(by_task_floor, cap)


def resolve_partitions(spark, edges: DataFrame, partitions: int | None) -> int:
    """Gather-partition count for an iterative kernel, in priority order:
    explicit caller argument > the bucket count a ``load_edge_image``
    DataFrame carries (adopting the image's baked-in partitioning lets
    ``gather_layout`` skip the cold-start shuffle) > **scale-adaptive from
    the edge count** (``adaptive_partitions``; one count action — metadata
    -fast on parquet scans and cached inputs). Single definition — every
    kernel resolves identically. Callers whose edge expression is an
    expensive lazy derivation should pass an explicit count-free
    ``partitions`` (the incremental polls do)."""
    resolved = partitions or getattr(edges, "_lg_bucket_count", None)
    if resolved:
        return resolved
    return adaptive_partitions(spark, edges.count())


def gather_layout(
    edges: DataFrame,
    partitions: int,
    cols: tuple[str, ...] = ("src_id", "dst_id"),
) -> DataFrame:
    """Loop-invariant edge layout for iterative gather joins: hash-partition
    on the gather key and sort within partitions, then cache.

    The sort matters as much as the partitioning: vertex state comes out of
    each superstep's ``localCheckpoint`` hash-partitioned AND sorted on id,
    so the per-superstep gather join plans as a sort-merge join. With the
    cached edge side also sorted, the SMJ streams both sides with **zero
    per-superstep sort** — otherwise Catalyst inserts a Sort over the whole
    edge table into every iteration (measured ~35%% of superstep time at
    |E|=50M on local[32]). Sorted longs also delta-encode far better in the
    columnar cache, cutting the per-superstep scan's memory traffic.

    Caller owns the returned cache (``.unpersist()`` when the loop ends).
    ``cols`` extends the cached projection (e.g. an edge-weight column).

    If ``edges`` came straight from ``load_edge_image`` with a bucket
    count equal to ``partitions``, the scan already IS hash-partitioned
    and sorted on the gather key — the repartition+sort is skipped and the
    cache builds directly over the bucketed scan (zero cold-start edge
    shuffle).
    """
    if getattr(edges, "_lg_bucket_count", None) == partitions:
        return edges.select(*cols).persist()
    return (
        edges.select(*cols)
        .repartition(partitions, "src_id")
        .sortWithinPartitions("src_id")
        .persist()
    )


def symmetrized_gather_layout(edges: DataFrame, partitions: int) -> DataFrame:
    """``gather_layout(symmetrize(edges), n)`` in ONE shuffle instead of
    two-three: union both edge directions, hash-partition straight onto
    the gather key, then dedup + sort WITHIN partitions.

    The trick: ``dropDuplicates(["src_id", "dst_id"])`` after
    ``repartition(n, "src_id")`` needs no further Exchange — hash
    partitioning on ``src_id`` already satisfies the dedup aggregation's
    clustered distribution on (src_id, dst_id) (every duplicate pair is
    co-located), so Catalyst plans the dedup partition-local. The naive
    composition shuffles once for the distinct (keyed on both columns)
    and AGAIN for the gather key. Same rows, same layout contract as
    gather_layout (caller owns the cache)."""
    rev = reverse_edges(edges)
    return (
        edges.select("src_id", "dst_id")
        .unionByName(rev)
        .filter(F.col("src_id") != F.col("dst_id"))
        .repartition(partitions, "src_id")
        .dropDuplicates(["src_id", "dst_id"])
        .sortWithinPartitions("src_id")
        .persist()
    )


def reverse_edges(edges: DataFrame) -> DataFrame:
    """(src, dst) -> (dst, src): the single definition of the edge
    reversal used by symmetrize and the transpose-graph algorithms
    (HITS authority step, SCC backward sweep, Brandes dependency
    accumulation) — one place to change if the contract ever grows
    (e.g. carrying a weight column through)."""
    return edges.select(
        F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected simple graph as directed pairs in both directions
    (input to WCC / LP / TC — SURVEY.md U1)."""
    rev = reverse_edges(edges)
    return (
        edges.unionByName(rev)
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )


def vertex_ids_from_edges(edges: DataFrame) -> DataFrame:
    """Vertex universe (id) implied by an edge table.

    One union + distinct, deliberately: per-side distincts before the
    union (to make the src side partition-local on a gather layout) were
    tried in r6 and REFUTED by an interleaved noop A/B on the 5M-edge
    bench graph — the single exchange's map-side partial dedup already
    collapses the stream, and the three-exchange spelling was slower on
    both raw (1.0 vs 1.0-2.5s) and layout (0.42 vs 0.61-1.4s) inputs."""
    return (
        edges.select(F.col("src_id").alias("id"))
        .unionByName(edges.select(F.col("dst_id").alias("id")))
        .distinct()
    )
