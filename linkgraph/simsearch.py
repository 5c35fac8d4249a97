"""Similarity search over the ``embeddings`` table (array<float> column).

- Brute-force cosine top-k: the exact baseline. Query side is broadcast
  (small); similarity is computed with built-in higher-order array
  functions (``zip_with`` + ``aggregate``) — JVM-side, no Python UDF.
- LSH-bucketed variant (random-hyperplane SimHash): the scale path — a
  signature groupBy replaces the full cross product; candidates are then
  re-scored exactly. Hyperplanes are deterministic (hash-derived), so the
  result is reproducible without fitting state.

Float note: cosine scores are rounded to 3 decimals in both engines so the
driver's value-hash comparison is not flipped by float32→float64 noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOP_K = 5
N_QUERIES = 5  # first N vec_ids serve as the query set
SIMHASH_BITS = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _cosine(a, b):
    """Cosine with a zero-norm guard: Spark 4 runs ANSI mode by default,
    where double/0.0 RAISES — one all-zeros embedding (failed encode,
    null padding) would otherwise kill the whole query. try_divide turns
    the degenerate row's score into NULL, which every downstream
    threshold filter / top-k window drops (the SQL oracles carry the
    matching NULLIF; testdata embeddings are unit-norm, so values are
    untouched where both are defined)."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the first N_QUERIES vectors (excluding self)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    pairs = F.broadcast(queries).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("q"), F.col("e")), 3).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


KNN_BRUTEFORCE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROUND(list_dot_product(q.qv, e.embedding)
                 / NULLIF(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.embedding, e.embedding)), 0), 3) AS cosine
    FROM q, embeddings e
    WHERE q.query_id <> e.vec_id
)
SELECT query_id, neighbor_id, cosine, rn FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {TOP_K}
"""


def q_embedding_label_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label count + mean L2 norm (embedding-hygiene aggregate)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", _norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("vectors"), F.round(F.avg("nrm"), 3).alias("avg_norm"))
        .orderBy("label")
    )


EMBEDDING_LABEL_NORMS_SQL = """
SELECT label, COUNT(*) AS vectors,
       ROUND(AVG(sqrt(list_dot_product(embedding, embedding))), 3) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
"""


EMB_NEAR_DUP_COS = 0.4  # near-dup threshold for the exact pair query
# Above this corpus size the exact all-pairs crossJoin is a scale-killer
# (O(n^2) pairs: at 20k rows that is already 2x10^8 scored pairs);
# embedding_near_dup_pairs then routes through banded SimHash LSH +
# exact in-bucket rescore instead.
EMB_EXACT_MAX_ROWS = 20_000
EMB_LSH_BANDS = 4


def _normalized(emb: DataFrame) -> DataFrame:
    """(vec_id, u): unit-normalized embeddings — norms computed ONCE per
    vector, so every downstream pair score is a single zip_with dot.

    The norm rides ``array_repeat`` rather than being referenced inside a
    ``transform`` lambda: a lambda reference counts as a single static
    use, so CollapseProject would inline the O(d) norm aggregate into the
    per-element body — O(d^2) per vector. ``array_repeat(norm, d)``
    evaluates the norm once per row. try_divide: a zero vector yields an
    all-NULL u, whose pair scores go NULL and fall out of every
    threshold filter (ANSI mode would otherwise raise DIVIDE_BY_ZERO)."""
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.zip_with(
            e,
            F.array_repeat(_norm(e), F.size(e)),
            lambda x, nn: F.try_divide(x.cast("double"), nn),
        ).alias("u"),
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = EMB_NEAR_DUP_COS,
    max_exact_rows: int = EMB_EXACT_MAX_ROWS,
    bands: int = EMB_LSH_BANDS,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold, a < b).

    Corpus-size-gated execution (one bounded count action to decide —
    ``limit(max_exact_rows + 1).count()`` scans at most max+1 rows, never
    the corpus; pass ``n_rows`` when the caller already knows the corpus
    size — e.g. from catalog stats at 100 TB — and even that is skipped):

    - ``n <= max_exact_rows``: exact all-pairs self-join — complete recall,
      the small-corpus baseline the oracle checks.
    - larger: **banded random-hyperplane SimHash** candidates + exact
      in-bucket rescore. ``bands`` independent SIMHASH_BITS-bit signatures
      (disjoint hyperplane sets); docs agreeing on ANY band become
      candidates, then the exact cosine filter keeps only true near-dups.
      Precision is exact; recall is probabilistic (pairs can disagree on
      every band) — the standard LSH trade at 10^12-doc scale, where the
      all-pairs join is not an option. No crossJoin anywhere on this path.
    """
    normed = _normalized(emb)
    n = emb.limit(max_exact_rows + 1).count() if n_rows is None else n_rows
    if n <= max_exact_rows:
        a = normed.select(F.col("vec_id").alias("vec_a"), F.col("u").alias("ua"))
        b = normed.select(F.col("vec_id").alias("vec_b"), F.col("u").alias("ub"))
        pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    else:
        sigs = normed.select(
            "vec_id",
            "u",
            *[
                simhash_signature(
                    F.col("u"), plane_offset=band * SIMHASH_BITS
                ).alias(f"sig{band}")
                for band in range(bands)
            ],
        )
        band_rows = None
        for band in range(bands):
            one = sigs.select(
                "vec_id", "u", F.lit(band).alias("band"), F.col(f"sig{band}").alias("sig")
            )
            band_rows = one if band_rows is None else band_rows.unionByName(one)
        a = band_rows.select(
            F.col("vec_id").alias("vec_a"), F.col("u").alias("ua"), "band", "sig"
        )
        b = band_rows.select(
            F.col("vec_id").alias("vec_b"), F.col("u").alias("ub"), "band", "sig"
        )
        pairs = (
            a.join(b, ["band", "sig"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .dropDuplicates(["vec_a", "vec_b"])
        )
    return pairs.select(
        "vec_a",
        "vec_b",
        F.round(_dot(F.col("ua"), F.col("ub")), 3).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-family operator
    over the embedding column. At oracle scale the corpus is far under
    ``EMB_EXACT_MAX_ROWS``, so the exact path runs and the DuckDB oracle
    match is complete-recall exact; past the bound the same entry point
    switches to banded LSH + exact rescore (see embedding_near_dup_pairs).
    """
    return embedding_near_dup_pairs(_emb(spark, sf_dir))


EMB_NEAR_DUP_SQL = f"""
WITH n AS (
    -- zero-norm vectors are FILTERED, not NULLIF'd: x / NULLIF(0,0)
    -- would make u an all-NULL list and DuckDB's list_dot_product
    -- RAISES on NULL elements (unlike the scalar NULLIF divisions in
    -- the knn oracles, where a NULL cosine just falls out of top-k).
    -- Spark's side yields NULL cosine for these rows via try_divide,
    -- which fails the >= threshold the same way the filter does.
    SELECT vec_id,
           list_transform(embedding, x -> x / norm) AS u
    FROM (
        SELECT vec_id, embedding,
               sqrt(list_dot_product(embedding, embedding)) AS norm
        FROM embeddings
    )
    WHERE norm > 0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.u, b.u), 3) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.u, b.u), 3) >= {EMB_NEAR_DUP_COS}
"""


IVF_CENTROIDS = 16
IVF_NPROBE = 6
IVF_KMEANS_ITERS = 3


def _assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell): max-cosine cell per vector — one
    broadcast-join pass over the data (the shape that scales: cells
    partition the corpus, so query probing later touches only
    nprobe/n_centroids of it).

    The argmax is a ``max(struct(ccos, -cell, embedding))`` aggregation,
    not a ROW_NUMBER window: the partial (map-side) max collapses each
    vector's IVF_CENTROIDS scored copies to ONE row before the exchange,
    so the per-Lloyd-pass shuffle carries ~corpus rows instead of
    centroids x corpus rows and skips the window's per-partition sort.
    The (ccos, -cell) struct order reproduces the window's pick exactly —
    max cosine, ties to the smallest cell, a NULL cosine ordering lowest
    just like DESC NULLS LAST; -cell is unique within a vector's group so
    the trailing embedding field never participates in a comparison.
    (Inlining the centroids as literal arrays and taking a per-row
    array_max was tried and REFUTED: 16 higher-order-function cosine
    expressions in one projection made the pass 2-3x slower than the
    crossJoin it replaced — the exchange was never the bottleneck, the
    expression interpreter was.)"""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        F.struct(
            _cosine(F.col("embedding"), F.col("cvec")).alias("ccos"),
            (-F.col("cell")).alias("negcell"),
            F.col("embedding").alias("e"),
        ).alias("s"),
    )
    best = scored.groupBy("vec_id").agg(F.max("s").alias("b"))
    return best.select(
        "vec_id", F.col("b.e").alias("embedding"), (-F.col("b.negcell")).alias("cell")
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    kmeans_iters: int = IVF_KMEANS_ITERS,
):
    """IVF coarse quantizer, deterministic end-to-end: seed centroids are
    the ``n_centroids`` vectors with smallest xxhash64(vec_id) (a
    deterministic sample), refined by ``kmeans_iters`` Lloyd iterations —
    assign to max-cosine cell, recompute each cell's element-wise mean
    (posexplode → groupBy(cell, dim) avg → re-assemble), repeat. All
    JVM-side column ops; per iteration one broadcast join + two shuffles
    of (cell, dim) partials, independent of corpus size per-row.

    Seed selection is ``orderBy(hash).limit(n)`` — planned as a fully
    parallel TakeOrderedAndProject (per-partition top-n, then a driver
    merge of n_centroids rows), NOT a global window, which would funnel
    the whole corpus through one task. Cell ids are stamped on the ≤
    n_centroids collected seeds driver-side (bounded metadata, same
    pattern as engine lineage).

    Returns (centroids_df(cell, cvec), assign_df(vec_id, embedding, cell)).
    """
    spark = emb.sparkSession
    # Shuffle partitions sized to the CORPUS for the whole index build
    # (guide-style scale adaptivity): at small sf the Lloyd passes were
    # paying 64 reduce tasks per exchange to aggregate a few thousand
    # rows — measured 3.0s of the 3.5s query. The conf is restored after;
    # the returned ``assign`` is eagerly materialized inside the override
    # so its plan binds to the adaptive count too (the IVF index build is
    # a materialization point anyway — the probe step re-reads it).
    from linkgraph.build import adaptive_partitions

    sp_before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        # ~8 bytes x dim + key overhead per row
        str(adaptive_partitions(spark, emb.count(), row_bytes=8 * 64 + 16)),
    )
    try:
        seeds = (
            emb.select("vec_id", "embedding", F.xxhash64(F.col("vec_id")).alias("__h"))
            .orderBy(F.asc("__h"), F.asc("vec_id"))
            .limit(n_centroids)
            .collect()
        )
        seeds.sort(key=lambda r: (r["__h"], r["vec_id"]))
        centroids = spark.createDataFrame(
            [(i + 1, [float(x) for x in r["embedding"]]) for i, r in enumerate(seeds)],
            "cell int, cvec array<double>",
        )
        for _ in range(kmeans_iters):
            assign = _assign_cells(emb, centroids)
            centroids = (
                assign.select("cell", F.posexplode("embedding").alias("dim", "x"))
                .groupBy("cell", "dim")
                .agg(F.avg(F.col("x").cast("double")).alias("m"))
                .groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "m"))),
                        lambda s: s["m"],
                    ).alias("cvec")
                )
                # MATERIALIZE the <= n_centroids rows: without this each Lloyd
                # iteration's centroid plan embeds the full previous assign
                # subtree, so plan depth (and broadcast-subtree recompute)
                # grows with kmeans_iters. Interleaved A/B at iters=3 measured
                # it neutral (the corpus passes dominate); the eager cut is
                # kept as the plan-depth bound for larger iteration counts.
                .localCheckpoint(eager=True)
            )
        return centroids, _assign_cells(emb, centroids).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", sp_before)


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF cells: each query probes its IVF_NPROBE nearest cells
    and exact-rescoring runs only inside them. Same output columns as the
    brute-force query (rows-only check: recall < 1 by construction; the
    test suite pins a recall floor vs knn_bruteforce)."""
    emb = _emb(spark, sf_dir)
    centroids, assign = ivf_assign(emb)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    qcells = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "q",
            "cell",
            _cosine(F.col("q"), F.col("cvec")).alias("ccos"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell"))
            ),
        )
        .filter(F.col("__rn") <= IVF_NPROBE)
        .select("query_id", "q", "cell")
    )
    cands = F.broadcast(qcells).join(
        assign.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"), "cell"),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("q"), F.col("e")), 3).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def simhash_signature(emb_col, bits: int = SIMHASH_BITS, plane_offset: int = 0):
    """Random-hyperplane SimHash: bit b = sign(<v, h_{o+b}>) where
    hyperplane h_j[i] = ±1 from xxhash64(j, i) parity — deterministic, no
    fitted state. ``plane_offset`` selects a disjoint hyperplane set so
    multiple INDEPENDENT band signatures can be drawn from the same family
    (offset 0 reproduces the original single-band signature)."""
    def bit(b: int):
        signed = F.aggregate(
            F.zip_with(
                emb_col,
                F.transform(
                    F.sequence(F.lit(0), F.size(emb_col) - 1),
                    lambda i: F.when(
                        F.pmod(F.xxhash64(F.lit(plane_offset + b), i), F.lit(2)) == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(signed >= 0, F.lit(1 << b)).otherwise(F.lit(0))

    sig = F.lit(0)
    for b in range(bits):
        sig = sig + bit(b)
    return sig.cast("long")


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via SimHash buckets: candidates share a signature, then exact
    cosine re-scoring within buckets. Returns the same columns as the
    brute-force query (rows-only check: recall < 1 by construction)."""
    emb = _emb(spark, sf_dir).withColumn(
        "sig", simhash_signature(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"), "sig"
    )
    cands = F.broadcast(queries).join(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"), "sig"),
        "sig",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("q"), F.col("e")), 3).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def q_knn_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both ANN variants (SimHash-bucket LSH and IVF probing) as one tagged
    result — same columns as the brute-force query plus ``method``.
    Rows-only by design: ANN recall < 1; the test suite pins a recall floor
    for each method against knn_bruteforce."""
    lsh = q_knn_lsh(spark, sf_dir).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id", "cosine", "rn"
    )
    ivf = q_knn_ivf(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "cosine", "rn"
    )
    return lsh.unionByName(ivf)
