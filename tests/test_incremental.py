"""Incremental crawl → re-rank loop: stable dictionary + warm-started
convergence across polls, equivalent to a from-scratch batch build."""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import functions as F


def test_extend_vertex_ids_stable(spark):
    from linkgraph.build import assign_vertex_ids, extend_vertex_ids

    a = spark.createDataFrame([(u,) for u in ["u3", "u1", "u7"]], "url string")
    d1 = assign_vertex_ids(a, partitions=4)
    base = {r["url"]: r["id"] for r in d1.collect()}

    both = spark.createDataFrame(
        [(u,) for u in ["u3", "u1", "u7", "u0", "u9"]], "url string"
    )
    d2 = extend_vertex_ids(d1, both, partitions=4)
    got = {r["url"]: r["id"] for r in d2.collect()}
    # known urls keep their ids EXACTLY (u0 sorts before u1 — a fresh
    # assign_vertex_ids over the union would renumber everything)
    for u, i in base.items():
        assert got[u] == i, f"{u} renumbered {i} -> {got[u]}"
    # novel urls: dense, above the previous max, no collisions
    assert sorted(got.values()) == list(range(5))
    assert {got["u0"], got["u9"]} == {3, 4}

    # extending with no novel urls is the identity
    d3 = extend_vertex_ids(d2, a, partitions=4)
    assert {(r["id"], r["url"]) for r in d3.collect()} == set(
        (i, u) for u, i in got.items()
    )

    # extending an EMPTY dictionary == assign from scratch (ids from 0)
    empty = spark.createDataFrame([], "id long, url string")
    d0 = extend_vertex_ids(empty, a, partitions=4)
    assert {r["url"]: r["id"] for r in d0.collect()} == base


def test_incremental_poll_warm_start_matches_batch(spark, tmp_path):
    """Two polls over a growing pages directory: the second poll
    warm-starts from the first's converged ranks, converges in FEWER
    iterations than a cold run on the same graph, keeps every url's id
    stable, and its converged ranks match a from-scratch batch
    build+rank of the full crawl (joined by url — the id spaces differ
    by construction)."""
    from linkgraph.algos import pagerank
    from linkgraph.build import build_graph
    from linkgraph.incremental import incremental_rank_poll
    from linkgraph.synth import gen_pages

    eps = 1e-9
    pages1 = gen_pages(spark, 60)
    targets = [r["url"] for r in pages1.select("url").orderBy("url").limit(8).collect()]
    # realistic steady-state poll: re-crawl 3 pages with byte-identical
    # html except ONE added link — a small graph delta, so the previous
    # fixpoint is a near-perfect warm seed (a wholesale outlink rewrite
    # would perturb ranks enough that warm ~= cold iterations)
    originals = {
        r["url"]: bytes(r["html"]).decode()
        for r in pages1.filter(F.col("url").isin(targets[:3])).select("url", "html").collect()
    }
    recrawl_rows = []
    for i, u in enumerate(targets[:3]):
        html = originals[u]
        if i == 0:
            html = html.replace("</body>", f'<a href="{targets[-1]}">new</a></body>')
        recrawl_rows.append(
            (u, datetime.datetime(2024, 6, 1, 12, 0, i), html.encode(), "", "en")
        )
    pages2 = spark.createDataFrame(
        recrawl_rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    pages1.coalesce(1).write.mode("overwrite").parquet(stage)
    m1 = incremental_rank_poll(spark, stage, state, eps=eps, max_iters=200, partitions=8)
    assert not m1["warm_started"] and m1["edges"] > 0

    dict1 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/dict").collect()}

    pages2.coalesce(1).write.mode("append").parquet(stage)
    m2 = incremental_rank_poll(spark, stage, state, eps=eps, max_iters=200, partitions=8)
    assert m2["warm_started"]

    dict2 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/dict").collect()}
    for u, i in dict1.items():
        assert dict2[u] == i, f"{u} renumbered across polls"

    # cold run on the identical final graph: warm start must beat it
    g = build_graph(pages1.unionByName(pages2), partitions=8)
    cold = pagerank(spark, g.edges, vertices=g.vertices.select("id"), eps=eps, max_iters=200)
    assert m2["iterations"] < cold.iterations, (
        f"warm poll took {m2['iterations']} iters vs cold {cold.iterations}"
    )

    # converged ranks match the batch pipeline, joined by url
    inc = (
        spark.read.parquet(f"{state}/ranks")
        .join(
            spark.read.parquet(f"{state}/dict"), "id"
        )
        .select("url", F.col("rank").alias("inc_rank"))
    )
    batch = cold.state.join(g.vertices.select("id", "url"), "id").select(
        "url", F.col("rank").alias("batch_rank")
    )
    # inner join on url: the incremental universe is pairs-derived, so a
    # fully isolated page (zero out- AND in-links) exists only batch-side —
    # it contributes nothing to any other vertex's rank, so shared urls
    # must still agree exactly
    both = inc.join(batch, "url").toPandas()
    assert len(both) == inc.count() > 0
    assert np.allclose(
        both["inc_rank"].to_numpy(), both["batch_rank"].to_numpy(),
        rtol=0, atol=100 * eps,
    )


def _recrawl_rows(spark, pages, targets, add_link_to=None, kill=()):
    """Re-crawls of ``targets`` (same shape as the linkstore tests'
    helper): byte-identical html except the first optionally gains a link;
    urls in ``kill`` are re-crawled with NO links (tombstones)."""
    originals = {
        r["url"]: bytes(r["html"]).decode()
        for r in pages.filter(F.col("url").isin(list(targets) + list(kill)))
        .select("url", "html")
        .collect()
    }
    rows = []
    for i, u in enumerate(targets):
        html = originals[u]
        if i == 0 and add_link_to is not None:
            html = html.replace("</body>", f'<a href="{add_link_to}">new</a></body>')
        rows.append((u, datetime.datetime(2024, 6, 1, 12, 0, i), html.encode(), "", "en"))
    for j, u in enumerate(kill):
        rows.append(
            (u, datetime.datetime(2024, 6, 1, 13, 0, j), b"<html><body>dead</body></html>", "", "en")
        )
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_host_store_rank_poll_matches_batch_host_pagerank(spark, tmp_path):
    """Steady-state host-rank loop: three polls (fresh crawl, re-crawl with
    a new cross-host link, tombstone) over a LinkStore. After every poll
    the HostAgg partials sum EXACTLY to the batch roll-up over the store's
    current pairs; the second and third polls warm-start, refresh only the
    touched buckets (no full rebuild), keep every host's id stable, and
    the final converged host ranks equal a from-scratch batch
    host_pagerank over the same pairs."""
    from linkgraph.hostgraph import host_edges, host_pagerank
    from linkgraph.incremental import host_store_rank_poll
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages

    eps = 1e-9
    buckets = 8
    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")

    pages1 = gen_pages(spark, 60)
    urls = [r["url"] for r in pages1.select("url").orderBy("url").limit(10).collect()]

    def batch_rollup():
        store = LinkStore(spark, f"{state}/links", buckets=None)
        return {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in host_edges(store.current_pairs()).collect()
        }

    def agg_rollup():
        from linkgraph.hostgraph import HostAgg

        return {
            (r["src_host"], r["dst_host"]): r["weight"]
            for r in HostAgg(spark, f"{state}/hostagg").host_edges().collect()
        }

    pages1.coalesce(1).write.mode("overwrite").parquet(stage)
    m1 = host_store_rank_poll(
        spark, stage, state, eps=eps, max_iters=200, partitions=8, buckets=buckets
    )
    assert not m1["warm_started"] and m1["partials_rebuilt"]  # first use
    assert m1["hosts"] > 1 and m1["host_edges"] > 0
    assert agg_rollup() == batch_rollup() != {}
    dict1 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/hostdict").collect()}

    # poll 2: re-crawl 3 pages, one gains a link to the last url
    recrawl = _recrawl_rows(spark, pages1, urls[:3], add_link_to=urls[-1])
    recrawl.coalesce(1).write.mode("append").parquet(stage)
    m2 = host_store_rank_poll(
        spark, stage, state, eps=eps, max_iters=200, partitions=8, buckets=buckets
    )
    assert m2["warm_started"] and not m2["partials_rebuilt"]
    assert 0 < m2["touched_buckets"] < buckets  # incremental, not a rescan
    assert agg_rollup() == batch_rollup()

    # poll 3: a page dies — its host edges must shrink/vanish from the agg
    kill = _recrawl_rows(spark, pages1, [], kill=[urls[1]])
    kill.coalesce(1).write.mode("append").parquet(stage)
    m3 = host_store_rank_poll(
        spark, stage, state, eps=eps, max_iters=200, partitions=8, buckets=buckets
    )
    assert m3["warm_started"] and not m3["partials_rebuilt"]
    assert agg_rollup() == batch_rollup()

    # host ids stable across all polls
    dict3 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/hostdict").collect()}
    for h, i in dict1.items():
        assert dict3[h] == i, f"host {h} renumbered across polls"

    # converged poll ranks == from-scratch batch host_pagerank on the same
    # current pairs, joined by host string
    store = LinkStore(spark, f"{state}/links", buckets=None)
    batch = host_pagerank(
        spark, store.current_pairs(), eps=eps, max_iters=200, partitions=8
    ).withColumnRenamed("rank", "batch_rank")
    inc = (
        spark.read.parquet(f"{state}/host_ranks")
        .join(spark.read.parquet(f"{state}/hostdict"), "id")
        .select(F.col("url").alias("host"), F.col("rank").alias("inc_rank"))
    )
    both = inc.join(batch, "host").toPandas()
    assert len(both) == inc.count() > 0
    assert np.allclose(
        both["inc_rank"].to_numpy(), both["batch_rank"].to_numpy(),
        rtol=0, atol=100 * eps,
    )


def test_link_store_components_poll_matches_batch_wcc(spark, tmp_path):
    """Three polls of the components loop: cold bootstrap, a GROW-ONLY
    poll (new pages only — warm start fires, gated on replaced_srcs==0),
    and a re-crawl poll (gate forces a cold start). After every poll the
    committed labels equal a from-scratch wcc over the store's current
    pairs, joined by url."""
    import datetime as dt

    from linkgraph.algos import wcc
    from linkgraph.build import pairs_to_edges
    from linkgraph.incremental import link_store_components_poll
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages, page_url

    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    buckets = 8

    def poll():
        return link_store_components_poll(
            spark, stage, state, max_iters=200, partitions=8, buckets=buckets
        )

    def assert_matches_batch():
        store = LinkStore(spark, f"{state}/links", buckets=None)
        dictionary = spark.read.parquet(f"{state}/dict")
        edges = pairs_to_edges(store.current_pairs(), dictionary)
        batch = (
            wcc(spark, edges, partitions=8)
            .state.join(dictionary, "id")
            # component labels are ids — compare by the url of the label's
            # vertex so the check is id-space independent
            .select(F.col("url").alias("u"), F.col("comp"))
            .join(
                dictionary.select(F.col("id").alias("comp"), F.col("url").alias("comp_url")),
                "comp",
            )
            .select("u", "comp_url")
        )
        inc = (
            spark.read.parquet(f"{state}/comps")
            .join(dictionary, "id")
            .select(F.col("url").alias("u"), F.col("comp"))
            .join(
                dictionary.select(F.col("id").alias("comp"), F.col("url").alias("comp_url")),
                "comp",
            )
            .select("u", "comp_url")
        )
        got = {(r["u"], r["comp_url"]) for r in inc.collect()}
        want = {(r["u"], r["comp_url"]) for r in batch.collect()}
        assert got == want and len(got) > 0

    pages1 = gen_pages(spark, 60)
    pages1.coalesce(1).write.mode("overwrite").parquet(stage)
    m1 = poll()
    assert not m1["warm_started"] and m1["edges"] > 0
    assert_matches_batch()
    dict1 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/dict").collect()}

    # poll 2: GROW-ONLY — brand-new pages linking into the existing graph
    targets = [r["url"] for r in pages1.select("url").orderBy("url").limit(4).collect()]
    new_rows = [
        (
            page_url(1000 + i),
            dt.datetime(2024, 6, 2, 12, 0, i),
            (
                "<html><body>"
                + f'<a href="{targets[i]}">t</a><a href="{page_url(1001 + i)}">n</a>'
                + "</body></html>"
            ).encode(),
            "",
            "en",
        )
        for i in range(3)
    ]
    spark.createDataFrame(
        new_rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.mode("append").parquet(stage)
    m2 = poll()
    assert m2["replaced_srcs"] == 0 and m2["warm_started"]
    assert m2["iterations"] <= m1["iterations"]
    assert_matches_batch()

    # poll 3: a re-crawl REPLACES an existing src's winner rows — the
    # grow-only precondition fails and the gate must force a cold start
    recrawl = _recrawl_rows(spark, pages1, targets[:1], add_link_to=targets[-1])
    recrawl.coalesce(1).write.mode("append").parquet(stage)
    m3 = poll()
    assert m3["replaced_srcs"] > 0 and not m3["warm_started"]
    assert_matches_batch()

    # url ids stable across all polls
    dict3 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/dict").collect()}
    for u, i in dict1.items():
        assert dict3[u] == i, f"{u} renumbered across polls"


def test_link_store_triangles_poll_matches_batch(spark, tmp_path):
    """Three polls of the triangle loop: cold bootstrap, a grow-only poll
    that takes the DELTA path (new pages closing triangles with existing
    ones), and a re-crawl poll that must recount cold. After every poll
    the committed per-vertex counts equal a from-scratch triangle_counts
    over the store's current pairs, compared by url."""
    import datetime as dt

    from linkgraph.algos import triangle_counts
    from linkgraph.build import pairs_to_edges
    from linkgraph.incremental import link_store_triangles_poll
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages, page_url

    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    buckets = 8

    def poll():
        return link_store_triangles_poll(
            spark, stage, state, partitions=8, buckets=buckets
        )

    def assert_matches_batch():
        store = LinkStore(spark, f"{state}/links", buckets=None)
        dictionary = spark.read.parquet(f"{state}/dict")
        edges = pairs_to_edges(store.current_pairs(), dictionary)
        want = {
            r["url"]: r["tri"]
            for r in triangle_counts(spark, edges).join(dictionary, "id").collect()
        }
        got = {
            r["url"]: r["tri"]
            for r in spark.read.parquet(f"{state}/tri").join(dictionary, "id").collect()
        }
        assert got == want and len(got) > 0

    pages1 = gen_pages(spark, 60)
    pages1.coalesce(1).write.mode("overwrite").parquet(stage)
    m1 = poll()
    assert not m1["incremental"] and m1["edges"] > 0
    assert_matches_batch()

    # poll 2: grow-only — new pages each linking TWO existing pages that
    # are themselves linked (closing new triangles through old edges)
    store = LinkStore(spark, f"{state}/links", buckets=None)
    pair = store.current_pairs().orderBy("src_url", "dst_url").limit(3).collect()
    new_rows = [
        (
            page_url(2000 + i),
            dt.datetime(2024, 6, 2, 12, 0, i),
            (
                "<html><body>"
                + f'<a href="{r["src_url"]}">a</a><a href="{r["dst_url"]}">b</a>'
                + "</body></html>"
            ).encode(),
            "",
            "en",
        )
        for i, r in enumerate(pair)
    ]
    spark.createDataFrame(
        new_rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.mode("append").parquet(stage)
    m2 = poll()
    assert m2["replaced_srcs"] == 0 and m2["incremental"]
    assert_matches_batch()

    # poll 3: a re-crawl replaces winner rows — must recount cold
    targets = [r["url"] for r in pages1.select("url").orderBy("url").limit(2).collect()]
    recrawl = _recrawl_rows(spark, pages1, targets[:1], add_link_to=targets[-1])
    recrawl.coalesce(1).write.mode("append").parquet(stage)
    m3 = poll()
    assert m3["replaced_srcs"] > 0 and not m3["incremental"]
    assert_matches_batch()


def test_poll_crash_between_merge_and_commit_forces_cold(spark, tmp_path):
    """A poll that merges into the LinkStore but dies before committing
    its product state leaves edges no stored labels/counts account for —
    the next poll's replaced_srcs (and the components frontier) only
    reflect the LATEST merge. The watermark stamped into each state
    commit must detect the gap and force a cold start, and the cold
    results must match batch."""
    import datetime as dt

    from linkgraph.incremental import (
        link_store_components_poll,
        link_store_triangles_poll,
    )
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages, page_url

    def new_pages(base_idx, targets):
        rows = [
            (
                page_url(base_idx + i),
                dt.datetime(2024, 6, 3, 12, 0, i),
                (
                    "<html><body>"
                    + f'<a href="{t}">t</a>'
                    + "</body></html>"
                ).encode(),
                "",
                "en",
            )
            for i, t in enumerate(targets)
        ]
        return spark.createDataFrame(
            rows,
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    pages1 = gen_pages(spark, 40)
    targets = [r["url"] for r in pages1.select("url").orderBy("url").limit(4).collect()]

    for poll_fn, state_name in (
        (link_store_components_poll, "comps"),
        (link_store_triangles_poll, "tri"),
    ):
        stage = str(tmp_path / f"pages_{state_name}")
        state = str(tmp_path / f"state_{state_name}")
        pages1.coalesce(1).write.mode("overwrite").parquet(stage)
        m1 = poll_fn(spark, stage, state, partitions=8, buckets=8)
        assert m1["edges"] > 0

        # simulated crash: a poll merges new pages into the store but
        # dies before committing comps/tri (we drive the store directly)
        new_pages(3000, targets[:2]).coalesce(1).write.mode("append").parquet(stage)
        store = LinkStore(spark, f"{state}/links", buckets=None)
        store.ingest(stage)
        assert store.merge()["new_rows"] > 0

        # next poll: grow-only on ITS merge (fresh srcs), but the stored
        # state watermark predates the crashed merge -> must go cold
        new_pages(4000, targets[2:]).coalesce(1).write.mode("append").parquet(stage)
        m2 = poll_fn(spark, stage, state, partitions=8, buckets=8)
        assert m2["replaced_srcs"] == 0
        flag = "warm_started" if state_name == "comps" else "incremental"
        assert not m2[flag], f"{state_name}: crash window not detected"

        # and a FOLLOWING clean grow-only poll warm-starts again
        new_pages(5000, targets[:1]).coalesce(1).write.mode("append").parquet(stage)
        m3 = poll_fn(spark, stage, state, partitions=8, buckets=8)
        assert m3[flag], f"{state_name}: watermark did not recover"


def test_poll_survives_store_split_between_polls(spark, tmp_path):
    """The documented maintenance loop — polls with a fixed bucket
    argument, ``maybe_split``/``split`` between polls — must keep working
    after the store grows: polls open with ``LinkStore.open_or_create``
    (adopt the on-disk count), so a split does not strand the loop on a
    bucket-count mismatch, ids stay stable, and the post-split poll's
    ranks still match the pre-split trajectory's semantics (fresh srcs
    rank identically to an unsplit store over the same crawl)."""
    from linkgraph.incremental import link_store_rank_poll
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages

    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    pages1 = gen_pages(spark, 40)
    pages1.coalesce(1).write.mode("overwrite").parquet(stage)
    m1 = link_store_rank_poll(spark, stage, state, partitions=8, buckets=4)
    assert m1["edges"] > 0
    dict1 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/dict").collect()}

    # ops maintenance between polls: grow the store
    store = LinkStore.open_or_create(spark, f"{state}/links", buckets=4)
    assert store.split(2)["buckets"] == 8

    # the next poll (same creation-count argument) must adopt 8, not raise
    gen_pages(spark, 50).coalesce(1).write.mode("overwrite").parquet(stage)
    m2 = link_store_rank_poll(spark, stage, state, partitions=8, buckets=4)
    assert m2["urls"] >= m1["urls"]
    dict2 = {r["url"]: r["id"] for r in spark.read.parquet(f"{state}/dict").collect()}
    for u, i in dict1.items():
        assert dict2[u] == i, f"{u} renumbered across the split"
    assert LinkStore.open_or_create(spark, f"{state}/links").buckets == 8


def test_crash_between_merge_and_dict_commit_recovers_urls(spark, tmp_path):
    """THE dictionary crash window: a poll that merges new pages into the
    store but dies before committing the extended dictionary replays with
    ``touched_buckets=[]`` — the lost merge's urls are invisible to a
    touched-bucket candidate scan, and ``pairs_to_edges`` would silently
    drop their edges from every later poll. The dict watermark stamp must
    detect the gap and fall back to a full-bucket candidate scan, after
    which every url in the store's current pairs has a dictionary id and
    the converged ranks match a from-scratch batch build."""
    import datetime as dt

    from linkgraph.algos import pagerank
    from linkgraph.build import build_graph
    from linkgraph.incremental import link_store_rank_poll
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages, page_url

    eps = 1e-9
    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    pages1 = gen_pages(spark, 40)
    targets = [r["url"] for r in pages1.select("url").orderBy("url").limit(3).collect()]
    pages1.coalesce(1).write.mode("overwrite").parquet(stage)
    m1 = link_store_rank_poll(spark, stage, state, eps=eps, partitions=8, buckets=8)
    assert m1["edges"] > 0

    # simulated crash: new pages (fresh urls) are merged into the store,
    # but the poll dies before the dictionary commit
    crash_pages = spark.createDataFrame(
        [
            (
                page_url(7000 + i),
                dt.datetime(2024, 6, 4, 12, 0, i),
                f'<html><body><a href="{t}">t</a></body></html>'.encode(),
                "",
                "en",
            )
            for i, t in enumerate(targets)
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    crash_pages.coalesce(1).write.mode("append").parquet(stage)
    store = LinkStore(spark, f"{state}/links", buckets=None)
    store.ingest(stage)
    assert store.merge()["new_rows"] > 0

    # replay poll: its own merge sees nothing new, so only the stale-dict
    # fallback can recover the crashed merge's urls
    m2 = link_store_rank_poll(spark, stage, state, eps=eps, partitions=8, buckets=8)
    assert m2["new_rows"] == 0

    dictionary = spark.read.parquet(f"{state}/dict")
    pairs = LinkStore(spark, f"{state}/links", buckets=None).current_pairs()
    pair_urls = (
        pairs.select(F.col("src_url").alias("url"))
        .unionByName(pairs.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    missing = pair_urls.join(dictionary, "url", "left_anti").count()
    assert missing == 0, f"{missing} store urls absent from the dictionary"
    for i in range(len(targets)):
        assert dictionary.filter(F.col("url") == page_url(7000 + i)).count() == 1

    # and the committed ranks equal a from-scratch batch build+rank
    g = build_graph(pages1.unionByName(crash_pages), partitions=8)
    batch = pagerank(spark, g.edges, vertices=g.vertices.select("id"), eps=eps, max_iters=200)
    inc = (
        spark.read.parquet(f"{state}/ranks")
        .join(dictionary, "id")
        .select("url", F.col("rank").alias("inc_rank"))
    )
    ref = batch.state.join(g.vertices.select("id", "url"), "id").select(
        "url", F.col("rank").alias("batch_rank")
    )
    both = inc.join(ref, "url").toPandas()
    assert len(both) == inc.count() > 0
    assert np.allclose(
        both["inc_rank"].to_numpy(), both["batch_rank"].to_numpy(), rtol=0, atol=100 * eps
    )


def test_components_poll_never_warms_from_nonconverged_labels(spark, tmp_path):
    """Labels committed by a run that exhausted max_iters mid-propagation
    are not a fixpoint; warm-starting from them with a touched-bucket
    frontier would freeze the unfinished propagation into every later
    poll. The ``converged`` stamp must force the next poll cold, and once
    a poll converges the labels must equal batch WCC and re-enable the
    warm path."""
    import datetime as dt

    from linkgraph.algos import wcc
    from linkgraph.build import build_graph
    from linkgraph.incremental import link_store_components_poll
    from linkgraph.synth import page_url

    def chain_pages(n, t0=0):
        # p_i -> p_{i+1}: a path graph, diameter n-1 — min-label
        # propagation needs ~n rounds, so a tiny max_iters cannot converge
        rows = [
            (
                page_url(i),
                dt.datetime(2024, 6, 5, 12, 0, t0),
                f'<html><body><a href="{page_url(i + 1)}">n</a></body></html>'.encode(),
                "",
                "en",
            )
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        )

    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    chain_pages(24).coalesce(1).write.mode("overwrite").parquet(stage)
    m1 = link_store_components_poll(
        spark, stage, state, max_iters=3, partitions=8, buckets=8
    )
    assert m1["edges"] > 0 and not m1["converged"]

    # grow-only append: the watermark matches and replaced_srcs == 0, so
    # ONLY the converged stamp stands between this poll and a wrong warm
    # start from the half-propagated labels
    extra = spark.createDataFrame(
        [
            (
                page_url(900),
                dt.datetime(2024, 6, 5, 13, 0, 0),
                f'<html><body><a href="{page_url(0)}">n</a></body></html>'.encode(),
                "",
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    extra.coalesce(1).write.mode("append").parquet(stage)
    m2 = link_store_components_poll(
        spark, stage, state, max_iters=200, partitions=8, buckets=8
    )
    assert m2["replaced_srcs"] == 0
    assert not m2["warm_started"], "warm-started from a non-fixpoint seed"
    assert m2["converged"]

    # converged labels equal batch WCC over the same crawl (joined by url)
    g = build_graph(chain_pages(24).unionByName(extra), partitions=8)
    batch = wcc(spark, g.edges, vertices=g.vertices.select("id"))
    dictionary = spark.read.parquet(f"{state}/dict")
    inc = (
        spark.read.parquet(f"{state}/comps")
        .join(dictionary, "id")
        .select("url", F.col("comp").alias("inc_comp"))
    )
    ref = (
        batch.state.join(g.vertices.select("id", "url"), "id")
        .select("url", F.col("comp").alias("batch_comp"))
    )
    both = inc.join(ref, "url").toPandas()
    assert len(both) == inc.count() > 0
    # component PARTITIONS must match (ids differ across the two
    # dictionaries; the min-id labels are dictionary-relative)
    import pandas as pd

    grp_inc = both.groupby("inc_comp")["url"].apply(frozenset).tolist()
    grp_ref = both.groupby("batch_comp")["url"].apply(frozenset).tolist()
    assert sorted(grp_inc, key=sorted) == sorted(grp_ref, key=sorted)

    # a following grow-only poll warm-starts again
    extra2 = spark.createDataFrame(
        [
            (
                page_url(901),
                dt.datetime(2024, 6, 5, 14, 0, 0),
                f'<html><body><a href="{page_url(1)}">n</a></body></html>'.encode(),
                "",
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    extra2.coalesce(1).write.mode("append").parquet(stage)
    m3 = link_store_components_poll(
        spark, stage, state, max_iters=200, partitions=8, buckets=8
    )
    assert m3["warm_started"] and m3["converged"]


def test_components_poll_zero_iters_never_stamps_converged(spark, tmp_path):
    """A poll run with ``max_iters=0`` commits state0 — every vertex its
    own singleton component — with EMPTY engine metrics (the loop body
    never ran). Defaulting empty metrics to "changed == 0" would stamp
    that labeling ``converged: true``; every later grow-only poll would
    then pass all three warm gates and frontier-restrict away the old
    vertices, freezing the singletons in as the 'converged' output
    forever. Empty metrics must stamp NOT converged, and the next real
    poll must cold-start and reach the true fixpoint."""
    import datetime as dt

    from linkgraph.incremental import link_store_components_poll
    from linkgraph.io import read_state_meta
    from linkgraph.synth import gen_pages, page_url

    stage = str(tmp_path / "pages")
    state = str(tmp_path / "state")
    gen_pages(spark, 40).coalesce(1).write.mode("overwrite").parquet(stage)
    m0 = link_store_components_poll(
        spark, stage, state, max_iters=0, partitions=8, buckets=8
    )
    assert m0["edges"] > 0 and m0["iterations"] == 0
    assert not m0["converged"], "zero-propagation poll claimed convergence"
    meta = read_state_meta(spark, f"{state}/comps")
    assert meta is not None and meta.get("converged") is False

    # grow-only append: watermark matches, replaced_srcs == 0 — only the
    # stamp stands between the next poll and warm-starting from singletons
    extra = spark.createDataFrame(
        [
            (
                page_url(900),
                dt.datetime(2024, 6, 6, 12, 0, 0),
                f'<html><body><a href="{page_url(0)}">n</a></body></html>'.encode(),
                "",
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    extra.coalesce(1).write.mode("append").parquet(stage)
    m1 = link_store_components_poll(
        spark, stage, state, max_iters=200, partitions=8, buckets=8
    )
    assert m1["replaced_srcs"] == 0
    assert not m1["warm_started"], "warm-started from an unverified state0"
    assert m1["converged"] and m1["iterations"] > 0
