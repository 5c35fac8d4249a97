"""LinkStore: incrementally-maintained latest-crawl view — equivalence
with the full-log batch view, touched-bucket minimality, crash-replay
idempotence, and rank-poll parity with the pairlog-based loop."""

from __future__ import annotations

import datetime
import os

import numpy as np
from pyspark.sql import functions as F

BUCKETS = 8


def _write_poll(spark, pages_df, stage, mode):
    pages_df.coalesce(1).write.mode(mode).parquet(stage)


def _recrawl_rows(spark, pages, targets, add_link_to=None, kill=()):
    """Re-crawls of ``targets``: byte-identical html except the first one
    optionally gains a link; urls in ``kill`` are re-crawled with NO links
    (the tombstone case — every previous edge must vanish)."""
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


def test_linkstore_matches_batch_view_and_replay(spark, tmp_path):
    """Three polls (fresh crawl, re-crawl with a new link, tombstone): after
    every merge the store's pairs equal the batch winner view over the FULL
    log; then a simulated crash (meta rewound) re-merges already-merged
    deltas with no change and no duplicate rows; then a simulated mid-swap
    crash (bucket stranded in latest.aside) is repaired."""
    from linkgraph.engine import fs_rename
    from linkgraph.linkstore import LinkStore
    from linkgraph.streaming import current_edge_pairs
    from linkgraph.synth import gen_pages

    stage = str(tmp_path / "pages")
    store = LinkStore(spark, str(tmp_path / "links"), buckets=BUCKETS)

    pages1 = gen_pages(spark, 60)
    urls = [r["url"] for r in pages1.select("url").orderBy("url").limit(10).collect()]

    def batch_view():
        # ground truth: winner view over every row ever ingested
        from linkgraph.io import read_parquet_or_empty
        from linkgraph.linkstore import PAIR_COLS

        log = None
        for i in store._delta_indices():
            part = read_parquet_or_empty(spark, f"{store.deltas_dir}/d={i}", PAIR_COLS)
            log = part if log is None else log.unionByName(part)
        return {
            (r["src_url"], r["dst_url"])
            for r in current_edge_pairs(log).collect()
        }

    def store_view():
        return {
            (r["src_url"], r["dst_url"]) for r in store.current_pairs().collect()
        }

    _write_poll(spark, pages1, stage, "overwrite")
    store.ingest(stage)
    m1 = store.merge(keep_deltas=10)
    assert m1["new_rows"] > 0 and m1["merged_through"] == 0
    assert store_view() == batch_view() != set()

    _write_poll(
        spark,
        _recrawl_rows(spark, pages1, urls[:3], add_link_to=urls[-1]),
        stage,
        "append",
    )
    store.ingest(stage)
    m2 = store.merge(keep_deltas=10)
    assert m2["merged_through"] == 1
    v2 = store_view()
    assert v2 == batch_view()

    # tombstone poll: one page dies — all its edges must vanish
    _write_poll(spark, _recrawl_rows(spark, pages1, [], kill=[urls[1]]), stage, "append")
    store.ingest(stage)
    store.merge(keep_deltas=10)
    v3 = store_view()
    assert v3 == batch_view()
    assert not any(s == urls[1] for s, _ in v3) and any(s == urls[1] for s, _ in v2)

    # ---- crash replay: rewind meta so the last two deltas count as
    # unmerged and re-merge — winner-max idempotence must reproduce the
    # exact latest rows, including multiplicity (no duplicate rows)
    rows_before = sorted(
        map(tuple, store._read_latest().fillna("NULL", "dst_url").collect())
    )
    store._write_meta(0)
    replay = store.merge(keep_deltas=10)
    assert replay["merged_through"] == 2 and replay["new_rows"] > 0
    rows_after = sorted(
        map(tuple, store._read_latest().fillna("NULL", "dst_url").collect())
    )
    assert rows_after == rows_before

    # ---- mid-swap crash: strand one bucket in latest.aside (exactly the
    # state after rename(live->aside) dies before rename(staged->live));
    # the next merge's repair must restore it
    k = replay["touched_buckets"][0] if replay["touched_buckets"] else 0
    assert fs_rename(
        spark, f"{store.latest_dir}/lb={k}", f"{store.aside_dir}/lb={k}"
    )
    store._write_meta(1)  # force the merge to actually run (and repair)
    store.merge(keep_deltas=10)
    assert sorted(
        map(tuple, store._read_latest().fillna("NULL", "dst_url").collect())
    ) == rows_before


def test_linkstore_untouched_buckets_not_rewritten(spark, tmp_path):
    """A poll that re-crawls ONE page must rewrite only that src's bucket:
    every other bucket directory's files are bit-for-bit untouched (same
    names, sizes, mtimes) — the property that makes poll cost O(touched),
    not O(corpus)."""
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages

    stage = str(tmp_path / "pages")
    store = LinkStore(spark, str(tmp_path / "links"), buckets=BUCKETS)

    pages1 = gen_pages(spark, 60)
    _write_poll(spark, pages1, stage, "overwrite")
    store.ingest(stage)
    store.merge()

    def bucket_files():
        out = {}
        for name in os.listdir(store.latest_dir.replace("file:", "")):
            if not name.startswith("lb="):
                continue
            d = os.path.join(store.latest_dir, name)
            out[name] = sorted(
                (f, os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d)
                if not f.startswith((".", "_"))
            )
        return out

    before = bucket_files()
    assert len(before) > 1, "fixture too small to exercise bucket pruning"

    one = [r["url"] for r in pages1.select("url").orderBy("url").limit(1).collect()]
    _write_poll(spark, _recrawl_rows(spark, pages1, one, add_link_to=one[0] + "x"), stage, "append")
    store.ingest(stage)
    m = store.merge()
    assert m["touched_buckets"], "re-crawl produced no touched bucket"
    after = bucket_files()

    touched = {f"lb={k}" for k in m["touched_buckets"]}
    for name, files in before.items():
        if name in touched:
            continue
        assert after[name] == files, f"untouched bucket {name} was rewritten"


def test_link_store_rank_poll_matches_pairlog_poll(spark, tmp_path):
    """The LinkStore-backed poll and the full-log poll produce the SAME
    stable dictionary and the SAME converged ranks across a two-poll
    crawl (fresh + re-crawl-with-new-link)."""
    from linkgraph.incremental import incremental_rank_poll, link_store_rank_poll
    from linkgraph.synth import gen_pages

    eps = 1e-9
    pages1 = gen_pages(spark, 60)
    urls = [r["url"] for r in pages1.select("url").orderBy("url").limit(8).collect()]
    polls = [
        (pages1, "overwrite"),
        (_recrawl_rows(spark, pages1, urls[:3], add_link_to=urls[-1]), "append"),
    ]

    stage_a, state_a = str(tmp_path / "pages_a"), str(tmp_path / "state_a")
    stage_b, state_b = str(tmp_path / "pages_b"), str(tmp_path / "state_b")
    for pages, mode in polls:
        _write_poll(spark, pages, stage_a, mode)
        ma = incremental_rank_poll(spark, stage_a, state_a, eps=eps, max_iters=200, partitions=4)
        _write_poll(spark, pages, stage_b, mode)
        mb = link_store_rank_poll(
            spark, stage_b, state_b, eps=eps, max_iters=200, partitions=4, buckets=BUCKETS
        )
        assert ma["urls"] == mb["urls"] and ma["edges"] == mb["edges"]

    assert mb["warm_started"] and mb["new_rows"] > 0
    assert 0 < mb["touched_buckets"] < BUCKETS

    dict_a = {r["url"]: r["id"] for r in spark.read.parquet(f"{state_a}/dict").collect()}
    dict_b = {r["url"]: r["id"] for r in spark.read.parquet(f"{state_b}/dict").collect()}
    assert dict_a == dict_b

    ra = {r["id"]: r["rank"] for r in spark.read.parquet(f"{state_a}/ranks").collect()}
    rb = {r["id"]: r["rank"] for r in spark.read.parquet(f"{state_b}/ranks").collect()}
    assert set(ra) == set(rb)
    ids = sorted(ra)
    assert np.allclose(
        [ra[i] for i in ids], [rb[i] for i in ids], rtol=0, atol=100 * eps
    )


def test_linkstore_split_doubles_buckets_preserving_view(spark, tmp_path):
    """split() doubles B in place: the winner view is IDENTICAL before and
    after (and still equals the full-log batch view), every parent
    bucket's rows land only in its two children k and k+B, later merges
    keep working at the new count, a mid-split crash rolls forward safely,
    and the constructor refuses non-power-of-two counts but adopts the
    grown count via buckets=None."""
    import json

    import pytest

    from linkgraph.engine import fs_exists, fs_rename
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages

    stage = str(tmp_path / "pages")
    with pytest.raises(ValueError, match="power of two"):
        LinkStore(spark, str(tmp_path / "bad"), buckets=6)

    store = LinkStore(spark, str(tmp_path / "links"), buckets=BUCKETS)
    pages1 = gen_pages(spark, 60)
    _write_poll(spark, pages1, stage, "overwrite")
    store.ingest(stage)
    store.merge()

    def rows():
        return sorted(
            map(tuple, store._read_latest().drop("lb").fillna("NULL", "dst_url").collect())
        )

    def bucket_of():
        out = {}
        for r in store._read_latest().select("src_url", "lb").distinct().collect():
            out.setdefault(r["src_url"], set()).add(r["lb"])
        return {u: ks.pop() for u, ks in out.items() if len(ks) == 1}

    before_rows, before_lb = rows(), bucket_of()
    mt_before = store.merged_through()
    res = store.split()
    assert res["buckets"] == 2 * BUCKETS and store.buckets == 2 * BUCKETS
    assert store.merged_through() == mt_before
    assert rows() == before_rows, "split changed the winner rows"
    after_lb = bucket_of()
    for u, k in before_lb.items():
        assert after_lb[u] in (k, k + BUCKETS), (u, k, after_lb[u])

    # reopen: stale count refused, None adopts the grown count
    with pytest.raises(ValueError, match="buckets"):
        LinkStore(spark, str(tmp_path / "links"), buckets=BUCKETS)
    reopened = LinkStore(spark, str(tmp_path / "links"), buckets=None)
    assert reopened.buckets == 2 * BUCKETS

    # a post-split poll merges correctly at the new count and the store
    # still equals the full-log batch view
    from linkgraph.io import read_parquet_or_empty
    from linkgraph.linkstore import PAIR_COLS
    from linkgraph.streaming import current_edge_pairs

    urls = [r["url"] for r in pages1.select("url").orderBy("url").limit(3).collect()]
    _write_poll(spark, _recrawl_rows(spark, pages1, urls[:2], add_link_to=urls[2]), stage, "append")
    reopened.ingest(stage)
    m = reopened.merge()
    assert m["new_rows"] > 0 and all(k < 2 * BUCKETS for k in m["touched_buckets"])
    log = None
    for i in reopened._delta_indices():
        part = read_parquet_or_empty(spark, f"{reopened.deltas_dir}/d={i}", PAIR_COLS)
        log = part if log is None else log.unionByName(part)
    assert {
        (r["src_url"], r["dst_url"]) for r in reopened.current_pairs().collect()
    } == {(r["src_url"], r["dst_url"]) for r in current_edge_pairs(log).collect()}

    # ---- mid-split crash: stage + marker written, swap not run (the
    # exact state after split()'s fs_write_text). Re-opening the store
    # must roll the split forward; the view is unchanged.
    want = sorted(
        map(tuple, reopened._read_latest().drop("lb").fillna("NULL", "dst_url").collect())
    )
    fs_delete_ok = fs_rename(
        spark, reopened.latest_dir, reopened.split_staging_dir
    )  # fake "staging complete, latest already renamed away" crash point:
    #    marker present + staging present + latest missing
    assert fs_delete_ok
    from linkgraph.engine import fs_write_text

    fs_write_text(
        spark,
        reopened.split_marker_path,
        json.dumps({"from": 2 * BUCKETS, "to": 2 * BUCKETS,
                    "merged_through": reopened.merged_through()}),
    )
    recovered = LinkStore(spark, str(tmp_path / "links"), buckets=None)
    assert not fs_exists(spark, recovered.split_marker_path)
    assert fs_exists(spark, recovered.latest_dir)
    assert sorted(
        map(tuple, recovered._read_latest().drop("lb").fillna("NULL", "dst_url").collect())
    ) == want


def test_linkstore_factor_split_and_governor(spark, tmp_path):
    """split(factor) generalizes the doubling: one rewrite sends parent k's
    rows to exactly {k, k+B, k+2B, k+3B} at factor 4, view preserved; the
    maybe_split governor is a no-op under budget, picks the smallest
    power-of-two factor that restores the budget when over it, and
    refuses nonsense arguments."""
    import pytest

    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages

    stage = str(tmp_path / "pages")
    store = LinkStore(spark, str(tmp_path / "links"), buckets=BUCKETS)
    _write_poll(spark, gen_pages(spark, 60), stage, "overwrite")
    store.ingest(stage)
    store.merge()

    with pytest.raises(ValueError, match="power of two"):
        store.split(factor=3)
    with pytest.raises(ValueError, match="positive"):
        store.maybe_split(0)

    def rows():
        return sorted(
            map(tuple, store._read_latest().drop("lb").fillna("NULL", "dst_url").collect())
        )

    def bucket_of():
        out = {}
        for r in store._read_latest().select("src_url", "lb").distinct().collect():
            out.setdefault(r["src_url"], set()).add(r["lb"])
        return {u: ks.pop() for u, ks in out.items() if len(ks) == 1}

    # under budget: governor is a pure no-op (no rewrite, same count)
    sizes = store.bucket_bytes()
    assert sizes and all(v > 0 for v in sizes.values())
    res = store.maybe_split(max(sizes.values()) + 1)
    assert res == {
        "split": False,
        "buckets": BUCKETS,
        "max_bucket_bytes": max(sizes.values()),
        "budget_bytes": max(sizes.values()) + 1,
    }
    assert store.buckets == BUCKETS

    # over budget by >2x: the governor must pick factor 4 in ONE rewrite
    before_rows, before_lb = rows(), bucket_of()
    budget = max(sizes.values()) // 4 + 1  # 2*budget < max <= 4*budget
    assert 2 * budget < max(sizes.values()) <= 4 * budget
    res = store.maybe_split(budget)
    assert res["split"] and res["factor"] == 4 and "capped_factor" not in res
    assert store.buckets == 4 * BUCKETS and res["buckets"] == 4 * BUCKETS
    assert rows() == before_rows, "factor split changed the winner rows"
    for u, k in before_lb.items():
        assert bucket_of()[u] % BUCKETS == k % BUCKETS, (u, k)

    # reopen adopts the grown count; a later merge works at the new count
    reopened = LinkStore(spark, str(tmp_path / "links"), buckets=None)
    assert reopened.buckets == 4 * BUCKETS


def test_linkstore_meta_crash_window_heals_and_mismatch_refuses(spark, tmp_path):
    """``_write_meta``'s delete-then-rename window (staged ``.tmp``
    present, live ``_meta`` gone) must not lose the bucket count: a split
    store re-opened through ``open_or_create`` has to ADOPT the split
    count from the stage, not fall back to the caller's creation count —
    that fallback would re-bucket every later merge mod the wrong B,
    writing fresh winners to one dir while stale rows sit unread in
    another, and ``current_pairs()`` would return both. With the stage
    ALSO gone (out-of-band damage) the constructor must refuse when
    on-disk ``lb=`` indices prove the requested count wrong."""
    import pytest

    from linkgraph.engine import (
        fs_delete,
        fs_exists,
        fs_list_names,
        fs_read_text,
        fs_write_text,
    )
    from linkgraph.linkstore import LinkStore
    from linkgraph.synth import gen_pages

    stage = str(tmp_path / "pages")
    root = str(tmp_path / "links")
    store = LinkStore(spark, root, buckets=BUCKETS)
    _write_poll(spark, gen_pages(spark, 60), stage, "overwrite")
    store.ingest(stage)
    store.merge()
    store.split()  # BUCKETS -> 2*BUCKETS
    mt = store.merged_through()
    view = {(r["src_url"], r["dst_url"]) for r in store.current_pairs().collect()}
    # precondition for the refusal half below: some bucket index proves
    # the creation count wrong (deterministic for gen_pages(60))
    live_idx = [
        int(n.split("=", 1)[1])
        for n in fs_list_names(spark, store.latest_dir)
        if n.startswith("lb=")
    ]
    assert max(live_idx) >= BUCKETS, "synth data no longer touches high buckets"

    # simulate the crash: the staged copy holds the latest JSON, the live
    # file is already deleted, the rename never ran
    fs_write_text(spark, store.meta_path + ".tmp", fs_read_text(spark, store.meta_path))
    fs_delete(spark, store.meta_path)

    healed = LinkStore.open_or_create(spark, root, buckets=BUCKETS)
    assert healed.buckets == 2 * BUCKETS, "crash window lost the split count"
    assert healed.merged_through() == mt
    assert fs_exists(spark, healed.meta_path), "stage not healed into place"
    assert not fs_exists(spark, healed.meta_path + ".tmp")
    assert {
        (r["src_url"], r["dst_url"]) for r in healed.current_pairs().collect()
    } == view

    # out-of-band damage: meta AND stage gone; the creation count is now
    # provably wrong (lb= dirs >= BUCKETS exist) -> refuse, don't guess
    fs_delete(spark, healed.meta_path)
    with pytest.raises(ValueError, match="provably"):
        LinkStore(spark, root, buckets=BUCKETS)
    # the true count still opens (degrades to re-merging retained deltas)
    assert LinkStore(spark, root, buckets=2 * BUCKETS).buckets == 2 * BUCKETS
