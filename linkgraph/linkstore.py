"""Incrementally-maintained latest-crawl link store.

The naive incremental loop derives the latest-crawl view by scanning the
ENTIRE append-only pair log every poll (``streaming.current_edge_pairs``)
— a per-poll cost that grows with crawl HISTORY, not graph size, which is
what dies first on a continuous web-scale crawl (the log is a strict
superset of the graph: every re-crawl appends its full outlink set
forever). This module materializes the latest view once and then keeps it
current with per-poll cost **O(new rows + touched buckets)**:

    root/
      deltas/d=N/     per-poll raw pair rows (the streaming sink's target
                      for poll N — availableNow micro-batches, so each
                      poll's dir holds exactly the rows ingested since the
                      previous poll; the shared stream checkpoint
                      guarantees each page file is extracted once overall)
      latest/lb=K/    the CURRENT winner rows, hive-partitioned by
                      lb = pmod(xxhash64(src_url), buckets)
      latest.aside/   bucket dirs renamed aside mid-swap (repair state)
      latest.splitstage/, latest.presplit/, _split
                      split() staging / pre-split copy / roll-forward
                      marker (transient; any open completes a marked split)
      _meta           {"merged_through": N, "buckets": B}

A merge takes the unmerged delta rows, computes which ``lb`` buckets they
touch, reads ONLY those partitions of ``latest/`` (partition-pruned scan),
re-runs the per-src winner rule — ``max (warc_ts, crawl_fp)``, the same
tie-break as the batch path — over (current winners ∪ new rows), and
swaps just the touched bucket directories. Two bounds, in order of
importance: (1) merge cost is bounded by the CURRENT CORPUS — never by
crawl history, which the log-scanning variant pays and which grows
without bound; (2) when a poll's changed srcs are few relative to the
bucket count (poll often, or crawl locality), untouched buckets are never
read or written, so the common small poll costs O(new + touched bucket
bytes). Under uniform hashing a poll changing n srcs touches
~B·(1-(1-1/B)^n) buckets — size B so the steady-state poll's n stays
well under it.

Bucket count is NOT fixed for the store's lifetime: B must be a power of
two, and ``split(factor)`` multiplies it in place — lb = h mod B refines
to h mod f·B, so each parent bucket maps onto exactly its f children
k, k+B, …, k+(f−1)B with no re-keying of untouched rows
(consistent-hashing-style growth). That keeps bound (2) live at any
corpus size: when bucket bytes outgrow the merge budget (the
10^12-document regime where a 64-bucket store would put ~15B rows in
every touched bucket), ``maybe_split(max_bucket_bytes)`` — the
between-polls merge-cost governor — measures per-bucket bytes
(driver-side ContentSummary, no data read) and performs ONE rewrite by
the smallest power-of-two factor that restores the budget; the per-poll
merge bound is then O(new rows + touched buckets · budget). This also
bounds the hot-bucket pathology (a frequently re-crawled mega-host
hashing into one bucket forces every poll to rewrite that whole
bucket): the governor keeps "that whole bucket" ≤ budget bytes, down to
the irreducible floor of a single src's own winner rows.

Crash safety rides on ALGEBRA, not filesystem atomicity: the winner rule
is an idempotent, commutative, monotone max — re-merging an
already-merged delta over the already-swapped bucket reproduces the same
rows (a tombstone or a newer crawl can never be un-won by replaying older
rows). ``_meta.merged_through`` only ADVANCES after every touched bucket
is swapped, so any crash simply replays the merge; the one non-idempotent
window — a bucket dir mid-rename — is covered by the rename-aside
protocol plus ``_repair_asides`` (at most one bucket can be mid-swap, and
its complete pre-swap content sits in ``latest.aside`` until the swap
completes). ``_meta`` itself is staged (full JSON at ``.tmp`` before the
live file is touched) and ``_read_meta`` heals the delete-done-rename-not
window from the staged copy, so the bucket count survives any crash;
losing ``_meta`` AND its stage (out-of-band damage) degrades to
re-merging every retained delta under the caller's bucket count — and the
constructor refuses outright when on-disk ``lb=`` indices prove that
count wrong (a mis-bucketed merge would silently resurrect stale rows).

Tombstone rows (``dst_url IS NULL`` — a re-crawled page that died or lost
all links) are RETAINED in ``latest/``: they must keep winning the max so
a replayed older delta cannot resurrect the dead page's edges; readers
filter them out (same order of operations as the batch view).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.engine import (
    fs_delete,
    fs_exists,
    fs_list_names,
    fs_mkdirs,
    fs_read_text,
    fs_rename,
    fs_restore_asides,
    fs_write_text,
)
from linkgraph.io import read_parquet_or_empty

PAIR_COLS = "src_url string, warc_ts timestamp, crawl_fp string, dst_url string"
_LATEST_SCHEMA = PAIR_COLS + ", lb int"


def latest_rows(rows: DataFrame) -> DataFrame:
    """THE winner rule, shared with the batch view: keep each src_url's
    rows from its max (warc_ts, crawl_fp) crawl — crawl_fp breaks
    timestamp ties exactly as ``streaming.current_edge_pairs`` and the
    batch ``latest_snapshot`` do, so no path can diverge on a collision.
    Tombstones (dst_url NULL) are kept; dedup absorbs replayed rows."""
    w = rows.groupBy("src_url").agg(F.max(F.struct("warc_ts", "crawl_fp")).alias("w"))
    winner = w.select(
        "src_url", F.col("w.warc_ts").alias("warc_ts"), F.col("w.crawl_fp").alias("crawl_fp")
    )
    return (
        rows.join(winner, ["src_url", "warc_ts", "crawl_fp"], "left_semi")
        # replayed deltas re-contribute rows the store already holds
        .dropDuplicates(["src_url", "warc_ts", "crawl_fp", "dst_url"])
    )


class LinkStore:
    def __init__(self, spark: SparkSession, root: str, buckets: int | None = 64):
        """``buckets`` must be a power of two (so ``split`` can double it:
        lb = h mod B refines to h mod 2B, sending each bucket's rows to
        exactly its two children k and k+B). Pass ``buckets=None`` to adopt
        whatever the store on disk was built with — the right spelling for
        re-opening a store that may have been split since it was created."""
        self.spark = spark
        self.root = root.rstrip("/")
        self.deltas_dir = f"{self.root}/deltas"
        self.latest_dir = f"{self.root}/latest"
        self.aside_dir = f"{self.root}/latest.aside"
        self.staging_dir = f"{self.root}/latest.staging"
        self.split_staging_dir = f"{self.root}/latest.splitstage"
        self.presplit_dir = f"{self.root}/latest.presplit"
        self.split_marker_path = f"{self.root}/_split"
        self.meta_path = f"{self.root}/_meta"
        self._finish_split()  # complete any crash-interrupted split first
        meta = self._read_meta()
        if meta is not None:
            if buckets is not None and meta["buckets"] != buckets:
                raise ValueError(
                    f"LinkStore at {self.root} was built with buckets="
                    f"{meta['buckets']}, opened with buckets={buckets}; open "
                    "with buckets=None to adopt the on-disk count, or grow "
                    "it explicitly with split()"
                )
            self.buckets = int(meta["buckets"])
        else:
            b = 64 if buckets is None else int(buckets)
            if b <= 0 or b & (b - 1):
                raise ValueError(
                    f"buckets must be a power of two (got {b}): split() "
                    "doubles the count by refining lb = h mod B to h mod 2B, "
                    "which only maps each bucket onto exactly two children "
                    "when B is a power of two"
                )
            self.buckets = b
            # no meta, not even a recoverable .tmp: if merged bucket dirs
            # exist on disk anyway (meta deleted out-of-band), the true
            # count is unknowable. When any lb index >= b the mismatch is
            # PROVEN — refuse rather than let merges mis-bucket (a src
            # re-hashed mod b would get fresh winners in one dir while its
            # stale rows sit unread in another, and current_pairs() would
            # return both). Indices all < b can still be wrong in theory,
            # but the only internal path to missing-meta is the rename
            # window that _read_meta now heals; this guard is for
            # external damage.
            live = [
                int(n.split("=", 1)[1])
                for n in fs_list_names(self.spark, self.latest_dir)
                if n.startswith("lb=")
            ]
            if live and max(live) >= b:
                raise ValueError(
                    f"LinkStore at {self.root} has merged bucket dirs up to "
                    f"lb={max(live)} but no _meta; buckets={b} is provably "
                    "wrong and the on-disk count is unknowable — refusing"
                )

    @classmethod
    def open_or_create(
        cls, spark: SparkSession, root: str, buckets: int = 64
    ) -> "LinkStore":
        """Open an existing store ADOPTING its on-disk bucket count, or
        create a fresh one with ``buckets``. This is the spelling the
        steady-state polls use: the ops loop grows the store between polls
        (``maybe_split``), so a poll pinning the creation-time count would
        refuse to open its own store after the first split. Before the
        first merge the count has no on-disk footprint (deltas carry no
        lb), so "exists" is keyed on ``_meta`` — written by every merge
        and every split — or its staged ``.tmp`` (the crash window that
        ``_read_meta`` heals must adopt, not re-create)."""
        meta = f"{root.rstrip('/')}/_meta"
        exists = fs_exists(spark, meta) or fs_exists(spark, meta + ".tmp")
        return cls(spark, root, buckets=None if exists else buckets)

    # ------------------------------------------------------------- metadata
    def _read_meta(self) -> dict | None:
        if fs_exists(self.spark, self.meta_path):
            return json.loads(fs_read_text(self.spark, self.meta_path))
        # crash-window recovery: _write_meta stages the COMPLETE JSON at
        # .tmp before deleting the live file, so "meta missing, tmp
        # present" is exactly the delete-done-rename-not window — finish
        # the interrupted rename and carry on. Without this, a split
        # store re-opened through open_or_create would fall back to the
        # caller's creation-time bucket count and every later merge would
        # mis-bucket (stale rows resurrected from dirs it never reads).
        # A truncated tmp can only coexist with a LIVE meta (the staged
        # write strictly precedes the delete), so this branch never sees
        # partial JSON from our own protocol; the parse guard is for
        # out-of-band damage only.
        tmp = self.meta_path + ".tmp"
        if fs_exists(self.spark, tmp):
            try:
                meta = json.loads(fs_read_text(self.spark, tmp))
            except ValueError:
                return None
            if isinstance(meta, dict) and "buckets" in meta and "merged_through" in meta:
                fs_rename(self.spark, tmp, self.meta_path)  # best-effort heal
                return meta
        return None

    def _write_meta(self, merged_through: int) -> None:
        # staged: a crash mid-write must not leave truncated JSON. Losing
        # the rename race window (delete done, rename not) degrades to
        # "meta missing" = re-merge all retained deltas — idempotent.
        tmp = self.meta_path + ".tmp"
        fs_write_text(
            self.spark,
            tmp,
            json.dumps({"merged_through": merged_through, "buckets": self.buckets}),
        )
        fs_delete(self.spark, self.meta_path)
        if not fs_rename(self.spark, tmp, self.meta_path):
            raise IOError(f"LinkStore: rename {tmp} -> {self.meta_path} failed")

    def merged_through(self) -> int:
        meta = self._read_meta()
        return meta["merged_through"] if meta is not None else -1

    def _delta_indices(self) -> list[int]:
        return sorted(
            int(n.split("=", 1)[1])
            for n in fs_list_names(self.spark, self.deltas_dir)
            if n.startswith("d=")
        )

    def _lb(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.buckets)).cast("int")

    # -------------------------------------------------------------- ingest
    def ingest(self, pages_path: str) -> int:
        """Drive the streaming link extraction over any new page files into
        this poll's delta dir (plain-parquet batch appends — see
        ``streaming.run_edge_ingest_batches`` for why the streaming sink
        can't target per-poll dirs, and why at-least-once is enough here);
        returns the target delta index. If a previous poll crashed before
        merging, its delta dir is REUSED so the unmerged backlog stays in
        one place."""
        from linkgraph.streaming import run_edge_ingest_batches

        done = self.merged_through()
        unmerged = [i for i in self._delta_indices() if i > done]
        target = max(unmerged) if unmerged else done + 1
        run_edge_ingest_batches(
            self.spark,
            pages_path,
            f"{self.deltas_dir}/d={target}",
            f"{self.root}/ingest_ckpt",
        )
        return target

    # --------------------------------------------------------------- merge
    def _repair_asides(self) -> None:
        """Complete any bucket swap a crash interrupted. Invariant from the
        swap order below: for each bucket, EITHER latest/lb=K exists and is
        complete (aside is stale residue — drop it) OR only the aside holds
        the bucket's pre-swap content (the swap died between its two
        renames — restore it; the merge will redo that bucket)."""
        fs_restore_asides(self.spark, self.latest_dir, self.aside_dir, "LinkStore")

    def _read_latest(self, touched: list[int] | None = None) -> DataFrame:
        df = read_parquet_or_empty(self.spark, self.latest_dir, _LATEST_SCHEMA)
        if touched is not None:
            # partition filter on the hive key: Spark prunes to the touched
            # bucket directories — the scan never opens an untouched bucket
            df = df.filter(F.col("lb").isin([int(k) for k in touched]))
        return df

    def merge(self, keep_deltas: int = 4, track_replaced: bool = False) -> dict:
        """Fold all unmerged deltas into ``latest/``; returns merge stats.
        Safe to call after any crash — see the module docstring's
        idempotence argument.

        ``track_replaced`` adds ``replaced_srcs``: how many of the poll's
        src_urls already had winner rows before this merge (re-crawls /
        tombstones — the events that can REMOVE edges). 0 means the poll
        was grow-only, which is the precondition for warm-starting
        monotone label state (``wcc(init_comps=...)``). One extra
        partition-pruned scan of the touched buckets, so opt-in.
        Conservative on crash replay: a replayed delta's srcs are already
        winners, count as replaced, and merely force one cold start."""
        self._repair_asides()
        done = self.merged_through()
        unmerged = [i for i in self._delta_indices() if i > done]
        if not unmerged:
            out = {"new_rows": 0, "touched_buckets": [], "merged_through": done}
            if track_replaced:
                out["replaced_srcs"] = 0
            return out

        new = None
        for i in unmerged:
            part = read_parquet_or_empty(
                self.spark, f"{self.deltas_dir}/d={i}", PAIR_COLS
            )
            new = part if new is None else new.unionByName(part)
        new = new.withColumn("lb", self._lb(F.col("src_url"))).localCheckpoint(eager=True)
        n_new = new.count()
        high = max(unmerged)
        if n_new == 0:
            self._write_meta(high)
            self._prune_deltas(high, keep_deltas)
            out = {"new_rows": 0, "touched_buckets": [], "merged_through": high}
            if track_replaced:
                out["replaced_srcs"] = 0
            return out

        touched = sorted(
            r["lb"] for r in new.select("lb").distinct().collect()
        )  # bounded by self.buckets — driver-side metadata, like BFS sources
        cur = self._read_latest(touched)
        replaced_srcs = None
        if track_replaced:
            # must be counted BEFORE the bucket swap replaces latest/
            replaced_srcs = (
                new.select("src_url")
                .distinct()
                .join(cur.select("src_url").distinct(), "src_url", "left_semi")
                .count()
            )
        merged = latest_rows(cur.unionByName(new)).withColumn(
            "lb", self._lb(F.col("src_url"))
        )

        fs_delete(self.spark, self.staging_dir)
        merged.write.partitionBy("lb").mode("overwrite").parquet(self.staging_dir)

        fs_mkdirs(self.spark, self.latest_dir)
        fs_mkdirs(self.spark, self.aside_dir)
        for k in touched:
            name = f"lb={k}"
            live, aside = f"{self.latest_dir}/{name}", f"{self.aside_dir}/{name}"
            staged = f"{self.staging_dir}/{name}"
            if not fs_exists(self.spark, staged):
                # cannot happen: a touched bucket has ≥1 new row, whose
                # src's winning crawl emits ≥1 winner row (tombstones are
                # rows too) — a missing staged dir means the write lied
                raise IOError(f"LinkStore: staged bucket {staged} missing after write")
            fs_delete(self.spark, aside)
            if fs_exists(self.spark, live) and not fs_rename(self.spark, live, aside):
                raise IOError(f"LinkStore: rename {live} -> {aside} failed")
            if not fs_rename(self.spark, staged, live):
                raise IOError(f"LinkStore: rename {staged} -> {live} failed")
            fs_delete(self.spark, aside)
        fs_delete(self.spark, self.staging_dir)

        self._write_meta(high)
        self._prune_deltas(high, keep_deltas)
        out = {"new_rows": n_new, "touched_buckets": touched, "merged_through": high}
        if track_replaced:
            out["replaced_srcs"] = replaced_srcs
        return out

    # --------------------------------------------------------------- split
    def split(self, factor: int = 2) -> dict:
        """Multiply the bucket count IN PLACE — the store's growth path.

        Why it exists: merge cost is O(new rows + touched-bucket BYTES),
        and bucket bytes grow with the corpus. A store created with
        buckets=64 at 10^12 documents puts ~15B rows in every touched
        bucket, decaying the bound toward O(corpus). Splitting restores
        the bound without re-keying the universe: lb = h mod B refines to
        h mod f·B (``factor`` a power of two), so parent bucket k's rows
        land in exactly children k, k+B, …, k+(f−1)B — each rewrite task
        reads one parent and writes f children, no shuffle of untouched
        keys, perfectly partition-parallel. Call it whenever steady-state
        polls touch most buckets or bucket bytes outgrow the merge
        budget. The rewrite is one full-store pass regardless of factor,
        so a store that has outgrown its budget by 8× should split once
        with factor=8, not three times (``maybe_split`` computes the
        factor from measured bucket bytes and does exactly that).

        Crash safety (same refuse-don't-guess style as merge): the
        rewritten store is staged COMPLETELY, then a marker records
        (from, to, merged_through), then the swap runs
        rename(latest -> presplit); rename(stage -> latest); meta(to);
        cleanup. ``_finish_split`` (run on every open) rolls the swap
        FORWARD from any crash point — the marker is only ever written
        after staging is complete, so forward is always safe — and the
        winner rows themselves never change, only their directory, so
        delta replay invariants are untouched."""
        f = int(factor)
        if f < 2 or f & (f - 1):
            raise ValueError(f"split factor must be a power of two >= 2 (got {factor})")
        self._repair_asides()
        b_from, b_to = self.buckets, self.buckets * f
        fs_delete(self.spark, self.split_staging_dir)
        cur = self._read_latest()
        (
            cur.drop("lb")
            .withColumn("lb", F.pmod(F.xxhash64("src_url"), F.lit(b_to)).cast("int"))
            .write.partitionBy("lb")
            .mode("overwrite")
            .parquet(self.split_staging_dir)
        )
        fs_write_text(
            self.spark,
            self.split_marker_path,
            json.dumps(
                {"from": b_from, "to": b_to, "merged_through": self.merged_through()}
            ),
        )
        self._finish_split()
        return {"buckets": self.buckets}

    def _finish_split(self) -> None:
        """Roll a marked split forward to completion (no-op without a
        marker). Idempotent at every crash point: each step is guarded by
        the existence of its input, and re-writing meta is harmless."""
        if not fs_exists(self.spark, self.split_marker_path):
            return
        marker = json.loads(fs_read_text(self.spark, self.split_marker_path))
        if fs_exists(self.spark, self.split_staging_dir):
            # staging is complete (the marker is written only after) and
            # not yet swapped in
            if fs_exists(self.spark, self.latest_dir):
                fs_delete(self.spark, self.presplit_dir)
                if not fs_rename(self.spark, self.latest_dir, self.presplit_dir):
                    raise IOError(
                        f"LinkStore: split rename {self.latest_dir} -> "
                        f"{self.presplit_dir} failed"
                    )
            if not fs_rename(self.spark, self.split_staging_dir, self.latest_dir):
                raise IOError(
                    f"LinkStore: split rename {self.split_staging_dir} -> "
                    f"{self.latest_dir} failed"
                )
        # else: already swapped in by an earlier attempt — finish bookkeeping
        self.buckets = int(marker["to"])
        self._write_meta(int(marker["merged_through"]))
        fs_delete(self.spark, self.presplit_dir)
        fs_delete(self.spark, self.split_marker_path)

    def bucket_bytes(self) -> dict[int, int]:
        """On-disk bytes per live bucket (driver-side metadata: one
        listing + one ContentSummary RPC per bucket dir, bounded by B —
        no data read, no Spark job)."""
        from linkgraph.engine import fs_dir_bytes

        out: dict[int, int] = {}
        for name in fs_list_names(self.spark, self.latest_dir):
            if name.startswith("lb="):
                out[int(name.split("=", 1)[1])] = fs_dir_bytes(
                    self.spark, f"{self.latest_dir}/{name}"
                )
        return out

    def maybe_split(self, max_bucket_bytes: int) -> dict:
        """Merge-cost governor: split (once, by the right factor) iff any
        bucket's bytes exceed ``max_bucket_bytes``.

        This is the between-polls maintenance call that keeps the merge
        bound O(new rows + touched buckets · budget) as the corpus grows:
        the ops loop picks the budget (what one merge may re-read/rewrite
        per touched bucket) and the governor keeps every bucket under it.
        The factor is the smallest power of two that brings the LARGEST
        bucket under budget assuming uniform hash refinement within the
        bucket — one full-store rewrite total, however far the store has
        outgrown the budget. Deliberately NOT called inside ``merge``:
        a poll's cost must stay predictable; growth is an explicit,
        schedulable maintenance step (``incremental`` loop docstring).

        Limit of the mechanism, stated honestly: splitting refines the
        src_url hash, so it cannot shrink a bucket dominated by a SINGLE
        src's winner rows (one row per outlink of that src). Per-src
        bytes are bounded by max outdegree — megabytes, not the
        gigabyte-scale budgets this governs — so the assumption holds on
        web graphs; a bucket already at one src simply stops shrinking
        and the governor reports it rather than splitting forever
        (``capped_factor`` in the result, factor capped at 4096×/call)."""
        budget = int(max_bucket_bytes)
        if budget <= 0:
            raise ValueError(f"max_bucket_bytes must be positive (got {max_bucket_bytes})")
        sizes = self.bucket_bytes()
        biggest = max(sizes.values(), default=0)
        out = {
            "split": False,
            "buckets": self.buckets,
            "max_bucket_bytes": biggest,
            "budget_bytes": budget,
        }
        if biggest <= budget:
            return out
        factor = 2
        while biggest > budget * factor and factor < 4096:
            factor *= 2
        out.update(self.split(factor), split=True, factor=factor)
        if biggest > budget * factor:
            out["capped_factor"] = True
        return out

    def _prune_deltas(self, merged_through: int, keep: int) -> None:
        """Merged deltas are replay fuel, not live state — keep the last
        ``keep`` for post-crash re-merges and debugging, delete the rest
        (an unbounded crawl would otherwise accumulate O(history) storage,
        the exact disease this store cures)."""
        merged = [i for i in self._delta_indices() if i <= merged_through]
        for i in merged[: max(0, len(merged) - keep)]:
            fs_delete(self.spark, f"{self.deltas_dir}/d={i}")

    # -------------------------------------------------------------- readers
    def current_pairs(self) -> DataFrame:
        """The full latest-crawl (src_url, dst_url) view — same contract as
        ``streaming.current_edge_pairs`` over the complete log."""
        return (
            self._read_latest()
            .filter(F.col("dst_url").isNotNull())
            .select("src_url", "dst_url")
            .distinct()
        )

    def changed_urls(self, touched: list[int] | None) -> DataFrame:
        """Distinct urls appearing in the touched buckets' CURRENT winner
        rows — the only urls a poll can have introduced, which is all the
        id dictionary needs to see (winner-restricted so the dictionary
        matches what a full-log rebuild would produce). ``touched=None``
        scans EVERY bucket — the recovery spelling for a dictionary that
        cannot prove it reflects the store (a poll that crashed between
        its merge and its dict commit replays with touched_buckets=[],
        so the lost merge's urls are only reachable by a full scan);
        ``touched=[]`` stays the cheap no-new-rows empty result."""
        if touched is not None and not touched:
            return self.spark.createDataFrame([], "url string")
        rows = self._read_latest(touched).filter(F.col("dst_url").isNotNull())
        return (
            rows.select(F.col("src_url").alias("url"))
            .unionByName(rows.select(F.col("dst_url").alias("url")))
            .distinct()
        )
