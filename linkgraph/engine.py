"""BSP superstep engine (SURVEY.md §2.1 A5).

The reference's graph_engine (worker threads + message queues + level
barrier, FlashGraph FAST'15 §3.3–3.5) maps onto Spark as: a Python driver
loop over DataFrame transforms, where the shuffle boundary of the
message-combine ``groupBy`` IS the superstep barrier and Spark's partial
aggregation IS the message combiner.

Spark-specific responsibilities handled here (SURVEY.md §4):

- **Lineage truncation**: iterative DataFrame loops grow the logical plan
  without bound; every ``checkpoint_every`` supersteps the vertex-state
  table is written to parquet and re-read (plan reset).
- **Resume** (BASELINE.json north_rule: "resumable from checkpoint with
  per-partition lineage + metrics"): each checkpoint directory
  ``ckpt/it=N`` carries a ``_meta.json`` with the iteration number,
  per-partition row counts + xxhash64 checksums, schema, and wall time;
  ``run(resume=True)`` restarts from the latest valid checkpoint.
- **Metrics**: one JSONL row per superstep (iteration, seconds, rows, plus
  algorithm-supplied scalars such as convergence delta).
"""

from __future__ import annotations

import json
import os
import re
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from linkgraph.conventions import CHECKPOINT_EVERY

# step(state, iteration) -> new state (must contain the same id column)
StepFn = Callable[[DataFrame, int], DataFrame]
# stop(new_state, iteration) -> (stop?, metrics dict). Runs ≤1 Spark action.
StopFn = Callable[[DataFrame, int], tuple[bool, dict]]


@dataclass
class ObservedStop:
    """Stop/telemetry computed for FREE on the superstep's own
    materialization.

    A plain ``StopFn`` costs one extra O(V) aggregation job per superstep
    (scan the localCheckpoint'd state, reduce a scalar). ``ObservedStop``
    instead attaches ``metrics`` (named aggregate Columns) to the new
    state via ``DataFrame.observe`` — Spark evaluates them task-side
    DURING the eager ``localCheckpoint`` the engine already runs for
    lineage truncation, so stop decisions and per-round telemetry add
    **zero** Spark jobs. At crawl scale (1,000-superstep runs) that is a
    thousand scans of vertex state not taken.

    ``decide(observed_metrics, iteration) -> stop?`` runs driver-side on
    the observed scalars; the scalars are logged as the superstep's
    metrics row. ``decide=None`` means pure telemetry (never stops).

    ``metrics`` is a zero-arg FACTORY (not a dict): Column construction
    needs an active SparkContext, and stop definitions are routinely built
    at module import time, before any session exists.
    """

    metrics: Callable[[], dict[str, Column]]
    decide: Callable[[dict, int], bool] | None = None


# ---------------------------------------------------------------- fs helpers
#
# Checkpoint METADATA must live beside the checkpoint parquet — which on a
# cluster is shared storage (hdfs:// s3a:// ...), where the driver's local
# open()/os.listdir() silently miss or fail. These helpers route the tiny
# metadata IO through the same Hadoop FileSystem Spark writes the parquet
# with; for plain local paths they resolve to the local fs transparently.

def _hadoop_fs(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    fs, p = _hadoop_fs(spark, path_str)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path_str: str) -> str:
    fs, p = _hadoop_fs(spark, path_str)
    stream = fs.open(p)
    jvm = spark._jvm
    bos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 4096, True)
    return bytes(bos.toByteArray()).decode("utf-8")


def fs_exists(spark: SparkSession, path_str: str) -> bool:
    fs, p = _hadoop_fs(spark, path_str)
    return bool(fs.exists(p))


def fs_list_names(spark: SparkSession, dir_str: str) -> list[str]:
    fs, p = _hadoop_fs(spark, dir_str)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def fs_delete(spark: SparkSession, path_str: str) -> None:
    fs, p = _hadoop_fs(spark, path_str)
    if fs.exists(p):
        fs.delete(p, True)


def fs_mkdirs(spark: SparkSession, path_str: str) -> None:
    fs, p = _hadoop_fs(spark, path_str)
    fs.mkdirs(p)


def fs_restore_asides(
    spark: SparkSession, live_dir: str, aside_dir: str, label: str
) -> None:
    """Complete any per-bucket rename-aside swap a crash interrupted — the
    one repair protocol shared by every bucket store (LinkStore.latest/,
    HostAgg.parts/). Invariant from the swap order (delete aside; live ->
    aside; staged -> live; delete aside): for each ``lb=`` bucket EITHER
    the live dir exists and is complete (its aside is stale residue —
    drop it) OR only the aside holds the bucket's pre-swap content (the
    swap died between its two renames — restore it; the caller's replay
    redoes that bucket). A refused restore rename is raised, not
    swallowed: continuing without the bucket would silently drop it."""
    for name in fs_list_names(spark, aside_dir):
        if not name.startswith("lb="):
            continue
        live = f"{live_dir}/{name}"
        aside = f"{aside_dir}/{name}"
        if fs_exists(spark, live):
            fs_delete(spark, aside)
        elif not fs_rename(spark, aside, live):
            raise IOError(f"{label}: repair rename {aside} -> {live} failed")


def fs_rename(spark: SparkSession, src_str: str, dst_str: str) -> bool:
    """Directory/file rename via the Hadoop FS API — atomic on HDFS and
    local filesystems (object stores degrade to copy). Returns False if
    the source is missing or the FS refuses the rename."""
    fs, src = _hadoop_fs(spark, src_str)
    _, dst = _hadoop_fs(spark, dst_str)
    if not fs.exists(src):
        return False
    return bool(fs.rename(src, dst))


def fs_dir_bytes(spark: SparkSession, path_str: str) -> int:
    """Total bytes under a path (Hadoop ContentSummary — one namenode RPC
    per call, no data read); 0 if the path is missing."""
    fs, p = _hadoop_fs(spark, path_str)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def make_changed_stop(metric_key: str = "changed", stop_on_zero: bool = True) -> ObservedStop:
    """The standard frontier stop/telemetry: sum the boolean ``changed``
    column of the new state, log it under ``metric_key``, and (unless
    ``stop_on_zero`` is off — fixed-iteration telemetry mode) stop when it
    hits 0. One shared definition for every frontier kernel; observed on
    the superstep's own materialization, so it costs no extra job."""
    return ObservedStop(
        metrics=lambda: {metric_key: F.sum(F.col("changed").cast("long"))},
        decide=(lambda m, it: int(m[metric_key] or 0) == 0) if stop_on_zero else None,
    )


def _plain(v):
    """Observed metric values -> JSON-loggable python scalars (sum over an
    empty state observes as None; decimal-space checksums as Decimal)."""
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


@dataclass
class RunResult:
    state: DataFrame
    iterations: int
    metrics: list[dict] = field(default_factory=list)
    resumed_from: int | None = None


def _partition_lineage(state: DataFrame) -> list[dict]:
    """Per-partition row counts + order-insensitive checksums."""
    cols = [F.col(c).cast("string") for c in state.columns]
    rows = (
        state.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # ANSI mode: sum of full-range longs overflows; sum in decimal space
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).cast("string").alias("checksum"),
        )
        .collect()
    )
    return [
        {"partition": r["__pid"], "rows": r["rows"], "checksum": r["checksum"]}
        for r in sorted(rows, key=lambda r: r["__pid"])
    ]


class SuperstepEngine:
    """Runs an iterative vertex program as a driver loop over DataFrames."""

    def __init__(
        self,
        spark: SparkSession,
        ckpt_dir: str | None = None,
        checkpoint_every: int = CHECKPOINT_EVERY,
        metrics_path: str | None = None,
        lineage_in_meta: bool = True,
        keep_checkpoints: int = 2,
    ) -> None:
        """``keep_checkpoints``: how many newest ``it=N`` checkpoint dirs to
        retain (older ones are deleted after each successful checkpoint —
        a 1,000-superstep crawl-scale run must not accumulate O(run)
        storage). ≥1; pass 0/None to keep everything."""
        self.spark = spark
        self.ckpt_dir = ckpt_dir
        self.checkpoint_every = checkpoint_every
        # remember whether the metrics file is ours (derived from
        # ckpt_dir) or caller-owned: only the default file is rotated by
        # a fresh run — an explicit path may be a deliberately shared log
        self._metrics_is_default = metrics_path is None and ckpt_dir is not None
        self.metrics_path = metrics_path or (
            os.path.join(ckpt_dir, "metrics.jsonl") if ckpt_dir else None
        )
        self.lineage_in_meta = lineage_in_meta
        self.keep_checkpoints = keep_checkpoints
        self._warned_uri_metrics = False

    # ------------------------------------------------------------ checkpoints

    def _ckpt_path(self, iteration: int) -> str:
        assert self.ckpt_dir is not None
        return os.path.join(self.ckpt_dir, f"it={iteration}")

    def checkpoint(self, state: DataFrame, iteration: int, seconds: float) -> DataFrame:
        """Write state + _meta.json, return the re-read (lineage-free) state."""
        path = self._ckpt_path(iteration)
        state.write.mode("overwrite").parquet(path)
        reread = self.spark.read.parquet(path)
        meta = {
            "iteration": iteration,
            "seconds": seconds,
            "schema": reread.schema.jsonValue(),
            "partitions": _partition_lineage(reread) if self.lineage_in_meta else [],
        }
        meta["rows"] = sum(p["rows"] for p in meta["partitions"]) if meta["partitions"] else None
        # through the Hadoop FS: _meta.json sits beside the parquet, which
        # on a cluster is shared storage where driver-local open() fails
        fs_write_text(self.spark, os.path.join(path, "_meta.json"), json.dumps(meta))
        self._prune_checkpoints(iteration)
        return reread

    def _prune_checkpoints(self, current_it: int) -> None:
        """Retention: drop all but the newest ``keep_checkpoints`` COMPLETE
        checkpoints at or below the current iteration. Runs only AFTER a
        successful write+meta, so the newest survivor is always resumable.
        Two guards: only complete (_meta.json) checkpoints can occupy a
        retention slot (a killed-mid-write dir is deleted, never kept over
        a valid older one), and dirs numbered ABOVE the current iteration
        are never touched — pruning by raw dict order in a reused ckpt_dir
        would delete the checkpoint this run just wrote while "keeping" a
        previous run's stale higher-numbered ones."""
        if not self.keep_checkpoints or not self.ckpt_dir:
            return
        complete: list[int] = []
        incomplete: list[int] = []
        for name in fs_list_names(self.spark, self.ckpt_dir):
            m = re.fullmatch(r"it=(\d+)", name)
            if not m or (it := int(m.group(1))) > current_it:
                continue
            has_meta = fs_exists(
                self.spark, os.path.join(self._ckpt_path(it), "_meta.json")
            )
            (complete if has_meta else incomplete).append(it)
        keep = set(sorted(complete)[-self.keep_checkpoints:])
        for it in complete:
            if it not in keep:
                fs_delete(self.spark, self._ckpt_path(it))
        for it in incomplete:
            fs_delete(self.spark, self._ckpt_path(it))

    def latest_checkpoint(self) -> tuple[int, str] | None:
        if not self.ckpt_dir:
            return None
        best: tuple[int, str] | None = None
        for name in fs_list_names(self.spark, self.ckpt_dir):
            m = re.fullmatch(r"it=(\d+)", name)
            if not m:
                continue
            path = os.path.join(self.ckpt_dir, name)
            if not fs_exists(self.spark, os.path.join(path, "_meta.json")):
                continue  # incomplete checkpoint (e.g. killed mid-write)
            it = int(m.group(1))
            if best is None or it > best[0]:
                best = (it, path)
        return best

    def _log_metrics(self, record: dict) -> None:
        if not self.metrics_path:
            return
        if "://" in self.metrics_path:
            # append-mode JSONL is driver-local telemetry; object stores /
            # HDFS don't append — metrics stay available on RunResult.
            # Warn ONCE so a caller configuring cluster metrics learns the
            # file is not being written rather than finding nothing later.
            if not self._warned_uri_metrics:
                self._warned_uri_metrics = True
                import warnings

                warnings.warn(
                    f"metrics_path {self.metrics_path!r} is a URI; per-"
                    "superstep JSONL appends are driver-local only — no "
                    "file will be written (metrics remain on RunResult)",
                    stacklevel=3,
                )
            return
        parent = os.path.dirname(self.metrics_path)
        if parent:  # bare filename -> cwd; makedirs("") raises
            os.makedirs(parent, exist_ok=True)
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # ------------------------------------------------------------------- run

    def run(
        self,
        initial_state: DataFrame,
        step: StepFn,
        max_iters: int,
        should_stop: StopFn | ObservedStop | None = None,
        resume: bool = False,
        shuffle_partitions: int | None = None,
    ) -> RunResult:
        state = initial_state
        start_iter = 0
        resumed_from: int | None = None
        if resume:
            latest = self.latest_checkpoint()
            if latest is not None:
                start_iter, path = latest
                state = self.spark.read.parquet(path)
                resumed_from = start_iter
        elif self.ckpt_dir:
            # fresh run over a reused ckpt_dir: a previous run's it=N dirs
            # must not survive — they would confuse retention (stale
            # higher-numbered dirs out-sorting this run's fresh ones) and a
            # later resume=True would silently resume the WRONG run (same
            # refuse-stale rule as scc's phase checkpoints)
            for name in fs_list_names(self.spark, self.ckpt_dir):
                if re.fullmatch(r"it=\d+", name):
                    fs_delete(self.spark, os.path.join(self.ckpt_dir, name))
            # the same refuse-stale rule for the telemetry file beside the
            # it=N dirs: appending a fresh run to the previous run's
            # metrics.jsonl would interleave duplicate iteration numbers
            # with contradictory timings. Only the DEFAULT (ckpt_dir-
            # derived) file is ours to rotate; an explicit metrics_path
            # may be a deliberately shared log.
            if self._metrics_is_default and "://" not in self.metrics_path:
                try:
                    os.unlink(self.metrics_path)
                except OSError:
                    pass

        metrics: list[dict] = []
        # Superstep plans are identical every iteration and stage sizes are
        # known after iteration 1 — AQE's per-iteration replanning is pure
        # overhead inside the loop (measured ~2-3x per-superstep latency).
        # One-shot queries outside the loop keep the session's AQE setting.
        aqe_before = self.spark.conf.get("spark.sql.adaptive.enabled")
        # Inside the loop every join is between the sorted, co-partitioned
        # edge cache (build.gather_layout) and vertex state that comes out
        # of localCheckpoint hash-partitioned AND id-sorted, so sort-merge
        # joins stream both sides with zero per-superstep sort. Left to the
        # cost model, the gather join instead plans as a shuffled-hash join
        # that BUILDS ON THE EDGE SIDE every superstep (the checkpointed
        # state scan has unknown stats, so the O(E) cache looks like the
        # small side) — O(E) hash-map builds per iteration, the single
        # worst plan in the loop. Forcing SMJ here is strictly better: any
        # unsorted side (resume-from-parquet state, raw test layouts) pays
        # one small O(V) sort, never an O(E) build.
        smj_before = self.spark.conf.get("spark.sql.join.preferSortMergeJoin")
        # Loop-scoped shuffle-partition override: kernels resolve a gather
        # partition count from the DATA (build.resolve_partitions — scale-
        # adaptive, not the session's one-shot-query constant) and every
        # in-loop exchange (message groupBy, apply join, state checkpoint)
        # must agree with the cached edge layout's partitioning or Catalyst
        # re-inserts a per-superstep Exchange. Setting it here (and
        # restoring after) keeps the whole loop on ONE consistent count:
        # a 2k-edge host graph iterates in 1-task stages instead of paying
        # the session's 64-task scheduling floor per superstep, while a
        # crawl-scale graph gets its size-derived count.
        sp_before = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        self.spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        if shuffle_partitions:
            self.spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            return self._run_loop(
                state, step, max_iters, should_stop, start_iter, resumed_from, metrics
            )
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
            self.spark.conf.set("spark.sql.join.preferSortMergeJoin", smj_before)
            self.spark.conf.set("spark.sql.shuffle.partitions", sp_before)

    def _run_loop(
        self,
        state: DataFrame,
        step: StepFn,
        max_iters: int,
        should_stop: StopFn | ObservedStop | None,
        start_iter: int,
        resumed_from: int | None,
        metrics: list[dict],
    ) -> RunResult:
        iteration = start_iter
        for iteration in range(start_iter + 1, max_iters + 1):
            t0 = time.monotonic()
            # localCheckpoint every superstep: the step function references
            # `state` more than once, so without truncation the logical plan
            # doubles per iteration (2^k blowup -> driver OOM). This cuts the
            # plan at a materialized RDD; the parquet checkpoint below is the
            # durable/resumable layer (SURVEY.md §4 "lineage blowup").
            plan = step(state, iteration)
            ob: Observation | None = None
            if isinstance(should_stop, ObservedStop):
                # stop metrics ride the localCheckpoint materialization —
                # no separate aggregation job (see ObservedStop)
                ob = Observation()
                plan = plan.observe(
                    ob,
                    *[expr.alias(k) for k, expr in should_stop.metrics().items()],
                )
            new_state = plan.localCheckpoint(eager=True)
            stop, algo_metrics = (False, {})
            if ob is not None:
                algo_metrics = {k: _plain(v) for k, v in ob.get.items()}
                if should_stop.decide is not None:
                    stop = bool(should_stop.decide(algo_metrics, iteration))
            elif should_stop is not None:
                stop, algo_metrics = should_stop(new_state, iteration)
            seconds = time.monotonic() - t0
            do_ckpt = self.ckpt_dir and (
                iteration % self.checkpoint_every == 0 or stop or iteration == max_iters
            )
            if do_ckpt:
                new_state = self.checkpoint(new_state, iteration, seconds)
            state = new_state
            record = {"iteration": iteration, "seconds": round(seconds, 4), **algo_metrics}
            metrics.append(record)
            self._log_metrics(record)
            if stop:
                break
        return RunResult(state=state, iterations=iteration, metrics=metrics, resumed_from=resumed_from)
