"""Structured Streaming surface (demo-scope).

The reference engine is batch-iterative — FlashGraph has no streaming
(SURVEY.md §2.3 "Streaming") — so this module is deliberately small: it
shows how the same DataFrame programs run incrementally over the ``events``
table, which is the Spark-native path a production crawl pipeline would use
for continuous ingest (new WARC batches -> incremental edge-table upserts):

- watermarked tumbling-window aggregation (``windowed_event_counts``);
- a **custom stateful operator** via ``applyInPandasWithState``
  (``sessionize_stream``): gap-based user sessionization, the canonical
  op that windowed aggregation cannot express (session extent depends on
  the data, not the clock grid). The batch twin (``sessionize_events``,
  lag + running-sum window frames) is DuckDB-oracle-checked and the test
  suite proves stream ≡ batch for all closed sessions.

``run_*_once`` helpers use the availableNow trigger so tests can drive a
real streaming query to completion against static parquet and compare it
with the batch equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

WINDOW = "1 hour"
WATERMARK = "2 hours"


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling-window counts + value sums per event_type (works on both a
    batch DataFrame and a streaming one — same logical program)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", WATERMARK)
    return (
        src.groupBy(F.window("ts", WINDOW).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


SESSION_GAP_SECONDS = 6 * 3600  # new session after 6h of user inactivity

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("session_no", LongType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
        StructField("value_sum", DoubleType(), True),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_no", LongType(), True),
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("value_sum", DoubleType(), True),
    ]
)


def sessionize_events(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Batch gap-sessionization: a session breaks where the inter-event gap
    exceeds ``gap_seconds`` (lag + running sum over an ordered frame —
    SURVEY.md §2.3 W "frame specs"). ``session_no`` is 1-based per user in
    time order, so the output is exactly reproducible by the streaming
    stateful operator."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may load as TIMESTAMP_NTZ (no direct double cast); the extra
    # timestamp cast is zone-offset-invariant under subtraction
    ts_secs = F.col("ts").cast("timestamp").cast("double")
    gap = ts_secs - F.lag(ts_secs).over(w)
    marked = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn("session_no", F.sum("new_sess").over(wsum))
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


def _sessionize_fn(gap_seconds: int):
    """Build the applyInPandasWithState update function (one user per key).

    State = the currently-open session; each micro-batch appends its rows
    in time order, emitting every session that a later event closes. Open
    sessions stay in state across triggers (closed-session output is
    therefore identical to the batch twin minus each user's final session).
    """
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        user_id = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        # robust to the pandas datetime resolution Arrow hands over (ns or us)
        ts_us = pd.Series(rows["ts"].values.astype("datetime64[us]").astype("int64"))
        # NULL value -> NaN under Arrow; raw float addition would poison
        # the session's value_sum to NaN forever, while the batch twin's
        # F.sum SKIPS nulls — zero-fill matches it for every session with
        # >=1 non-null value (an all-null session reads 0.0 here vs NULL
        # in batch; the event still counts toward n_events in both)
        vals = rows["value"].astype("float64").fillna(0.0)

        if state.exists:
            session_no, start_us, last_us, n_events, value_sum = state.get
        else:
            session_no, start_us, last_us, n_events, value_sum = 0, None, None, 0, 0.0

        out = []
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if start_us is None:
                session_no, start_us, last_us, n_events, value_sum = 1, t, t, 1, v
            elif t - last_us > gap_us:
                out.append((session_no, start_us, last_us, n_events, value_sum))
                session_no, start_us, last_us, n_events, value_sum = (
                    session_no + 1, t, t, 1, v,
                )
            else:
                # min/max, not assignment: the watermark admits rows up to
                # WATERMARK late, and a cross-batch late row (t < last_us)
                # must not REGRESS the session bounds — a regressed last_us
                # both emits an invalid interval (session_end < start) and
                # mis-computes the next row's gap (an on-time follow-up
                # would falsely close the session). Late rows are absorbed
                # with clamped bounds: counts/sums stay exact; only the
                # gap-split decision can differ from the batch twin, which
                # sees globally sorted data (see sessionize_stream's
                # docstring for the precise guarantee).
                start_us, last_us, n_events, value_sum = (
                    min(start_us, t), max(last_us, t), n_events + 1, value_sum + v,
                )
        state.update((session_no, start_us, last_us, n_events, value_sum))

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_no": [o[0] for o in out],
                    "session_start": pd.to_datetime([o[1] for o in out], unit="us"),
                    "session_end": pd.to_datetime([o[2] for o in out], unit="us"),
                    "n_events": [o[3] for o in out],
                    # unrounded: Python round() is banker's (half-to-even)
                    # while the batch twin uses Spark F.round (HALF_UP) and
                    # the oracle DuckDB ROUND (half away from zero) — the
                    # shared rounding happens in one place, Spark-side, in
                    # sessionize_stream's final projection
                    "value_sum": [o[4] for o in out],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Streaming twin of ``sessionize_events`` as a custom stateful operator
    (applyInPandasWithState). Emits a session when a later event closes it.

    Equality guarantee: for per-user event-time-ordered arrival (each
    user's events never cross micro-batches out of order), closed-session
    output is IDENTICAL to the batch twin minus each user's final (still-
    open) session — pinned by the pytest suite. Rows arriving late but
    inside the watermark are absorbed into the open session with clamped
    bounds (start=min, end=max; counts and sums exact): a one-pass
    operator cannot retroactively re-split sessions the way the batch
    twin's global sort can, so for late data only the gap-split decision
    may differ — never an invalid interval, never a dropped event."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        # one rounding convention for batch, stream, and oracle: Spark
        # F.round (HALF_UP), applied to the exact unrounded session sum
        .withColumn("value_sum", F.round("value_sum", 2))
    )


def run_sessionize_stream_once(
    spark: SparkSession,
    events_path: str,
    out_dir: str,
    checkpoint_location: str,
) -> DataFrame:
    """Drive the stateful sessionization to completion (availableNow, file
    micro-batches) into a parquet sink; returns ALL sessions emitted so far.

    Repeated calls against a growing input directory resume from the stream
    checkpoint and process only new files — the test harness uses this to
    feed deterministic in-order micro-batches (event-time order across
    files is the ingest contract; the watermark bounds how late data may
    arrive in production). The parquet sink is the checkpoint-recoverable
    sink (memory sink is not), and is what a production run would use.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_path)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # a first poll over a dir with no (new) event files runs zero
    # micro-batches and the sink never creates out_dir — same guard the
    # edge-ingest twin documents; an empty sessions frame, not
    # PATH_NOT_FOUND
    from linkgraph.io import read_parquet_or_empty

    return read_parquet_or_empty(spark, out_dir, SESSION_SCHEMA)


def run_windowed_counts_once(
    spark: SparkSession, events_path: str, table_name: str = "stream_out"
) -> DataFrame:
    """Drive the streaming query to completion (availableNow) into a memory
    sink; returns the sink contents as a DataFrame."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_path)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


# ------------------------------------------------ continuous edge ingest

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def extract_pairs_stream(pages: DataFrame) -> DataFrame:
    """Link extraction as a streaming-safe transform: one output row per
    (src_url, warc_ts, dst_url). Identical logic batch or stream — the
    pandas UDF (Arrow batches) runs per micro-batch under streaming.

    This is the continuous-crawl ingest path the north-star pipeline
    implies: new WARC batches land as files, each micro-batch extracts its
    links, and the pair log grows append-only. ``warc_ts`` rides along so
    re-crawls are resolvable downstream (``current_edge_pairs``).

    ``explode_outer``, not ``explode``: a crawl with ZERO links must still
    land one (src_url, warc_ts, NULL) tombstone row — otherwise a page
    that goes dead (soft-404/paywall re-crawl) leaves no trace in the log
    and its stale edges would survive the latest-crawl view forever."""
    from linkgraph.extract import extract_links_udf

    return pages.select(
        F.col("url").alias("src_url"),
        "warc_ts",
        # the same tie-break key latest_snapshot uses: on a (url, warc_ts)
        # collision both paths resolve to the md5-max crawl
        F.md5("html").alias("crawl_fp"),
        F.explode_outer(extract_links_udf(F.col("html"), F.col("url"))).alias("dst_url"),
    )


def current_edge_pairs(pairs: DataFrame) -> DataFrame:
    """Latest-crawl view over the append-only pair log: each src_url's
    pairs from its most recent ``warc_ts`` only (re-crawled pages REPLACE
    their outlinks — append-log + latest-view is the Parquet-only stand-in
    for an Iceberg ``MERGE INTO``; ingest contract: (url, warc_ts) unique,
    which real crawl ids satisfy). Distinct (src_url, dst_url) output
    feeds the same url-dictionary + edge build as the batch path."""
    # winner per src_url: max (warc_ts, crawl_fp) — crawl_fp breaks
    # timestamp ties exactly as latest_snapshot does batch-side, so the
    # two ingest paths never diverge on a (url, warc_ts) collision
    latest = pairs.groupBy("src_url").agg(
        F.max(F.struct("warc_ts", "crawl_fp")).alias("w")
    )
    winner = latest.select(
        "src_url",
        F.col("w.warc_ts").alias("warc_ts"),
        F.col("w.crawl_fp").alias("crawl_fp"),
    )
    return (
        pairs.join(winner, ["src_url", "warc_ts", "crawl_fp"], "left_semi")
        # drop zero-link tombstones AFTER the latest-crawl restriction:
        # the tombstone's warc_ts must win the max() so the dead page's
        # older edges vanish, but it contributes no edge itself
        .filter(F.col("dst_url").isNotNull())
        .select("src_url", "dst_url")
        .distinct()
    )


def run_edge_ingest_batches(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    checkpoint_location: str,
) -> None:
    """Like ``run_edge_ingest_once`` but sinks each micro-batch as a PLAIN
    parquet append (foreachBatch) instead of the streaming parquet sink.

    Needed when the target dir changes between polls (LinkStore's per-poll
    delta dirs): the streaming sink's ``_spark_metadata`` log is numbered
    by the checkpoint's GLOBAL batch id, so a fresh sink dir whose first
    batch id is nonzero is unreadable to batch readers (missing log entry
    0). Plain appends drop the sink-side exactly-once dedup — a batch
    replayed after a crash lands twice — which is exactly the contract the
    LinkStore merge is built for: its winner rule + row dedup make
    duplicate delta rows a no-op, so at-least-once here is sufficient."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(pages_path)
    )

    def write_batch(df: DataFrame, _batch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    q = (
        extract_pairs_stream(stream)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_edge_ingest_once(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    checkpoint_location: str,
) -> DataFrame:
    """Drive the streaming link-extraction to completion (availableNow,
    file micro-batches) appending to the parquet pair log; returns the log.
    Repeated calls against a growing pages directory resume from the
    stream checkpoint and process only new files."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(pages_path)
    )
    q = (
        extract_pairs_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    log_schema = StructType(
        [
            StructField("src_url", StringType(), True),
            StructField("warc_ts", TimestampType(), True),
            StructField("crawl_fp", StringType(), True),
            StructField("dst_url", StringType(), True),
        ]
    )
    # first poll before any pages landed: the sink never created out_dir —
    # an empty log, not an error (the caller loops); real read failures
    # propagate (linkgraph.io)
    from linkgraph.io import read_parquet_or_empty

    return read_parquet_or_empty(spark, out_dir, log_schema)
