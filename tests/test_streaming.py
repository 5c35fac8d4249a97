"""Streaming demo: availableNow streaming result == batch result."""

from __future__ import annotations

import os
import shutil


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    from linkgraph.streaming import run_windowed_counts_once, windowed_event_counts

    src = "/root/testdata/sf0.001/events.parquet"
    # stage as a directory of parquet files (streaming source needs a dir)
    stage = str(tmp_path / "events")
    os.makedirs(stage, exist_ok=True)
    spark.read.parquet(src).repartition(3).write.mode("overwrite").parquet(stage)

    batch = (
        windowed_event_counts(spark.read.parquet(stage))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    streamed = (
        run_windowed_counts_once(spark, stage)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert batch.equals(streamed)
    assert len(batch) > 0


def _sessions_pdf(df):
    pdf = (
        df.toPandas()
        .sort_values(["user_id", "session_no"])
        .reset_index(drop=True)
    )
    for c in ("session_start", "session_end"):
        pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization == batch window sessionization
    for every CLOSED session (a user's final session stays open in state),
    fed as two in-order micro-batch runs resuming from the stream
    checkpoint."""
    import pandas as pd

    from linkgraph.streaming import (
        run_sessionize_stream_once,
        sessionize_events,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cut = "2024-01-15"
    stage = str(tmp_path / "events_sess")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    # batch 1: first half by event time
    events.filter(f"ts < '{cut}'").coalesce(1).write.mode("overwrite").parquet(stage)
    got1 = _sessions_pdf(run_sessionize_stream_once(spark, stage, out, ckpt))
    # batch 2: the rest arrives later (event-time order across files);
    # the second run resumes from the checkpoint and processes only it
    events.filter(f"ts >= '{cut}'").coalesce(1).write.mode("append").parquet(stage)
    streamed = _sessions_pdf(run_sessionize_stream_once(spark, stage, out, ckpt))

    batch = _sessions_pdf(sessionize_events(events))
    # closed sessions only: drop each user's last (max session_no) session
    last = batch.groupby("user_id")["session_no"].transform("max")
    closed = batch[batch["session_no"] != last].reset_index(drop=True)

    assert len(streamed) > 0
    pd.testing.assert_frame_equal(
        streamed.astype({"n_events": "int64", "session_no": "int64"}),
        closed.astype({"n_events": "int64", "session_no": "int64"}),
        check_dtype=False,
    )
    # and at least one session must have been closed ACROSS the two runs
    # (state carried over the checkpoint restart)
    assert len(streamed) > len(got1)
