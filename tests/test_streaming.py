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
