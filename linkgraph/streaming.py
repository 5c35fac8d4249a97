"""Structured Streaming surface (demo-scope).

The reference engine is batch-iterative — FlashGraph has no streaming
(SURVEY.md §2.3 "Streaming") — so this module is deliberately small: it
shows how the same DataFrame programs run incrementally over the ``events``
table with watermarked tumbling windows, which is the Spark-native path a
production crawl pipeline would use for continuous ingest (new WARC batches
-> incremental edge-table upserts).

``run_windowed_counts_once`` uses the availableNow trigger so tests can
drive a real streaming query to completion against static parquet and
compare it with the batch equivalent (exactly-once semantics make the two
results identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
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
