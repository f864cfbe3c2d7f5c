"""File-source Structured Streaming over the events table.

``Trigger.AvailableNow`` processes everything currently in the source and
stops — the streaming twin of the reference's daily batch (SURVEY.md §2.8):
the same code incrementally processes new files when they land, with
watermarks bounding state instead of the reference's re-fetch-3-days trick.

Scale: the aggregation state is (window x event_type) — tiny; the file
source lists incrementally (maxFilesPerTrigger governs batch size at 100 TB
backfill); watermark 2h bounds state growth for continuous runs.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.plans._util import T, dec


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, with the same nanos->timestamp
    normalization as the batch loader (_util.T)."""
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # The file source wants a directory; select just the events file via
    # pathGlobFilter so sibling tables in sf_dir aren't picked up.
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream


def hourly_agg_stream(stream: DataFrame) -> DataFrame:
    """Watermarked 1-hour tumbling aggregate per event type."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value", 18, 6)), 4).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    agg: DataFrame, spark: SparkSession, name: str = "stream_out"
) -> DataFrame:
    """Run the streaming query to completion (AvailableNow) into a memory
    sink and return the result as a batch DataFrame."""
    checkpoint = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
