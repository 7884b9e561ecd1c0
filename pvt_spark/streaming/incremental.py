"""Incremental page ingest via Structured Streaming.

The reference is strictly batch (SURVEY §2.9); its resume unit is the
stage file. For continuously-arriving crawl data we add an incremental
front half: a file/parquet stream of pages runs through the SAME
extract + geotag kernels (stateless, so mapInPandas/pandas UDFs are
streaming-safe) and appends Hilbert-keyed points; the pyramid stages
then run as periodic batch compactions over the appended points
(leaves/tree/content are re-aggregations — cheap relative to ingest).

``trigger(availableNow=True)`` gives exactly-once batch-incremental
semantics with a checkpoint directory — the streaming analog of the
pipeline's lineage snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract_pages
from ..operators.geotag import geotag
from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream of page parquet drops (new files = new pages)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
    )


def incremental_points(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> geotagged points stream (stateless kernels only)."""
    from pyspark.sql import functions as F

    pts = geotag(extract_pages(pages_stream))
    return pts.withColumn("feature_id", F.xxhash64("url", "mention_idx"))


def run_ingest(
    spark: SparkSession,
    pages_dir: str,
    points_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
):
    """One incremental ingest pass over all currently-available files."""
    stream = incremental_points(read_pages_stream(spark, pages_dir))
    q = (
        stream.writeStream.format("parquet")
        .option("path", points_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
