"""Incremental ingest: exactly-once append across two file drops."""

import os

from pvt_spark.sources.pages import synthesize_pages
from pvt_spark.streaming.incremental import run_ingest


def test_incremental_ingest_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    points_dir = str(tmp_path / "points")
    ckpt = str(tmp_path / "ckpt")

    # drop 1
    synthesize_pages(spark, 100, seed=42, partitions=2).write.mode("append").parquet(pages_dir)
    run_ingest(spark, pages_dir, points_dir, ckpt)
    n1 = spark.read.parquet(points_dir).count()
    assert n1 > 0

    # re-run with no new files: nothing appended (checkpoint dedup)
    run_ingest(spark, pages_dir, points_dir, ckpt)
    assert spark.read.parquet(points_dir).count() == n1

    # drop 2: only the new pages are processed
    synthesize_pages(spark, 50, seed=7, partitions=1).write.mode("append").parquet(pages_dir)
    run_ingest(spark, pages_dir, points_dir, ckpt)
    n2 = spark.read.parquet(points_dir).count()
    assert n2 > n1

    # points carry provenance + hilbert keys
    row = spark.read.parquet(points_dir).first()
    assert row.url.startswith("https://") and row.h is not None
    assert os.path.isdir(ckpt)
