"""Bucketed table layout — shuffle-free repeated joins.

A join between two tables bucketed INTO THE SAME bucket count ON the
join key needs no exchange: every bucket pair is co-located by layout,
so Spark plans a SortMergeJoin with zero Exchange operators (and zero
Sort operators when the buckets were written sorted, one file per
bucket). At 100 TB this is THE technique for dimension tables and
fact tables that join on the same key every batch — the shuffle is
paid ONCE at write time and amortized across every subsequent join,
exactly like the reference's Hilbert-ordered layout amortizes range
scans (SURVEY §2.6/O1).

Usage shape:

    write_bucketed(points, "pts", "feature_id", 64, path=...)
    write_bucketed(tags, "tags", "feature_id", 64, path=...)
    spark.table("pts").join(spark.table("tags"), "feature_id")
    # -> SortMergeJoin with NO Exchange and NO Sort (plan-tested)

Bucketed writes go through the session catalog (`saveAsTable`); pass
``path`` to keep the files in an external location (the catalog entry
is just metadata). The writer repartitions to one file per bucket —
multi-file buckets would void the sorted-bucket property and reinstate
per-task sorts. Sort elision additionally needs
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (Spark
stopped consuming the sortBy metadata by default in 3.0 because
multi-file buckets break it; the single-file writer here makes it
safe). The Exchange elision — the expensive part — needs no flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table.
    One shuffle now — none on any future equi-join against a table
    bucketed the same way."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (a plain
    ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(table)
