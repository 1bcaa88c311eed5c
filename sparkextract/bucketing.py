"""Bucketed-table co-location (SCALE.md §3): pre-shuffle at WRITE time
so repeated joins on the same key never exchange again.

At 100 TB the documents ⋈ embeddings (and extracted ⋈ anything-by-id)
joins recur across every pipeline run; paying one bucketed write
(`bucketBy` + `sortBy` into the catalog) converts every later
sort-merge join into a zero-Exchange merge — the same trick
Iceberg/Hive bucketing plays, expressed through Spark's native bucketed
tables. (A cheap per-partition Sort remains whenever a bucket spans
more than one file — Spark only elides it for single-file buckets; the
expensive node removed is the Exchange.) Guarded by a plan-shape test
(tests/test_plan_pushdown.py): same-key same-count bucketed tables join
with NO Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 16
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted catalog table. One
    full shuffle now; none on any future equi-join/aggregation on
    ``key`` against a co-bucketed table."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With equal
    bucket counts Spark plans a SortMergeJoin whose children are the
    bucketed scans directly — no Exchange on either side."""
    return spark.table(left).join(spark.table(right).hint("merge"), key)
