"""Checkpointed, resumable batch runs with per-partition lineage
(north_rule; SURVEY.md §2.8/§4.3).

The unit of progress is a conv_id hash bucket. A bucket is *committed*
iff a lineage row (bucket, input snapshot, rows in/out, wall time)
exists — output data for uncommitted buckets is overwritten on retry, so
a crash between data-write and lineage-append resolves to "re-do that
bucket" (idempotent, exactly the reference-compatible semantics: the
reference has no resume at all — strictly batch over files,
tasks/ocr/task.py:58-86 — so this is new scale design).

Resume = anti-join pending buckets against committed lineage: one extra
metadata-sized read, no per-bucket driver loop. Storage is parquet with
dynamic partition overwrite; swap the writer for an Iceberg table where
the runtime jar exists (the write path is isolated here on purpose).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract

LINEAGE_DIR = "_lineage"
DATA_DIR = "data"


def _bucket(col, n: int):
    return F.pmod(F.hash(col), F.lit(n))


def committed_buckets(spark: SparkSession, out_dir: str, snapshot: str) -> set[int]:
    path = os.path.join(out_dir, LINEAGE_DIR)
    try:
        lin = spark.read.parquet(path)
    except Exception:
        return set()
    rows = lin.where(F.col("input_snapshot") == snapshot).select("partition_id").collect()
    return {r.partition_id for r in rows}


def run_with_lineage(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    snapshot: str,
    buckets: int = 64,
    **extract_kw,
) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict."""
    done = committed_buckets(spark, out_dir, snapshot)
    todo = sorted(set(range(buckets)) - done)
    if not todo:
        return {"buckets": buckets, "processed": 0, "skipped": len(done)}

    src = transcripts.withColumn("bucket", _bucket(F.col("conv_id"), buckets))
    if done:  # resume: anti-join committed buckets
        src = src.where(~F.col("bucket").isin([int(b) for b in done]))

    t0 = time.perf_counter()
    rows_in = {
        r.bucket: r.n
        for r in src.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = extract(src.drop("bucket"), **extract_kw).withColumn(
        "bucket", _bucket(F.col("conv_id"), buckets)
    )
    data_path = os.path.join(out_dir, DATA_DIR)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(data_path)
    )
    out_written = spark.read.parquet(data_path).where(
        F.col("bucket").isin([int(b) for b in todo])
    )
    rows_out = {
        r.bucket: r.n
        for r in out_written.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wall = time.perf_counter() - t0

    lineage_rows = [
        (int(b), snapshot, int(rows_in.get(b, 0)), int(rows_out.get(b, 0)),
         float(round(wall / max(len(todo), 1), 4)))
        for b in todo
    ]
    spark.createDataFrame(
        lineage_rows,
        "partition_id INT, input_snapshot STRING, rows_in BIGINT, "
        "rows_out BIGINT, wall_time_s DOUBLE",
    ).write.mode("append").parquet(os.path.join(out_dir, LINEAGE_DIR))
    return {
        "buckets": buckets,
        "processed": len(todo),
        "skipped": len(done),
        "rows_in": sum(rows_in.values()),
        "rows_out": sum(rows_out.values()),
        "wall_time_s": round(wall, 3),
    }
