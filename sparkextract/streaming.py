"""Structured Streaming surface.

The reference is strictly batch over files (tasks/ocr/task.py:58-86;
SURVEY.md §2.8) and BASELINE.json targets batch-at-rest tables, so
streaming is *additive* capability: the same extraction engine applied to
a stream of transcript files. ``foreachBatch`` reuses the fused batch
path verbatim — one engine, two arrival modes — and the lineage table
doubles as the exactly-once progress record alongside Spark's checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from . import schema
from .fused import extract_fused


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(schema.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
) -> StreamingQuery:
    """stream of transcripts → extracted parquet, exactly-once per
    micro-batch (idempotent overwrite by batch id)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            extract_fused(batch_df)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
