"""Streaming ingestion landing: JSONL drops → quarantine split →
lang-partitioned parquet, exactly-once.

The arrival half of the dataset story (sinks/dataset.py is the export
half): a crawl keeps appending JSONL files to a drop directory; this
pipeline streams them in with the SAME explicit schema + corrupt-record
quarantine the batch readers use (sources/files.py policy), lands clean
rows as lang-partitioned parquet, and routes malformed lines to a DLQ
directory — all under one checkpoint, so a crashed run resumes without
re-landing or losing files (Structured Streaming's file-source log +
sink commit log give exactly-once for file-to-file pipelines).

Scale notes (100 TB/day): the pipeline is fully narrow — parse,
validate, route — so throughput is bounded by source listing + parquet
encode; `maxFilesPerTrigger` bounds per-batch memory, partitionBy(lang)
keeps landed files query-prunable (tests pin PartitionFilters on the
batch side). foreachBatch does the two-way split because a streaming
query has exactly one sink; the batch handle inside is the standard
multi-sink pattern and stays exactly-once via the checkpoint's batch-id
dedup (idempotent re-run of a replayed batch overwrites the same
paths deterministically... for parquet append sinks Spark skips
committed batch ids entirely)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import _WITH_CORRUPT


def land_documents_stream(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1000,
):
    """Start (or resume) the landing query; returns the StreamingQuery.

    Callers test-drive it with trigger(availableNow=True) semantics by
    awaiting termination; production leaves it running."""
    raw = (
        spark.readStream.schema(_WITH_CORRUPT)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(drop_dir)
        .withColumn("_src", F.input_file_name())
    )

    def split(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            (
                batch.filter(F.col("_corrupt_record").isNull())
                .drop("_corrupt_record", "_src")
                .write.mode("append")
                .partitionBy("lang")
                .parquet(out_dir)
            )
            (
                batch.filter(F.col("_corrupt_record").isNotNull())
                .select(
                    F.col("_corrupt_record").alias("raw"),
                    F.col("_src").alias("src_file"),
                    F.lit(batch_id).alias("batch_id"),
                )
                .write.mode("append")
                .parquet(dlq_dir)
            )
        finally:
            batch.unpersist()

    return (
        raw.writeStream.foreachBatch(split)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
