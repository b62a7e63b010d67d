"""Streaming ingestion landing: JSONL drops → quarantine split →
lang-partitioned parquet, exactly-once BY IDEMPOTENT REPLAY.

The arrival half of the dataset story (sinks/dataset.py is the export
half): a crawl keeps appending JSONL files to a drop directory; this
pipeline streams them in with the SAME explicit schema + corrupt-record
quarantine the batch readers use (sources/files.py policy), lands clean
rows as lang-partitioned parquet, and routes malformed lines to a DLQ
directory — all under one checkpoint, so a crashed run resumes without
re-landing or losing files.

Delivery semantics — stated precisely, because foreachBatch alone is NOT
exactly-once: batch writes inside foreachBatch do not participate in the
streaming sink commit log, so a crash after one write but before the
checkpoint commit replays the whole batch, and a plain append-mode
parquet write re-appends duplicate part files under fresh task UUIDs.
The upgrade to effective exactly-once is idempotence: each micro-batch
writes to a batch-id-scoped subdirectory (`.../batch_id=N/lang=.../`)
in OVERWRITE mode, so a replayed batch deterministically replaces its
own previous (possibly partial) output instead of duplicating it.
`batch_id` and `lang` surface as partition columns on read, and a lang
filter still prunes partitions (tests pin PartitionFilters). At-least-
once execution + idempotent writes = exactly-once observed contents —
the same contract a transactional table format would give, without
needing one in this container.

Scale notes (100 TB/day): the pipeline is fully narrow — parse,
validate, route — so throughput is bounded by source listing + parquet
encode; `maxFilesPerTrigger` bounds per-batch memory, partitionBy(lang)
keeps landed files query-prunable. foreachBatch does the two-way split
because a streaming query has exactly one sink; the batch-id directory
scheme also gives ops a free retention/compaction unit (rewrite one
batch dir at a time)."""

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
            # overwrite into the batch-scoped dir: a replayed batch
            # replaces its own prior output — idempotent, see module doc
            (
                batch.filter(F.col("_corrupt_record").isNull())
                .drop("_corrupt_record", "_src")
                .write.mode("overwrite")
                .partitionBy("lang")
                .parquet(f"{out_dir}/batch_id={batch_id}")
            )
            (
                batch.filter(F.col("_corrupt_record").isNotNull())
                .select(
                    F.col("_corrupt_record").alias("raw"),
                    F.col("_src").alias("src_file"),
                )
                .write.mode("overwrite")
                .parquet(f"{dlq_dir}/batch_id={batch_id}")
            )
        finally:
            batch.unpersist()

    return (
        raw.writeStream.foreachBatch(split)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
