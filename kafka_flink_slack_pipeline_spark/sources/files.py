"""File-format ingestion for the documents table: JSONL, CSV, raw text.

The reference ingests exactly one format (RFC-822 email over IMAP —
Producer/kafkaProducer.js:100-150); a training-data pipeline ingests
whatever the crawl dumped. These readers land any of the three common
text-corpus formats into the SAME documents schema the operator library
consumes, so every registered query runs unchanged on JSONL/CSV/raw
drops.

Design rules (all three readers):
  - EXPLICIT schema, never inference: schema inference is a full extra
    pass over 100 TB and silently drifts when a field goes all-null in
    one drop. The landed schema is pinned to `tables.DOCUMENTS_SCHEMA`.
  - Malformed rows quarantine, not crash: PERMISSIVE mode with a
    `_corrupt_record` column routed to a DLQ frame (the sinks/slack.py
    DLQ precedent) — a 100 TB ingest always contains garbage and a
    fail-fast reader loses the whole job to one bad line.
  - Pushdown intact: filters on doc_id/lang reach the file scan
    (PushedFilters for CSV; JSON readers filter post-parse — documented
    difference, another reason parquet is the operator-side format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_WITH_CORRUPT = T.StructType(
    DOCUMENTS_SCHEMA.fields
    + [T.StructField("_corrupt_record", T.StringType())]
)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) frames from a JSON-lines drop.

    Spark refuses to answer queries that touch only the internal
    `_corrupt_record` column of a raw scan (QUERY_ONLY_CORRUPT_RECORD_
    COLUMN) — the parse must be materialized once to split it. Here
    that is a .cache() sized to the ingest batch; at 100 TB the landing
    pattern is the same materialization to parquet (land raw once,
    split clean/DLQ from the landed copy) rather than an in-memory
    cache."""
    raw = (
        spark.read.schema(_WITH_CORRUPT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # input_file_name() resolves only at the file scan — capture it
        # BEFORE the cache materializes the parse (empty afterwards)
        .withColumn("_src", F.input_file_name())
        .cache()
    )
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "_src"
    )
    dlq = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw"),
        F.col("_src").alias("src_file"),
    )
    return clean, dlq


def read_documents_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) frames from a headered CSV drop (same
    materialize-once contract as read_documents_jsonl)."""
    raw = (
        spark.read.schema(_WITH_CORRUPT)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", "false")
        .csv(path)
        .withColumn("_src", F.input_file_name())
        .cache()
    )
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "_src"
    )
    dlq = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw"),
        F.col("_src").alias("src_file"),
    )
    return clean, dlq


def read_documents_text(
    spark: SparkSession, path: str, lang: str = "und", source: str = "textfile"
) -> DataFrame:
    """Raw text files: one document per LINE, ids assigned by (file,
    line) position so re-reads are stable for an unchanged drop.

    Line position = row_number per file over the split-ordered monotonic
    id: text-source splits cover ascending byte ranges, so for a FIXED
    file layout the ordering is the file's line order (the same
    fixed-layout determinism contract the PCA Gram kernel documents). A
    plain global monotonically_increasing_id would NOT survive a
    repartition — the per-file window is what pins it.

    ID layout: doc_id = pmod(xxhash64(file), 2^23) * 2^40 + line_pos.
    The low 40 bits hold the 1-based line position (a single file may
    carry up to 2^40 - 1 ~ 1.1e12 lines before overflowing into the
    next slot — far past any real shard; files.maxPartitionBytes splits
    long before that), the high 23 bits the file-hash slot, and the
    maximum value (2^23 - 1) * 2^40 + (2^40 - 1) = Long.MAX exactly.
    pmod (not abs) because abs(Long.MIN_VALUE) stays negative in Java
    two's-complement. The 23-bit file space means hash-colliding FILES
    can still collide ids at identical line positions (birthday bound
    ~2^11.5 files for a first collision) — callers landing more than a
    few thousand files per drop should dedupe on (doc_id, md5(text)) or
    land per-directory; the registered dedup operators treat doc_id as
    unique per TESTDATA contract."""
    lines = spark.read.text(path).select(
        F.col("value").alias("text"), F.input_file_name().alias("f")
    )
    w_pos = F.row_number().over(
        Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
    )
    return lines.select(
        (
            F.pmod(F.xxhash64("f"), F.lit(1 << 23)) * F.lit(1 << 40)
            + w_pos
        ).alias("doc_id"),
        "text",
        F.lit(lang).alias("lang"),
        F.lit(source).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
