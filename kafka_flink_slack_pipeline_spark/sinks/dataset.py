"""Training-dataset export sink: partitioned parquet shards + manifest.

The write half of the pipeline that `operators.textops.corpus_export_manifest`
plans: filtered documents are packed into sequences, then materialized as
a directory tree a training job consumes directly:

    out_dir/lang=<lang>/shard=<n>/part-*.parquet

Scale notes (100 TB):
  - `repartition(lang, shard)` gives one writer task per output partition
    (no tiny-file explosion from every input task writing to every dir);
    the shard count is derived from corpus size (`_pack_shards_for`) so
    each writer's slice stays executor-sized at any scale, and file size
    is capped with maxRecordsPerFile.
  - `sortWithinPartitions` makes file contents deterministic (seq order),
    so re-runs produce byte-identical shards for unchanged input —
    downstream caching/dedup of shards works.
  - The manifest is computed by READING BACK what was written (not by
    trusting the writer): per-shard file count, docs, tokens, sequences.
    A training scheduler uses it to size downloads; the roundtrip test
    pins it against the planned `corpus_export_manifest` numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    packed: DataFrame, out_dir: str, max_records_per_file: int = 1_000_000
) -> None:
    """Materialize packed sequences as lang/shard-partitioned parquet."""
    (
        packed.repartition("lang", "shard")
        .sortWithinPartitions("lang", "shard", "seq_id", "seq_offset")
        .write.partitionBy("lang", "shard")
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_dir)
    )


def read_training_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read an exported shard tree (partition columns come back typed)."""
    return spark.read.parquet(out_dir)


def shard_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read-back manifest: files/sequences/docs/tokens per (lang, shard)."""
    # input_file_name() is non-deterministic, so it must be projected before
    # the aggregate (Spark 4.x rejects it inside an aggregate function).
    df = read_training_shards(spark, out_dir).withColumn(
        "_file", F.input_file_name()
    )
    return (
        df.groupBy("lang", "shard")
        .agg(
            F.countDistinct("_file").alias("n_files"),
            (F.max("seq_id") + 1).alias("n_seqs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("lang", "shard")
    )


def export_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """End-to-end export: composite filter -> pack -> write -> manifest.

    Returns the read-back manifest; every number in it is recomputed from
    the files on disk, so it can only match the planned manifest if the
    write actually persisted what the plan promised.
    """
    from ..operators.textops import (
        _apply_pack,
        _corpus_filter_signals,
        _pack_shards_for,
    )
    from ..tables import table

    n_shards = _pack_shards_for(table(spark, sf_dir, "documents").count())
    survivors = (
        _corpus_filter_signals(spark, sf_dir)
        .filter(F.col("keep") == 1)
        .select(
            "lang",
            (F.col("doc_id") % n_shards).cast("int").alias("shard"),
            "doc_id",
            "n_tokens",
        )
    )
    write_training_shards(_apply_pack(survivors), out_dir)
    return shard_manifest(spark, out_dir)
