"""Kafka source wiring (S4) + file-backed envelope stand-in for tests.

The reference consumer subscribes `technews` with `fromBeginning: true`
(`Consumer/kafkaConsumer.js:35,53,58-71`). Spark's built-in Kafka source
covers all of it: `startingOffsets=earliest` is the replay policy, the
consumer group is managed by Spark's own offset tracking (checkpoint), and
partition parallelism maps to Spark tasks (one per topic-partition slice —
the reference surfaced partition ids but ran single-threaded;
`Consumer/kafkaConsumer.js:59,62`).

No broker exists in the test environment, so `envelope_stream_from_dir`
provides the same KAFKA_ENVELOPE_SCHEMA columns from a parquet directory —
pipelines are written against the envelope schema and cannot tell the
difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import KAFKA_ENVELOPE_SCHEMA

DEFAULT_TOPIC = "technews"  # Producer/kafkaProducer.js:71, Consumer :53


def kafka_envelope_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",  # fromBeginning: true
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S4 — streaming Kafka scan. Backpressure via maxOffsetsPerTrigger
    (absent in the reference; fire-hose replay there)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_envelope_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
) -> DataFrame:
    """Batch Kafka scan (full-topic replay, e.g. backfills)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )


def envelope_stream_from_dir(
    spark: SparkSession, envelope_dir: str
) -> DataFrame:
    """Kafka-envelope-shaped stream from parquet — broker-free testing."""
    return spark.readStream.schema(KAFKA_ENVELOPE_SCHEMA).parquet(envelope_dir)
