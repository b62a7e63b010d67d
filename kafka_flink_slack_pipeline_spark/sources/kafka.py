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

# The secured-cluster options the reference passes to KafkaJS against
# Confluent Cloud (`Consumer/kafkaConsumer.js:23-31`, same shape in
# `Producer/kafkaProducer.js:29-40`: ssl + sasl plain + broker list),
# expressed as the Spark connector's `kafka.`-prefixed consumer/producer
# configs. Purely illustrative — pass your own dict as `extra_options`.
SASL_SSL_OPTIONS_EXAMPLE = {
    "kafka.security.protocol": "SASL_SSL",
    "kafka.sasl.mechanism": "PLAIN",
    "kafka.sasl.jaas.config": (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        'username="<api-key>" password="<api-secret>";'
    ),
}


def merge_kafka_options(
    managed: dict[str, str], extra_options: dict[str, str] | None
) -> dict[str, str]:
    """Merge caller-supplied reader/writer options under the managed ones.

    `extra_options` is the SASL/SSL/tuning pass-through (the reference
    connects over SASL_PLAIN+SSL — see SASL_SSL_OPTIONS_EXAMPLE); keys
    this wrapper itself manages (subscribe/offsets/etc.) may NOT be
    overridden through it — a silent clobber would desync the wrapper's
    semantics (e.g. replay policy) from its arguments, so colliding keys
    raise instead."""
    extra = dict(extra_options or {})
    clash = sorted(set(extra) & set(managed))
    if clash:
        raise ValueError(
            f"extra_options may not override managed option(s) {clash}; "
            "use the dedicated parameters instead"
        )
    return {**extra, **managed}


def kafka_envelope_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",  # fromBeginning: true
    max_offsets_per_trigger: int | None = None,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """S4 — streaming Kafka scan. Backpressure via maxOffsetsPerTrigger
    (absent in the reference; fire-hose replay there). `extra_options`
    forwards connector configs verbatim — security (`kafka.security.
    protocol`, `kafka.sasl.jaas.config`, ... per SASL_SSL_OPTIONS_EXAMPLE)
    and tuning (`kafka.fetch.max.bytes`, `minPartitions`, ...)."""
    managed = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        managed["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return (
        spark.readStream.format("kafka")
        .options(**merge_kafka_options(managed, extra_options))
        .load()
    )


def kafka_envelope_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Batch Kafka scan (full-topic replay, e.g. backfills)."""
    managed = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": "earliest",
        "endingOffsets": "latest",
    }
    return (
        spark.read.format("kafka")
        .options(**merge_kafka_options(managed, extra_options))
        .load()
    )


def envelope_stream_from_dir(
    spark: SparkSession, envelope_dir: str
) -> DataFrame:
    """Kafka-envelope-shaped stream from parquet — broker-free testing."""
    return spark.readStream.schema(KAFKA_ENVELOPE_SCHEMA).parquet(envelope_dir)
