"""Kafka producer sink (K1).

Reference: `producer.send({topic:'technews', messages:[{value: avroBytes}]})`
per record (`Producer/kafkaProducer.js:56,68-75`), at-least-once via
flag-after-send (`:208-222`). Spark's Kafka sink + checkpointing subsumes
the progress tracking (ST3): offsets live in the checkpoint WAL, not in
IMAP \\Seen flags, and delivery to Kafka is idempotent per epoch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def email_kafka_sink_frame(record: Column, serde: str = "json") -> Column:
    """struct<seqno,subject,body> → binary `value` column (D3).

    serde: 'avro' (spark-avro jar), 'avro-py' (pure-Python Avro wire
    format, jar-free), or 'json'."""
    if serde == "avro":
        from ..functions.serde import email_to_avro

        return email_to_avro(record)
    if serde == "avro-py":
        from ..functions.avro_py import email_to_avro_py

        return email_to_avro_py(record)
    from ..functions.serde import email_to_json

    return email_to_json(record)


def write_stream_to_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    extra_options: dict[str, str] | None = None,
) -> StreamingQuery:
    """writeStream wiring for a DataFrame that already has a `value` column.

    `trigger` kwargs pass straight through (e.g.
    {'processingTime': '10 minutes'} mirroring the reference's poll period,
    or {'availableNow': True} for drain-and-stop runs). `extra_options`
    forwards producer configs verbatim — the SASL/SSL security options a
    Confluent-style cluster needs (`Producer/kafkaProducer.js:29-40`;
    see sources.kafka.SASL_SSL_OPTIONS_EXAMPLE) plus any `kafka.`-prefixed
    tuning; managed keys collide loudly rather than silently clobber.
    """
    from ..sources.kafka import merge_kafka_options

    if "value" not in df.columns:
        raise ValueError("expected a 'value' column (use email_kafka_sink_frame)")
    managed = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }
    writer = (
        df.select(F.col("value"))
        .writeStream.format("kafka")
        .options(**merge_kafka_options(managed, extra_options))
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
