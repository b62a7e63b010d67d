"""Slack Events source (S5).

The reference receives Slack events as HTTP POSTs into a Bolt app
(`Slack Event Server/slackEventServer.js:51,114`). The HTTP receiver is a
thin non-engine adapter whose only job is to append the event JSON to a
durable log (Kafka topic or landing directory); the engine streams that
log and parses with `from_json` in PERMISSIVE mode — mirroring the
reference's duck-typed field access (`event.files || []`, `:73,119`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SLACK_EVENT_SCHEMA


def slack_events_from_json(value: Column) -> Column:
    """Parse a JSON event payload (PERMISSIVE: missing fields → null,
    matching the reference's optimistic field access)."""
    return F.from_json(
        value.cast("string"), SLACK_EVENT_SCHEMA, {"mode": "PERMISSIVE"}
    )


def slack_events_stream_from_dir(
    spark: SparkSession, events_dir: str, raw_json: bool = False
) -> DataFrame:
    """Stream Slack events from a landing directory.

    raw_json=True expects files of `{"value": "<json>"}` rows (the Kafka
    envelope shape) and parses; False expects already-typed parquet.
    """
    if raw_json:
        raw = spark.readStream.schema(
            T.StructType([T.StructField("value", T.StringType())])
        ).json(events_dir)
        return raw.select(
            slack_events_from_json(F.col("value")).alias("e")
        ).select("e.*")
    return spark.readStream.schema(SLACK_EVENT_SCHEMA).parquet(events_dir)
