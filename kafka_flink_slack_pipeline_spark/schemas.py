"""Central record schemas (SURVEY.md §1, FIXTURES.md A-F).

One declaration per record type — the reference declares its Avro schema
twice (Producer/kafkaProducer.js:58-65 vs Consumer/kafkaConsumer.js:38-45,
must match by convention); here both sides import the same object.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

# --- email record (Producer/kafkaProducer.js:58-65) -----------------------
EMAIL_SCHEMA = T.StructType(
    [
        T.StructField("seqno", T.IntegerType(), False),
        T.StructField("subject", T.StringType(), False),
        T.StructField("body", T.StringType(), False),
    ]
)

# Avro schema JSON for from_avro/to_avro — the direct equivalent of
# avsc.Type.forSchema(...) in the reference.
EMAIL_AVRO_JSON = json.dumps(
    {
        "type": "record",
        "name": "email",
        "fields": [
            {"name": "seqno", "type": "int"},
            {"name": "subject", "type": "string"},
            {"name": "body", "type": "string"},
        ],
    }
)

# --- raw IMAP fetch output, pre-cleaning (FIXTURES.md A) ------------------
EMAILS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("email_id", T.LongType(), False),
        T.StructField("seqno", T.IntegerType(), False),
        T.StructField("mailbox", T.StringType(), True),
        T.StructField("fetch_ts", T.TimestampType(), True),
        T.StructField("seen", T.BooleanType(), True),
        T.StructField("internal_date", T.DateType(), True),
        T.StructField("subject_raw", T.StringType(), True),
        T.StructField("body_raw", T.StringType(), True),
    ]
)

# --- Kafka envelope (mirrors Spark's Kafka source columns) ----------------
KAFKA_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), False),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)

# --- Slack event (slackEventServer.js:55-73,116,121,160,177) --------------
SLACK_FILE_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("mimetype", T.StringType(), True),
        T.StructField("url_private", T.StringType(), True),
        T.StructField("permalink_public", T.StringType(), True),
    ]
)

SLACK_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("channel", T.StringType(), False),
        T.StructField("channel_type", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.StringType(), False),
        T.StructField("thread_ts", T.StringType(), True),
        T.StructField("subtype", T.StringType(), True),
        T.StructField("bot_id", T.StringType(), True),
        T.StructField("files", T.ArrayType(SLACK_FILE_STRUCT), True),
    ]
)

# --- Slack message history store (FIXTURES.md E) --------------------------
SLACK_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType(), False),
        T.StructField("ts", T.StringType(), False),
        T.StructField("thread_ts", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# --- Slack file bytes for multimodal tests (FIXTURES.md F) ----------------
SLACK_FILE_BYTES_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.StringType(), False),
        T.StructField("mimetype", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)
