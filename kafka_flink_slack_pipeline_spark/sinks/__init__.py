"""Sinks (SURVEY.md §2.8): Kafka, Slack webhook/chat, DLQ, console."""

from .kafka import email_kafka_sink_frame, write_stream_to_kafka  # noqa: F401
from .slack import SlackWebhookSink  # noqa: F401
