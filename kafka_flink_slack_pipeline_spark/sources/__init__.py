"""Streaming/batch sources (SURVEY.md §2.1).

Every pipeline accepts a DataFrame, so any source that produces the right
schema plugs in: the Kafka source in production, file/rate/memory sources
in tests — no broker required to exercise the dataflow.
"""

from .email import email_landing_stream  # noqa: F401
from .kafka import (  # noqa: F401
    envelope_stream_from_dir,
    kafka_envelope_batch,
    kafka_envelope_stream,
)
from .slack_events import slack_events_from_json, slack_events_stream_from_dir  # noqa: F401
