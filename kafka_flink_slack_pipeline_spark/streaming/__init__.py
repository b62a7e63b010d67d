"""Streaming dataflows: the reference's three processes re-expressed as
Structured Streaming pipelines (SURVEY.md §3), plus the event-time layer
the reference lacks (ST5)."""

from .consumer_pipeline import consumer_transform, run_consumer_stream  # noqa: F401
from .event_server import (  # noqa: F401
    content_blocks,
    dms_only,
    enrich_dms,
    enrich_mentions,
    enrich_mentions_multimodal,
    history_context,
    reply_payload,
    run_dm_server_stream,
    run_event_server_stream,
    thread_registry_stream,
)
from .event_time import windowed_event_counts  # noqa: F401
from .ingest_dedup import (  # noqa: F401
    crossdup_documents_stream,
    dedup_documents_stream,
    neardup_documents_stream,
)
from .llm import MAX_TOKENS, DeterministicStubModel, make_llm_udf  # noqa: F401
from .producer_pipeline import producer_transform, run_producer_stream  # noqa: F401
