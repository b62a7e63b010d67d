"""Ingestion-time streaming dedup — the streaming face of dedup_exact.

A training-data ingest stream drops exact duplicates ON ARRIVAL by
normalized content fingerprint (operators/textops.py doc_fingerprints
semantics: lowercase, whitespace-collapsed, md5). State is keyed by
fingerprint and evicted once the watermark passes the document's ingest
time + ttl — dropDuplicatesWithinWatermark, because a plain streaming
dropDuplicates whose key omits the event-time column never evicts.

100 TB/day: state holds one 16-byte hash per distinct document inside
the TTL horizon, shuffled by fingerprint — uniform by construction (md5),
no skew. Cross-horizon duplicates are the batch dedup_exact query's job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_documents_stream(
    docs: DataFrame, ts_col: str = "ingest_ts", ttl: str = "24 hours"
) -> DataFrame:
    """Streaming frame with exact-duplicate documents dropped within the
    watermark horizon. Input needs `text` and an event-time column."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
    return (
        docs.withColumn("fingerprint", F.md5(normalized))
        .withWatermark(ts_col, ttl)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
