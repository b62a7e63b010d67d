"""Email landing source — the engine-side half of S1/S2/S3.

The reference polls IMAP in-process every 10 minutes
(`Producer/kafkaProducer.js:51-53,79-81,232`) with a server-side predicate
`['UNSEEN', ['SINCE','29-AUG-2025']]` (`:92`) and a projection to subject
header + TEXT (`:103-106`).

Spark-first realization: IMAP is not a partitionable, replayable source, so
a thin out-of-band fetcher (or a custom PySpark DataSourceStreamReader)
lands raw emails as parquet in `landing_dir`; the engine streams that
directory. The reference's 10-minute poll becomes
`trigger(processingTime='10 minutes')` at the writeStream (see
streaming/producer_pipeline.py); its predicate/projection become a filter +
select that Catalyst pushes into the parquet scan (S2/S3 pushdown —
visible as PushedFilters in explain), mirroring how the reference pushes
them to the IMAP server.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EMAILS_RAW_SCHEMA

# The reference's SINCE constant (kafkaProducer.js:92).
DEFAULT_SINCE = dt.date(2025, 8, 29)


def email_landing_stream(
    spark: SparkSession,
    landing_dir: str,
    since: dt.date = DEFAULT_SINCE,
    unseen_only: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream of raw fetched emails with the S2 predicate and S3 projection
    applied engine-side (both push into the scan)."""
    reader = spark.readStream.schema(EMAILS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(landing_dir)
    if unseen_only:
        df = df.filter(F.col("seen") == False)  # noqa: E712 (S2: UNSEEN)
    df = df.filter(F.col("internal_date") >= F.lit(since))  # S2: SINCE
    # S3: subject header + TEXT only (plus identity/progress columns)
    return df.select("email_id", "seqno", "subject_raw", "body_raw")
