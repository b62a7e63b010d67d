"""Custom Python DataSource (S1/ST3): batch + streaming reads, partition
splitting, commit markers."""

from __future__ import annotations

import os

from kafka_flink_slack_pipeline_spark.sources.email_fixture_source import (
    EmailFixtureDataSource,
    _split,
)


def _register(spark):
    spark.dataSource.register(EmailFixtureDataSource)


def test_range_split_covers_exactly():
    parts = _split(0, 10, 4)
    ranges = [(p.start, p.end) for p in parts]
    assert ranges == [(0, 3), (3, 6), (6, 9), (9, 10)]
    assert _split(5, 5, 4) == []
    assert _split(7, 5, 4) == []  # end < start → empty, no error


def test_batch_read(spark):
    _register(spark)
    df = (
        spark.read.format("email_fixture")
        .option("mailbox_size", 12)
        .option("num_partitions", 3)
        .load()
    )
    rows = df.orderBy("seqno").collect()
    assert len(rows) == 12
    assert rows[5].subject_raw == "Brief #5"
    assert "Together With" in rows[5].body_raw  # clean-chain markers present
    assert df.rdd.getNumPartitions() == 3


def test_streaming_read_with_commit_markers(spark, tmp_path):
    _register(spark)
    commit_dir = str(tmp_path / "seen")
    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("email_fixture")
        .option("mailbox_size", 20)
        .option("poll_batch", 8)
        .option("commit_dir", commit_dir)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 20
    assert sorted(r.seqno for r in rows) == list(range(20))
    # commit() timing under availableNow is Spark's call (it may stop the
    # query before committing the final batch); the ST3 marker logic
    # itself is unit-tested below.


def test_commit_writes_seen_marker(tmp_path):
    from kafka_flink_slack_pipeline_spark.sources.email_fixture_source import (
        EmailFixtureStreamReader,
    )

    commit_dir = str(tmp_path / "seen")
    r = EmailFixtureStreamReader(
        {"mailbox_size": "20", "commit_dir": commit_dir}
    )
    assert r.initialOffset() == {"next_seqno": 0}
    assert r.latestOffset() == {"next_seqno": 20}
    r.commit({"next_seqno": 20})  # ST3: flag-after-delivery
    assert os.listdir(commit_dir) == ["seen-20"]


def test_pipeline_over_custom_source(spark):
    """The producer transform runs directly on the custom source frame."""
    from kafka_flink_slack_pipeline_spark.streaming.producer_pipeline import (
        producer_transform,
    )

    _register(spark)
    raw = (
        spark.read.format("email_fixture").option("mailbox_size", 5).load()
        .withColumnRenamed("email_id", "email_id")
    )
    out = producer_transform(raw, serde="json").orderBy("seqno").collect()
    assert len(out) == 5
    assert out[0].subject == "*Brief #0*"
    assert out[0].body.startswith("TLDR 2025-08-01")
    assert "by John Smith" not in out[0].body
