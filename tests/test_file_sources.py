"""File-format ingestion: JSONL/CSV/raw-text drops land into the same
documents schema the operator library consumes, with malformed rows
quarantined instead of failing the job."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.sources.files import (
    DOCUMENTS_SCHEMA,
    read_documents_csv,
    read_documents_jsonl,
    read_documents_text,
)

ROWS = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "w",
     "n_chars": 10},
    {"doc_id": 2, "text": "gamma delta", "lang": "es", "source": "w",
     "n_chars": 11},
]


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    good = [json.dumps(r) for r in ROWS]
    bad = ['{"doc_id": "not-a-number", "text": 3]', "{broken"]
    p.write_text("\n".join(good + bad) + "\n")
    clean, dlq = read_documents_jsonl(spark, str(p))
    assert clean.schema == DOCUMENTS_SCHEMA
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "alpha beta", 2: "gamma delta"}
    quarantined = dlq.collect()
    assert len(quarantined) == len(bad)
    assert all(r.src_file.endswith("drop.jsonl") for r in quarantined)


def test_jsonl_lands_into_operator_library(spark, tmp_path):
    """The landed frame powers a registered operator unchanged."""
    p = tmp_path / "drop.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS) + "\n")
    clean, _ = read_documents_jsonl(spark, str(p))
    stats = (
        clean.select(F.size(F.split(F.trim("text"), "\\s+")).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert stats == 4


def test_csv_clean_and_quarantine(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha beta,en,w,10\n"
        "not-a-number,x,y,z,oops\n"
    )
    clean, dlq = read_documents_csv(spark, str(p))
    assert clean.schema == DOCUMENTS_SCHEMA
    assert [r.doc_id for r in clean.collect()] == [1]
    assert dlq.count() == 1


def test_text_lines_stable_ids(spark, tmp_path):
    p = tmp_path / "drop.txt"
    p.write_text("first line\nsecond line\nthird line\n")
    df = read_documents_text(spark, str(p), lang="en")
    rows = sorted(df.collect(), key=lambda r: r.doc_id)
    assert [r.text for r in rows] == ["first line", "second line",
                                      "third line"]
    assert [r.n_chars for r in rows] == [10, 11, 10]
    assert len({r.doc_id for r in rows}) == 3
    # re-read of the unchanged drop assigns identical ids
    again = sorted(read_documents_text(spark, str(p), lang="en").collect(),
                   key=lambda r: r.doc_id)
    assert rows == again


def test_streaming_landing_pipeline(spark, tmp_path):
    """JSONL drops stream into lang-partitioned parquet with quarantine,
    and a resumed run does not re-land already-committed files."""
    import time

    from kafka_flink_slack_pipeline_spark.streaming.ingest_land import (
        land_documents_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "landed")
    dlq = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")
    (drop / "a.jsonl").write_text(
        "\n".join(json.dumps(r) for r in ROWS) + "\n{broken\n"
    )
    q = land_documents_stream(spark, str(drop), out, dlq, ckpt)
    q.awaitTermination(120)
    landed = spark.read.parquet(out)
    assert {r.doc_id for r in landed.collect()} == {1, 2}
    # partitioned layout: a lang filter prunes partitions
    plan = landed.filter(F.col("lang") == "en")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert spark.read.parquet(dlq).count() == 1
    # second drop arrives; resume lands ONLY the new file
    (drop / "b.jsonl").write_text(json.dumps(
        {"doc_id": 3, "text": "epsilon", "lang": "fr", "source": "w",
         "n_chars": 7}) + "\n")
    q2 = land_documents_stream(spark, str(drop), out, dlq, ckpt)
    q2.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # no duplicates from re-landing a.jsonl
    assert spark.read.parquet(dlq).count() == 1


def test_landing_replay_is_idempotent(spark, tmp_path):
    """Crash-replay contract: foreachBatch is at-least-once, so a batch
    whose writes completed but whose checkpoint commit didn't gets
    REPLAYED on restart. The batch-id-scoped overwrite writes must make
    that replay idempotent (the old append-mode writes duplicated every
    row of the replayed batch)."""
    import os

    from kafka_flink_slack_pipeline_spark.streaming.ingest_land import (
        land_documents_stream,
    )

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "landed")
    dlq = str(tmp_path / "dlq")
    ckpt = tmp_path / "ckpt"
    (drop / "a.jsonl").write_text(
        "\n".join(json.dumps(r) for r in ROWS) + "\n{broken\n"
    )
    q = land_documents_stream(spark, str(drop), out, dlq, str(ckpt))
    q.awaitTermination(120)
    q.stop()
    import time

    for _ in range(100):  # restart needs the old query fully deregistered
        if q.id not in {a.id for a in spark.streams.active}:
            break
        time.sleep(0.2)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 2]
    # simulate the crash window: writes landed, commit marker didn't
    commits = sorted(p for p in os.listdir(ckpt / "commits")
                     if not p.startswith("."))
    os.remove(ckpt / "commits" / commits[-1])
    crc = ckpt / "commits" / f".{commits[-1]}.crc"
    if crc.exists():  # stale Hadoop checksum blocks the re-written marker
        os.remove(crc)
    q2 = land_documents_stream(spark, str(drop), out, dlq, str(ckpt))
    q2.awaitTermination(120)
    # replayed batch overwrote its own directory — no duplicates
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 2]
    assert spark.read.parquet(dlq).count() == 1
