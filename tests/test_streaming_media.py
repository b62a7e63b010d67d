"""Stream/batch parity for the streaming perceptual media-dedup face.

The contract (streaming/media_dedup.py): with monotone ingest (doc_id
order), the accumulated keep-first verdicts equal media_dedup_batch_of
on the same payloads exactly — across a checkpoint restart — the
per-batch pair stage reads only touched (band, bprefix) store
partitions, auto-compaction preserves the verdicts, and the report
refuses a horizon whose batches recorded over-cap buckets.
"""

from __future__ import annotations

import base64
import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators import multimodal as M
from kafka_flink_slack_pipeline_spark.streaming.media_dedup import (
    _pruned_fp_store,
    media_dedup_batch_of,
    media_dedup_stream,
    media_dedup_stream_report,
)

_COPY_OFFSET = 10**6


def _media_rows(spark, sf_dir):
    """Image payloads from the corpus plus planted RE-ENCODE copies
    (quantize-to-even, the fake codec's quality-loss class) at
    doc_id + 1M — the keep-first verdicts must drop every copy."""
    base = [
        (r.doc_id, bytes(r.payload))
        for r in M.multimodal_view(spark, sf_dir)
        .filter(
            F.col("mimetype").startswith("image/")
            & (F.octet_length("payload") > 0)
        )
        .select("doc_id", "payload")
        .orderBy("doc_id")
        .collect()
    ]
    copies = [
        (doc_id + _COPY_OFFSET, bytes(b - (b % 2) for b in payload))
        for doc_id, payload in base[:20]
    ]
    return base + copies


def _media_frame(spark, rows):
    return spark.createDataFrame(
        [(d, bytearray(p)) for d, p in rows],
        "doc_id bigint, payload binary",
    )


def _write_drop(path, rows, lo, hi):
    with open(path, "w") as f:
        for i, (doc_id, payload) in enumerate(
            sorted(r for r in rows if lo <= r[0] < hi)
        ):
            f.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "payload_b64": base64.b64encode(payload).decode(),
                        "ingest_ts": f"2025-01-01T00:{i // 60:02d}"
                        f":{i % 60:02d}.000Z",
                    }
                )
                + "\n"
            )


@pytest.fixture(scope="module")
def media_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("mediadedup")
    d = {
        "drop": str(base / "drop"),
        "state": str(base / "state"),
        "ckpt": str(base / "ckpt"),
    }
    os.makedirs(d["drop"])
    return d


def test_media_stream_batch_parity_across_restart(spark, sf_dir, media_dirs):
    rows = _media_rows(spark, sf_dir)

    # first drop: the base images; run to completion
    _write_drop(f"{media_dirs['drop']}/part1.jsonl", rows, 0, 300)
    media_dedup_stream(
        spark, media_dirs["drop"], media_dirs["state"], media_dirs["ckpt"]
    )
    mid = media_dedup_stream_report(spark, media_dirs["state"])
    assert mid.count() == sum(1 for d, _ in rows if d < 300)

    # the rest (including every planted re-encode copy) lands; RESUME
    # from the same checkpoint — only the new file processes
    _write_drop(f"{media_dirs['drop']}/part2.jsonl", rows, 300, 10**9)
    media_dedup_stream(
        spark, media_dirs["drop"], media_dirs["state"], media_dirs["ckpt"]
    )

    got = {
        r["doc_id"]: (
            r["fp_hi"], r["fp_lo"], r["keep"], r["n_dups"],
            r["best_hamming"],
        )
        for r in media_dedup_stream_report(
            spark, media_dirs["state"]
        ).collect()
    }
    want = {
        r["doc_id"]: (
            r["fp_hi"], r["fp_lo"], r["keep"], r["n_dups"],
            r["best_hamming"],
        )
        for r in media_dedup_batch_of(_media_frame(spark, rows)).collect()
    }
    assert got == want
    # non-vacuous: every planted re-encode copy was dropped
    for doc_id, _ in rows:
        if doc_id >= _COPY_OFFSET:
            assert got[doc_id][2] is False


def test_media_store_scan_prunes_to_touched_buckets(spark, media_dirs):
    """Runs after the parity test (module-scoped dirs hold a real
    store): a probe touching ONE (band, bprefix) pair must read only
    that partition's files, and the store must hold others."""
    store_dir = f"{media_dirs['state']}/fingerprints"
    full = spark.read.option("basePath", store_dir).parquet(store_dir)
    pairs = sorted(
        (r["band"], r["bprefix"])
        for r in full.select("band", "bprefix").distinct().collect()
    )
    assert len(pairs) > 1
    band, bprefix = pairs[0]
    pruned = _pruned_fp_store(spark, store_dir, 10**9, [(band, bprefix)])
    read_files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files
    for f in read_files:
        assert f"/band={band}/bprefix={bprefix}/" in f, (
            f"read untouched partition: {f}"
        )
    all_files = [
        r[0] for r in full.select(F.input_file_name()).distinct().collect()
    ]
    assert len(read_files) < len(all_files)


def test_media_store_rejects_remote_uri(spark):
    with pytest.raises(ValueError, match="driver-local"):
        _pruned_fp_store(spark, "hdfs://nn/fps", 2, [(0, 0)])


def test_media_store_compaction_and_auto_policy(spark, sf_dir, tmp_path):
    """A 3-batch run with compact_every=1 folds the store from inside
    the runner: directory count ends below the batch count, pruning
    still works on the folded layout, and the accumulated verdicts
    equal the batch rows exactly (output identity)."""
    rows = _media_rows(spark, sf_dir)
    d = {
        "drop": str(tmp_path / "drop"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["drop"])
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 10**9)]):
        path = f"{d['drop']}/part{i}.jsonl"
        _write_drop(path, rows, lo, hi)
        # FileStreamSource orders files by modification time; three
        # files written in one fast loop can tie on mtime and process
        # out of doc_id order, violating the monotone-ingest parity
        # precondition — pin strictly increasing mtimes
        os.utime(path, (1700000000 + i, 1700000000 + i))
    media_dedup_stream(
        spark, d["drop"], d["state"], d["ckpt"],
        max_files_per_trigger=1, compact_every=1,
    )

    store_dir = f"{d['state']}/fingerprints"
    n_dirs = len(
        [e for e in os.listdir(store_dir) if e.startswith("batch_id=")]
    )
    assert n_dirs < 3  # folded from inside the runner

    got = {
        r["doc_id"]: (r["keep"], r["n_dups"], r["best_hamming"])
        for r in media_dedup_stream_report(spark, d["state"]).collect()
    }
    want = {
        r["doc_id"]: (r["keep"], r["n_dups"], r["best_hamming"])
        for r in media_dedup_batch_of(_media_frame(spark, rows)).collect()
    }
    assert got == want


def test_media_report_refuses_capped_horizon(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Drive a bucket over the cap (cap monkeypatched to 0 — every
    touched bucket is over it) and pin the report's refusal plus the
    allow_capped acceptance path (the funnel report's gate shape)."""
    monkeypatch.setattr(M, "PHASH_BUCKET_CAP", 0)
    rows = _media_rows(spark, sf_dir)[:10]
    d = {
        "drop": str(tmp_path / "drop"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["drop"])
    _write_drop(f"{d['drop']}/part1.jsonl", rows, 0, 10**9)
    media_dedup_stream(spark, d["drop"], d["state"], d["ckpt"])
    with pytest.raises(ValueError, match="PHASH_BUCKET_CAP"):
        media_dedup_stream_report(spark, d["state"])
    rep = media_dedup_stream_report(spark, d["state"], allow_capped=True)
    assert rep.count() == len(rows)
    # with every bucket suppressed, nothing can pair: all keeps
    assert all(r["keep"] for r in rep.collect())


def test_media_stream_skips_null_and_empty_payloads(spark, sf_dir, tmp_path):
    """A drop with a missing or empty payload carries nothing to
    fingerprint: the stream must exclude it (the batch op's
    octet_length gate) rather than crash the Arrow kernel on
    bytes(None)."""
    rows = _media_rows(spark, sf_dir)[:5]
    d = {
        "drop": str(tmp_path / "drop"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["drop"])
    _write_drop(f"{d['drop']}/part1.jsonl", rows, 0, 10**9)
    with open(f"{d['drop']}/part1.jsonl", "a") as f:
        f.write(json.dumps({"doc_id": 900, "payload_b64": None,
                            "ingest_ts": "2025-01-01T01:00:00.000Z"}) + "\n")
        f.write(json.dumps({"doc_id": 901, "payload_b64": "",
                            "ingest_ts": "2025-01-01T01:00:01.000Z"}) + "\n")
    media_dedup_stream(spark, d["drop"], d["state"], d["ckpt"])
    got = {r["doc_id"] for r in
           media_dedup_stream_report(spark, d["state"]).collect()}
    assert got == {doc_id for doc_id, _ in rows}
    # the exclusions stay visible in telemetry: n_raw counts arrivals,
    # n_docs the fingerprintable subset
    m = spark.read.option("basePath", f"{d['state']}/metrics").parquet(
        f"{d['state']}/metrics"
    ).collect()
    assert sum(r["n_raw"] for r in m) == len(rows) + 2
    assert sum(r["n_docs"] for r in m) == len(rows)
