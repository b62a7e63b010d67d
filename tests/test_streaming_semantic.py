"""Stream/batch parity for the streaming semantic-dedup face.

The contract (streaming/semantic_dedup.py): with monotone ingest
(vec_id order), the accumulated per-vector verdicts equal the batch
semantic_dedup rows exactly — across a checkpoint restart that adds a
second drop file — and the per-batch pair stage reads only the store's
touched cid partitions.
"""

from __future__ import annotations

import json
import os

import pytest

from kafka_flink_slack_pipeline_spark.operators.similarity import (
    _centroid_model,
    _neardup_corpus,
    semantic_dedup,
)
from kafka_flink_slack_pipeline_spark.streaming.semantic_dedup import (
    semantic_dedup_stream,
    semantic_dedup_stream_report,
)


def _write_drop(spark, sf_dir, path, lo, hi):
    """One JSONL drop of the batch op's OWN corpus (embeddings + planted
    near-dup copies), vec_id-ordered rows in [lo, hi) — the monotone
    ingest sequence the parity contract states."""
    rows = (
        _neardup_corpus(spark, sf_dir)
        .filter(f"vec_id >= {lo} AND vec_id < {hi}")
        .orderBy("vec_id")
        .collect()
    )
    with open(path, "w") as f:
        for i, r in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "vec_id": r["vec_id"],
                        "embedding": list(r["emb"]),
                        "ingest_ts": f"2025-01-01T00:{i // 60:02d}"
                        f":{i % 60:02d}.000Z",
                    }
                )
                + "\n"
            )


@pytest.fixture(scope="module")
def sem_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("semdedup")
    d = {
        "drop": str(base / "drop"),
        "state": str(base / "state"),
        "ckpt": str(base / "ckpt"),
    }
    os.makedirs(d["drop"])
    return d


def test_semantic_stream_batch_parity_across_restart(spark, sf_dir, sem_dirs):
    model = _centroid_model(spark, sf_dir)

    # first drop: the base half; run to completion
    _write_drop(spark, sf_dir, f"{sem_dirs['drop']}/part1.jsonl", 0, 100)
    semantic_dedup_stream(
        spark, sem_dirs["drop"], sem_dirs["state"], sem_dirs["ckpt"], model
    )
    mid = semantic_dedup_stream_report(spark, sem_dirs["state"])
    assert mid.count() == 100

    # the rest (including every planted +1M near-dup copy) lands; RESUME
    # from the same checkpoint — only the new file processes
    _write_drop(
        spark, sf_dir, f"{sem_dirs['drop']}/part2.jsonl", 100, 10**9
    )
    semantic_dedup_stream(
        spark, sem_dirs["drop"], sem_dirs["state"], sem_dirs["ckpt"], model
    )

    got = {
        r["vec_id"]: (r["cid"], r["keep"], r["n_dups"], r["best_sim"])
        for r in semantic_dedup_stream_report(
            spark, sem_dirs["state"]
        ).collect()
    }
    want = {
        r["vec_id"]: (r["cid"], r["keep"], r["n_dups"], r["best_sim"])
        for r in semantic_dedup(spark, sf_dir).collect()
    }
    assert got == want
    # the parity is non-vacuous: the planted copies produce real drops
    assert any(not keep for (_, keep, _, _) in got.values())


def test_semantic_store_scan_prunes_to_touched_cids(spark, sf_dir, sem_dirs):
    """Runs after the parity test (module-scoped dirs hold a real
    store): a probe batch touching ONE cid must read only that cid's
    store partitions, and the store must hold others (non-vacuous)."""
    from pyspark.sql import functions as F

    from kafka_flink_slack_pipeline_spark.streaming.semantic_dedup import (
        _pruned_vec_store,
    )

    store_dir = f"{sem_dirs['state']}/vectors"
    full = spark.read.option("basePath", store_dir).parquet(store_dir)
    cids = sorted(r["cid"] for r in full.select("cid").distinct().collect())
    assert len(cids) > 1
    probe = [cids[0]]
    pruned = _pruned_vec_store(spark, store_dir, 10**9, probe)
    read_files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files
    for f in read_files:
        assert f"/cid={probe[0]}/" in f, f"read untouched partition: {f}"
    all_files = [
        r[0] for r in full.select(F.input_file_name()).distinct().collect()
    ]
    assert len(read_files) < len(all_files)


def test_semantic_store_rejects_remote_uri(spark):
    from kafka_flink_slack_pipeline_spark.streaming.semantic_dedup import (
        _pruned_vec_store,
    )

    with pytest.raises(ValueError, match="driver-local"):
        _pruned_vec_store(spark, "hdfs://nn/vectors", 2, [0])
