"""Stream/batch parity for the incremental BM25 postings index.

The contract (streaming/retrieval_index.py): bm25_index_search over
the landed horizon equals bm25_keyword_search over the same documents
EXACTLY (same tokenization, same integer tf/df/dl, exactly
reconstructed N/avgdl, same scoring expressions), across a checkpoint
restart — and a bounded query workload reads only its terms' tp
partitions from the postings store.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators.curation import (
    bm25_keyword_search,
)
from kafka_flink_slack_pipeline_spark.streaming.retrieval_index import (
    _pruned_postings,
    bm25_index_search,
    bm25_index_stream,
)


def _doc_rows(spark, sf_dir):
    return [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    ]


def _write_drop(path, rows, lo, hi):
    with open(path, "w") as f:
        for i, (doc_id, text) in enumerate(
            sorted(r for r in rows if lo <= r[0] < hi)
        ):
            f.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "ingest_ts": f"2025-01-01T00:{i // 60:02d}"
                        f":{i % 60:02d}.000Z",
                    }
                )
                + "\n"
            )


def _batch_rows(spark, rows, tmpdir):
    """bm25_keyword_search over exactly the landed documents: write
    them as a documents.parquet table and run the registered batch op."""
    spark.createDataFrame(
        rows, "doc_id bigint, text string"
    ).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return bm25_keyword_search(spark, str(tmpdir)).collect()


@pytest.fixture(scope="module")
def index_dirs(tmp_path_factory, spark, sf_dir):
    base = tmp_path_factory.mktemp("bm25index")
    d = {
        "drop": str(base / "drop"),
        "state": str(base / "state"),
        "ckpt": str(base / "ckpt"),
        "docs": str(base / "docs"),
    }
    os.makedirs(d["drop"])
    rows = _doc_rows(spark, sf_dir)

    # two drops across a RESTART: the index must accumulate
    _write_drop(f"{d['drop']}/part1.jsonl", rows, 0, 300)
    bm25_index_stream(spark, d["drop"], d["state"], d["ckpt"])
    _write_drop(f"{d['drop']}/part2.jsonl", rows, 300, 10**9)
    bm25_index_stream(spark, d["drop"], d["state"], d["ckpt"])
    d["rows"] = rows
    return d


def test_index_search_equals_batch_bm25(spark, index_dirs):
    got = [
        tuple(r) for r in bm25_index_search(
            spark, index_dirs["state"]
        ).collect()
    ]
    want = [
        tuple(r)
        for r in _batch_rows(spark, index_dirs["rows"], index_dirs["docs"])
    ]
    assert got == want
    assert got, "empty workload — parity vacuous"


def test_index_search_single_query_serving_path(spark, index_dirs):
    """The serving path: one query's result equals that query's slice
    of the full workload, and its postings scan touches ONLY the query
    terms' tp partitions (directory-level pruning pinned via
    input_file_name)."""
    full = {
        (r["query_id"], r["rank"]): tuple(r)
        for r in bm25_index_search(spark, index_dirs["state"]).collect()
    }
    qid = sorted({q for q, _ in full})[0]
    one = bm25_index_search(
        spark, index_dirs["state"], query_ids=[qid]
    ).collect()
    assert [tuple(r) for r in one] == [
        full[(q, k)] for q, k in sorted(full) if q == qid
    ]

    seeds = spark.read.option(
        "basePath", f"{index_dirs['state']}/seeds"
    ).parquet(f"{index_dirs['state']}/seeds")
    terms = [
        (r["term"], r["tp"])
        for r in seeds.filter(F.col("query_id") == qid)
        .select("term", "tp")
        .distinct()
        .collect()
    ]
    tps = {tp for _, tp in terms}
    pruned = _pruned_postings(
        spark, f"{index_dirs['state']}/postings", terms
    )
    read_files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files
    for f in read_files:
        assert any(f"/tp={tp}/" in f for tp in tps), (
            f"read untouched partition: {f}"
        )
    all_files = [
        r[0]
        for r in spark.read.option(
            "basePath", f"{index_dirs['state']}/postings"
        )
        .parquet(f"{index_dirs['state']}/postings")
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert len(read_files) < len(all_files)


def test_index_compaction_preserves_search(spark, sf_dir, tmp_path):
    """A 3-batch run with compact_every=1 folds the postings store from
    inside the runner; the folded index serves identical results."""
    rows = _doc_rows(spark, sf_dir)
    d = {
        "drop": str(tmp_path / "drop"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
        "docs": str(tmp_path / "docs"),
    }
    os.makedirs(d["drop"])
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 10**9)]):
        path = f"{d['drop']}/part{i}.jsonl"
        _write_drop(path, rows, lo, hi)
        os.utime(path, (1700000000 + i, 1700000000 + i))  # mtime order
    bm25_index_stream(
        spark, d["drop"], d["state"], d["ckpt"],
        max_files_per_trigger=1, compact_every=1,
    )
    postings_dir = f"{d['state']}/postings"
    n_dirs = len(
        [e for e in os.listdir(postings_dir) if e.startswith("batch_id=")]
    )
    assert n_dirs < 3  # folded from inside the runner
    got = [tuple(r) for r in bm25_index_search(spark, d["state"]).collect()]
    want = [tuple(r) for r in _batch_rows(spark, rows, d["docs"])]
    assert got == want


def test_index_store_rejects_remote_uri(spark):
    with pytest.raises(ValueError, match="driver-local"):
        _pruned_postings(spark, "s3://bucket/postings", [("x", 0)])


def test_index_search_refuses_empty_store(spark, tmp_path):
    with pytest.raises(ValueError, match="nothing has landed"):
        _pruned_postings(spark, f"{tmp_path}/postings", [("x", 0)])
