"""Stream/batch parity for the incrementally-maintained hybrid index.

The contract (streaming/hybrid_index.py): once the corpus has landed,
hybrid_index_search with the codebook trained on that corpus equals
hybrid_search_rrf_ivf over the same (documents, embeddings) tables
EXACTLY — fused ranks, rrf scores, in_lex/in_dense flags — across a
checkpoint restart; and a single query's dense candidates are read
only from its probed cid partitions.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators.curation import (
    hybrid_search_rrf_ivf,
)
from kafka_flink_slack_pipeline_spark.operators.similarity import (
    IVF_NPROBE,
    _centroid_model,
)
from kafka_flink_slack_pipeline_spark.streaming.hybrid_index import (
    _pruned_vectors,
    hybrid_index_search,
    hybrid_index_stream,
)


def _drop_rows(spark, sf_dir):
    """documents JOIN embeddings (1:1 on id in this corpus): each drop
    carries the text and the float32→double vector, so the landed
    doubles are bit-identical to what the batch op reads."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("emb"),
    )
    return [
        (r.doc_id, r.text, list(r.emb) if r.emb is not None else None)
        for r in docs.join(emb, "doc_id", "left").orderBy("doc_id").collect()
    ]


def _write_drop(path, rows, lo, hi):
    with open(path, "w") as f:
        for i, (doc_id, text, emb) in enumerate(
            sorted((r for r in rows if lo <= r[0] < hi), key=lambda r: r[0])
        ):
            f.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "embedding": emb,
                        "ingest_ts": f"2025-01-01T00:{i // 60:02d}"
                        f":{i % 60:02d}.000Z",
                    }
                )
                + "\n"
            )


@pytest.fixture(scope="module")
def hybrid_dirs(tmp_path_factory, spark, sf_dir):
    base = tmp_path_factory.mktemp("hybridindex")
    d = {
        "drop": str(base / "drop"),
        "state": str(base / "state"),
        "ckpt": str(base / "ckpt"),
    }
    os.makedirs(d["drop"])
    codebook = _centroid_model(spark, sf_dir)
    rows = _drop_rows(spark, sf_dir)
    _write_drop(f"{d['drop']}/part1.jsonl", rows, 0, 300)
    hybrid_index_stream(
        spark, d["drop"], d["state"], d["ckpt"], codebook
    )
    _write_drop(f"{d['drop']}/part2.jsonl", rows, 300, 10**9)
    hybrid_index_stream(
        spark, d["drop"], d["state"], d["ckpt"], codebook
    )
    d["codebook"] = codebook
    return d


def test_hybrid_index_search_equals_batch_fusion(
    spark, sf_dir, hybrid_dirs
):
    got = [
        tuple(r)
        for r in hybrid_index_search(
            spark, hybrid_dirs["state"], hybrid_dirs["codebook"]
        ).collect()
    ]
    want = [tuple(r) for r in hybrid_search_rrf_ivf(spark, sf_dir).collect()]
    assert got == want
    assert got, "empty workload — parity vacuous"


def test_hybrid_index_single_query_and_cid_pruning(spark, hybrid_dirs):
    """The serving path: one query's fused rows equal its slice of the
    full workload, and its dense candidates come only from <= nprobe
    cid partitions (input_file_name-pinned)."""
    full = {
        (r["query_id"], r["rank"]): tuple(r)
        for r in hybrid_index_search(
            spark, hybrid_dirs["state"], hybrid_dirs["codebook"]
        ).collect()
    }
    qid = sorted({q for q, _ in full})[0]
    one = hybrid_index_search(
        spark, hybrid_dirs["state"], hybrid_dirs["codebook"],
        query_ids=[qid],
    ).collect()
    assert [tuple(r) for r in one] == [
        full[(q, k)] for q, k in sorted(full) if q == qid
    ]

    # the probed cids for this query are <= IVF_NPROBE; the pruned scan
    # must touch only those partitions, and the store must hold others
    vectors_dir = f"{hybrid_dirs['state']}/vectors"
    all_cids = {
        r["cid"]
        for r in spark.read.option("basePath", vectors_dir)
        .parquet(vectors_dir)
        .select("cid")
        .distinct()
        .collect()
    }
    assert len(all_cids) > IVF_NPROBE
    probe_cids = sorted(all_cids)[:IVF_NPROBE]
    pruned = _pruned_vectors(spark, vectors_dir, probe_cids)
    read_files = [
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files
    for f in read_files:
        assert any(f"/cid={c}/" in f for c in probe_cids), (
            f"read untouched partition: {f}"
        )


def test_hybrid_vector_store_rejects_remote_uri(spark):
    with pytest.raises(ValueError, match="driver-local"):
        _pruned_vectors(spark, "hdfs://nn/vectors", [0])


def test_hybrid_index_compaction_preserves_search(spark, sf_dir, tmp_path):
    """A 3-batch run with compact_every=1 folds BOTH stores from inside
    the runner; the folded index serves identical fused results."""
    from kafka_flink_slack_pipeline_spark.streaming.hybrid_index import (
        hybrid_index_stream as run,
    )

    codebook = _centroid_model(spark, sf_dir)
    rows = _drop_rows(spark, sf_dir)
    d = {
        "drop": str(tmp_path / "drop"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["drop"])
    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 10**9)]):
        path = f"{d['drop']}/part{i}.jsonl"
        _write_drop(path, rows, lo, hi)
        os.utime(path, (1700000000 + i, 1700000000 + i))  # mtime order
    run(
        spark, d["drop"], d["state"], d["ckpt"], codebook,
        max_files_per_trigger=1, compact_every=1,
    )
    for store in ("postings", "vectors"):
        n_dirs = len(
            [
                e
                for e in os.listdir(f"{d['state']}/{store}")
                if e.startswith("batch_id=")
            ]
        )
        assert n_dirs < 3, f"{store} not folded"
    got = [
        tuple(r)
        for r in hybrid_index_search(spark, d["state"], codebook).collect()
    ]
    want = [tuple(r) for r in hybrid_search_rrf_ivf(spark, sf_dir).collect()]
    assert got == want


def test_hybrid_vector_store_refuses_empty_store(spark, tmp_path):
    with pytest.raises(ValueError, match="nothing has landed"):
        _pruned_vectors(spark, f"{tmp_path}/vectors", [0])
