"""Write-path tests: training-shard export roundtrip + determinism."""

from __future__ import annotations

import os

from kafka_flink_slack_pipeline_spark.operators.textops import (
    corpus_export_manifest,
)
from kafka_flink_slack_pipeline_spark.sinks.dataset import (
    export_corpus,
    read_training_shards,
    write_training_shards,
)


def test_export_roundtrip_matches_planned_manifest(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    readback = {
        (r.lang, r.shard): r for r in export_corpus(spark, sf_dir, out).collect()
    }
    planned = {
        (r.lang, r.shard): r
        for r in corpus_export_manifest(spark, sf_dir).collect()
    }
    assert set(readback) == set(planned)
    for key, p in planned.items():
        r = readback[key]
        assert (r.n_seqs, r.n_docs, r.n_tokens) == (
            p.n_seqs,
            p.n_docs,
            p.n_tokens,
        ), key
        assert r.n_files >= 1
    # hive-style partition layout on disk
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert langs and all(
        any(s.startswith("shard=") for s in os.listdir(os.path.join(out, d)))
        for d in langs
    )


def test_export_is_deterministic_across_reruns(spark, sf_dir, tmp_path):
    """Same input -> byte-identical shard contents (rerun-stable caching)."""
    from kafka_flink_slack_pipeline_spark.operators.textops import (
        _apply_pack,
        _pack_shards_for,
        _sized_docs,
    )
    from kafka_flink_slack_pipeline_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    packed = _apply_pack(_sized_docs(docs, _pack_shards_for(docs.count())))
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(packed, a)
    write_training_shards(packed, b)
    rows_a = [
        tuple(r)
        for r in read_training_shards(spark, a)
        .orderBy("lang", "shard", "seq_id", "seq_offset", "doc_id")
        .collect()
    ]
    rows_b = [
        tuple(r)
        for r in read_training_shards(spark, b)
        .orderBy("lang", "shard", "seq_id", "seq_offset", "doc_id")
        .collect()
    ]
    assert rows_a == rows_b and rows_a


def test_max_records_per_file_splits_output(spark, sf_dir, tmp_path):
    from kafka_flink_slack_pipeline_spark.operators.textops import (
        _apply_pack,
        _pack_shards_for,
        _sized_docs,
    )
    from kafka_flink_slack_pipeline_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    packed = _apply_pack(_sized_docs(docs, _pack_shards_for(docs.count())))
    out = str(tmp_path / "small")
    write_training_shards(packed, out, max_records_per_file=10)
    one_lang = os.path.join(
        out, sorted(d for d in os.listdir(out) if d.startswith("lang="))[0]
    )
    one_shard = os.path.join(
        one_lang,
        sorted(d for d in os.listdir(one_lang) if d.startswith("shard="))[0],
    )
    files = [f for f in os.listdir(one_shard) if f.endswith(".parquet")]
    n_rows = (
        read_training_shards(spark, out)
        .filter("lang = '%s' and shard = %s"
                % (one_lang.split("=")[-1], one_shard.split("=")[-1]))
        .count()
    )
    assert len(files) >= n_rows // 10, (len(files), n_rows)
