"""Stream/batch parity for the composed streaming curation funnel.

The contract (streaming/curation_funnel.py): on the same drop, with
ingest order following doc_id order, the accumulated per-stage survivor
counts equal the batch corpus_curation_funnel rows exactly — across a
checkpoint restart that adds a second drop file.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from kafka_flink_slack_pipeline_spark.operators.curation import (
    corpus_curation_funnel,
    fuzzy_bench_frames,
)
from kafka_flink_slack_pipeline_spark.operators.textops import tokens_col
from kafka_flink_slack_pipeline_spark.streaming.curation_funnel import (
    curation_funnel_stream,
    curation_funnel_stream_report,
)


def _write_drop(sf_dir: str, path: str, lo: int, hi: int) -> None:
    """One single-file JSONL drop of documents with doc_id in [lo, hi),
    rows in doc_id order, ingest_ts monotone in doc_id (the monotone
    ingest-sequence assumption the parity contract states)."""
    rows = duckdb.sql(
        f"""
        SELECT doc_id, text, lang, source
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE doc_id >= {lo} AND doc_id < {hi}
        ORDER BY doc_id
        """
    ).fetchall()
    with open(path, "w") as f:
        for doc_id, text, lang, source in rows:
            ts = f"2025-01-01T00:{doc_id // 60:02d}:{doc_id % 60:02d}.000Z"
            f.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "lang": lang,
                        "source": source,
                        "ingest_ts": ts,
                    }
                )
                + "\n"
            )


@pytest.fixture(scope="module")
def funnel_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("funnel")
    d = {
        "drop": str(base / "drop"),
        "out": str(base / "out"),
        "state": str(base / "state"),
        "ckpt": str(base / "ckpt"),
    }
    os.makedirs(d["drop"])
    return d


def _run(spark, sf_dir, dirs):
    toked = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", tokens_col().alias("toks"))
    )
    bench_sh, bench_sizes = fuzzy_bench_frames(toked)
    return curation_funnel_stream(
        spark,
        dirs["drop"],
        dirs["out"],
        dirs["state"],
        dirs["ckpt"],
        bench_sh,
        bench_sizes,
        ttl="2 hours",
    )


def test_funnel_stream_batch_parity_across_restart(spark, sf_dir, funnel_dirs):
    # first drop: the lower half of the corpus; run to completion
    _write_drop(sf_dir, f"{funnel_dirs['drop']}/part1.jsonl", 0, 250)
    _run(spark, sf_dir, funnel_dirs)

    mid = {
        r["stage"]: r
        for r in curation_funnel_stream_report(
            spark, funnel_dirs["state"], funnel_dirs["out"]
        ).collect()
    }
    assert mid["raw"]["n_docs"] == 250

    # second drop lands; RESUME from the same checkpoint — only the new
    # file processes (raw count would exceed 500 if part1 re-ran)
    _write_drop(sf_dir, f"{funnel_dirs['drop']}/part2.jsonl", 250, 10**9)
    _run(spark, sf_dir, funnel_dirs)

    got = {
        (r["stage_ord"], r["stage"]): (r["n_docs"], r["n_tokens"])
        for r in curation_funnel_stream_report(
            spark, funnel_dirs["state"], funnel_dirs["out"]
        ).collect()
    }
    want = {
        (r["stage_ord"], r["stage"]): (r["n_docs"], r["n_tokens"])
        for r in corpus_curation_funnel(spark, sf_dir).collect()
    }
    assert got == want


def test_funnel_stream_lands_final_survivors(spark, sf_dir, funnel_dirs):
    # runs after the parity test (module-scoped dirs): landed docs must
    # equal the batch funnel's final-stage count and be lang-partitioned
    landed = spark.read.option("basePath", funnel_dirs["out"]).parquet(
        funnel_dirs["out"]
    )
    final = [
        r["n_docs"]
        for r in corpus_curation_funnel(spark, sf_dir).collect()
        if r["stage"] == "decontaminated"
    ][0]
    assert landed.count() == final
    assert "lang" in landed.columns and "batch_id" in landed.columns
    # partition pruning works on the landed layout
    assert landed.filter("lang = 'en'").count() > 0


def test_funnel_report_refuses_missing_ingest_metrics(spark, funnel_dirs):
    """The crash-window consistency gate: counts/ holding a batch_id
    that ingest/ lacks must raise, not silently undercount stage 0/1.
    (Runs after the parity test — module-scoped dirs have real state.)"""
    import shutil

    import pytest as _pytest

    ingest = os.path.join(funnel_dirs["state"], "ingest")
    victim = sorted(
        e for e in os.listdir(ingest) if e.startswith("batch_id=")
    )[0]
    backup = os.path.join(funnel_dirs["state"], "_backup_" + victim)
    shutil.move(os.path.join(ingest, victim), backup)
    try:
        with _pytest.raises(ValueError, match="ingest metrics missing"):
            curation_funnel_stream_report(
                spark, funnel_dirs["state"], funnel_dirs["out"]
            )
    finally:
        shutil.move(backup, os.path.join(ingest, victim))
    # restored state reports cleanly again
    assert (
        curation_funnel_stream_report(
            spark, funnel_dirs["state"], funnel_dirs["out"]
        ).count()
        == 6
    )


# ---------------------------------------------------------------------------
# Signature-store pruning: the property that keeps per-batch near-dup cost
# flat as the store grows. The store is partitioned by (band, bprefix); a
# batch's near-dup stage must READ only the partitions its own band keys
# hash into, and the rows it pulls from them must be exactly the full
# store's members of the buckets the batch touches (so restricting the
# bucket-size count to touched buckets loses nothing).


def _bands_of(spark, sf_dir, lo, hi):
    from pyspark.sql import functions as F

    from kafka_flink_slack_pipeline_spark.operators.dedup import (
        _minhash_sig_bands,
        _minhash_sigs,
        _word_shingles,
    )
    from kafka_flink_slack_pipeline_spark.streaming.curation_funnel import (
        _bprefix_col,
    )

    shingled = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(f"doc_id >= {lo} AND doc_id < {hi}")
        .select(
            "doc_id",
            F.explode(_word_shingles(tokens_col(), 3)).alias("shingle"),
        )
        .filter("shingle <> ''")
    )
    return _minhash_sig_bands(_minhash_sigs(shingled)).withColumn(
        "bprefix", _bprefix_col()
    )


def test_sig_store_scan_prunes_to_touched_partitions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from kafka_flink_slack_pipeline_spark.streaming.curation_funnel import (
        _pruned_store,
    )

    sigs_dir = str(tmp_path / "sigs")
    _bands_of(spark, sf_dir, 0, 200).write.mode("overwrite").partitionBy(
        "band", "bprefix"
    ).parquet(f"{sigs_dir}/batch_id=0")
    _bands_of(spark, sf_dir, 200, 400).write.mode("overwrite").partitionBy(
        "band", "bprefix"
    ).parquet(f"{sigs_dir}/batch_id=1")

    # a single-doc incoming batch touches at most 4 (band, bprefix) pairs
    new = _bands_of(spark, sf_dir, 400, 401)
    touched = [
        (r["band"], r["bprefix"])
        for r in new.select("band", "bprefix").distinct().collect()
    ]
    assert 0 < len(touched) <= 4

    store = _pruned_store(spark, sigs_dir, 2, touched)
    read_files = [
        r[0]
        for r in store.select(F.input_file_name()).distinct().collect()
    ]
    # every file actually read lives under a touched partition directory
    assert read_files
    for f in read_files:
        assert any(
            f"/band={b}/bprefix={p}/" in f for b, p in touched
        ), f"read an untouched partition's file: {f}"

    # non-vacuous: the store HAS partitions the batch does not touch
    full = spark.read.option("basePath", sigs_dir).parquet(sigs_dir)
    all_files = [
        r[0] for r in full.select(F.input_file_name()).distinct().collect()
    ]
    assert len(read_files) < len(all_files)

    # exactness: pruning + bucket semi-join together return precisely the
    # full store's members of the buckets the batch touches — nothing the
    # bucket-size count (and hence the cap decision) needs is lost
    keys = new.select("band", "bkey").distinct()
    got = store.join(keys, ["band", "bkey"], "semi").count()
    want = full.join(keys, ["band", "bkey"], "semi").count()
    assert got == want


def test_sig_store_rejects_remote_uri(spark):
    import pytest as _pytest

    from kafka_flink_slack_pipeline_spark.streaming.curation_funnel import (
        _pruned_store,
    )

    with _pytest.raises(ValueError, match="driver-local"):
        _pruned_store(spark, "s3://bucket/sigs", 2, [(0, 0)])
