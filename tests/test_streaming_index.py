"""Stream/batch parity for the incremental BM25 postings index.

The contract (streaming/retrieval_index.py): bm25_index_search over
the landed horizon equals bm25_keyword_search over the LWW-CURRENT
corpus (re-ingested versions supersede by ingest_ts, tombstones drop
docs from results AND from df/N/avgdl) EXACTLY — same tokenization,
same integer tf/df/dl, exactly reconstructed N/avgdl, same scoring
expressions — across a checkpoint restart, pre- and post-compaction;
and a bounded query workload reads only its terms' tp partitions from
the postings store.
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
    _read_store,
    bm25_index_search,
    bm25_index_search_adhoc,
    bm25_index_stream,
    compact_retrieval_store,
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


def test_index_sidecars_refuse_empty_and_remote(spark, tmp_path):
    """The r10 ADVICE gap: seeds/docmeta reads get the same loud
    guards as postings (a wrong state_dir must not surface a raw
    AnalysisException)."""
    with pytest.raises(ValueError, match="nothing has landed"):
        _read_store(spark, f"{tmp_path}/seeds", "seed sidecar dir")
    with pytest.raises(ValueError, match="driver-local"):
        _read_store(spark, "s3://bucket/docmeta", "docmeta store dir")


def _write_recs(path, recs):
    with open(path, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


# 16+ tokens so the updated seed doc's query slice (tokens 10..12) is
# non-empty and DIFFERS from the original seed terms
_NEW_SEED_TEXT = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec"
)


def _updated_corpus(rows, upd, dels):
    """LWW-current corpus after applying updates/tombstones — the
    batch comparator's ground truth."""
    return [(i, upd.get(i, t)) for i, t in rows if i not in dels]


@pytest.fixture(scope="module")
def lww_dirs(tmp_path_factory, spark, sf_dir):
    """Three-wave store: full corpus, then updates + tombstones across
    a restart, then compaction, then a post-compaction wave (the stats
    snapshot + tail-correction serving path)."""
    base = tmp_path_factory.mktemp("bm25lww")
    d = {
        "drop": str(base / "drop"),
        "state": str(base / "state"),
        "ckpt": str(base / "ckpt"),
        "docs": str(base / "docs"),
    }
    os.makedirs(d["drop"])
    rows = _doc_rows(spark, sf_dir)
    texts = dict(rows)

    # wave 1: the full corpus (January ingest_ts, the legacy helper)
    _write_drop(f"{d['drop']}/w1.jsonl", rows, 0, 10**9)
    bm25_index_stream(spark, d["drop"], d["state"], d["ckpt"])

    # wave 2 (across a RESTART): re-ingest every doc_id%10==7 with new
    # text, re-ingest seed doc 0 with entirely new seed terms, and
    # tombstone every doc_id%10==3 plus seed doc 100
    upd = {
        i: f"{t} revised {t}" for i, t in rows if i % 10 == 7
    }
    upd[0] = _NEW_SEED_TEXT
    dels = {i for i, _ in rows if i % 10 == 3} | {100}
    recs = [
        {
            "doc_id": i,
            "text": txt,
            "ingest_ts": f"2025-02-01T00:00:{k % 60:02d}.{k // 60:03d}Z",
        }
        for k, (i, txt) in enumerate(sorted(upd.items()))
    ] + [
        {
            "doc_id": i,
            "text": None,
            "ingest_ts": f"2025-02-02T00:00:{k % 60:02d}.{k // 60:03d}Z",
            "deleted": True,
        }
        for k, i in enumerate(sorted(dels))
    ]
    _write_recs(f"{d['drop']}/w2.jsonl", recs)
    bm25_index_stream(spark, d["drop"], d["state"], d["ckpt"])
    d["rows"], d["upd"], d["dels"] = rows, upd, dels
    d["texts"] = texts
    return d


def test_index_update_delete_parity_precompaction(spark, lww_dirs):
    got = [
        tuple(r)
        for r in bm25_index_search(spark, lww_dirs["state"]).collect()
    ]
    want = [
        tuple(r)
        for r in _batch_rows(
            spark,
            _updated_corpus(
                lww_dirs["rows"], lww_dirs["upd"], lww_dirs["dels"]
            ),
            lww_dirs["docs"],
        )
    ]
    assert got == want
    assert got, "empty workload — parity vacuous"
    qids = {q for q, *_ in got}
    assert 100 not in qids, "tombstoned seed doc still serves a query"
    assert 0 in qids, "updated seed doc lost its query"
    assert not {doc for _, _, doc, *_ in got} & lww_dirs["dels"], (
        "tombstoned doc appears in results"
    )


def test_index_update_delete_parity_postcompaction(spark, lww_dirs):
    """Compaction physically drops superseded and tombstoned rows;
    serving is unchanged; a post-compaction wave then serves through
    the stats snapshot + tail correction."""
    before = [
        tuple(r)
        for r in bm25_index_search(spark, lww_dirs["state"]).collect()
    ]
    compact_retrieval_store(
        spark, lww_dirs["state"], upto=2, checkpoint_dir=lww_dirs["ckpt"]
    )
    after = [
        tuple(r)
        for r in bm25_index_search(spark, lww_dirs["state"]).collect()
    ]
    assert after == before

    postings = _read_store(
        spark, f"{lww_dirs['state']}/postings", "postings index store dir"
    )
    assert (
        postings.filter(
            F.col("doc_id").isin(sorted(lww_dirs["dels"])[:50])
        ).count()
        == 0
    ), "tombstoned docs' postings not physically dropped"
    assert (
        postings.filter(F.col("doc_id") == 7)
        .select("ts")
        .distinct()
        .count()
        == 1
    ), "superseded version's postings not physically dropped"

    # wave 3 AFTER the fold: another update + tombstone must serve
    # exactly through snapshot-corrected stats and the tail mask
    upd3 = dict(lww_dirs["upd"])
    upd3[11] = "eleven rewritten beyond recognition with many tokens"
    dels3 = set(lww_dirs["dels"]) | {21}
    _write_recs(
        f"{lww_dirs['drop']}/w3.jsonl",
        [
            {
                "doc_id": 11,
                "text": upd3[11],
                "ingest_ts": "2025-03-01T00:00:00.000Z",
            },
            {
                "doc_id": 21,
                "text": None,
                "ingest_ts": "2025-03-01T00:00:01.000Z",
                "deleted": True,
            },
        ],
    )
    bm25_index_stream(
        spark, lww_dirs["drop"], lww_dirs["state"], lww_dirs["ckpt"]
    )
    got = [
        tuple(r)
        for r in bm25_index_search(spark, lww_dirs["state"]).collect()
    ]
    want = [
        tuple(r)
        for r in _batch_rows(
            spark,
            _updated_corpus(lww_dirs["rows"], upd3, dels3),
            lww_dirs["docs"],
        )
    ]
    assert got == want


def test_index_adhoc_query_serving(spark, lww_dirs):
    """Ad-hoc query strings serve through the same masked path: a
    string assembled from the updated seed doc's CURRENT slice terms
    reproduces the stored workload's rows for that query; an unseen
    term returns empty; an empty workload refuses loudly."""
    stored = [
        tuple(r)
        for r in bm25_index_search(
            spark, lww_dirs["state"], query_ids=[0]
        ).collect()
    ]
    assert stored, "seed query 0 missing — fixture drift"
    # _NEW_SEED_TEXT tokens 10..12 (the _BM25_QSLICE rule)
    adhoc = [
        tuple(r)
        for r in bm25_index_search_adhoc(
            spark, lww_dirs["state"], {0: "juliett kilo lima"}
        ).collect()
    ]
    assert adhoc == stored

    assert (
        bm25_index_search_adhoc(
            spark, lww_dirs["state"], {1: "zzzunseenterm"}
        ).collect()
        == []
    )
    with pytest.raises(ValueError, match="no non-empty query terms"):
        bm25_index_search_adhoc(spark, lww_dirs["state"], {2: "   "})

    # the corpus tokenization rule is the JAVA regex \s+ (ASCII-only):
    # a Unicode NBSP is NOT a separator, so it must stay inside one
    # (unseen) token instead of splitting into two matching terms —
    # Python's \s would have split it (ADVICE r11)
    assert (
        bm25_index_search_adhoc(
            spark, lww_dirs["state"], {3: "juliett\u00a0kilo"}
        ).collect()
        == []
    )
    # ...while the ASCII whitespace class separates exactly like the
    # corpus rule does
    adhoc_ws = [
        tuple(r)
        for r in bm25_index_search_adhoc(
            spark, lww_dirs["state"], {0: "juliett\tkilo\nlima"}
        ).collect()
    ]
    assert adhoc_ws == stored


def test_index_out_of_order_version_repaired_at_fold(spark, sf_dir, tmp_path):
    """The ORDERING CONTRACT's documented failure-and-repair path: a
    LATE older version arriving AFTER its successor was folded wins the
    tail mask (the tail knows nothing of the folded v2), so serving
    temporarily reflects v1 — and the NEXT fold's global LWW repairs it
    to v2. Both states pinned against the batch op."""
    rows = _doc_rows(spark, sf_dir)
    texts = dict(rows)
    d = {
        "drop": str(tmp_path / "drop"),
        "state": str(tmp_path / "state"),
        "ckpt": str(tmp_path / "ckpt"),
        "docs": str(tmp_path / "docs"),
    }
    os.makedirs(d["drop"])

    # batch 0: the corpus with doc 7 at version v2 (ts March)
    v2_text = "version two of seven with plenty of distinct tokens here"
    recs = [
        {
            "doc_id": i,
            "text": v2_text if i == 7 else t,
            "ingest_ts": "2025-03-01T00:00:00.000Z"
            if i == 7
            else f"2025-01-01T00:{k // 60:02d}:{k % 60:02d}.000Z",
        }
        for k, (i, t) in enumerate(rows)
    ]
    _write_recs(f"{d['drop']}/w1.jsonl", recs)
    bm25_index_stream(spark, d["drop"], d["state"], d["ckpt"])
    compact_retrieval_store(spark, d["state"], upto=1, checkpoint_dir=d["ckpt"])

    # batch 1: doc 7's OLDER v1 arrives LATE (ts February < March)
    v1_text = "version one of seven straggling in far too late"
    _write_recs(
        f"{d['drop']}/w2.jsonl",
        [
            {
                "doc_id": 7,
                "text": v1_text,
                "ingest_ts": "2025-02-01T00:00:00.000Z",
            }
        ],
    )
    bm25_index_stream(spark, d["drop"], d["state"], d["ckpt"])

    def corpus_with(doc7_text):
        return [(i, doc7_text if i == 7 else texts[i]) for i, _ in rows]

    # DEGRADED (documented): the tail winner is v1, so serving equals
    # the batch op over the v1 corpus — wrong vs LWW, but deterministic
    degraded = [
        tuple(r) for r in bm25_index_search(spark, d["state"]).collect()
    ]
    assert degraded == [
        tuple(r) for r in _batch_rows(spark, corpus_with(v1_text), d["docs"])
    ]

    # REPAIR: the next fold's global LWW reinstates v2 exactly
    compact_retrieval_store(spark, d["state"], upto=2, checkpoint_dir=d["ckpt"])
    repaired = [
        tuple(r) for r in bm25_index_search(spark, d["state"]).collect()
    ]
    assert repaired == [
        tuple(r) for r in _batch_rows(spark, corpus_with(v2_text), d["docs"])
    ]
