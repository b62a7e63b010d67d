"""Incremental retrieval-index maintenance: the streaming face of
bm25_keyword_search (operators/curation.py — reference analogue: the
consumer's continuous ingest loop, kafkaConsumer.js:74-90, feeding a
queryable history, slackEventServer.js:186-192).

A production search/RAG deployment does not re-tokenize its corpus per
query; it maintains a POSTINGS INDEX incrementally as documents arrive
and serves queries from it. Every micro-batch of (doc_id, text,
ingest_ts) drops:

    1. tokenizes with the batch op's exact rule (tokens_col + ''-filter)
       and lands one posting row per (term, doc) — (term, doc_id, tf,
       dl) — in a parquet store partitioned by tp = xxhash64(term) mod
       _TERM_PREFIXES and SORTED BY term within partitions, so a
       bounded query workload prunes both at the directory level (tp
       literals) and at the row-group level (term IN (...) pushed to
       the parquet scan against the sorted column's min/max stats);
    2. lands the batch's integer corpus statistics (n_docs, n_len,
       sum_dl) — dl values are integers, so double summation at report
       time is order-independent and avgdl reconstructs EXACTLY;
    3. lands the batch's SEED QUERIES (the registered workload rule:
       doc_id % _BM25_EVERY == 0, capped at _BM25_MAX_QUERIES seeds;
       query terms = the seed doc's token slice) in a bounded sidecar,
       carrying each term's tp so the search face never rehashes.

bm25_index_search then serves the landed horizon: corpus constants
from the summed integer stats, df/tf/dl from the pruned postings scan,
and the batch op's scoring expressions VERBATIM (one-IEEE-op rational
idf, decimal-accumulated term scores, round 6, (score DESC, doc_id)
top-k) — so the PARITY CONTRACT holds exactly: search-over-the-store
equals bm25_keyword_search over the same documents, across a
checkpoint restart (tests/test_streaming_index.py). Unlike the dedup
stores there is no bucket-cap caveat — BM25 has no candidate cap — so
parity is unconditional given idempotent replay (batch_id-scoped
overwrite, the shared store contract).

100 TB/day shape: the per-batch work is one tokenize pass + one
shuffle to (term, doc) groups; the store write appends only the
batch's own postings; a query's serving cost tracks ITS TERMS' posting
lists (directory + row-group pruning make the rest of the store
invisible), which is the inherent cost of BM25 — df grows with the
corpus, the scan of unrelated terms does not. MEASURED
(tools/index_probe.py, SCALE_PROBE_INDEX.json, 1.17M -> 1.17B posting
rows with the workload's own lists held FIXED): the shipped layout's
serving time is FLAT across three decades (3.64 -> 3.54 s, exponent
-0.004). Honest caveat: the flat-unsorted counterfactual is largely
rescued by parquet DICTIONARY filtering on the term IN predicate
(3.29 -> 3.98 s, exponent 0.028) — pushdown does most of the work in
both layouts on a string key; the partitioned layout adds the bounded
file listing and the guaranteed skip (11% ahead at 1.17B rows and
widening), and is the shape that still holds when dictionaries
overflow or the filter degrades to stats-only.

Store maintenance is the shared rails: compact_index_store folds
committed batches into one directory (tp layout + term sort
preserved; id-horizon + commits-log validation; underscore-prefixed
crash staging), invoked every `compact_every` batches by default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.curation import (
    _BM25_B,
    _BM25_EVERY,
    _BM25_K1,
    _BM25_MAX_QUERIES,
    _BM25_QSLICE,
    _BM25_TOPK,
)
from ..operators.textops import tokens_col
from .curation_funnel import (
    _assert_local_dir,
    _assert_no_compact_leftover,
    _compact_batch_store,
)

INDEX_DROP_SCHEMA = "doc_id bigint, text string, ingest_ts timestamp"
_TERM_PREFIXES = 64
_POSTING_COLS = ["term", "doc_id", "tf", "dl"]


def _tp_col(term_col="term"):
    return F.pmod(F.xxhash64(F.col(term_col)), F.lit(_TERM_PREFIXES))


def _toked_of(batch: DataFrame) -> DataFrame:
    """The batch op's exact tokenization: trimmed whitespace split,
    empty tokens dropped BEFORE length stats."""
    return batch.select(
        "doc_id", F.filter(tokens_col(), lambda t: t != "").alias("toks")
    )


def compact_index_store(
    spark: SparkSession,
    store_dir: str,
    upto: int,
    checkpoint_dir: str | None = None,
) -> int:
    """Fold postings batches [0, upto) into ONE directory, preserving
    the tp layout (the shared _compact_batch_store rails). Term order
    within the folded files follows the kernel's read order and is NOT
    guaranteed sorted — the search face never relies on sortedness for
    correctness (the IN predicate is exact either way; sortedness only
    sharpens row-group skipping on freshly-landed batches)."""
    return _compact_batch_store(
        spark,
        store_dir,
        upto,
        cols=[*_POSTING_COLS, "tp"],
        partition_cols=["tp"],
        what="postings index store dir",
        checkpoint_dir=checkpoint_dir,
    )


def _land_text(batch: DataFrame, batch_id: int, state_dir: str) -> None:
    """Land one micro-batch's lexical index state: tp-partitioned
    term-sorted postings, integer corpus statistics (exact avgdl/N
    reconstruction — dl sums are integers, double addition order-free),
    and the bounded seed-query sidecar (<= _BM25_MAX_QUERIES docs
    ever). Shared by bm25_index_stream and hybrid_index_stream."""
    toked = _toked_of(batch)
    postings = (
        toked.select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("tp", _tp_col())
    )
    (
        postings.repartition("tp")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("tp")
        .parquet(f"{state_dir}/postings/batch_id={batch_id}")
    )
    (
        toked.select(F.size("toks").alias("l"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("l").cast("long").alias("n_len"),
            F.coalesce(F.sum("l"), F.lit(0)).cast("long").alias("sum_dl"),
        )
        .write.mode("overwrite")
        .parquet(f"{state_dir}/stats/batch_id={batch_id}")
    )
    (
        toked.filter(
            (F.col("doc_id") % _BM25_EVERY == 0)
            & (F.col("doc_id") < _BM25_EVERY * _BM25_MAX_QUERIES)
        )
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(F.slice("toks", *_BM25_QSLICE))
            ).alias("term"),
        )
        .withColumn("tp", _tp_col())
        .write.mode("overwrite")
        .parquet(f"{state_dir}/seeds/batch_id={batch_id}")
    )


def bm25_index_stream(
    spark: SparkSession,
    drop_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1000,
    compact_every: int | None = 64,
):
    """Run the index-maintenance stream over all available drops
    (availableNow) and block until done; returns the finished
    StreamingQuery. Re-invoke with the same checkpoint_dir to resume —
    only new files process, and replayed batches overwrite their own
    prior store partitions (idempotent replay, the shared contract)."""
    postings_dir = f"{state_dir}/postings"

    raw = (
        spark.readStream.schema(INDEX_DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )

    def stage(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_index_store(
                spark, postings_dir, upto=batch_id,
                checkpoint_dir=checkpoint_dir,
            )
        batch = batch.persist()
        try:
            _land_text(batch, batch_id, state_dir)
        finally:
            batch.unpersist()

    q = (
        raw.writeStream.queryName("bm25_index_stream")
        .foreachBatch(stage)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _pruned_postings(
    spark: SparkSession,
    postings_dir: str,
    terms: list[tuple[str, int]],
):
    """Landed posting rows pruned to the query terms: tp literals prune
    partitions at the directory level, the term IN-list pushes to the
    parquet scan (row-group min/max skipping against the term-sorted
    files). `terms` is bounded (the seed workload), so both predicates
    are static literals."""
    _assert_local_dir(postings_dir, "postings index store dir")
    if not os.path.isdir(postings_dir):
        raise ValueError(
            f"no postings index at {postings_dir!r}: nothing has landed "
            "yet (run bm25_index_stream / hybrid_index_stream first)"
        )
    _assert_no_compact_leftover(postings_dir)
    store = spark.read.option("basePath", postings_dir).parquet(
        postings_dir
    )
    tps = sorted({tp for _, tp in terms})
    return (
        store.filter(F.col("tp").isin(tps))
        .filter(F.col("term").isin(sorted({t for t, _ in terms})))
        .select(*_POSTING_COLS)
    )


def bm25_index_search(
    spark: SparkSession, state_dir: str, query_ids: list[int] | None = None
) -> DataFrame:
    """Serve the landed horizon: BM25 top-k for the stored seed queries
    (optionally a subset — the single-query serving path the pruning
    exists for), with the batch op's scoring expressions verbatim.
    Output schema == bm25_keyword_search's: (query_id, rank, doc_id,
    score, n_matched_terms)."""
    seeds = spark.read.option("basePath", f"{state_dir}/seeds").parquet(
        f"{state_dir}/seeds"
    )
    if query_ids is not None:
        seeds = seeds.filter(F.col("query_id").isin(list(query_ids)))
    # bounded model-state collect: <= _BM25_MAX_QUERIES * slice terms
    terms = [
        (r["term"], r["tp"])
        for r in seeds.select("term", "tp").distinct().collect()
    ]
    queries = seeds.select("query_id", "term").distinct()

    stats = (
        spark.read.option("basePath", f"{state_dir}/stats")
        .parquet(f"{state_dir}/stats")
        .agg(
            F.sum("n_docs").cast("double").alias("n"),
            (
                F.sum("sum_dl").cast("double")
                / F.sum("n_len").cast("double")
            ).alias("avgdl"),
        )
    )
    matched = (
        _pruned_postings(spark, f"{state_dir}/postings", terms)
        .select(
            "doc_id",
            F.col("dl").cast("double").alias("dl"),
            "term",
            F.col("tf").cast("double").alias("tf"),
        )
        .withColumn(
            "df",
            F.count(F.lit(1))
            .over(Window.partitionBy("term"))
            .cast("double"),
        )
    )
    idf = (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_norm = (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    term_score = F.round(idf * tf_norm, 9).cast("decimal(25,12)")
    scored = (
        matched.join(F.broadcast(queries), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(term_score).cast("double"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "rank", "doc_id", "score", "n_matched_terms")
        .orderBy("query_id", "rank")
    )
