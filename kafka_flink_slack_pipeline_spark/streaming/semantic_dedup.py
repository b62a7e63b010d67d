"""Streaming face of semantic_dedup (SemDeDup, Abbas et al. 2023 — batch
semantics at operators/similarity.py:semantic_dedup): embedding vectors
arrive as JSONL drops; every micro-batch

    1. assigns each arrival to its nearest coarse-quantizer centroid —
       a pure NARROW map against the O(k*d) driver-literal model (the
       batch op's `_centroid_sims`/`_assign_cid` expressions verbatim:
       no broadcast join, no shuffle, whole-stage codegen);
    2. lands its assignments in a cid-PARTITIONED parquet vector store
       (batch_id-scoped overwrite — the idempotent-replay contract every
       store in this package uses; batch N reads batch_id < N only);
    3. prunes arrivals against history: a vector is DROPPED iff a
       lower-id vector in the same cluster has cosine >= threshold (the
       SemDeDup keep-first rule). The pair side reads ONLY the store's
       touched cid partitions (partition-pruned scan; the touched list
       is bounded by min(k, |batch|) literals), so per-batch pair work
       is sum over touched clusters of |cluster| * |batch ∩ cluster| —
       exactly the bound the coarse quantizer exists to provide — and
       history in untouched clusters is never re-read.

PARITY CONTRACT (tests/test_streaming_semantic.py, across a checkpoint
restart): with monotone ingest (vec_id order — every lower id has landed
by the time an arrival is judged), the accumulated per-vector verdicts
equal the batch `semantic_dedup` rows exactly: same keep flags, same
n_dups (an arrival's lower-id pairs all resolve in its own batch — part
from the store, part from same-batch lower ids), same best_sim (the
store round-trips doubles losslessly and both faces share one cosine
fold expression).

Why a STORE and not keyed state (the minhash face holds per-bucket
state): the reference set here is every landed vector, 64 doubles each —
a table, not a state row; and SemDeDup's cluster sizes are corpus-scale
(k ~ sqrt(n) leaves sqrt(n)-sized cells), far past any per-key state
budget. Same decision the curation funnel's signature store documents.

The centroid MODEL is a fixed input (production trains it offline;
SemDeDup used precomputed k-means over LAION embeddings) — passed in as
the driver-literal list, never derived from the stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    NEARDUP_THRESHOLD,
    _assign_cid,
    _centroid_sims,
    cosine,
    norm,
)
from .curation_funnel import (
    _assert_local_dir,
    _assert_no_compact_leftover,
    _compact_batch_store,
)

VEC_DROP_SCHEMA = (
    "vec_id bigint, embedding array<double>, ingest_ts timestamp"
)


def compact_vec_store(
    spark: SparkSession,
    store_dir: str,
    upto: int,
    checkpoint_dir: str | None = None,
) -> int:
    """Fold vector-store batches [0, upto) into ONE batch directory
    (id = upto - 1), preserving the cid partition layout — the
    signature store's compaction discipline applied to the semantic
    store (each live batch adds up to min(k, |batch|) cid directories,
    and partition discovery across many batch dirs is the pruned scan's
    residual growth term, measured in SCALE_PROBE_SEMANTIC.json).
    Future batches N >= upto read batch_id < N, which includes the
    compacted id, so verdicts are unchanged (output-identity test).
    Shares compact_sig_store's safety rails: id-horizon and
    committed-horizon validation, underscore-prefixed staging that
    every reader refuses loudly after a crash."""
    return _compact_batch_store(
        spark,
        store_dir,
        upto,
        cols=["vec_id", "emb", "cid"],
        partition_cols=["cid"],
        what="vector store dir",
        checkpoint_dir=checkpoint_dir,
    )


def _pruned_vec_store(
    spark: SparkSession, store_dir: str, before: int, touched: list[int]
):
    """Landed (vec_id, emb, cid) rows from batches < `before`, scan-
    pruned to the touched cid partitions; None when no store exists yet.
    `touched` is bounded by the codebook size, so the isin predicate is
    a static partition-pruning literal list."""
    _assert_local_dir(store_dir, "vector store dir")
    if not os.path.isdir(store_dir):
        return None
    _assert_no_compact_leftover(store_dir)
    if not any(e.startswith("batch_id=") for e in os.listdir(store_dir)):
        return None
    if not touched:
        return None
    return (
        spark.read.option("basePath", store_dir)
        .parquet(store_dir)
        .filter(F.col("batch_id") < before)
        .filter(F.col("cid").isin([int(c) for c in touched]))
        .select("vec_id", "emb", "cid")
    )


def semantic_dedup_stream(
    spark: SparkSession,
    drop_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    model: list[tuple[int, list[float]]],
    threshold: float = NEARDUP_THRESHOLD,
    max_files_per_trigger: int = 1000,
    compact_every: int | None = 64,
):
    """Run the stream over all available drops (availableNow) and block
    until done; returns the finished StreamingQuery. Re-invoke with the
    same checkpoint_dir to resume — only new files process, and replayed
    batches overwrite their own prior store partition and verdicts.

    `compact_every=N` folds the vector store every N committed batches
    from inside the runner (at the start of batch k where k % N == 0,
    upto=k — everything below k is committed by then, enforced from the
    commits/ log), the curation funnel's auto-compaction policy: a
    long-running deployment's store stays at ~N + 1 batch directories
    without anyone remembering the manual tool. ON BY DEFAULT (64;
    pass None to disable and manage compaction externally). Replay-safe
    — a replayed batch's repeat call is a no-op once one directory
    remains."""
    store_dir = f"{state_dir}/vectors"
    verdicts_dir = f"{state_dir}/verdicts"

    raw = (
        spark.readStream.schema(VEC_DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )

    def stage(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_vec_store(
                spark, store_dir, upto=batch_id, checkpoint_dir=checkpoint_dir
            )
        assigned = (
            batch.select(
                "vec_id",
                F.col("embedding").alias("emb"),
                norm(F.col("embedding")).alias("nrm"),
            )
            .select(
                "vec_id",
                "emb",
                _centroid_sims(model, F.col("emb"), F.col("nrm")).alias(
                    "csims"
                ),
            )
            .select(
                "vec_id", _assign_cid(model, F.col("csims")).alias("cid"),
                "emb",
            )
            .persist()
        )
        try:
            assigned.write.mode("overwrite").partitionBy("cid").parquet(
                f"{store_dir}/batch_id={batch_id}"
            )
            touched = [
                r["cid"]
                for r in assigned.select("cid").distinct().collect()
            ]  # bounded by the codebook size
            store = _pruned_vec_store(spark, store_dir, batch_id, touched)
            hist = (
                assigned.select("vec_id", "emb", "cid")
                if store is None
                else store.unionByName(
                    assigned.select("vec_id", "emb", "cid")
                )
            )
            pairs = (
                hist.alias("a")
                .join(
                    assigned.alias("b"),
                    (F.col("a.cid") == F.col("b.cid"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")),
                )
                .withColumn("sim", cosine(F.col("a.emb"), F.col("b.emb")))
                .filter(F.col("sim") >= threshold)
                .select(F.col("b.vec_id").alias("vec_id"), "sim")
            )
            stats = pairs.groupBy("vec_id").agg(
                F.count(F.lit(1)).alias("n_dups"),
                F.max("sim").alias("best_sim"),
            )
            (
                assigned.join(stats, "vec_id", "left")
                .select(
                    "vec_id",
                    "cid",
                    F.col("n_dups").isNull().alias("keep"),
                    F.coalesce("n_dups", F.lit(0).cast("long")).alias(
                        "n_dups"
                    ),
                    F.round("best_sim", 6).alias("best_sim"),
                )
                .write.mode("overwrite")
                .parquet(f"{verdicts_dir}/batch_id={batch_id}")
            )
        finally:
            assigned.unpersist()

    q = (
        raw.writeStream.queryName("semantic_dedup_stream")
        .foreachBatch(stage)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def semantic_dedup_stream_report(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Accumulated per-vector verdicts over every processed batch — the
    same (vec_id, cid, keep, n_dups, best_sim) rows as the batch
    semantic_dedup (the parity test compares them directly)."""
    return (
        spark.read.option("basePath", f"{state_dir}/verdicts")
        .parquet(f"{state_dir}/verdicts")
        .select("vec_id", "cid", "keep", "n_dups", "best_sim")
        .orderBy("vec_id")
    )
