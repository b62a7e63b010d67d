"""Incrementally-maintained HYBRID retrieval index: the streaming face
of hybrid_search_rrf_ivf (operators/curation.py) — the full RAG
serving path (lexical BM25 ∪ list-pruned dense ANN, RRF-fused) served
from stores that a single checkpointed stream maintains as documents
arrive.

Every micro-batch of (doc_id, text, embedding, ingest_ts) drops lands
BOTH index faces:

    lexical — the bm25_index_stream state verbatim (shared _land_text:
      tp-partitioned term-sorted postings + integer corpus stats + the
      bounded seed-query sidecar);
    dense — each arrival's vector is assigned to its nearest coarse
      centroid under a FIXED codebook (the production IVF discipline:
      the coarse quantizer is trained offline and vectors are assigned
      at insert time; retraining means re-partitioning, which is the
      compaction story) and landed in a store partitioned by cid, plus
      a bounded dense seed sidecar (the seed docs' query vectors).

hybrid_index_search then serves the landed horizon:
bm25_index_search's lexical ranks, the IVF dense ranks (probes = the
query's nprobe nearest centroids from the same fixed codebook,
candidates read ONLY from the probed cid partitions, exact cosine
re-rank inside them — the _ivf_topk expressions verbatim, including
_centroid_sims' Python-side literal norms so tie-breaks are
bit-identical), fused by the unit-tested rrf_fuse.

PARITY CONTRACT (tests/test_streaming_hybrid.py, across a checkpoint
restart): once the corpus has landed, hybrid_index_search with the
codebook trained on that corpus equals hybrid_search_rrf_ivf over the
same (documents, embeddings) tables EXACTLY — same fused ranks, same
rrf scores, same in_lex/in_dense flags. Unconditional (no cap caveat:
neither BM25 nor the IVF probe caps candidates).

100 TB/day shape: per-batch cost is one tokenize pass + one narrow
vector-assignment map (centroids enter the plan as literals — no
broadcast join, no shuffle beyond the postings groupBy); serving cost
tracks the query's own posting lists + its nprobe/k share of the
vector store (cid directory pruning), both measured flat/sublinear by
SCALE_PROBE_INDEX.json and the IVF probe family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.curation import (
    _BM25_EVERY,
    _BM25_MAX_QUERIES,
    _RRF_TOPK,
    rrf_fuse,
)
from ..operators.similarity import (
    IVF_NPROBE,
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
from .retrieval_index import (
    _land_text,
    bm25_index_search,
    compact_index_store,
)

HYBRID_DROP_SCHEMA = (
    "doc_id bigint, text string, embedding array<double>, "
    "ingest_ts timestamp"
)


def _ranked_probe_cids(model, csims_col):
    """The query's nprobe nearest centroids — _ivf_index's probe
    expressions verbatim (array_sort on (-csim, cid) structs, so
    tie-breaks match the batch op exactly)."""
    return F.slice(
        F.array_sort(
            F.zip_with(
                csims_col,
                F.array(*[F.lit(int(cid)) for cid, _ in model]),
                lambda s, c: F.struct((-s).alias("negsim"), c.alias("cid")),
            )
        ),
        1,
        IVF_NPROBE,
    )


def compact_hybrid_vector_store(
    spark: SparkSession,
    store_dir: str,
    upto: int,
    checkpoint_dir: str | None = None,
) -> int:
    """Fold vector-store batches [0, upto) into ONE directory,
    preserving the cid layout (the shared _compact_batch_store rails —
    also the RETRAIN path: re-partitioning under a new codebook is this
    fold with reassignment applied first)."""
    return _compact_batch_store(
        spark,
        store_dir,
        upto,
        cols=["doc_id", "emb", "cid"],
        partition_cols=["cid"],
        what="hybrid vector store dir",
        checkpoint_dir=checkpoint_dir,
    )


def hybrid_index_stream(
    spark: SparkSession,
    drop_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    codebook: list[tuple[int, list[float]]],
    max_files_per_trigger: int = 1000,
    compact_every: int | None = 64,
):
    """Run the hybrid index-maintenance stream over all available drops
    (availableNow) and block until done. `codebook` is the fixed coarse
    quantizer ((cid, centroid) pairs — similarity._centroid_model's
    shape), held as driver model state and entering each batch's
    assignment as literals. `compact_every=N` folds BOTH stores every N
    committed batches from inside the runner (on by default, the
    sibling stores' policy)."""
    vectors_dir = f"{state_dir}/vectors"
    vecseeds_dir = f"{state_dir}/vecseeds"

    raw = (
        spark.readStream.schema(HYBRID_DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )

    def stage(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_index_store(
                spark, f"{state_dir}/postings", upto=batch_id,
                checkpoint_dir=checkpoint_dir,
            )
            compact_hybrid_vector_store(
                spark, vectors_dir, upto=batch_id,
                checkpoint_dir=checkpoint_dir,
            )
        batch = batch.persist()
        try:
            _land_text(batch, batch_id, state_dir)
            vecs = (
                batch.filter(F.col("embedding").isNotNull())
                .select("doc_id", F.col("embedding").alias("emb"))
                .select("doc_id", "emb", norm(F.col("emb")).alias("nrm"))
                .select(
                    "doc_id",
                    "emb",
                    _centroid_sims(
                        codebook, F.col("emb"), F.col("nrm")
                    ).alias("csims"),
                )
                .select(
                    "doc_id",
                    "emb",
                    _assign_cid(codebook, F.col("csims")).alias("cid"),
                )
            )
            (
                vecs.write.mode("overwrite")
                .partitionBy("cid")
                .parquet(f"{vectors_dir}/batch_id={batch_id}")
            )
            # bounded dense seed sidecar: the seed docs' query vectors
            (
                batch.filter(
                    (F.col("doc_id") % _BM25_EVERY == 0)
                    & (F.col("doc_id") < _BM25_EVERY * _BM25_MAX_QUERIES)
                    & F.col("embedding").isNotNull()
                )
                .select(
                    F.col("doc_id").alias("query_id"),
                    F.col("embedding").alias("qe"),
                )
                .write.mode("overwrite")
                .parquet(f"{vecseeds_dir}/batch_id={batch_id}")
            )
        finally:
            batch.unpersist()

    q = (
        raw.writeStream.queryName("hybrid_index_stream")
        .foreachBatch(stage)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _pruned_vectors(
    spark: SparkSession, vectors_dir: str, cids: list[int]
):
    """Landed vectors pruned to the probed cid partitions (bounded:
    <= min(|queries| * nprobe, k) cids — a static literal predicate)."""
    _assert_local_dir(vectors_dir, "hybrid vector store dir")
    if not os.path.isdir(vectors_dir):
        raise ValueError(
            f"no vector store at {vectors_dir!r}: nothing has landed "
            "yet (run hybrid_index_stream first)"
        )
    _assert_no_compact_leftover(vectors_dir)
    store = spark.read.option("basePath", vectors_dir).parquet(vectors_dir)
    return store.filter(F.col("cid").isin(sorted(set(cids))))


def hybrid_index_search(
    spark: SparkSession,
    state_dir: str,
    codebook: list[tuple[int, list[float]]],
    query_ids: list[int] | None = None,
) -> DataFrame:
    """Serve the landed horizon: hybrid_search_rrf_ivf's output schema
    (query_id, rank, doc_id, rrf_score, in_lex, in_dense) computed from
    the stores — bm25_index_search's lexical ranks fused with the
    list-pruned dense ranks by the same rrf_fuse."""
    lex = bm25_index_search(spark, state_dir, query_ids=query_ids).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )

    seeds = spark.read.option(
        "basePath", f"{state_dir}/vecseeds"
    ).parquet(f"{state_dir}/vecseeds")
    if query_ids is not None:
        seeds = seeds.filter(F.col("query_id").isin(list(query_ids)))
    probes = (
        seeds.select("query_id", "qe", norm(F.col("qe")).alias("nrm"))
        .select(
            "query_id",
            "qe",
            _centroid_sims(codebook, F.col("qe"), F.col("nrm")).alias(
                "csims"
            ),
        )
        .select(
            "query_id",
            "qe",
            F.explode(
                _ranked_probe_cids(codebook, F.col("csims"))
            ).alias("probe"),
        )
        .select("query_id", "qe", F.col("probe.cid").alias("cid"))
    )
    # bounded collect: <= |queries| * nprobe cid literals for the
    # directory-pruning predicate (the store-touch discipline)
    cids = [r["cid"] for r in probes.select("cid").distinct().collect()]
    cand = _pruned_vectors(spark, f"{state_dir}/vectors", cids).select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("emb").alias("ne"),
        "cid",
    )
    rescored = (
        cand.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qe"), F.col("ne")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    dense = (
        rescored.withColumn("dense_rank", F.row_number().over(w))
        .filter(F.col("dense_rank") <= _RRF_TOPK)
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            "dense_rank",
        )
    )
    return rrf_fuse(lex, dense)
