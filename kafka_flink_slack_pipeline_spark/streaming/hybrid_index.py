"""Incrementally-maintained HYBRID retrieval index: the streaming face
of hybrid_search_rrf_ivf (operators/curation.py) — the full RAG
serving path (lexical BM25 ∪ list-pruned dense ANN, RRF-fused) served
from stores that a single checkpointed stream maintains as documents
arrive.

Every micro-batch of (doc_id, text, embedding, ingest_ts[, deleted])
drops lands BOTH index faces:

    lexical — the bm25_index_stream state verbatim (shared _land_text:
      tp-partitioned version-stamped postings + the dp-partitioned
      docmeta version ledger + the bounded seed-query sidecar);
    dense — each live arrival's vector is assigned to its nearest
      coarse centroid under a FIXED codebook (the production IVF
      discipline: the coarse quantizer is trained offline and vectors
      are assigned at insert time) and landed version-stamped in a
      store partitioned by cid, plus a bounded dense seed sidecar (the
      seed docs' query vectors, version-stamped).

UPDATE/DELETE: the retrieval_index LWW-by-ingest_ts + tombstone
semantics apply to both faces — a re-ingested doc's new embedding may
land in a DIFFERENT cid than its old version; the old vector is masked
at serve time (the bounded tail mask, shared _mask_visible) and
physically dropped at compaction. Same ordering contract (per-doc
nondecreasing distinct ingest_ts; compaction repairs violations).

CODEBOOK RETRAIN: retrain_hybrid_vector_store re-partitions the ENTIRE
landed vector store under a new codebook — the fold-with-reassignment:
every surviving (LWW-masked) vector's cid is recomputed with the new
centroids and the store is rewritten in the new cid layout through the
shared crash-staged rails. Resume the stream with the new codebook
afterwards (inserts must assign against the layout they land into);
the rails' committed-horizon guard enforces that the stream is
stopped. This is how a drifted corpus migrates without losing the
incremental store.

hybrid_index_search then serves the landed horizon:
bm25_index_search's lexical ranks, the IVF dense ranks (probes = the
query's nprobe nearest centroids from the same fixed codebook,
candidates read ONLY from the probed cid partitions, exact cosine
re-rank inside them — the _ivf_topk expressions verbatim, including
_centroid_sims' Python-side literal norms so tie-breaks are
bit-identical), fused by the unit-tested rrf_fuse.

PARITY CONTRACT (tests/test_streaming_hybrid.py, across a checkpoint
restart, pre- and post-compaction, and across a retrain): once the
corpus has landed, hybrid_index_search under codebook C equals
hybrid_search_rrf_ivf(model=C) over the LWW-current (documents,
embeddings) tables EXACTLY — same fused ranks, same rrf scores, same
in_lex/in_dense flags. Unconditional (no cap caveat: neither BM25 nor
the IVF probe caps candidates), given idempotent replay and the
ordering contract.

100 TB/day shape: per-batch cost is one tokenize pass + one narrow
vector-assignment map (centroids enter the plan as literals — no
broadcast join, no shuffle beyond the postings groupBy); serving cost
tracks the query's own posting lists + its nprobe/k share of the
vector store (cid directory pruning) + one broadcast-sized tail mask,
measured flat/sublinear by SCALE_PROBE_INDEX.json /
SCALE_PROBE_HYBRID.json and the IVF probe family.
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
from .curation_funnel import _compact_batch_store
from .retrieval_index import (
    _alive_of,
    _fold_horizon,
    _land_text,
    _mask_visible,
    _read_store,
    _tail_live,
    bm25_index_search,
    compact_retrieval_store,
)

HYBRID_DROP_SCHEMA = (
    "doc_id bigint, text string, embedding array<double>, "
    "ingest_ts timestamp, deleted boolean"
)
_VECTOR_COLS = ["doc_id", "emb", "ts", "cid"]
_VECSEED_COLS = ["query_id", "qe", "ts"]


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


def _assigned(vecs: DataFrame, codebook) -> DataFrame:
    """(doc_id, emb, ts) -> + cid under the given codebook — the batch
    op's exact assignment expressions (projected norm, literal-side
    centroid norms, argmax with lowest-cid ties)."""
    return (
        vecs.select("doc_id", "emb", "ts", norm(F.col("emb")).alias("nrm"))
        .select(
            "doc_id",
            "emb",
            "ts",
            _centroid_sims(codebook, F.col("emb"), F.col("nrm")).alias(
                "csims"
            ),
        )
        .select(
            "doc_id",
            "emb",
            "ts",
            _assign_cid(codebook, F.col("csims")).alias("cid"),
        )
    )


def compact_hybrid_store(
    spark: SparkSession,
    state_dir: str,
    upto: int,
    checkpoint_dir: str | None = None,
) -> int:
    """Fold batches [0, upto) of ALL SIX hybrid stores: the four
    text-face stores (compact_retrieval_store: postings, seeds,
    docmeta, stats snapshot) plus the cid-partitioned vector store and
    the dense seed sidecar — each through the shared crash-staged
    rails, with superseded-version and tombstoned-doc rows physically
    dropped (the LWW mask). Returns directories removed."""
    removed = compact_retrieval_store(
        spark, state_dir, upto, checkpoint_dir=checkpoint_dir
    )
    alive = _alive_of(spark, state_dir, upto)
    removed += _compact_batch_store(
        spark,
        f"{state_dir}/vectors",
        upto,
        cols=_VECTOR_COLS,
        partition_cols=["cid"],
        what="hybrid vector store dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: df.join(alive, ["doc_id", "ts"]),
        force=True,
    )
    removed += _compact_batch_store(
        spark,
        f"{state_dir}/vecseeds",
        upto,
        cols=_VECSEED_COLS,
        partition_cols=[],
        what="dense seed sidecar dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: df.join(
            alive.select(F.col("doc_id").alias("query_id"), "ts"),
            ["query_id", "ts"],
        ),
        force=True,
    )
    return removed


def retrain_hybrid_vector_store(
    spark: SparkSession,
    state_dir: str,
    codebook: list[tuple[int, list[float]]],
    checkpoint_dir: str | None = None,
) -> int:
    """Re-partition the ENTIRE landed vector store under a NEW coarse
    codebook: one crash-staged rewrite in which every LWW-surviving
    vector's cid is recomputed with the new centroids (the batch
    assignment expressions verbatim) and the store lands in the new
    cid layout. Covers the full store horizon by construction — a
    partial retrain would leave two layouts and mis-prune — and the
    rails' committed-horizon guard (pass checkpoint_dir) enforces that
    the maintenance stream is stopped. Serve and resume with the new
    codebook afterwards. Returns directories removed (>= 0; the
    single-directory case still rewrites — force=True — because the
    content changes)."""
    vectors_dir = f"{state_dir}/vectors"
    _read_store(spark, vectors_dir, "hybrid vector store dir")  # guards
    # full horizon: every landed batch must move to the new layout
    ids = [
        int(e.split("=", 1)[1])
        for e in os.listdir(vectors_dir)
        if e.startswith("batch_id=") and e.split("=", 1)[1].isdigit()
    ]
    upto = max(ids) + 1
    alive = _alive_of(spark, state_dir, upto)
    return _compact_batch_store(
        spark,
        vectors_dir,
        upto,
        cols=_VECTOR_COLS,
        partition_cols=["cid"],
        what="hybrid vector store dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: _assigned(
            df.join(alive, ["doc_id", "ts"]).select("doc_id", "emb", "ts"),
            codebook,
        ),
        force=True,
    )


def _land_hybrid(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    codebook: list[tuple[int, list[float]]],
) -> None:
    """Land one micro-batch's BOTH index faces: the shared lexical
    state (_land_text) plus the cid-assigned version-stamped vectors
    and the bounded dense seed sidecar. Shared VERBATIM by the
    checkpointed stream and the registered serving certificate
    (hybrid_index_served_lww) — stream/certificate parity by
    construction."""
    _land_text(batch, batch_id, state_dir)
    live = batch.filter(~F.coalesce(F.col("deleted"), F.lit(False)))
    vecs = _assigned(
        live.filter(F.col("embedding").isNotNull()).select(
            "doc_id",
            F.col("embedding").alias("emb"),
            F.col("ingest_ts").alias("ts"),
        ),
        codebook,
    )
    (
        vecs.write.mode("overwrite")
        .partitionBy("cid")
        .parquet(f"{state_dir}/vectors/batch_id={batch_id}")
    )
    # bounded dense seed sidecar: the seed docs' query vectors
    (
        live.filter(
            (F.col("doc_id") % _BM25_EVERY == 0)
            & (F.col("doc_id") < _BM25_EVERY * _BM25_MAX_QUERIES)
            & F.col("embedding").isNotNull()
        )
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("ingest_ts").alias("ts"),
        )
        .write.mode("overwrite")
        .parquet(f"{state_dir}/vecseeds/batch_id={batch_id}")
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
    assignment as literals. `compact_every=N` folds ALL SIX stores
    every N committed batches from inside the runner (on by default,
    the sibling stores' policy). Drops may carry deleted=true
    tombstones and re-ingested versions (LWW by ingest_ts)."""
    raw = (
        spark.readStream.schema(HYBRID_DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )

    def stage(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_hybrid_store(
                spark, state_dir, upto=batch_id,
                checkpoint_dir=checkpoint_dir,
            )
        batch = batch.persist()
        try:
            _land_hybrid(batch, batch_id, state_dir, codebook)
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
    <= min(|queries| * nprobe, k) cids — a static literal predicate).
    Rows are version-stamped; callers mask visibility."""
    store = _read_store(spark, vectors_dir, "hybrid vector store dir")
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
    list-pruned dense ranks by the same rrf_fuse, both faces under the
    update/delete tail mask."""
    lex = bm25_index_search(spark, state_dir, query_ids=query_ids).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    fold_id = _fold_horizon(state_dir)
    tail = _tail_live(spark, state_dir, fold_id)

    seeds = _read_store(
        spark, f"{state_dir}/vecseeds", "dense seed sidecar dir"
    )
    if query_ids is not None:
        seeds = seeds.filter(F.col("query_id").isin(list(query_ids)))
    seeds = _mask_visible(seeds, tail, key="query_id")
    return _fused_over(spark, state_dir, codebook, lex, seeds, tail)


def hybrid_index_search_adhoc(
    spark: SparkSession,
    state_dir: str,
    codebook: list[tuple[int, list[float]]],
    queries: dict[int, tuple[str, list[float]]],
) -> DataFrame:
    """Serve AD-HOC hybrid queries — query_id -> (query text, query
    vector) — against the landed stores: the request path a RAG
    deployment exposes (the stored seed workload exists for the
    registered oracle). The lexical side tokenizes the text with the
    corpus rule (bm25_index_search_adhoc); the dense side probes the
    given vector's nprobe nearest centroids under the store's codebook;
    both under the same update/delete tail mask; fused by the same
    rrf_fuse. A query may carry text only (vector None — lexical-only)
    or vector only (empty text is NOT allowed on the lexical side, so
    pass text='' to skip it)."""
    from .retrieval_index import bm25_index_search_adhoc

    texts = {
        qid: t for qid, (t, _) in queries.items() if t and t.strip()
    }
    if texts:
        lex = bm25_index_search_adhoc(spark, state_dir, texts).select(
            "query_id", "doc_id", F.col("rank").alias("lex_rank")
        )
    else:
        lex = spark.createDataFrame(
            [], "query_id bigint, doc_id bigint, lex_rank int"
        )
    vec_rows = [
        (int(qid), [float(x) for x in v])
        for qid, (_, v) in queries.items()
        if v is not None
    ]
    fold_id = _fold_horizon(state_dir)
    tail = _tail_live(spark, state_dir, fold_id)
    seeds = spark.createDataFrame(
        vec_rows, "query_id bigint, qe array<double>"
    )
    return _fused_over(spark, state_dir, codebook, lex, seeds, tail)


def _fused_over(
    spark: SparkSession, state_dir, codebook, lex, seeds, tail
) -> DataFrame:
    """The shared dense-probe + fusion stage: nprobe nearest centroids
    per query vector, candidates read only from the probed cid
    partitions, tail-masked, exact cosine re-rank, rrf_fuse with the
    given lexical ranks."""
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
    cand = _mask_visible(
        _pruned_vectors(spark, f"{state_dir}/vectors", cids), tail
    ).select(
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
