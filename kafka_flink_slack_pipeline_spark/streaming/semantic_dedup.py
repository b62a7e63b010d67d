"""Streaming face of semantic_dedup (SemDeDup, Abbas et al. 2023 — batch
semantics at operators/similarity.py:semantic_dedup): embedding vectors
arrive as JSONL drops; every micro-batch

    1. lands one DOCMETA row per arrival — (vec_id, ts, deleted) in the
       dp-partitioned version ledger (the retrieval-index rails,
       streaming/retrieval_index.py) — so UPDATES and DELETES are
       first-class: a re-ingested vec_id supersedes its older versions
       by ingest_ts, a deleted=true tombstone removes the vector from
       the REFERENCE SET for every later judgment and from the report;
    2. assigns each live arrival to its nearest coarse-quantizer
       centroid — a pure NARROW map against the O(k*d) driver-literal
       model (the batch op's `_centroid_sims`/`_assign_cid` expressions
       verbatim: no broadcast join, no shuffle, whole-stage codegen) —
       and lands the version-stamped assignment in a cid-PARTITIONED
       parquet vector store (batch_id-scoped overwrite — the
       idempotent-replay contract every store in this package uses);
    3. prunes arrivals against the LIVE history: a vector is DROPPED
       iff a lower-id LIVE vector in the same cluster has cosine >=
       threshold (the SemDeDup keep-first rule over the LWW-current
       corpus). The pair side reads ONLY the store's touched cid
       partitions (partition-pruned scan; the touched list is bounded
       by min(k, |batch|) literals) and masks superseded/tombstoned
       rows against the UNCOMPACTED TAIL of the ledger (bounded by
       compaction cadence — the retrieval-index tail-mask design), so
       per-batch pair work stays sum over touched clusters of
       |cluster| * |batch ∩ cluster| and history in untouched clusters
       is never re-read.

VERDICT SEMANTICS under update/delete: a verdict is decided AT
JUDGMENT TIME against the then-live corpus and is immutable once
written (the SemDeDup decision is consumed downstream at arrival); a
RE-INGESTED vector is re-judged (its new verdict supersedes the old
one in the report by LWW) and a TOMBSTONED vector's verdicts drop from
the report. Earlier vectors' verdicts are NOT retroactively recomputed
when a reference they were judged against later changes — the
eventual-by-construction contract a streaming deduper can honor; the
batch op over the LWW-current corpus is the ground truth for vectors
judged AFTER the change (pinned by the parity test's planted
unsuppression case). Ordering contract as in retrieval_index: per-key
nondecreasing distinct ingest_ts.

PARITY CONTRACT (tests/test_streaming_semantic.py, across a checkpoint
restart): with monotone append-only ingest the accumulated verdicts
equal batch `semantic_dedup` exactly; with updates/deletes, vectors
judged after the change equal `_semantic_verdicts_over` on the
LWW-current corpus (same keep flags, same n_dups, same best_sim).

Why a STORE and not keyed state (the minhash face holds per-bucket
state): the reference set here is every landed vector, 64 doubles each —
a table, not a state row; and SemDeDup's cluster sizes are corpus-scale
(k ~ sqrt(n) leaves sqrt(n)-sized cells), far past any per-key state
budget. Same decision the curation funnel's signature store documents.

The centroid MODEL is a fixed input (production trains it offline;
SemDeDup used precomputed k-means over LAION embeddings) — passed in as
the driver-literal list, never derived from the stream. Retraining is
retrain_semantic_store below (r12): the hybrid store's
fold-with-reassignment (retrain_hybrid_vector_store) PLUS a full
re-judgment, because here the verdicts are the served state — a
recluster that moved vectors between cells must re-decide keep flags,
or the report would pin cluster ids and suppressions from the old
geometry.

Store maintenance: compact_semantic_store folds vectors, verdicts, and
the ledger (superseded and tombstoned rows PHYSICALLY dropped;
tombstones retained in the ledger; stats snapshot as the fold-horizon
marker), invoked every `compact_every` batches by default.
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
from .retrieval_index import (
    _alive_of,
    _dp_col,
    _fold_horizon,
    _fold_ledger,
    _mask_visible,
    _tail_live,
)

VEC_DROP_SCHEMA = (
    "vec_id bigint, embedding array<double>, ingest_ts timestamp, "
    "deleted boolean"
)
_VEC_COLS = ["vec_id", "emb", "ts", "cid"]
_VERDICT_COLS = ["vec_id", "cid", "keep", "n_dups", "best_sim", "ts"]


def _assigned_of(
    vecs: DataFrame, model: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, emb, ts) -> + cid under the given codebook — the batch
    op's exact assignment expressions (projected norm, literal-side
    centroid norms, argmax with lowest-cid ties), version stamp carried.
    Shared by the stream's landing stage and the retrain's
    reassignment fold."""
    return (
        vecs.select("vec_id", "emb", "ts", norm(F.col("emb")).alias("nrm"))
        .select(
            "vec_id",
            "emb",
            "ts",
            _centroid_sims(model, F.col("emb"), F.col("nrm")).alias("csims"),
        )
        .select(
            "vec_id",
            _assign_cid(model, F.col("csims")).alias("cid"),
            "emb",
            "ts",
        )
    )


def _verdict_rows(
    hist: DataFrame, arrivals: DataFrame, threshold: float
) -> DataFrame:
    """Keep-first verdicts for `arrivals` judged against `hist` (both
    (vec_id, emb, cid[, ts]) frames): lower-id same-cluster pairs at
    cosine >= threshold — _semantic_verdicts_over's pair/stats
    expressions verbatim (operators/similarity.py). ONE kernel, three
    faces: the stream stage (hist = masked store ∪ batch, arrivals =
    batch), the retrain's re-judgment (hist = arrivals = the folded
    store), and the ad-hoc probe (hist = masked store, arrivals =
    offset-id probes)."""
    pairs = (
        hist.alias("a")
        .join(
            arrivals.alias("b"),
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("sim", cosine(F.col("a.emb"), F.col("b.emb")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("b.vec_id").alias("vec_id"), "sim")
    )
    stats = pairs.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dups"), F.max("sim").alias("best_sim")
    )
    return arrivals.join(stats, "vec_id", "left").select(
        "vec_id",
        "cid",
        F.col("n_dups").isNull().alias("keep"),
        F.coalesce("n_dups", F.lit(0).cast("long")).alias("n_dups"),
        F.round("best_sim", 6).alias("best_sim"),
        *(["ts"] if "ts" in arrivals.columns else []),
    )


def retrain_semantic_store(
    spark: SparkSession,
    state_dir: str,
    model: list[tuple[int, list[float]]],
    threshold: float = NEARDUP_THRESHOLD,
    checkpoint_dir: str | None = None,
) -> int:
    """Recluster the ENTIRE landed semantic store under a NEW centroid
    model — the production SemDeDup recluster (a drifted corpus gets a
    fresh offline codebook and the dedup decisions are re-taken under
    it). Mirrors retrain_hybrid_vector_store's fold-with-reassignment
    (streaming/hybrid_index.py) with one semantic-specific extra: the
    VERDICTS are the served state here (the hybrid store recomputes its
    serving from vectors; this store's report serves stored verdicts),
    so the recluster must RE-JUDGE — stale verdicts would pin cluster
    ids and keep flags from the old geometry. The pre-retrain verdicts'
    immutability contract is explicitly revoked by a retrain; that
    re-decision is the point of a recluster.

    Three crash-staged rewrites, in a fixed repairable order:
      1. vectors fold over the FULL horizon with cid reassigned under
         the new model (_assigned_of — the batch expressions verbatim)
         and the global LWW mask applied (superseded/tombstoned
         versions physically dropped; a partial retrain would leave two
         layouts and mis-prune, so the horizon is computed, not passed);
      2. verdicts REPLACED by a fresh batch judgment of the folded live
         vectors under the new model (_verdict_rows — after this the
         report equals _semantic_verdicts_over on the LWW-current
         corpus under the new model by construction);
      3. ledger fold (winners, tombstones retained, snapshot marker).
    A crash between 1 and 2 leaves old verdicts beside new vectors;
    RE-RUNNING the retrain with the same model repairs it (step 1 is an
    idempotent force rewrite, step 2 re-judges). The rails' committed-
    horizon guard (pass checkpoint_dir) enforces that the maintenance
    stream is stopped; resume it with the new model afterwards (inserts
    must assign against the layout they land into). Returns directories
    removed."""
    from .retrieval_index import _read_store

    vectors_dir = f"{state_dir}/vectors"
    verdicts_dir = f"{state_dir}/verdicts"
    _read_store(spark, vectors_dir, "vector store dir")  # guards
    # full horizon: every landed batch must move to the new layout, and
    # the verdicts horizon rides along (written by the same stage)
    upto = 0
    for d in (vectors_dir, verdicts_dir):
        if not os.path.isdir(d):
            continue
        ids = [
            int(e.split("=", 1)[1])
            for e in os.listdir(d)
            if e.startswith("batch_id=") and e.split("=", 1)[1].isdigit()
        ]
        upto = max(upto, max(ids) + 1 if ids else 0)
    alive = _alive_of(spark, state_dir, upto).select(
        F.col("doc_id").alias("vec_id"), "ts"
    )
    removed = _compact_batch_store(
        spark,
        vectors_dir,
        upto,
        cols=_VEC_COLS,
        partition_cols=["cid"],
        what="vector store dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: _assigned_of(
            df.join(alive, ["vec_id", "ts"]).select("vec_id", "emb", "ts"),
            model,
        ),
        force=True,
    )
    # step 2 reads the FOLDED vectors back (one directory, new layout)
    # so the re-judgment sees exactly what later pruned scans will see
    folded = (
        spark.read.option("basePath", vectors_dir)
        .parquet(vectors_dir)
        .select(*_VEC_COLS)
    )
    fresh = _verdict_rows(folded, folded, threshold)
    removed += _compact_batch_store(
        spark,
        verdicts_dir,
        upto,
        cols=_VERDICT_COLS,
        partition_cols=[],
        what="verdict store dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda _old: fresh,  # re-judged, not folded
        force=True,
    )
    removed += _fold_ledger(
        spark, state_dir, upto, checkpoint_dir=checkpoint_dir
    )
    return removed


def compact_semantic_store(
    spark: SparkSession,
    state_dir: str,
    upto: int,
    checkpoint_dir: str | None = None,
) -> int:
    """Fold batches [0, upto) of all three semantic stores through the
    shared crash-staged rails: the docmeta ledger (LWW winners,
    tombstones retained, stats snapshot as fold-horizon marker), the
    cid-partitioned vector store, and the verdicts sidecar — the latter
    two masked to LIVE winner versions, so superseded vectors stop
    being dedup references and tombstoned vectors' verdicts leave the
    report PHYSICALLY, not just logically. Shares compact_sig_store's
    safety rails: id-horizon and committed-horizon validation,
    underscore-prefixed staging that every reader refuses loudly after
    a crash. Returns directories removed."""
    dm_dir = f"{state_dir}/docmeta"
    if not os.path.isdir(dm_dir):
        return 0  # nothing landed yet — nothing to fold
    alive = _alive_of(spark, state_dir, upto).select(
        F.col("doc_id").alias("vec_id"), "ts"
    )
    removed = _compact_batch_store(
        spark,
        f"{state_dir}/vectors",
        upto,
        cols=_VEC_COLS,
        partition_cols=["cid"],
        what="vector store dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: df.join(alive, ["vec_id", "ts"]),
        force=True,
    )
    removed += _compact_batch_store(
        spark,
        f"{state_dir}/verdicts",
        upto,
        cols=_VERDICT_COLS,
        partition_cols=[],
        what="verdict store dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: df.join(alive, ["vec_id", "ts"]),
        force=True,
    )
    removed += _fold_ledger(
        spark, state_dir, upto, checkpoint_dir=checkpoint_dir
    )
    return removed


def _pruned_vec_store(
    spark: SparkSession, store_dir: str, before: int, touched: list[int]
):
    """Landed (vec_id, emb, ts, cid) rows from batches < `before`, scan-
    pruned to the touched cid partitions; None when no store exists yet.
    `touched` is bounded by the codebook size, so the isin predicate is
    a static partition-pruning literal list. Rows are version-stamped;
    callers mask visibility against the ledger tail."""
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
        .select(*_VEC_COLS)
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
    Drops may carry deleted=true tombstones and re-ingested versions of
    earlier vec_ids (LWW by ingest_ts; see the module contract).

    `compact_every=N` folds all three stores every N committed batches
    from inside the runner (at the start of batch k where k % N == 0,
    upto=k — everything below k is committed by then, enforced from the
    commits/ log), the curation funnel's auto-compaction policy. ON BY
    DEFAULT (64; pass None to disable and manage compaction
    externally)."""
    store_dir = f"{state_dir}/vectors"
    verdicts_dir = f"{state_dir}/verdicts"

    raw = (
        spark.readStream.schema(VEC_DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )

    def stage(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_semantic_store(
                spark, state_dir, upto=batch_id,
                checkpoint_dir=checkpoint_dir,
            )
        deleted = F.coalesce(F.col("deleted"), F.lit(False))
        # ledger FIRST: this batch's own tombstones/updates must mask
        # the reference set its arrivals are judged against
        (
            batch.select(
                F.col("vec_id").alias("doc_id"),
                F.col("ingest_ts").alias("ts"),
                deleted.alias("deleted"),
                F.lit(None).cast("long").alias("dl"),
            )
            .withColumn("dp", _dp_col())
            .repartition("dp")
            .write.mode("overwrite")
            .partitionBy("dp")
            .parquet(f"{state_dir}/docmeta/batch_id={batch_id}")
        )
        assigned = _assigned_of(
            batch.filter(~deleted).select(
                "vec_id",
                F.col("embedding").alias("emb"),
                F.col("ingest_ts").alias("ts"),
            ),
            model,
        ).persist()
        try:
            assigned.select(*_VEC_COLS).write.mode(
                "overwrite"
            ).partitionBy("cid").parquet(
                f"{store_dir}/batch_id={batch_id}"
            )
            touched = [
                r["cid"]
                for r in assigned.select("cid").distinct().collect()
            ]  # bounded by the codebook size
            store = _pruned_vec_store(spark, store_dir, batch_id, touched)
            if store is not None:
                # live history only: mask superseded/tombstoned versions
                # against the ledger tail (bounded; includes THIS batch's
                # just-landed tombstones)
                tail = _tail_live(
                    spark, state_dir, _fold_horizon(state_dir)
                )
                store = _mask_visible(store, tail, key="vec_id")
            hist = (
                assigned.select("vec_id", "emb", "cid")
                if store is None
                else store.select("vec_id", "emb", "cid").unionByName(
                    assigned.select("vec_id", "emb", "cid")
                )
            )
            (
                _verdict_rows(hist, assigned, threshold)
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


def semantic_dedup_probe_adhoc(
    spark: SparkSession,
    state_dir: str,
    model: list[tuple[int, list[float]]],
    probes: dict[int, list[float]],
    threshold: float = NEARDUP_THRESHOLD,
) -> DataFrame:
    """Judge AD-HOC vectors against the landed LWW-current reference
    set WITHOUT ingesting — the request path a deployment exposes ("is
    this vector a dup of anything landed?"; until now only ingestion
    triggered judgment). `probes` maps probe_id -> vector. Each probe
    is assigned under the store's codebook (`model` must be the one the
    store is laid out under), the store scan prunes to the probes' own
    cid partitions (bounded literal list), history is masked against
    the ledger tail (a tombstoned or superseded vector has stopped
    being a reference), and the verdict kernel is the stream's own
    _verdict_rows, shared VERBATIM. Every live landed vector plays the
    reference (lower-id) role regardless of the probe's id: probe ids
    are offset above the landed horizon internally (one bounded max()
    over the pruned masked slice — only same-cluster vectors can ever
    qualify, so the slice suffices) and mapped back on output. Nothing
    is written: probing twice, or probing then ingesting, cannot
    double-judge. Output: (probe_id, cid, keep, n_dups, best_sim) in
    probe_id order; keep=false means "a dup of something landed".
    Reference anchor: the serving path re-reads CURRENT state per
    lookup (Slack Event Server/slackEventServer.js:187-202)."""
    if not probes:
        raise ValueError("no probe vectors given")
    ids = sorted(int(p) for p in probes)
    pdf = spark.createDataFrame(
        [(pid, [float(x) for x in probes[pid]]) for pid in ids],
        "probe_id bigint, emb array<double>",
    )
    assigned = _assigned_of(
        pdf.select(
            F.col("probe_id").alias("vec_id"),
            "emb",
            F.lit(None).cast("timestamp").alias("ts"),
        ),
        model,
    )
    # bounded collect: <= min(|probes|, k) touched cid literals
    touched = [r["cid"] for r in assigned.select("cid").distinct().collect()]
    store = _pruned_vec_store(
        spark, f"{state_dir}/vectors", 1 << 62, touched
    )
    if store is None:
        raise ValueError(
            f"no vector store under {state_dir!r}: nothing has landed "
            "yet (run semantic_dedup_stream first)"
        )
    tail = _tail_live(spark, state_dir, _fold_horizon(state_dir))
    hist = _mask_visible(store, tail, key="vec_id").select(
        "vec_id", "emb", "cid"
    )
    mx = hist.agg(
        F.coalesce(F.max("vec_id"), F.lit(0)).alias("mx")
    ).collect()[0]["mx"]
    idmap = spark.createDataFrame(
        [(int(mx) + 1 + i, pid) for i, pid in enumerate(ids)],
        "vec_id bigint, probe_id bigint",
    )
    arrivals = (
        assigned.withColumnRenamed("vec_id", "probe_id")
        .join(F.broadcast(idmap), "probe_id")
        .select("vec_id", "emb", "cid")
    )
    return (
        _verdict_rows(hist, arrivals, threshold)
        .join(F.broadcast(idmap), "vec_id")
        .select("probe_id", "cid", "keep", "n_dups", "best_sim")
        .orderBy("probe_id")
    )


def semantic_dedup_stream_report(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Accumulated per-vector verdicts over the LWW-CURRENT corpus —
    the same (vec_id, cid, keep, n_dups, best_sim) rows as the batch
    semantic_dedup (the parity test compares them directly). Verdicts
    of superseded versions and tombstoned vectors are masked against
    the ledger tail here and physically dropped at compaction."""
    v = (
        spark.read.option("basePath", f"{state_dir}/verdicts")
        .parquet(f"{state_dir}/verdicts")
        .select(*_VERDICT_COLS)
    )
    tail = _tail_live(spark, state_dir, _fold_horizon(state_dir))
    return (
        _mask_visible(v, tail, key="vec_id")
        .select("vec_id", "cid", "keep", "n_dups", "best_sim")
        .orderBy("vec_id")
    )
