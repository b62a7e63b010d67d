"""Composed streaming curation funnel — ONE checkpointed pipeline running
the full batch `corpus_curation_funnel` stage chain on an ingest stream:

    JSONL drops -> quality gate (Gopher/C4-style signal battery)
                -> exact dedup ON ARRIVAL (engine state,
                   dropDuplicatesWithinWatermark)
                -> near-dup drop vs the landed corpus (minhash-LSH
                   against an idempotent signature store)
                -> fuzzy benchmark decontamination (static bench frames)
                -> lang-partitioned landing + per-stage survivor counts

Every face existed individually (quality_gate_stream, dedup/crossdup
streams, land_documents_stream); this module is the composition a real
ingest deployment runs, with a stream/batch PARITY CONTRACT: on the same
drop (ingest order following doc_id order — the usual monotone ingest
sequence), the accumulated per-stage survivor counts equal the batch
funnel's rows exactly (tests/test_streaming_funnel.py pins all 5 stages,
docs and tokens, across a checkpoint restart).

Design decisions, in dependency order:

- The quality signals are the IDENTICAL expressions as the batch funnel
  (operators/textops.py quality_signals_of) — a pure narrow projection,
  so they stream unchanged; stage-0/1 counts are taken with
  `observe()` UPSTREAM of the stateful dedup (rows the dedup drops must
  still be counted as ingested) and surface through
  StreamingQueryProgress.observedMetrics, keyed by batchId — replay
  re-observes the same numbers, so the batch-scoped overwrite stays
  idempotent.

- Exact dedup is the ENGINE's keyed state (dropDuplicatesWithinWatermark
  on the md5 content hash, TTL-evicted — streaming/ingest_dedup.py
  semantics). The batch funnel dedups among QUALITY SURVIVORS only
  (canon counts qk docs), so quality-failing rows must pass through the
  dedup untouched — they get a per-doc unique key
  (`fail:<doc_id>`) instead of the content hash. They are NOT filtered
  out before foreachBatch because the near-dup reference set is ALL
  ingested documents (the batch funnel's ndv comes from full-corpus
  LSH — a survivor is dropped even when its near-twin failed quality).
  Cost: one state entry per failing doc inside the TTL horizon,
  documented and bounded by eviction.

- Exact-dup LOSERS never reach foreachBatch, so their signatures never
  enter the store — sound: a loser's text is byte-identical to its
  kept twin's, hence its minhash signature is identical too, and with
  kept = min doc_id every pair the loser could witness is implied by a
  pair the keeper witnesses (a < loser ⟹ a < keeper ∨ near(keeper, a)
  via the shared signature).

- Near-dup state lives in an idempotent batch-scoped PARQUET SIGNATURE
  STORE, not executor state: LSH banding needs each new doc joined
  against the whole landed horizon, and that reference set belongs in
  storage, not in a state store (the crossdup stream holds 16-byte
  fingerprints; 16x8-byte signatures x the corpus is a table). Batch N
  reads partitions batch_id < N only, so a replayed batch never sees
  its own failed attempt's output. Pair semantics mirror
  dedup_minhash_lsh exactly: band-key collision, doc_id order,
  round(est_jaccard, 4) >= 0.25. (The batch operator's bucket cap is a
  whole-corpus count; the stream omits it — no tested bucket comes near
  the cap, the operator's own pinned claim.)

- Decontamination is per-document (n-gram containment against STATIC
  bench frames — benchmarks are fixed inputs in production), so the
  per-batch application equals the batch application row for row
  (operators/curation.py fuzzy_contamination).

- All sinks are batch-id-scoped OVERWRITE directories (the
  ingest_land.py exactly-once-by-idempotent-replay contract): landed
  docs (lang-partitioned), the signature store, per-batch stage counts.

100 TB/day shape: quality + signatures are narrow maps; the engine
dedup shuffles 16-byte keys; the near-dup join is a banded equi-join of
the batch against a partition-pruned store scan (prunable further by
band-bucket layout at scale); decon broadcasts the bounded bench set;
all writes are append-shaped. No stage holds unbounded executor state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_K,
    _minhash_sig_bands,
    _minhash_sigs,
    _sig_agree,
    _word_shingles,
)
from ..operators.textops import (
    _FILTER_MAX_DUP_BIGRAM,
    _FILTER_MIN_QUALITY,
    quality_signals_of,
    tokens_col,
)

DROP_SCHEMA = "doc_id bigint, text string, lang string, ingest_ts timestamp"

_SIG_COLS = [f"h{i}" for i in range(MINHASH_K)]


def _read_sig_store(spark: SparkSession, sigs_dir: str, before: int):
    """Signatures landed by batches < `before` (None when none exist) —
    the replay guard: a re-run batch never joins against its own failed
    attempt's partition."""
    if not os.path.isdir(sigs_dir) or not any(
        e.startswith("batch_id=") for e in os.listdir(sigs_dir)
    ):
        return None
    store = spark.read.option("basePath", sigs_dir).parquet(sigs_dir)
    return store.filter(F.col("batch_id") < before).drop("batch_id")


def curation_funnel_stream(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    bench_sh: DataFrame,
    bench_sizes: DataFrame,
    ttl: str = "24 hours",
    max_files_per_trigger: int = 1000,
):
    """Run the composed funnel over all available drops (availableNow)
    and block until done; returns the finished StreamingQuery. Re-invoke
    with the same checkpoint_dir to resume — only new files process, and
    replayed batches overwrite their own prior output."""
    raw = (
        spark.readStream.schema(DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )
    sig = quality_signals_of(raw, keep=("text", "ingest_ts"))
    qk = (F.col("quality_score") >= _FILTER_MIN_QUALITY) & (
        F.col("dup_bigram_frac") <= _FILTER_MAX_DUP_BIGRAM
    )
    flagged = sig.select(
        "doc_id",
        "lang",
        "text",
        "ingest_ts",
        "n_tokens",
        qk.cast("int").alias("qk"),
        # quality failers bypass the dedup state via a per-doc unique key
        F.when(qk, F.col("h"))
        .otherwise(F.concat(F.lit("fail:"), F.col("doc_id").cast("string")))
        .alias("dedup_key"),
    )
    observed = flagged.observe(
        "funnel_ingest",
        F.count(F.lit(1)).alias("n_raw"),
        F.sum("qk").alias("n_quality"),
        F.sum("n_tokens").alias("tok_raw"),
        F.sum(F.col("qk") * F.col("n_tokens")).alias("tok_quality"),
    )
    deduped = observed.withWatermark("ingest_ts", ttl).dropDuplicatesWithinWatermark(
        ["dedup_key"]
    )

    sigs_dir = f"{state_dir}/sigs"
    counts_dir = f"{state_dir}/counts"
    ingest_dir = f"{state_dir}/ingest"

    def stage(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            # signature store gets ALL arriving docs (failers included —
            # they are valid near-dup witnesses in the batch semantics)
            shingled = batch.select(
                "doc_id",
                F.explode(_word_shingles(tokens_col(), 3)).alias("shingle"),
            ).filter(F.col("shingle") != "")
            sigs = _minhash_sigs(shingled).persist()
            sigs.write.mode("overwrite").parquet(
                f"{sigs_dir}/batch_id={batch_id}"
            )

            surv2 = batch.filter(F.col("qk") == 1).persist()

            # near-dup: banded pairs of (store ∪ this batch) vs this
            # batch's survivors, doc_id order, the batch op's estimator
            # AND its bucket cap (a bucket over MINHASH_BUCKET_CAP as of
            # this batch contributes no pairs — filtering the a-side
            # kills the whole bucket since both pair members share it)
            from pyspark.sql import Window

            from ..operators.dedup import MINHASH_BUCKET_CAP

            store = _read_sig_store(spark, sigs_dir, batch_id)
            all_sigs = sigs if store is None else store.unionByName(sigs)
            bands_a = _minhash_sig_bands(all_sigs)
            bands_a = bands_a.withColumn(
                "bsize",
                F.count(F.lit(1)).over(Window.partitionBy("band", "bkey")),
            ).filter(F.col("bsize") <= MINHASH_BUCKET_CAP)
            bands_b = _minhash_sig_bands(sigs).join(
                surv2.select("doc_id"), "doc_id", "semi"
            )
            est = F.round(
                _sig_agree(F.col("a.sig"), F.col("b.sig")) / F.lit(MINHASH_K),
                4,
            )
            flagged_nd = (
                bands_a.alias("a")
                .join(
                    bands_b.alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bkey") == F.col("b.bkey"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .filter(est >= 0.25)
                .select(F.col("b.doc_id").alias("doc_id"))
                .distinct()
            )
            surv3 = surv2.join(flagged_nd, "doc_id", "anti").persist()

            # decontamination: per-doc static-bench containment
            from ..operators.curation import fuzzy_contamination

            contam = (
                fuzzy_contamination(
                    surv3.select("doc_id", tokens_col().alias("toks")),
                    bench_sh,
                    bench_sizes,
                )
                .select("doc_id")
                .distinct()
            )
            surv4 = surv3.join(contam, "doc_id", "anti").persist()

            (
                surv4.select("doc_id", "text", "lang", "ingest_ts", "n_tokens")
                .write.mode("overwrite")
                .partitionBy("lang")
                .parquet(f"{out_dir}/batch_id={batch_id}")
            )

            def _dt(df):
                row = df.agg(
                    F.count(F.lit(1)).alias("d"),
                    F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
                ).collect()[0]
                return int(row.d), int(row.t)

            d2, t2 = _dt(surv2)
            d3, t3 = _dt(surv3)
            d4, t4 = _dt(surv4)
            spark.createDataFrame(
                [(d2, t2, d3, t3, d4, t4)],
                "d2 long, t2 long, d3 long, t3 long, d4 long, t4 long",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{counts_dir}/batch_id={batch_id}"
            )
            for df in (surv4, surv3, surv2, sigs):
                df.unpersist()
        finally:
            batch.unpersist()

    q = (
        deduped.writeStream.foreachBatch(stage)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # persist the observed pre-dedup counts, keyed by batchId — replay
    # re-observes identical numbers, so overwrite stays idempotent
    for p in q.recentProgress:
        om = (p.get("observedMetrics") or {}).get("funnel_ingest")
        if not om:
            continue
        spark.createDataFrame(
            [
                (
                    int(om["n_raw"]),
                    int(om["n_quality"] or 0),
                    int(om["tok_raw"] or 0),
                    int(om["tok_quality"] or 0),
                )
            ],
            "n_raw long, n_quality long, tok_raw long, tok_quality long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{ingest_dir}/batch_id={p['batchId']}"
        )
    return q


def curation_funnel_stream_report(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Accumulated per-stage funnel table over every processed batch —
    the same (stage_ord, stage, n_docs, n_tokens) rows as the batch
    corpus_curation_funnel (the parity test compares them directly).

    Consistency gate: stage-2/3/4 counts are written INSIDE foreachBatch
    (replay-safe — a crashed batch re-runs and overwrites), but the
    stage-0/1 observed metrics persist AFTER query termination, so a
    crash in that window loses them for already-committed batches. The
    report refuses to silently undercount: it raises when counts/ holds
    a batch_id that ingest/ lacks, naming the batches to re-reconcile."""
    ing = spark.read.option("basePath", f"{state_dir}/ingest").parquet(
        f"{state_dir}/ingest"
    )
    cnt = spark.read.option("basePath", f"{state_dir}/counts").parquet(
        f"{state_dir}/counts"
    )
    have = {r.batch_id for r in ing.select("batch_id").distinct().collect()}
    need = {r.batch_id for r in cnt.select("batch_id").distinct().collect()}
    missing = sorted(need - have)
    if missing:
        raise ValueError(
            "funnel ingest metrics missing for batches "
            f"{missing}: the run crashed between checkpoint commit and "
            "metrics persistence — stage-0/1 counts for those batches "
            "were only observable during that run. Re-land the affected "
            "drops or record the gap before trusting stage-0/1 totals."
        )
    i = ing.agg(
        F.sum("n_raw").alias("d0"),
        F.sum("tok_raw").alias("t0"),
        F.sum("n_quality").alias("d1"),
        F.sum("tok_quality").alias("t1"),
    )
    c = cnt.agg(
        *[F.sum(f"d{s}").alias(f"d{s}") for s in (2, 3, 4)],
        *[F.sum(f"t{s}").alias(f"t{s}") for s in (2, 3, 4)],
    )
    from ..operators.curation import _FUNNEL_STAGES

    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).cast("int").alias("stage_ord"),
                    F.lit(name).alias("stage"),
                    F.col(f"d{s}").cast("long").alias("n_docs"),
                    F.col(f"t{s}").cast("long").alias("n_tokens"),
                )
                for s, name in enumerate(_FUNNEL_STAGES)
            ]
        )
    )
    return (
        i.crossJoin(c).select(rows.alias("r")).select("r.*").orderBy("stage_ord")
    )
