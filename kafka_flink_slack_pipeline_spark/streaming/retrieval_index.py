"""Incremental retrieval-index maintenance: the streaming face of
bm25_keyword_search (operators/curation.py — reference analogue: the
consumer's continuous ingest loop, kafkaConsumer.js:74-90, feeding a
queryable history, slackEventServer.js:186-192).

A production search/RAG deployment does not re-tokenize its corpus per
query; it maintains a POSTINGS INDEX incrementally as documents arrive
and serves queries from it. Every micro-batch of (doc_id, text,
ingest_ts[, deleted]) drops:

    1. tokenizes live (non-tombstone) rows with the batch op's exact
       rule (tokens_col + ''-filter) and lands one posting row per
       (term, doc version) — (term, doc_id, tf, dl, ts) — in a parquet
       store partitioned by tp = xxhash64(term) mod _TERM_PREFIXES and
       SORTED BY term within partitions, so a bounded query workload
       prunes both at the directory level (tp literals) and at the
       row-group level (term IN (...) pushed to the parquet scan
       against the sorted column's min/max stats);
    2. lands one DOCMETA row per arrival — (doc_id, ts, deleted, dl) —
       partitioned by dp = xxhash64(doc_id) mod _DOC_PREFIXES: the
       version ledger that makes updates and deletes first-class (a
       real deployment re-crawls and deletes; the reference's serving
       analogue re-reads CURRENT Slack state per lookup precisely
       because messages get edited, slackEventServer.js:187-202);
    3. lands the batch's SEED QUERIES (the registered workload rule:
       doc_id % _BM25_EVERY == 0, capped at _BM25_MAX_QUERIES seeds;
       query terms = the seed doc's token slice) in a bounded sidecar,
       version-stamped with ts and carrying each term's tp so the
       search face never rehashes.

UPDATE/DELETE SEMANTICS (last-write-wins by ingest_ts + tombstones):
re-ingesting doc_id 42 with new text supersedes every older version —
its old postings stop matching, df/N/avgdl reflect only the new text —
and a deleted=true drop (a tombstone; text ignored) removes the doc
from results AND from the corpus statistics. Ingest stays append-only
(no read-before-write); the masking happens at the two places that can
afford it:

    serve time — visibility is decided against the UNCOMPACTED TAIL
      only (docmeta batches newer than the last fold): a posting/seed
      row is visible iff its doc has no tail version, or its ts equals
      the tail winner's ts and that winner is not a tombstone. The
      tail frame is bounded by compaction cadence (compact_every), so
      the mask join is broadcast-sized and serving stays FLAT in
      corpus size — the folded store needs no mask because compaction
      already applied one.
    compaction — compact_retrieval_store computes the global LWW
      winner per doc over the folded range, physically DROPS
      superseded postings/seeds and tombstoned docs' rows, folds
      docmeta to one row per doc (tombstones RETAINED — they must
      outlive the fold to suppress any not-yet-folded older version),
      and writes a per-dp STATS SNAPSHOT so corpus constants never
      need an O(corpus) pass at serve time.

ORDERING CONTRACT: versions of one doc must arrive in nondecreasing
ingest_ts order with DISTINCT ts per version (the CDC/Kafka shape —
a keyed topic preserves per-key order, kafkaProducer.js's fixed-key
sends land in one partition). The tail-only mask relies on it; an
out-of-order late version is repaired at the next compaction (global
LWW), never earlier. ingest_ts must be non-null.

CORPUS STATISTICS stay exact and bounded: N and avgdl derive from
integer (count, sum-of-dl) triplets — the last snapshot's totals,
minus the fold-live contribution of docs the tail touched (a dp-pruned
point lookup, bounded by the tail's dp spread), plus the tail winners'
contribution. dl values are integers, so double summation is
order-independent and avgdl reconstructs EXACTLY.

bm25_index_search then serves the landed horizon: corpus constants as
above, df/tf/dl from the pruned + tail-masked postings scan, and the
batch op's scoring expressions VERBATIM (one-IEEE-op rational idf,
decimal-accumulated term scores, round 6, (score DESC, doc_id) top-k)
— so the PARITY CONTRACT holds exactly: search-over-the-store equals
bm25_keyword_search over the LWW-current corpus (updated texts in,
tombstoned docs out), across a checkpoint restart, pre- and
post-compaction (tests/test_streaming_index.py). Unlike the dedup
stores there is no bucket-cap caveat — BM25 has no candidate cap — so
parity is unconditional given idempotent replay (batch_id-scoped
overwrite, the shared store contract) and the ordering contract above.

100 TB/day shape: the per-batch work is one tokenize pass + one
shuffle to (term, doc) groups; the store write appends only the
batch's own postings; a query's serving cost tracks ITS TERMS' posting
lists (directory + row-group pruning make the rest of the store
invisible) plus one broadcast-sized tail mask — which is the inherent
cost of BM25 — df grows with the corpus, the scan of unrelated terms
does not. MEASURED (tools/index_probe.py, SCALE_PROBE_INDEX.json):
serving time is FLAT across three decades of store growth with the
workload's own lists held fixed.

Store maintenance is the shared rails: compact_retrieval_store folds
committed batches of ALL FOUR text-face stores (postings, docmeta,
seeds, stats snapshot) into one directory each (layouts preserved;
id-horizon + commits-log validation; underscore-prefixed crash
staging), invoked every `compact_every` batches by default.
"""

from __future__ import annotations

import json
import os
import shutil

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
from ..tables import spread
from .curation_funnel import (
    _COMPACT_TMP_PREFIX,
    _assert_local_dir,
    _assert_no_compact_leftover,
    _compact_batch_store,
)

INDEX_DROP_SCHEMA = (
    "doc_id bigint, text string, ingest_ts timestamp, deleted boolean"
)
# Store-layout fan: tp/dp prefix-partition counts trade read-side
# pruning granularity against file count (one parquet file per prefix
# dir per landed batch — guide §6's small-files cost is paid per file
# PER SERVE). r14: 64/32 -> 16/8 measured -18% on the four *_served_lww
# bench rows (5.48 s -> 4.51 s within one window): at fixture scale the
# per-file open cost dominated the pruned scans (32 one-file tasks of
# ~65 ms fixed cost each). A production store whose per-prefix files
# reach the 128 MB-1 GB band should RAISE these via the envs — the
# pruning story is unchanged, only the fan width.
from ..tables import _env_width as _env_int  # noqa: E402 (defensive env parse)

_TERM_PREFIXES = _env_int("SPARK_GRAFT_TERM_PREFIXES") or 16
_DOC_PREFIXES = _env_int("SPARK_GRAFT_DOC_PREFIXES") or 8
# The prefix moduli are STORE state, not process config: tp/dp are
# recomputed at serve and compaction time, so a store landed under one
# modulus and read under another (env drift between ingest and serve
# processes, or an old store after a default change) silently prunes to
# the WRONG partitions — missing postings/docmeta rows, wrong scores,
# no error (ADVICE r14, medium). Landing therefore persists the moduli
# in a one-line manifest on first land, and every later land / serve /
# compaction asserts against it. Pre-manifest stores (no file) are
# trusted as-is — they were written by this process lineage.
_LAYOUT_FILE = "store_layout.json"


def _layout_now() -> dict:
    return {
        "term_prefixes": _TERM_PREFIXES,
        "doc_prefixes": _DOC_PREFIXES,
    }


def _land_layout(state_dir: str) -> None:
    """First land writes the manifest; later lands assert it."""
    path = os.path.join(state_dir, _LAYOUT_FILE)
    if os.path.exists(path):
        _assert_layout(state_dir)
        return
    os.makedirs(state_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(_layout_now(), f)


def _assert_layout(state_dir: str) -> None:
    """Fail loudly when the store's persisted prefix moduli disagree
    with this process's module/env values."""
    path = os.path.join(state_dir, _LAYOUT_FILE)
    if not os.path.exists(path):
        return
    with open(path) as f:
        got = json.load(f)
    want = _layout_now()
    if got != want:
        raise ValueError(
            f"store layout mismatch at {state_dir!r}: landed with "
            f"{got}, this process uses {want} — set "
            "SPARK_GRAFT_TERM_PREFIXES / SPARK_GRAFT_DOC_PREFIXES to "
            "the landed values (changing a store's fan requires a "
            "rewrite, not an env change)"
        )
# stats-correction point-lookup cap: tails up to this many touched docs
# resolve their fold-side lookups via a doc_id IN literal pushed into
# the doc_id-sorted folded docmeta (row-group skipping); larger tails
# fall back to the dp-pruned scan. Sized to keep the literal list and
# the driver round-trip trivial at streaming cadence.
#
# Measured-and-DECLINED retune (r13, SCALE_PROBE_COMPACTION's
# reproducible bm25 tail=16 bump): at a ~2.5k-doc tail over a 10k-doc
# fold, the dp-pruned fallback served in 5.11 s vs the IN-literal
# path's 6.30 s — thousand-element IN literals carry real driver-side
# planning cost, which is the bump the knob table shows. Lowering the
# cap would invert at the production target: the fallback's fold scan
# grows with the folded corpus (a 1B-doc fold's dp slice is millions
# of rows) while the literal's cost stays O(tail) regardless of fold
# size — the literal is the LSM point-lookup shape the flat serving
# exponent (SCALE_PROBE_INDEX) depends on. The bump is bounded by the
# cap and vanishes at the compaction cadences the stores default to.
_STATS_LOOKUP_CAP = 8192
_POSTING_COLS = ["term", "doc_id", "tf", "dl", "ts"]
_DOCMETA_COLS = ["doc_id", "ts", "deleted", "dl", "dp"]
_SEED_COLS = ["query_id", "term", "tp", "ts"]


def _tp_col(term_col="term"):
    return F.pmod(F.xxhash64(F.col(term_col)), F.lit(_TERM_PREFIXES))


def _dp_col(doc_col="doc_id"):
    return F.pmod(F.xxhash64(F.col(doc_col)), F.lit(_DOC_PREFIXES))


def _toked_of(batch: DataFrame) -> DataFrame:
    """The batch op's exact tokenization: trimmed whitespace split,
    empty tokens dropped BEFORE length stats."""
    return batch.select(
        "doc_id", F.filter(tokens_col(), lambda t: t != "").alias("toks")
    )


def _read_store(spark: SparkSession, store_dir: str, what: str):
    """Guarded store read: loud on remote URIs (os.path probes would
    misread them), loud when nothing has landed, loud on interrupted-
    compaction leftovers — the cdfe06a discipline, applied uniformly to
    every store and sidecar this module reads."""
    _assert_local_dir(store_dir, what)
    if not os.path.isdir(store_dir):
        raise ValueError(
            f"no {what} at {store_dir!r}: nothing has landed yet "
            "(run bm25_index_stream / hybrid_index_stream first)"
        )
    _assert_no_compact_leftover(store_dir)
    return spark.read.option("basePath", store_dir).parquet(store_dir)


def _lww(docmeta: DataFrame) -> DataFrame:
    """One winner row per doc under last-write-wins: max (ts, deleted,
    dl) struct — latest ts wins; an exact-ts tie (ordering-contract
    violation) resolves delete-over-update deterministically."""
    return docmeta.groupBy("doc_id").agg(
        F.max(F.struct("ts", "deleted", "dl")).alias("w")
    ).select(
        "doc_id",
        F.col("w.ts").alias("ts"),
        F.col("w.deleted").alias("deleted"),
        F.col("w.dl").alias("dl"),
    )


def _land_text(batch: DataFrame, batch_id: int, state_dir: str) -> None:
    """Land one micro-batch's lexical index state: tp-partitioned
    term-sorted version-stamped postings, the dp-partitioned docmeta
    version ledger (tombstones included), and the bounded version-
    stamped seed-query sidecar (<= _BM25_MAX_QUERIES docs ever). Shared
    by bm25_index_stream and hybrid_index_stream. Append-only: updates
    and deletes are resolved at serve time (tail mask) and at
    compaction (global LWW fold), never by reading the store here."""
    _land_layout(state_dir)
    deleted = F.coalesce(F.col("deleted"), F.lit(False))
    live = batch.filter(~deleted)
    toked = live.select(
        "doc_id",
        F.col("ingest_ts").alias("ts"),
        F.filter(tokens_col(), lambda t: t != "").alias("toks"),
    )
    postings = (
        toked.select(
            "doc_id",
            "ts",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("term", "doc_id", "dl", "ts")
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
        batch.select(
            "doc_id",
            F.col("ingest_ts").alias("ts"),
            deleted.alias("deleted"),
            F.when(deleted, F.lit(None).cast("long"))
            .otherwise(
                F.size(
                    F.filter(tokens_col(), lambda t: t != "")
                ).cast("long")
            )
            .alias("dl"),
        )
        .withColumn("dp", _dp_col())
        .repartition("dp")
        .write.mode("overwrite")
        .partitionBy("dp")
        .parquet(f"{state_dir}/docmeta/batch_id={batch_id}")
    )
    (
        toked.filter(
            (F.col("doc_id") % _BM25_EVERY == 0)
            & (F.col("doc_id") < _BM25_EVERY * _BM25_MAX_QUERIES)
        )
        .select(
            F.col("doc_id").alias("query_id"),
            "ts",
            F.explode(
                F.array_distinct(F.slice("toks", *_BM25_QSLICE))
            ).alias("term"),
        )
        .withColumn("tp", _tp_col())
        .select(*_SEED_COLS)
        .write.mode("overwrite")
        .parquet(f"{state_dir}/seeds/batch_id={batch_id}")
    )


def _fold_horizon(state_dir: str) -> int:
    """Last stats-snapshot id S: docmeta batches with id <= S are
    covered by the snapshot (and, barring a crash window that the next
    fold repairs, physically folded). -1 when never compacted."""
    snap_dir = f"{state_dir}/statsnap"
    if not os.path.isdir(snap_dir):
        return -1
    _assert_no_compact_leftover(snap_dir)
    ids = [
        int(e.split("=", 1)[1])
        for e in os.listdir(snap_dir)
        if e.startswith("batch_id=") and e.split("=", 1)[1].isdigit()
    ]
    return max(ids) if ids else -1


def _tail_live(spark: SparkSession, state_dir: str, fold_id: int):
    """LWW winners among docmeta batches NEWER than the last fold —
    the serve-time visibility mask. Bounded by compaction cadence
    (everything older was already masked physically by the fold), so
    the join against it broadcasts; before the first fold it is the
    global LWW (exact for any arrival order)."""
    dm = _read_store(spark, f"{state_dir}/docmeta", "docmeta store dir")
    return _lww(dm.filter(F.col("batch_id") > fold_id))


def _mask_visible(rows: DataFrame, tail: DataFrame, key: str = "doc_id"):
    """Visibility under the tail mask: a version-stamped row survives
    iff its doc has no tail version, or it IS the tail winner and that
    winner is not a tombstone. Requires the ordering contract (per-doc
    nondecreasing ts); compaction repairs violations globally."""
    t = tail.select(
        F.col("doc_id").alias(key),
        F.col("ts").alias("_t_ts"),
        F.col("deleted").alias("_t_del"),
    )
    return (
        rows.join(t, key, "left")
        .filter(
            F.col("_t_ts").isNull()
            | ((F.col("ts") == F.col("_t_ts")) & ~F.col("_t_del"))
        )
        .drop("_t_ts", "_t_del")
    )


def _stats_triplet(docmeta_live: DataFrame) -> tuple[int, int, int]:
    """(n_docs, n_len, sum_dl) integer contribution of live winner rows
    — tombstones excluded, null-text docs count toward N but not avgdl
    (the batch op's count(*) vs avg(len) split)."""
    r = (
        docmeta_live.filter(~F.col("deleted"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("dl").cast("long").alias("n_len"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
        )
        .collect()[0]
    )
    return (r["n_docs"], r["n_len"], r["sum_dl"])


def _live_stats(spark: SparkSession, state_dir: str) -> tuple[float, float]:
    """Exact (N, avgdl) over the LWW-current corpus, without an
    O(corpus) pass: last snapshot totals, minus the fold-live
    contribution of tail-touched docs (dp-pruned point lookup), plus
    the tail winners' contribution. All arithmetic on integer
    triplets; the final division is the batch op's one IEEE divide."""
    dm_dir = f"{state_dir}/docmeta"
    fold_id = _fold_horizon(state_dir)
    if fold_id < 0:
        n_docs, n_len, sum_dl = _stats_triplet(
            _lww(_read_store(spark, dm_dir, "docmeta store dir"))
        )
    else:
        snap = spark.read.parquet(
            f"{state_dir}/statsnap/batch_id={fold_id}"
        )
        tot = snap.agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("n_len"), F.lit(0)).alias("n_len"),
            F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
        ).collect()[0]
        n_docs, n_len, sum_dl = tot["n_docs"], tot["n_len"], tot["sum_dl"]
        tail = _tail_live(spark, state_dir, fold_id).withColumn(
            "dp", _dp_col()
        )
        # point-lookup collect, capped: below the cap the fold read
        # carries a doc_id IN literal list that row-group-skips inside
        # the doc_id-sorted folded files (the LSM point-lookup shape —
        # the correction then reads ~one row group per touched doc, so
        # serving stays flat in corpus size); above it, fall back to
        # the dp-pruned scan (bounded collect: <= _DOC_PREFIXES + cap)
        probe = tail.select("doc_id", "dp").limit(_STATS_LOOKUP_CAP + 1)
        trows = probe.collect()
        if trows:
            dm = _read_store(spark, dm_dir, "docmeta store dir")
            fold = dm.filter(F.col("batch_id") <= fold_id)
            if len(trows) <= _STATS_LOOKUP_CAP:
                fold = fold.filter(
                    F.col("dp").isin(sorted({r["dp"] for r in trows}))
                ).filter(
                    F.col("doc_id").isin(
                        sorted({r["doc_id"] for r in trows})
                    )
                )
            else:
                tdps = [
                    r["dp"]
                    for r in tail.select("dp").distinct().collect()
                ]
                fold = fold.filter(F.col("dp").isin(sorted(tdps)))
            fold_touched = _lww(fold).join(
                tail.select("doc_id"), "doc_id", "left_semi"
            )
            sub = _stats_triplet(fold_touched)
            add = _stats_triplet(tail)
            n_docs = n_docs - sub[0] + add[0]
            n_len = n_len - sub[1] + add[1]
            sum_dl = sum_dl - sub[2] + add[2]
    n = float(n_docs)
    avgdl = float(sum_dl) / float(n_len) if n_len else float("nan")
    return n, avgdl


def _write_statsnap(spark: SparkSession, state_dir: str, upto: int) -> None:
    """Per-dp integer stats of the live corpus over docmeta batches
    [0, upto), staged under the underscore crash prefix and swapped in;
    older snapshots removed after the rename (readers take the max id,
    so a crash between rename and removal is harmless)."""
    snap_dir = f"{state_dir}/statsnap"
    if os.path.isdir(os.path.join(snap_dir, f"batch_id={upto - 1}")):
        # a snapshot at this exact horizon already exists (a re-run
        # fold at an unchanged upto — idempotent replay of a compaction
        # batch, or the funnel's per-main-batch fold over a sibling
        # ledger that only grows per INVOCATION): the snapshot is a
        # pure function of docmeta[0, upto), whose winner rows any
        # prior fold preserved, so a rewrite would produce identical
        # content — skip instead of colliding on the rename (r12).
        return
    dm = _read_store(spark, f"{state_dir}/docmeta", "docmeta store dir")
    live = (
        _lww(dm.filter(F.col("batch_id") < upto))
        .filter(~F.col("deleted"))
        .withColumn("dp", _dp_col())
    )
    snap = live.groupBy("dp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("dl").cast("long").alias("n_len"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    )
    os.makedirs(snap_dir, exist_ok=True)
    _assert_no_compact_leftover(snap_dir)
    tmp = os.path.join(snap_dir, f"{_COMPACT_TMP_PREFIX}batch_id={upto - 1}")
    snap.coalesce(1).write.mode("overwrite").parquet(tmp)
    olds = [
        e
        for e in os.listdir(snap_dir)
        if e.startswith("batch_id=") and e != f"batch_id={upto - 1}"
    ]
    os.rename(tmp, os.path.join(snap_dir, f"batch_id={upto - 1}"))
    for e in olds:
        shutil.rmtree(os.path.join(snap_dir, e))


def _alive_of(spark: SparkSession, state_dir: str, upto: int):
    """(doc_id, ts) of LWW winners that are not tombstones, over
    docmeta batches [0, upto) — the physical-drop mask shared by every
    LWW store fold (postings/seeds here, vectors/vecseeds in
    hybrid_index, vectors/verdicts in semantic_dedup)."""
    dm = _read_store(spark, f"{state_dir}/docmeta", "docmeta store dir")
    return (
        _lww(dm.filter(F.col("batch_id") < upto))
        .filter(~F.col("deleted"))
        .select("doc_id", "ts")
    )


def _fold_ledger(
    spark: SparkSession,
    state_dir: str,
    upto: int,
    checkpoint_dir: str | None = None,
) -> int:
    """Fold the docmeta version ledger [0, upto) to one winner row per
    doc (tombstones RETAINED — they must suppress any not-yet-arrived
    older version; doc_id-sorted within dp for point lookups) and write
    the per-dp stats snapshot. Snapshot BEFORE the docmeta fold: every
    crash window then serves exactly — a snapshot at id S with unfolded
    docmeta dirs <= S is fine (the correction's fold-read filter
    batch_id <= S still sees them), whereas a docmeta fold without its
    snapshot would make the serve-time correction double-count the
    folded rows."""
    _write_statsnap(spark, state_dir, upto)
    return _compact_batch_store(
        spark,
        f"{state_dir}/docmeta",
        upto,
        cols=_DOCMETA_COLS,
        partition_cols=["dp"],
        what="docmeta store dir",
        checkpoint_dir=checkpoint_dir,
        # doc_id-sorted within dp partitions: the stats correction's
        # point lookups row-group-skip against the sorted min/max stats
        transform=lambda df: _lww(df)
        .withColumn("dp", _dp_col())
        .repartition("dp")
        .sortWithinPartitions("doc_id"),
        force=True,
    )


def compact_retrieval_store(
    spark: SparkSession,
    state_dir: str,
    upto: int,
    checkpoint_dir: str | None = None,
) -> int:
    """Fold text-face batches [0, upto) into ONE directory per store
    (the shared _compact_batch_store rails), applying the global LWW
    mask: superseded-version and tombstoned-doc postings/seeds are
    physically dropped; docmeta folds to one winner row per doc with
    TOMBSTONES RETAINED (they must suppress any not-yet-arrived older
    version); the per-dp stats snapshot is rewritten so serve-time
    corpus constants never rescan the corpus. Term order within folded
    postings files follows the kernel's read order and is NOT
    guaranteed sorted — the search face never relies on sortedness for
    correctness (the IN predicate is exact either way; sortedness only
    sharpens row-group skipping on freshly-landed batches). Returns
    directories removed."""
    _assert_layout(state_dir)
    dm_dir = f"{state_dir}/docmeta"
    if not os.path.isdir(dm_dir):
        return 0  # nothing landed yet — nothing to fold
    alive = _alive_of(spark, state_dir, upto)
    removed = _compact_batch_store(
        spark,
        f"{state_dir}/postings",
        upto,
        cols=[*_POSTING_COLS, "tp"],
        partition_cols=["tp"],
        what="postings index store dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: df.join(alive, ["doc_id", "ts"]),
        force=True,
    )
    removed += _compact_batch_store(
        spark,
        f"{state_dir}/seeds",
        upto,
        cols=_SEED_COLS,
        partition_cols=[],
        what="seed sidecar dir",
        checkpoint_dir=checkpoint_dir,
        transform=lambda df: df.join(
            alive.select(
                F.col("doc_id").alias("query_id"), "ts"
            ),
            ["query_id", "ts"],
        ),
        force=True,
    )
    removed += _fold_ledger(
        spark, state_dir, upto, checkpoint_dir=checkpoint_dir
    )
    return removed


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
    prior store partitions (idempotent replay, the shared contract).
    Drops may carry deleted=true tombstones and re-ingested versions of
    earlier doc_ids (LWW by ingest_ts; see the module contract).
    `compact_every` defaults to 64; to TUNE it for a deployment's
    serve:ingest ratio, feed the measured curve
    (SCALE_PROBE_COMPACTION.json, store "bm25_index") to
    compaction_policy.recommend_fold_cadence — the cadence trades fold
    cost against the tail serve tax, cost knob only (serve answers are
    probe-asserted bit-identical at every fold state)."""

    raw = (
        spark.readStream.schema(INDEX_DROP_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )

    def stage(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_retrieval_store(
                spark, state_dir, upto=batch_id,
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
    are static literals. Rows are version-stamped; callers mask
    visibility with _mask_visible."""
    store = _read_store(spark, postings_dir, "postings index store dir")
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
    exists for), with the batch op's scoring expressions verbatim and
    the update/delete tail mask applied to seeds and candidates.
    Output schema == bm25_keyword_search's: (query_id, rank, doc_id,
    score, n_matched_terms)."""
    fold_id = _fold_horizon(state_dir)
    tail = _tail_live(spark, state_dir, fold_id)

    seeds = _read_store(spark, f"{state_dir}/seeds", "seed sidecar dir")
    if query_ids is not None:
        seeds = seeds.filter(F.col("query_id").isin(list(query_ids)))
    seeds = _mask_visible(seeds, tail, key="query_id")
    # bounded model-state collect: <= _BM25_MAX_QUERIES * slice terms
    terms = [
        (r["term"], r["tp"])
        for r in seeds.select("term", "tp").distinct().collect()
    ]
    queries = seeds.select("query_id", "term").distinct()
    return _serve_workload(spark, state_dir, tail, queries, terms)


def bm25_index_search_adhoc(
    spark: SparkSession, state_dir: str, queries: dict[int, str]
) -> DataFrame:
    """Serve AD-HOC query strings against the landed index — the
    request path a search/RAG deployment actually exposes (the stored
    seed workload exists for the registered oracle; a user's query is
    not a corpus document). `queries` maps query_id -> query text,
    tokenized with the corpus rule (whitespace split, empty tokens
    dropped). The corpus rule is the JAVA regex \\s+ (ASCII-only:
    [ \\t\\n\\x0b\\f\\r]), so the Python split here must use the same
    ASCII class — Python's \\s also matches Unicode whitespace (e.g.
    \\u00a0), which would tokenize a query differently from the same
    text ingested as a document (ADVICE r11). Dropping empty tokens
    subsumes the Spark side's trim. The bounded term list prunes the
    postings read exactly as the seed path does, and the same
    update/delete tail mask applies. Same output schema as
    bm25_index_search."""
    import re

    pairs = sorted(
        {
            (int(qid), t)
            for qid, text in queries.items()
            for t in re.split(r"[ \t\n\x0b\f\r]+", text)
            if t != ""
        }
    )
    if not pairs:
        raise ValueError("no non-empty query terms in the ad-hoc workload")
    qdf = spark.createDataFrame(
        pairs, "query_id bigint, term string"
    ).withColumn("tp", _tp_col())
    # bounded collect: the caller's own workload, terms -> (term, tp)
    terms = [
        (r["term"], r["tp"])
        for r in qdf.select("term", "tp").distinct().collect()
    ]
    fold_id = _fold_horizon(state_dir)
    tail = _tail_live(spark, state_dir, fold_id)
    return _serve_workload(
        spark, state_dir, tail, qdf.select("query_id", "term"), terms
    )


def _serve_workload(
    spark: SparkSession, state_dir: str, tail, queries, terms
) -> DataFrame:
    """The shared serving stage: snapshot-corrected corpus constants,
    tp-pruned + term-IN-pushed postings read, tail visibility mask,
    and the batch op's scoring expressions verbatim over the given
    (query_id, term) workload frame."""
    _assert_layout(state_dir)
    n, avgdl = _live_stats(spark, state_dir)
    cand = _pruned_postings(spark, f"{state_dir}/postings", terms)
    # r14: ONE pinned-width exchange by term feeds the df window (the
    # scoring pipeline previously ran single-task: AQE coalesced the
    # ~1 MB by-term shuffle to one partition while the query fan-out +
    # decimal aggregation behind it was ~1 s of CPU — the same shape
    # measured in bm25_keyword_search, fixed the same way).
    matched = (
        spread(
            _mask_visible(cand, tail).select(
                "doc_id",
                F.col("dl").cast("double").alias("dl"),
                "term",
                F.col("tf").cast("double").alias("tf"),
            ),
            "term",
        )
        .withColumn(
            "df",
            F.count(F.lit(1))
            .over(Window.partitionBy("term"))
            .cast("double"),
        )
    )
    idf = (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_norm = (F.col("tf") * (_BM25_K1 + 1)) / (
        F.col("tf")
        + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.lit(avgdl))
    )
    # per-(doc, term) score computed BEFORE the query fan-out join (it
    # does not depend on query_id). r15: the fanned rows carry the
    # score's unscaled long at 1e9 instead of a decimal(25,12), so the
    # fan-out aggregation is a codegen long sum — exact, commutative,
    # and bit-identical to the decimal path through round(.., 6); see
    # the bit-safety argument at bm25_keyword_search (curation.py),
    # which this serve path mirrors expression-for-expression.
    scale9 = F.lit(1000000000).cast("decimal(10,0)")
    term_score_u = (
        F.round(idf * tf_norm, 9).cast("decimal(25,9)") * scale9
    ).cast("long")
    scored = (
        matched.withColumn("ts_u", term_score_u)
        .join(F.broadcast(queries), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                (F.sum("ts_u").cast("decimal(29,9)") / scale9).cast(
                    "double"
                ),
                6,
            ).alias("score"),
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
