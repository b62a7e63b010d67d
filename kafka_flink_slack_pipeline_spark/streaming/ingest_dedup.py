"""Ingestion-time streaming dedup — the streaming face of dedup_exact.

A training-data ingest stream drops exact duplicates ON ARRIVAL by
normalized content fingerprint (operators/textops.py doc_fingerprints
semantics: lowercase, whitespace-collapsed, md5). State is keyed by
fingerprint and evicted once the watermark passes the document's ingest
time + ttl — dropDuplicatesWithinWatermark, because a plain streaming
dropDuplicates whose key omits the event-time column never evicts.

100 TB/day: state holds one 16-byte hash per distinct document inside
the TTL horizon, shuffled by fingerprint — uniform by construction (md5),
no skew. Cross-horizon duplicates are the batch dedup_exact query's job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_documents_stream(
    docs: DataFrame, ts_col: str = "ingest_ts", ttl: str = "24 hours"
) -> DataFrame:
    """Streaming frame with exact-duplicate documents dropped within the
    watermark horizon. Input needs `text` and an event-time column."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
    return (
        docs.withColumn("fingerprint", F.md5(normalized))
        .withWatermark(ts_col, ttl)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


# --------------------------------------------------------------------------
# Stream-stream exact-hash dedup — the streaming face of the EXACT pair
# family (dedup_exact / the prefix join's output contract), and the one
# batch dedup shape that had no streaming counterpart before r6:
# dedup_documents_stream above DROPS duplicates within one stream but
# never says WHAT they duplicated, and neardup_documents_stream covers
# minhash only. This operator joins an incoming document stream against
# the landed-corpus stream on content fingerprint and emits one verdict
# row per (incoming doc, earlier landed copy) — the evidence record an
# ingest pipeline stores before dropping.
#
# Both sides are watermarked and the join carries an event-time range
# (landed_ts in [inc_ts - horizon, inc_ts]), which is what lets Spark
# evict join state: without the time bound a stream-stream inner join
# keeps every row forever. Each unordered pair is emitted exactly once
# (earlier-lands-first; doc_id tiebreak on equal timestamps), so a doc
# never matches itself even when the caller passes the SAME source as
# both sides (the self-join usage).
#
# 100 TB/day: state per side is (16-byte fingerprint, id, ts) rows
# inside the horizon, shuffled by fingerprint — md5-uniform, no skew;
# matches are equi-join rows only. Cross-horizon duplicates remain the
# batch dedup_exact query's job, exactly as for the two faces above.


def crossdup_documents_stream(
    incoming: DataFrame,
    landed: DataFrame,
    ts_col: str = "ingest_ts",
    horizon: str = "24 hours",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact-duplicate matches of `incoming` docs against
    earlier `landed` docs (append mode). Inputs need `doc_id`, `text`,
    and an event-time column; pass the same stream twice for the
    self-join face. Output: (doc_id, dup_of, fingerprint, ingest_ts,
    landed_ts); `select("doc_id").distinct()` is the drop list."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
    inc = (
        incoming.select(
            "doc_id",
            F.md5(normalized).alias("fingerprint"),
            F.col(ts_col).alias("ingest_ts"),
        )
        .withWatermark("ingest_ts", watermark)
    )
    lnd = (
        landed.select(
            F.col("doc_id").alias("dup_of"),
            F.md5(normalized).alias("l_fingerprint"),
            F.col(ts_col).alias("landed_ts"),
        )
        .withWatermark("landed_ts", watermark)
    )
    cond = (
        (F.col("fingerprint") == F.col("l_fingerprint"))
        & (F.col("landed_ts") >= F.expr(f"ingest_ts - INTERVAL {horizon}"))
        & (
            (F.col("landed_ts") < F.col("ingest_ts"))
            | (
                (F.col("landed_ts") == F.col("ingest_ts"))
                & (F.col("dup_of") < F.col("doc_id"))
            )
        )
    )
    return inc.join(lnd, cond, "inner").select(
        "doc_id", "dup_of", "fingerprint", "ingest_ts", "landed_ts"
    )


# --------------------------------------------------------------------------
# Streaming NEAR-dup flagging — the streaming face of dedup_minhash_lsh
# (operators/dedup.py), via applyInPandasWithState keyed by LSH band.
#
# Same signature family as the batch operator (16 minhashes over word
# 3-shingles, 4 bands x 4 rows, universal-hash coefficients from
# _minhash_coeffs), so a doc flagged here would also pair in the batch
# sweep. The signature is computed IN-ROW (array_min over a transform of
# the shingle-hash array) — no pre-aggregation shuffle, which matters
# twice: streaming stateful ops can't sit above an aggregate in append
# mode, and the narrow form pipelines straight from the source. The
# shingle-hash array is projected ONCE before the 16 per-component
# transforms (lambda bodies don't participate in subexpression
# elimination — the repo's tokens-projection rule).
#
# State: per (band, band_key), the FIRST-seen doc's id + signature.
# Each later arrival in the same bucket is emitted as a match with
# est_jaccard = fraction of agreeing signature components (the unbiased
# minhash Jaccard estimator); callers filter on it and anti-join the
# flagged doc_ids out of the ingest. State expires TTL after the
# bucket's last activity (event-time timeout anchored on the data, not
# the watermark — see thread_mention_counts for why).
#
# 100 TB/day: state is one (long, 16-long) record per occupied band
# bucket inside the TTL horizon, shuffled by (band, bkey) — md5-uniform,
# no skew; the Python function sees one bucket's rows per call,
# Arrow-batched. Cross-horizon near-dups remain the batch operator's job.

from collections.abc import Iterator

import pandas as pd

from ..operators.dedup import (
    MINHASH_BANDS,
    MINHASH_P,
    MINHASH_ROWS,
    _minhash_coeffs,
    _word_shingles,
)

NEARDUP_OUTPUT = (
    "doc_id bigint, dup_of bigint, band int, est_jaccard double, "
    "ingest_ts timestamp"
)
NEARDUP_STATE = "first_doc bigint, sig string, last_ms bigint"
NEARDUP_TTL_MS = 24 * 3600 * 1000


def _flag_neardups(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    batch = pd.concat(rows).sort_values(["ingest_ts", "doc_id"])
    if state.exists:
        first_doc, sig_csv, last_ms = state.get
        ref = [int(x) for x in sig_csv.split(",")]
    else:
        first_doc, ref, last_ms = None, None, 0
    out = []
    for r in batch.itertuples():
        sig = [int(x) for x in r.sig_csv.split(",")]
        if ref is None:
            first_doc, ref = int(r.doc_id), sig
        else:
            agree = sum(a == b for a, b in zip(ref, sig)) / len(ref)
            out.append((int(r.doc_id), first_doc, key[0], agree, r.ingest_ts))
        last_ms = max(last_ms, int(r.ingest_ts.value // 1_000_000))
    state.update((first_doc, ",".join(str(x) for x in ref), last_ms))
    state.setTimeoutTimestamp(last_ms + NEARDUP_TTL_MS)
    if out:
        yield pd.DataFrame(
            out, columns=["doc_id", "dup_of", "band", "est_jaccard", "ingest_ts"]
        )


def neardup_documents_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "24 hours",
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Streaming minhash-LSH near-dup matches (update mode).

    Input needs `doc_id`, `text`, and an event-time column. Output: one
    row per (flagged doc, band) with the first-seen bucket owner and the
    estimated Jaccard; `df.select("doc_id").distinct()` is the drop list.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _h(s):
        return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")

    def _mh_component(a: int, b: int):
        # closure per coefficient pair: Spark decides a lambda's arity by
        # inspecting its parameters, so default-arg capture is off-limits
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)

    toks = F.split(F.trim(F.col("text")), "\\s+")
    sigged = (
        docs.withColumn("shingle_hs", F.transform(_word_shingles(toks), _h))
        .filter(F.size("shingle_hs") > 0)
        .withColumn(
            "sig",
            F.array(
                *[
                    F.array_min(
                        F.transform(F.col("shingle_hs"), _mh_component(a, b))
                    )
                    for a, b in _minhash_coeffs()
                ]
            ),
        )
        .withColumn(
            "sig_csv",
            F.concat_ws(
                ",", F.transform("sig", lambda x: x.cast("string"))
            ),
        )
    )
    banded = sigged.select(
        "doc_id",
        "sig_csv",
        F.col(ts_col).alias("ingest_ts"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig").getItem(bnd * MINHASH_ROWS + r)
                                for r in range(MINHASH_ROWS)
                            ],
                        ).alias("bkey"),
                    )
                    for bnd in range(MINHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig_csv", "ingest_ts", "bk.band", "bk.bkey")
    matches = (
        banded.withWatermark("ingest_ts", watermark)
        .groupBy("band", "bkey")
        .applyInPandasWithState(
            _flag_neardups,
            outputStructType=NEARDUP_OUTPUT,
            stateStructType=NEARDUP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return matches.filter(F.col("est_jaccard") >= min_est_jaccard)
