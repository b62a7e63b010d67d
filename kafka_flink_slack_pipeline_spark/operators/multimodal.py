"""Multimodal binary-column operators (north-star surface).

The reference handles media as opaque bytes + mimetype metadata: Slack file
fetch → Buffer (`Slack Event Server/slackEventServer.js:157-184`), image
mimetype filter (`:245`), base64 attach (`:174`). This module generalizes
that into the engine's multimodal surface for a training-data pipeline:
typed binary columns with metadata, and decode / feature-extract /
frame-sample stages as Arrow-batched `mapInPandas` stages.

The container has no image/audio codecs, so the DECODE step is stubbed:
`_decode_image` raises NotImplementedError when Pillow is absent and a
deterministic fake (byte-level features) stands in. Everything Spark-side —
schema, binary columns, batch iteration, partitioning, output shape — is
real and oracle/test-verified.

Payloads are derived deterministically from the `documents` testdata table
(utf-8 bytes of `text`), so every operator stays reproducible and
DuckDB-checkable; in production the payload column comes from the object
store / Kafka instead.

Scale notes (100 TB):
  - Binary payloads ride in parquet BYTE_ARRAY; the metadata-only queries
    (byte stats) never touch payload bytes thanks to column pruning.
  - mapInPandas streams Arrow record batches: memory is bounded by
    `spark.sql.execution.arrow.maxRecordsPerBatch`, not partition size —
    the right shape for megabytes-per-row media columns. Feature extraction
    is embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import QuerySpec
from ..tables import spread, table

N_HIST_BINS = 16
FRAME_BYTES = 1000  # fake codec: one "frame" per kB of payload
FRAME_INTERVAL_MS = 40  # 25 fps

MIMETYPES = ("image/png", "audio/wav", "video/mp4")


def multimodal_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`documents` re-typed as a multimodal table.

    doc_id, mimetype (round-robin by doc_id), payload binary (utf-8 bytes
    of text — deterministic fake media), meta struct (fake width/height/
    duration derived from payload size).
    """
    d = table(spark, sf_dir, "documents")
    n_bytes = F.octet_length("text")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MIMETYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("mimetype"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (n_bytes % 640).cast("int").alias("width"),
            (n_bytes % 480).cast("int").alias("height"),
            (n_bytes * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
        F.col("text").alias("_text"),  # kept for hash parity with the oracle
    )


# --------------------------------------------------------------------------
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mimetype byte statistics over the multimodal table.

    Metadata-only: the plan reads doc_id + text lengths; payload bytes are
    pruned away (check ReadSchema in explain)."""
    mm = multimodal_view(spark, sf_dir)
    return (
        mm.select(
            "mimetype",
            F.octet_length("payload").alias("n_bytes"),
            F.md5("_text").alias("sig"),
        )
        .groupBy("mimetype")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.count_distinct(F.col("sig")).alias("n_distinct_payloads"),
        )
        .orderBy("mimetype")
    )


MULTIMODAL_BYTE_STATS_ORACLE = """
SELECT mimetype,
       count(*)::BIGINT AS n_files,
       sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       round(avg(octet_length(encode(text))), 4) AS avg_bytes,
       count(DISTINCT md5(text))::BIGINT AS n_distinct_payloads
FROM (
  SELECT doc_id, text,
         ['image/png', 'audio/wav', 'video/mp4'][(doc_id % 3 + 1)::INT] AS mimetype
  FROM documents
)
GROUP BY mimetype
ORDER BY mimetype
"""


# --------------------------------------------------------------------------
# Feature extraction: binary payload → byte-histogram features via
# mapInPandas. The "decode" would be the codec call; stubbed per module
# docstring. Output is long-format (doc_id, bin, n) so the oracle is plain
# SQL over codepoints (payload bytes == utf-8 codepoints for this ASCII
# testdata derivation).

try:  # decode stub gate: real codec path only when Pillow exists
    import PIL  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _decode_image(payload: bytes):  # pragma: no cover - container lacks PIL
    """REAL decode path (requires Pillow; absent in this container)."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; use the deterministic byte-level "
            "fake (_byte_histogram) in codec-less environments"
        )
    from io import BytesIO

    from PIL import Image

    return Image.open(BytesIO(payload))


def _byte_histogram(payload: bytes, n_bins: int = N_HIST_BINS) -> list[int]:
    """Deterministic stand-in for decode+feature-extract: 16-bin histogram
    of byte values (bin = byte // 16)."""
    counts = [0] * n_bins
    for b in payload:
        counts[b // N_HIST_BINS] += 1
    return counts


def image_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over image-typed payloads.

    Long-format output (doc_id, bin, n) — one row per non-empty histogram
    bin — keeps the oracle SQL-expressible while exercising the real
    Arrow-batched binary plumbing."""
    mm = multimodal_view(spark, sf_dir).filter(
        F.col("mimetype").startswith("image/")  # F7 mimetype gate
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_bin, out_n = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hist = _byte_histogram(bytes(payload))
                for b, n in enumerate(hist):
                    if n:
                        out_doc.append(doc_id)
                        out_bin.append(b)
                        out_n.append(n)
            yield pd.DataFrame({"doc_id": out_doc, "bin": out_bin, "n": out_n})

    return (
        mm.select("doc_id", "payload")
        .mapInPandas(extract, "doc_id bigint, bin int, n bigint")
        .orderBy("doc_id", "bin")
    )


# BYTE-exact oracle: the Spark kernel reads UTF-8 payload bytes, so the
# oracle extracts bytes too — hex(encode(text)) then 2-char slices —
# rather than ord() codepoints, which diverge from bytes (values AND
# counts) the moment a document contains a non-ASCII character.
IMAGE_BYTE_HISTOGRAM_ORACLE = """
SELECT doc_id, (code // 16)::INT AS bin, count(*)::BIGINT AS n
FROM (
  SELECT doc_id, ('0x' || substr(h, 2*i - 1, 2))::BIGINT AS code
  FROM (
    SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS nb
    FROM documents
    WHERE doc_id % 3 = 0  -- image/png slot of the round-robin typing
  ), unnest(range(1, nb + 1)) t(i)
)
GROUP BY doc_id, bin
ORDER BY doc_id, bin
"""


# --------------------------------------------------------------------------
# Image RESIZE — the remaining multimodal verb (decode / feature-extract
# / RESIZE / frame-sample). The deterministic fake decode views the
# payload as a 32-column row-major grayscale grid (H = ceil(nb/32) rows,
# no padding); the "resize" is 8x8 block-mean downsampling — each pixel
# maps to thumbnail cell (row*8 // H, col // 4) and cells average their
# pixels with FLOOR division, so the whole kernel is integer-exact on
# both engines. A real deployment swaps the grid view for the codec
# decode (the module's stub policy) and keeps the identical
# block-reduce, batch shape, and long-format output.
#
# 100 TB shape: one Arrow mapInPandas pass, zero row amplification (64
# cells out per image regardless of size), aggregation inside the
# kernel — no shuffle until the final sort.
_THUMB_W = 32
_THUMB_CELLS = 8


def _thumb_cells(images: DataFrame) -> DataFrame:
    """(doc_id, payload) -> long-format 8x8 block-mean thumbnail cells
    (doc_id, cell_row, cell_col, n_px, mean_byte): the integer-exact
    resize kernel (Arrow mapInPandas), shared by image_thumbnail_grid
    and the perceptual hash below — a kernel bug flips both ops'
    driver hashes."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "cell_row": [], "cell_col": [],
                   "n_px": [], "mean_byte": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                nb = arr.shape[0]
                h = -(-nb // _THUMB_W)  # ceil
                idx = np.arange(nb)
                row, col = idx // _THUMB_W, idx % _THUMB_W
                cell = (row * _THUMB_CELLS // h) * _THUMB_CELLS + (
                    col // (_THUMB_W // _THUMB_CELLS)
                )
                n_cells = _THUMB_CELLS * _THUMB_CELLS
                counts = np.bincount(cell, minlength=n_cells)
                sums = np.bincount(
                    cell, weights=arr.astype(np.int64), minlength=n_cells
                )
                for c in np.nonzero(counts)[0]:
                    out["doc_id"].append(doc_id)
                    out["cell_row"].append(int(c) // _THUMB_CELLS)
                    out["cell_col"].append(int(c) % _THUMB_CELLS)
                    out["n_px"].append(int(counts[c]))
                    # sums are exact in float64 below 2^53 — floor div
                    out["mean_byte"].append(int(sums[c]) // int(counts[c]))
            yield pd.DataFrame(out)

    return images.select("doc_id", "payload").mapInPandas(
        resize,
        "doc_id bigint, cell_row int, cell_col int, "
        "n_px bigint, mean_byte bigint",
    )


def image_thumbnail_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = multimodal_view(spark, sf_dir).filter(
        F.col("mimetype").startswith("image/")
        & (F.octet_length("payload") > 0)
    )
    return _thumb_cells(mm).orderBy("doc_id", "cell_row", "cell_col")


IMAGE_THUMBNAIL_ORACLE = f"""
SELECT doc_id,
       ((((i - 1) // {_THUMB_W}) * {_THUMB_CELLS}) // gh)::INT AS cell_row,
       (((i - 1) % {_THUMB_W}) // {_THUMB_W // _THUMB_CELLS})::INT AS cell_col,
       count(*)::BIGINT AS n_px,
       (sum(code) // count(*))::BIGINT AS mean_byte
FROM (
  SELECT doc_id, gh, ('0x' || substr(h, 2*i - 1, 2))::BIGINT AS code, i
  FROM (
    SELECT doc_id, hex(encode(text)) AS h,
           octet_length(encode(text)) AS nb,
           (octet_length(encode(text)) + {_THUMB_W - 1}) // {_THUMB_W} AS gh
    FROM documents
    WHERE doc_id % 3 = 0 AND octet_length(encode(text)) > 0
  ), unnest(range(1, nb + 1)) t(i)
)
GROUP BY doc_id, cell_row, cell_col
ORDER BY doc_id, cell_row, cell_col
"""


# --------------------------------------------------------------------------
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-typed payloads (fake codec: 1 frame/kB,
    25 fps timestamps, md5 frame signature). Pure column expressions — the
    per-frame fan-out is a lateral explode, no Python."""
    mm = multimodal_view(spark, sf_dir).filter(F.col("mimetype") == "video/mp4")
    n_frames = (F.octet_length("payload") / FRAME_BYTES).cast("int") + 1
    return (
        mm.select(
            "doc_id",
            F.md5("_text").alias("payload_sig"),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * FRAME_INTERVAL_MS).cast("bigint").alias("frame_ts_ms"),
            F.md5(
                F.concat_ws(":", F.col("payload_sig"), F.col("frame_idx"))
            ).alias("frame_sig"),
        )
        .orderBy("doc_id", "frame_idx")
    )


VIDEO_FRAME_SAMPLE_ORACLE = f"""
SELECT doc_id, frame_idx,
       (frame_idx * {FRAME_INTERVAL_MS})::BIGINT AS frame_ts_ms,
       md5(md5(text) || ':' || frame_idx) AS frame_sig
FROM (
  SELECT doc_id, text,
         unnest(range(0, (octet_length(encode(text)) // {FRAME_BYTES})::INT + 1))
           AS frame_idx
  FROM documents
  WHERE doc_id % 3 = 2  -- video/mp4 slot of the round-robin typing
)
ORDER BY doc_id, frame_idx
"""


# --------------------------------------------------------------------------
# Audio feature extraction — the audio member of the modality trio
# (image = byte histogram, video = frame sampling). Payload bytes frame
# into fixed windows and each frame reports its RMS "loudness" — the
# standard first feature of any audio pipeline (VAD, silence trimming,
# loudness normalization). The codec decode is stubbed per module policy
# (no soundfile/librosa in the container): bytes stand in for PCM
# samples, and the Arrow plumbing — binary column in, frame fan-out out
# — is the real thing.
#
# Exactness: the kernel emits INTEGER sums of squares; rms =
# round(sqrt(ss/n), 6) runs JVM-side — IEEE-754 sqrt is correctly
# rounded, so both engines produce the identical double.
AUDIO_FRAME_SAMPLES = 256  # fake PCM: one frame per 256 payload bytes


def audio_frame_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas frame-windowed RMS over audio-typed payloads."""
    import numpy as np

    mm = multimodal_view(spark, sf_dir).filter(
        F.col("mimetype").startswith("audio/")  # F7-style mimetype gate
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_samples": [], "ss": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                for f in range(0, len(arr), AUDIO_FRAME_SAMPLES):
                    frame = arr[f : f + AUDIO_FRAME_SAMPLES].astype(np.int64)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f // AUDIO_FRAME_SAMPLES)
                    out["n_samples"].append(len(frame))
                    out["ss"].append(int((frame * frame).sum()))
            yield pd.DataFrame(out)

    framed = mm.select("doc_id", "payload").mapInPandas(
        extract, "doc_id bigint, frame_idx int, n_samples int, ss bigint"
    )
    return framed.select(
        "doc_id",
        "frame_idx",
        "n_samples",
        F.round(F.sqrt(F.col("ss") / F.col("n_samples")), 6).alias("rms"),
    ).orderBy("doc_id", "frame_idx")


# BYTE-exact oracle (same policy as the image histogram's): the kernel
# frames np.frombuffer UTF-8 bytes, so the oracle slices bytes out of
# hex(encode(text)) — codepoint ord() would diverge in both values and
# frame boundaries for any non-ASCII document.
AUDIO_FRAME_RMS_ORACLE = f"""
SELECT doc_id, ((i - 1) // {AUDIO_FRAME_SAMPLES})::INT AS frame_idx,
       count(*)::INT AS n_samples,
       round(sqrt(sum(code * code)::BIGINT / count(*)), 6) AS rms
FROM (
  SELECT doc_id, i, ('0x' || substr(h, 2*i - 1, 2))::BIGINT AS code
  FROM (
    SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS nb
    FROM documents
    WHERE doc_id % 3 = 1  -- audio/wav slot of the round-robin typing
  ), unnest(range(1, nb + 1)) t(i)
)
GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
"""


# --------------------------------------------------------------------------
# Binary-payload near-dup detection WITHOUT decoding — the multimodal
# face of the dedup family. Re-encoded media won't byte-match, but the
# duplication a crawler actually ingests (same file fetched twice,
# padded/truncated copies, metadata-stripped re-uploads) shares most raw
# byte windows, which a simhash over BYTE 4-GRAMS catches with no codec
# in the loop. Tokens are the payload's hex string sliced in 8-hex-char
# windows at byte stride (each token = 4 aligned bytes), fingerprinted
# and banded by the EXACT kernel the text dedup family uses
# (operators/dedup.py: packed-counter 60-bit simhash, 4x15-bit
# pigeonhole bands, bucket cap) — one audited plan, two modalities.
#
# 100 TB shape: hex+slice is a narrow map off the payload column; the
# fingerprint is one groupBy(doc_id); pairs come from the capped
# single-pass band-bucket plan. Payload bytes never leave the JVM.
#
# Stride = the full shingle width (non-overlapping 4-byte blocks): the
# dup classes this op claims — exact refetches, tail padding,
# truncation — all PRESERVE byte alignment, so block shingles see them
# at a quarter of the overlapping-window token count (measured 6.0 s ->
# 2.4 s at sf0.1 for the same pairs on those classes). Mid-payload
# INSERTIONS shift alignment and defeat the block setting — that class
# belongs to media_neardup_cdc below (content-defined chunk boundaries
# re-synchronize after a splice; the planted test splits the two ops
# on exactly this case).
_MEDIA_SHINGLE_BYTES = 4
_MEDIA_STRIDE_BYTES = 4


def _spread_small_scan(
    spark: SparkSession, df: DataFrame, sf_dir: str, denom: int = 4
) -> DataFrame:
    """Repartition a compute-bound narrow map's input ONLY when the
    backing scan cannot parallelize by itself: a single sub-split-size
    parquet FILE (the local testdata shape — one row group, one task
    eats the whole corpus). At scale `documents` is a directory of many
    files, the scan's own splits provide the parallelism, and this is a
    no-op — no redundant exchange of the input bytes. The partition
    count is explicit because AQE's byte-based coalescing folds a tiny
    shuffle back to one partition, which is wrong for a compute-bound
    map (measured 4.5 s -> 1.9 s on the CDC chunk stage; ~35% end to
    end on the block simhash)."""
    import os

    # Driver-local os.path probe, deliberately: on a non-local URI
    # (s3://, hdfs://) isfile is False and we fall through to the no-op
    # branch — which IS the correct production behavior there (a remote
    # corpus is a directory of many files whose scan splits provide the
    # parallelism; the repartition exists only for the single-local-file
    # test shape). Unlike the funnel's signature store (where a silent
    # miss changes RESULTS and the path guard raises), this heuristic
    # only changes the plan.
    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isfile(path) and os.path.getsize(path) < (128 << 20):
        # r14: width defaultParallelism//4 (was spark.sql.shuffle.
        # partitions = the full core count). Every task of an Arrow
        # mapInPandas stage pays a Python-worker round-trip measured at
        # ~200-300 ms of blocked (non-CPU) time on this box, so for the
        # few-hundred-row media corpus fewer, fatter batches win (guide
        # §4.2): media_video_reencode_pairs at widths 32/16/8/4 ->
        # 1.67/0.90/0.61/0.59 s, media_neardup_phash 0.80/0.56/0.61/0.58,
        # media_neardup_simhash 0.90/0.65/0.74/0.89 (isolated, min of 3).
        # Env-overridable for clusters whose kernel stages are long
        # enough to amortize the worker round-trip. r15: `denom` lets an
        # op whose kernel is CPU-heavier per batch pick its own point on
        # that curve (simhash's isolated optimum was width 16 = cores//2
        # while the shared default gives cores//4 — its hex+shingle
        # explode amortizes the worker round-trip sooner).
        from ..tables import _env_width

        n = _env_width("SPARK_GRAFT_MEDIA_WIDTH") or max(
            2, spark.sparkContext.defaultParallelism // denom
        )
        return df.repartition(n, "doc_id")
    return df


def byte_simhash_pairs_of(mm: DataFrame) -> DataFrame:
    """Block-shingle byte simhash pairs over any (doc_id, payload)
    frame — the kernel behind media_neardup_simhash, callable on a
    planted frame (the phash re-encode test runs all three media
    near-dup kernels on one payload set)."""
    from .dedup import _simhash_agg, _simhash_capped_pairs

    hexs = F.hex("payload")
    width = 2 * _MEDIA_SHINGLE_BYTES
    stride = 2 * _MEDIA_STRIDE_BYTES
    shingles = F.when(
        F.length(hexs) >= width,
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.length(hexs) - width + 1, F.lit(stride)
                ),
                lambda i: F.substring(hexs, i, width),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    toks = mm.select(
        "doc_id", F.explode(shingles).alias("tok")
    )
    return _simhash_capped_pairs(_simhash_agg(toks))


def media_neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # denom=2: this kernel's per-batch CPU (hex + 4-byte block shingle
    # explode over the whole payload) amortizes the Python-worker
    # round-trip at twice the shared width — r14 isolated A/B at widths
    # 32/16/8/4 was 0.90/0.65/0.74/0.89 s (optimum 16 on 32 cores).
    mm = _spread_small_scan(
        spark, multimodal_view(spark, sf_dir), sf_dir, denom=2
    )
    return byte_simhash_pairs_of(mm)


def _media_neardup_oracle() -> str:
    from .dedup import _simhash_capped_oracle

    width = 2 * _MEDIA_SHINGLE_BYTES
    stride = 2 * _MEDIA_STRIDE_BYTES
    return _simhash_capped_oracle(
        toks_sql=f"""
  SELECT DISTINCT doc_id, substr(h, i, {width}) AS tok
  FROM (SELECT doc_id, hex(encode(text)) AS h FROM documents),
       unnest(generate_series(1, length(h) - {width} + 1, {stride})) AS u(i)
"""
    )


# --------------------------------------------------------------------------
# INSERTION-ROBUST binary near-dup via content-defined chunking (the r6
# verdict's missing class). media_neardup_simhash's aligned block
# shingles catch exact refetches and padded/truncated copies, but a
# MID-PAYLOAD INSERTION (an EXIF block spliced into a re-upload) shifts
# every downstream block boundary and defeats it. The standard public
# fix (Muthitacharoen et al. LBFS SOSP'01; FastCDC ATC'16) is to cut
# chunk boundaries where a ROLLING HASH of the last W bytes hits a
# divisor condition: boundaries are functions of LOCAL CONTENT, not of
# absolute offsets, so an insertion perturbs only the chunks it touches
# and every other chunk re-emerges byte-identical. Near-dup is then
# Jaccard over the distinct chunk set — the df-capped join kernel the
# text family uses (dedup.capped_jaccard_pairs_from), fourth consumer
# of one audited plan shape.
#
# The boundary hash is a UNIVERSAL multiplicative hash of the 4-byte
# window VALUE — ((A*v + B) mod P) mod D == 0 — pure int64 arithmetic
# both engines compute bit-identically (A < 2^24 and v < 2^32 keep the
# product < 2^56; the md5-derived-literals policy of _minhash_coeffs),
# and, unlike the text family's md5-per-token, costs no hashing: the
# window value IS the hex slice re-parsed. Expected chunk length is
# the divisor (bytes).
#
# NORMALIZED chunking (LBFS's min/max rule; FastCDC calls the bounded
# form normalized): raw divisor hits are THINNED sequentially — a hit
# closer than MIN = divisor/4 bytes to the previous accepted cut is
# skipped (kills the pathological run of tiny chunks a low-entropy
# region emits), and a gap longer than MAX = divisor*4 is force-cut at
# MAX strides (bounds the chunk a divisor-free region would otherwise
# grow without limit). MIN bounds the chunk-token table per doc at
# nb/MIN rows REGARDLESS of payload entropy; MAX bounds re-sync loss
# after an insertion. The thinning depends on the previous accepted
# cut, so it is a per-doc FOLD over the (already sparse) hit list —
# F.aggregate over ~nb/divisor elements, still a narrow JVM map — while
# the per-byte divisor test stays the parallel filter. Insertion
# robustness is preserved: boundaries remain functions of local content
# and re-synchronize within MAX bytes of the splice (planted MB-scale
# test pins both properties).
#
# Registered-query parameters: divisor 32 (MIN 8 / MAX 128) — sized to
# the KB-scale fixtures; `cdc_chunks_of(frame, expected_chunk=...)` is
# the parameterized entry an MB-blob deployment calls with a KB-scale
# divisor (the planted test uses 4096).
#
# 100 TB shape: chunking is a narrow map off the payload column (one
# substr+conv per byte, all JVM); sizes are a narrow map; the pair join
# is the bounded df-capped equi-join. Payload bytes never leave the JVM.
_CDC_WINDOW_BYTES = 4
_CDC_DIVISOR = 32
_CDC_MIN_SHIFT = 2  # MIN = divisor >> 2
_CDC_MAX_SHIFT = 2  # MAX = divisor << 2
_CDC_P = (1 << 31) - 1


def _cdc_coeffs() -> tuple[int, int]:
    import hashlib

    a = int(hashlib.md5(b"cdc:a").hexdigest()[:6], 16) | 1
    b = int(hashlib.md5(b"cdc:b").hexdigest()[:7], 16)
    return a, b


def _cdc_toked(mm: DataFrame, divisor: int = _CDC_DIVISOR) -> DataFrame:
    """(doc_id, chunks): distinct content-defined chunk tokens (hex) of
    the `payload` column, with LBFS min/max normalization (MIN =
    divisor/4, MAX = divisor*4; see the header comment).

    STAGED PROJECTIONS, deliberately: lambda bodies do not participate
    in codegen subexpression elimination (the repo's tokens-projection
    rule), so referencing the hex(payload) EXPRESSION inside the
    per-byte boundary lambda re-hexes the whole payload once per byte —
    O(L²) per document (measured 50 s -> 1.4 s at sf0.01 for this exact
    fix). `h`, `nb`, and `cuts` are each materialized as real columns
    before any lambda touches them."""
    w = _CDC_WINDOW_BYTES
    a, b = _cdc_coeffs()
    cmin = divisor >> _CDC_MIN_SHIFT
    cmax = divisor << _CDC_MAX_SHIFT
    hexed = mm.select(
        "doc_id",
        F.hex("payload").alias("h"),
        F.octet_length("payload").alias("nb"),
    )
    h, nb = F.col("h"), F.col("nb")

    # Byte VALUES as an array column, one O(L) regex pass — the window
    # test below must NOT call substring(h, 2i-7, 8) per position:
    # UTF8String.substring locates a start offset by scanning from the
    # head, so a per-byte substring over the payload is O(L^2) per doc
    # (fine at the KB fixtures, ~minutes per MB blob — measured 23 s for
    # a single 64 KB payload before this array form). element_at on an
    # array is O(1).
    bytesed = hexed.select(
        "doc_id",
        "h",
        "nb",
        F.transform(
            F.filter(F.split(h, "(?<=\\G..)"), lambda x: x != ""),
            lambda x: F.conv(x, 16, 10).cast("long"),
        ).alias("bv"),
    )
    bv = F.col("bv")

    def is_boundary(i):
        v = (
            F.element_at(bv, i - 3) * F.lit(1 << 24)
            + F.element_at(bv, i - 2) * F.lit(1 << 16)
            + F.element_at(bv, i - 1) * F.lit(1 << 8)
            + F.element_at(bv, i)
        )
        return ((F.lit(a) * v + F.lit(b)) % F.lit(_CDC_P)) % F.lit(
            divisor
        ) == 0

    # guarded: sequence(w, nb) runs DESCENDING when nb < w
    bs = F.when(
        nb >= w, F.filter(F.sequence(F.lit(w), nb), is_boundary)
    ).otherwise(F.array().cast("array<int>"))
    hitsed = bytesed.select("doc_id", "h", "nb", bs.alias("hits"))

    # min/max thinning: fold over the sparse hit list keeping
    # (last accepted cut, accepted cuts). `fill` are the MAX-forced cuts
    # bridging a gap: positions last+MAX, last+2*MAX, ... strictly below
    # the target (so the target is re-judged against the final forced
    # cut — the sequential LBFS rule, one pass).
    def fill(last, upto):
        return F.when(
            last + F.lit(cmax) <= upto - 1,
            F.sequence(last + F.lit(cmax), upto - 1, F.lit(cmax)),
        ).otherwise(F.array().cast("array<int>"))

    def step(acc, hit):
        last = acc["last"]
        fl = fill(last, hit)
        nl = F.coalesce(F.try_element_at(fl, F.lit(-1)), last)
        ok = (hit - nl) >= F.lit(cmin)
        return F.struct(
            F.when(ok, hit).otherwise(nl).alias("last"),
            F.concat(
                acc["cuts"],
                fl,
                F.when(ok, F.array(hit)).otherwise(
                    F.array().cast("array<int>")
                ),
            ).alias("cuts"),
        )

    nbc = F.col("nb")
    cuts_col = F.aggregate(
        F.col("hits"),
        F.struct(
            F.lit(0).alias("last"), F.array(F.lit(0)).alias("cuts")
        ),
        step,
        # tail: forced cuts for a trailing divisor-free gap, then nb
        # (the tail chunk may be shorter than MIN — every CDC
        # implementation permits the short tail)
        lambda acc: F.concat(
            acc["cuts"], fill(acc["last"], nbc), F.array(nbc)
        ),
    )
    cutsed = hitsed.select("doc_id", "h", cuts_col.alias("cuts"))
    cuts = F.col("cuts")
    chunks = F.transform(
        F.sequence(F.lit(2), F.size(cuts)),
        lambda k: F.substring(
            F.col("h"),
            F.element_at(cuts, k - 1) * 2 + 1,
            (F.element_at(cuts, k) - F.element_at(cuts, k - 1)) * 2,
        ),
    )
    return cutsed.select(
        "doc_id",
        F.array_distinct(F.filter(chunks, lambda c: c != "")).alias("chunks"),
    )


def cdc_chunks_of(mm: DataFrame, expected_chunk: int = _CDC_DIVISOR) -> DataFrame:
    """Parameterized CDC chunker over any (doc_id, payload) frame — the
    entry an MB-blob deployment calls with a KB-scale expected_chunk
    (LBFS used 8 KB expected / 2 KB min / 64 KB max; the min/max here
    follow the same /4, *4 shape from `expected_chunk`). Chunk-token
    rows per doc are bounded at octet_length/MIN regardless of payload
    entropy; the registered media_neardup_cdc uses the fixture-scale
    default (tests/test_multimodal.py pins the MB-scale behavior:
    bounded tokens, bounded chunk lengths, insertion robustness)."""
    return _cdc_toked(mm, divisor=expected_chunk)


def cdc_pairs_of(
    mm: DataFrame, expected_chunk: int = _CDC_DIVISOR
) -> DataFrame:
    """CDC chunk-set Jaccard pairs over any (doc_id, payload) frame —
    the kernel behind media_neardup_cdc, callable on a planted frame.
    The chunked frame is localCheckpointed: it feeds FOUR consumers
    (join sides a/b + sizes a/b), and Spark 4.1 AQE recomputes
    self-join branches — 209 s -> ~4 s at sf0.1 for checkpoint+spread
    together."""
    from pyspark.sql import Window

    from .dedup import capped_jaccard_pairs_from

    toked = _cdc_toked(mm, divisor=expected_chunk).localCheckpoint(
        eager=True
    )
    sizes = toked.select("doc_id", F.size("chunks").alias("n"))
    shingled = toked.select(
        "doc_id", F.explode("chunks").alias("shingle")
    ).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    return capped_jaccard_pairs_from(sizes, shingled).orderBy(
        "doc_a", "doc_b"
    )


def media_neardup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the per-byte boundary scan when the local single-file scan
    # can't parallelize itself (see _spread_small_scan — a no-op on a
    # multi-file corpus at scale)
    docs = _spread_small_scan(spark, multimodal_view(spark, sf_dir), sf_dir)
    return cdc_pairs_of(docs)


def _cdc_toks_ctes() -> str:
    """The shared hexed→hits→rc→ordered→toks CTE chain (must follow a
    WITH RECURSIVE): normalized chunk tokens per doc. The min/max
    thinning depends on the previous ACCEPTED cut, so the oracle walks
    it with a recursive CTE — one accepted (or MAX-forced) cut per doc
    per iteration; the lateral picks the first divisor hit at least MIN
    past the working cut, and a gap past MAX forces a cut at working+MAX
    (equivalence to the engine's fold checked against a shared Python
    reference in tests/test_multimodal.py)."""
    w = _CDC_WINDOW_BYTES
    a, b = _cdc_coeffs()
    cmin = _CDC_DIVISOR >> _CDC_MIN_SHIFT
    cmax = _CDC_DIVISOR << _CDC_MAX_SHIFT
    return f"""hexed AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text))::INT AS nb
  FROM documents
),
hits AS (
  SELECT doc_id, i
  FROM hexed, unnest(generate_series({w}, nb)) AS u(i)
  WHERE ((({a} * ('0x' || substr(h, 2*i - {2 * w - 1}, {2 * w}))::BIGINT
           + {b}) % {_CDC_P}) % {_CDC_DIVISOR}) = 0
),
rc AS (
  SELECT doc_id, 0 AS cut FROM hexed
  UNION ALL
  SELECT r.doc_id,
         CASE WHEN nh.h IS NOT NULL AND nh.h - r.cut <= {cmax} THEN nh.h
              ELSE r.cut + {cmax} END AS cut
  FROM rc r
  JOIN hexed x USING (doc_id)
  LEFT JOIN LATERAL (
    SELECT min(i) AS h FROM hits t
    WHERE t.doc_id = r.doc_id AND t.i >= r.cut + {cmin}
  ) nh ON true
  WHERE (nh.h IS NOT NULL AND nh.h - r.cut <= {cmax})
     OR (x.nb - r.cut > {cmax})
),
ordered AS (
  SELECT doc_id, cut,
         lead(cut) OVER (PARTITION BY doc_id ORDER BY cut) AS nxt
  FROM (
    SELECT DISTINCT doc_id, cut FROM (
      SELECT doc_id, cut FROM rc
      UNION ALL SELECT doc_id, nb FROM hexed
    )
  )
),
toks AS (
  SELECT DISTINCT o.doc_id,
         substr(x.h, o.cut * 2 + 1, (o.nxt - o.cut) * 2) AS tok
  FROM ordered o JOIN hexed x USING (doc_id)
  WHERE o.nxt IS NOT NULL AND o.nxt > o.cut
)"""


def media_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mimetype rollup of the NORMALIZED chunk tokens — the
    driver-hashed certificate of the LBFS min/max rule on real corpus
    payloads: `max_chunk_bytes` can never exceed MAX (the forced-cut
    bound), `n_runts` (chunks under MIN) is bounded by n_docs (only a
    doc's TAIL chunk may undershoot), and n_chunks is the token-table
    size the MIN bound caps at nb/MIN per doc. Mimetype derives from
    doc_id exactly as multimodal_view's round-robin, so neither engine
    joins for it."""
    mm = _spread_small_scan(spark, multimodal_view(spark, sf_dir), sf_dir)
    cmin = _CDC_DIVISOR >> _CDC_MIN_SHIFT
    # localCheckpoint BEFORE the explode, and not only for reuse (this
    # frame has ONE consumer): CollapseProject pushes the staged cuts/
    # chunks projections through the Generate, re-inlining the thinning
    # fold into every element_at reference — the optimized plan grew to
    # 9 aggregate-fold copies nested inside 36 transforms and execution
    # never finished at sf0.01. The checkpoint is the projection barrier
    # the media_neardup_cdc consumer already uses, and the materialized
    # table is small (doc_id + chunk tokens).
    lens = (
        _cdc_toked(mm)
        .localCheckpoint(eager=True)
        .select("doc_id", F.explode("chunks").alias("c"))
        .select(
            "doc_id",
            F.element_at(
                F.array(*[F.lit(m) for m in MIMETYPES]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("mimetype"),
            (F.length("c") / 2).cast("int").alias("len"),
        )
    )
    return (
        lens.groupBy("mimetype")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("len").alias("max_chunk_bytes"),
            F.sum((F.col("len") < cmin).cast("long")).alias("n_runts"),
            F.round(
                F.sum(F.col("len").cast("decimal(18,3)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("mean_chunk_bytes"),
        )
        .orderBy("mimetype")
    )


def _media_cdc_stats_oracle() -> str:
    cmin = _CDC_DIVISOR >> _CDC_MIN_SHIFT
    mt = ", ".join(f"'{m}'" for m in MIMETYPES)
    return f"""
WITH RECURSIVE {_cdc_toks_ctes()},
lens AS (
  SELECT doc_id,
         list_extract([{mt}], (doc_id % 3 + 1)::INT) AS mimetype,
         (length(tok) / 2)::INT AS len
  FROM toks
)
SELECT mimetype,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_chunks,
       max(len)::INT AS max_chunk_bytes,
       sum(CASE WHEN len < {cmin} THEN 1 ELSE 0 END)::BIGINT AS n_runts,
       round(sum(CAST(len AS DECIMAL(18,3)))::DOUBLE / count(*), 2)
         AS mean_chunk_bytes
FROM lens GROUP BY mimetype ORDER BY mimetype
"""


def _media_cdc_oracle() -> str:
    from .dedup import NGRAM_DF_CAP

    return f"""
WITH RECURSIVE {_cdc_toks_ctes()},
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
capped AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM toks
  ) WHERE df <= {NGRAM_DF_CAP}
),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM capped a JOIN capped b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       round(n_common / (sa.n + sb.n - n_common), 4) AS jaccard
FROM pair_common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.n + sb.n - n_common), 4) >= 0.5
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# PERCEPTUAL image near-dup (the aHash member of the pHash family —
# average hash over an 8x8 block-mean thumbnail): the RE-ENCODE
# duplicate class, which BOTH byte-level media near-dup ops above miss
# BY DESIGN. A re-encoded image (same picture, different bytes — the
# dominant duplicate class in web-scraped image corpora; LAION-style
# pipelines dedup on perceptual hashes for exactly this reason) shares
# almost no raw byte windows with its source: the block-stride simhash
# loses its aligned 4-byte shingles and CDC loses its chunk identities
# the moment pixel VALUES shift, however slightly. A perceptual hash is
# computed over the DECODED pixel grid instead, where a mild re-encode
# moves each pixel by a bounded amount and the 64 block means barely
# move.
#
# Kernel: the existing integer-exact 8x8 thumbnail (_thumb_cells — the
# decode stub + block-mean reduce image_thumbnail_grid hash-checks),
# then one bit per cell: bit_c = (k * m_c > G) where m_c is the cell's
# floor-mean byte, k the number of non-empty cells and G = sum of the
# m_c — i.e. "cell brighter than the thumbnail's average cell", the
# aHash rule with the division cleared so both engines compare exact
# integers. 64 bits pack into TWO nonnegative BIGINT halves (fp_lo =
# cells 0..31, fp_hi = 32..63; a single 64-bit BIGINT would go negative
# at cell 63 and arithmetic >> diverges between engines on negatives).
#
# Pairs: the text-simhash banding proof verbatim — 4 bands x 16 bits
# over (lo16, lo>>16, hi16, hi>>16); any pair at hamming <= 3 differs
# in at most 3 bands, so at least one band matches exactly and the
# banded equi-join ∪ hamming filter equals the brute-force scan, with
# the same production bucket cap mirrored in the oracle. Measured on
# the corpus: a quantize-to-even re-encode (every byte perturbed, ~half
# changed) moves ZERO fingerprints past hamming 3 at sf0.01 while both
# byte-level ops lose every token — the planted test pins that split.
#
# 100 TB shape: thumbnail = one Arrow map, 64 rows out per image
# regardless of size; fp = one doc_id aggregation (window + groupBy
# share the hash partitioning); pairs = the capped single-pass
# band-bucket plan. 16-bit bands keep random band occupancy n / 2^16 —
# the same ~10^6-10^7-doc envelope as the text geometry, with the same
# documented knob (wider fingerprint) beyond it.
PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_MAX_HAMMING = 3
PHASH_BUCKET_CAP = 1000  # the SIMHASH_BUCKET_CAP precedent


def phash_fps_of(images: DataFrame) -> DataFrame:
    """(doc_id, payload) -> (doc_id, fp_hi, fp_lo): the 64-bit aHash
    fingerprint in two nonnegative 32-bit halves."""
    cells = _thumb_cells(images).select(
        "doc_id",
        (F.col("cell_row") * _THUMB_CELLS + F.col("cell_col")).alias("cell"),
        F.col("mean_byte").alias("m"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    bit = (
        F.col("k") * F.col("m") > F.col("g")
    )  # k*m > G == m > mean-of-means, integers only
    lo_term = F.when(
        bit & (F.col("cell") < 32),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(cell AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    hi_term = F.when(
        bit & (F.col("cell") >= 32),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(cell - 32 AS INT))"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        cells.withColumn("k", F.count(F.lit(1)).over(w))
        .withColumn("g", F.sum("m").over(w))
        .groupBy("doc_id")
        .agg(
            F.sum(hi_term).alias("fp_hi"),
            F.sum(lo_term).alias("fp_lo"),
        )
    )


def _fp_bands(fps: DataFrame, carry: tuple[str, ...]) -> DataFrame:
    """(carry..., fp_hi, fp_lo) -> one row per (unit, band) with the
    band's 16-bit value — the LSH-index long format shared by the
    candidate generator below and the streaming store layout
    (streaming/media_dedup.py lands exactly these rows)."""
    mask = (1 << PHASH_BAND_BITS) - 1
    halves = [F.col("fp_lo"), F.col("fp_hi")]
    cols = [*carry, "fp_hi", "fp_lo"]
    return fps.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(
                            halves[b // 2], (b % 2) * PHASH_BAND_BITS
                        )
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(*cols, "bk.band", "bk.bval")


def _banded_fp_candidates(
    fps: DataFrame, carry: tuple[str, ...], cap: int = PHASH_BUCKET_CAP
) -> DataFrame:
    """Shared pigeonhole-banded candidate generator over 64-bit
    fingerprints split as two nonnegative 32-bit halves (fp_hi, fp_lo).

    Input: (carry..., fp_hi, fp_lo) — one row per fingerprinted unit
    (an image, an audio track, one video frame). Output: (a, b,
    hamming) where a/b are structs of the input columns, from the
    capped single-pass band-bucket plan (dedup.py's simhash shape).

    Pigeonhole proof (shared by every consumer): any pair at hamming
    <= PHASH_MAX_HAMMING (3) differs in at most 3 of the 4 disjoint
    16-bit bands, so at least one band matches exactly and the banded
    equi-join ∪ hamming filter equals the brute-force scan (minus
    over-cap buckets, mirrored in each oracle). Callers filter on ids
    (a.doc_id < b.doc_id, or != for cross-doc frame matching), apply
    the hamming threshold, and aggregate."""
    cols = [*carry, "fp_hi", "fp_lo"]
    bands = _fp_bands(fps, carry)
    buckets = (
        bands.groupBy("band", "bval")
        .agg(F.collect_list(F.struct(*cols)).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= cap))
    )
    hamming = (
        F.bit_count(F.col("a.fp_lo").bitwiseXOR(F.col("b.fp_lo")))
        + F.bit_count(F.col("a.fp_hi").bitwiseXOR(F.col("b.fp_hi")))
    ).cast("bigint")
    return (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .select("a", "b", hamming.alias("hamming"))
    )


def phash_pairs_of(images: DataFrame) -> DataFrame:
    """Banded hamming<=3 pairs over the perceptual fingerprints — the
    capped single-pass band-bucket plan (dedup.py's shape, third
    consumer; kernel shared with the video/audio contour ops below)."""
    cands = _banded_fp_candidates(phash_fps_of(images), ("doc_id",))
    return (
        cands.filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def media_neardup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = _spread_small_scan(
        spark, multimodal_view(spark, sf_dir), sf_dir
    ).filter(
        F.col("mimetype").startswith("image/")  # F7 mimetype gate
        & (F.octet_length("payload") > 0)
    )
    return phash_pairs_of(mm)


def _phash_oracle() -> str:
    mask = (1 << PHASH_BAND_BITS) - 1
    w, c = _THUMB_W, _THUMB_CELLS
    band_vals = ", ".join(
        [
            f"fp_lo & {mask}",
            f"(fp_lo >> {PHASH_BAND_BITS}) & {mask}",
            f"fp_hi & {mask}",
            f"(fp_hi >> {PHASH_BAND_BITS}) & {mask}",
        ]
    )
    return f"""
WITH cells AS (
  SELECT doc_id,
         ((((i - 1) // {w}) * {c}) // gh) * {c}
           + (((i - 1) % {w}) // {w // c}) AS cell,
         (sum(code) // count(*))::BIGINT AS m
  FROM (
    SELECT doc_id, gh, ('0x' || substr(h, 2*i - 1, 2))::BIGINT AS code, i
    FROM (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS nb,
             (octet_length(encode(text)) + {w - 1}) // {w} AS gh
      FROM documents
      WHERE doc_id % 3 = 0 AND octet_length(encode(text)) > 0
    ), unnest(range(1, nb + 1)) t(i)
  )
  GROUP BY doc_id, cell
),
bits AS (
  SELECT doc_id, cell, m,
         count(*) OVER (PARTITION BY doc_id) AS k,
         sum(m) OVER (PARTITION BY doc_id) AS g
  FROM cells
),
fps AS (
  SELECT doc_id,
         sum(CASE WHEN cell >= 32 AND k * m > g
                  THEN (1::BIGINT << (cell - 32)::INT) ELSE 0 END)::BIGINT
           AS fp_hi,
         sum(CASE WHEN cell < 32 AND k * m > g
                  THEN (1::BIGINT << cell::INT) ELSE 0 END)::BIGINT AS fp_lo
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, fp_hi, fp_lo, band, bval,
         count(*) OVER (PARTITION BY band, bval) AS bsize
  FROM (
    SELECT doc_id, fp_hi, fp_lo,
           unnest(range({PHASH_BANDS}))::INT AS band,
           unnest([{band_vals}]) AS bval
    FROM fps)
),
capped AS (
  SELECT * FROM bands WHERE bsize BETWEEN 2 AND {PHASH_BUCKET_CAP}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (bit_count(xor(a.fp_lo, b.fp_lo))
        + bit_count(xor(a.fp_hi, b.fp_hi)))::BIGINT AS hamming
FROM capped a JOIN capped b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp_lo, b.fp_lo))
      + bit_count(xor(a.fp_hi, b.fp_hi)) <= {PHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# PERCEPTUAL near-dup for the remaining two modalities — VIDEO and
# AUDIO — via ONE shared kernel: the sign-of-adjacent-segment-energy
# contour fingerprint (the bit rule of Haitsma & Kalker 2002, "A Highly
# Robust Audio Fingerprinting System", duration-normalized). A unit of
# media (one video frame / one audio track) is split into 65 equal
# contiguous byte segments (seg = pos * 65 // len, the video-cell rule);
# each segment reports its integer ENERGY E_s = sum(byte^2); bit_s =
# E_{s+1} > E_s for s in 0..63 packs into the same two nonnegative
# 32-bit BIGINT halves the image pHash uses, and pairs come from the
# same capped pigeonhole-banded hamming<=3 join (_banded_fp_candidates).
#
# Why ENERGY gradients and not the image op's mean-vs-global bits:
# measured on this corpus, a quantize-to-even re-encode flips up to 5
# of 64 mean-rule bits (floor-means of homogeneous byte runs tie, and
# ties break on the +-1 noise) but at most 3 energy-gradient bits
# (energies are large distinct integers; adjacent-segment deltas dwarf
# the bounded perturbation) — max flips 3 and cross-doc hamming >= 7 at
# BOTH sf0.01 and sf0.1, so hamming<=3 separates the re-encode class
# from distinct content with zero measured false positives. Same-length
# payloads produce identical segment splits, so the unequal segment
# sizes the floor split creates bias both sides of a comparison
# identically.
#
# VIDEO adds the temporal dimension the image op lacks: frames (the
# fake codec's 1 frame / 1000 bytes, video_frame_sample's rule) are
# fingerprinted independently and two videos pair on frame-set
# COVERAGE — matched_x / n_frames_x with the pair kept when EITHER
# side's coverage reaches VIDEO_MIN_COVERAGE, so a re-encode (all
# frames match, both coverages 1.0) and a CLIP (the short side's
# coverage 1.0) are both caught, the two duplicate classes frame-level
# CBVR dedup exists for. Frames shorter than 65 bytes cannot fill 64
# real bits and are excluded (only a video's LAST frame can be short,
# so fingerprinted frames are a prefix and n_frames counts them);
# whole-payload units (audio) carry the same >= 65-byte gate.
#
# Exactness: E_s <= 255^2 * 1000 < 2^27 — integer-exact in both
# engines (the kernel's float64 bincount accumulates integers < 2^53);
# coverage = round(matched / n_frames, 6) is one correctly-rounded IEEE
# division per side. The sf0.01/sf0.1 corpora are all-distinct, so the
# PAIRS ops return empty frames there (planted tests pin the catch /
# miss split); the FINGERPRINT tables are the in-window driver
# certificates — they hash-check every kernel value, and the pair plan
# downstream of them is the same _banded_fp_candidates machinery the
# in-window image op certifies.
#
# 100 TB shape: one Arrow map (1 row out per frame, 1 per track),
# banded equi-join with the production bucket cap, coverage agg on
# (doc_a, doc_b) — no all-pairs stage anywhere.
CONTOUR_SEGMENTS = 65  # -> 64 sign-of-delta bits
VIDEO_MIN_COVERAGE = 0.8


def contour_fps_of(
    media: DataFrame, frame_bytes: int | None
) -> DataFrame:
    """(doc_id, payload) -> (doc_id, frame_idx, n_frames, fp_hi, fp_lo):
    per-frame 64-bit energy-contour fingerprints (frame_bytes=None
    treats the whole payload as one frame — the audio face)."""

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [],
                   "fp_hi": [], "fp_lo": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                nb = arr.shape[0]
                if nb == 0:
                    continue
                fb = frame_bytes or nb
                nf_all = -(-nb // fb)  # ceil
                idx = np.arange(nb)
                fr, pos = idx // fb, idx % fb
                flen = np.full(nb, fb, dtype=np.int64)
                flen[fr == nf_all - 1] = nb - fb * (nf_all - 1)
                keep = flen >= CONTOUR_SEGMENTS
                if not keep.any():
                    continue
                arr64 = arr[keep].astype(np.int64)
                fr, pos, flen = fr[keep], pos[keep], flen[keep]
                # only the LAST frame can be short: kept frames are a
                # contiguous prefix 0..nf-1
                nf = int(fr.max()) + 1
                seg = fr * CONTOUR_SEGMENTS + pos * CONTOUR_SEGMENTS // flen
                e = np.bincount(
                    seg,
                    weights=(arr64 * arr64).astype(np.float64),
                    minlength=nf * CONTOUR_SEGMENTS,
                ).astype(np.int64).reshape(nf, CONTOUR_SEGMENTS)
                bits = e[:, 1:] > e[:, :-1]
                pw = (1 << np.arange(32)).astype(np.int64)
                lo = (bits[:, :32] * pw).sum(axis=1)
                hi = (bits[:, 32:] * pw).sum(axis=1)
                for f in range(nf):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(nf)
                    out["fp_hi"].append(int(hi[f]))
                    out["fp_lo"].append(int(lo[f]))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        fps,
        "doc_id bigint, frame_idx bigint, n_frames bigint, "
        "fp_hi bigint, fp_lo bigint",
    )


def media_video_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame video contour fingerprints — the driver certificate of
    the shared kernel (every frame's 64 bits hash-checked)."""
    mm = _spread_small_scan(
        spark, multimodal_view(spark, sf_dir), sf_dir
    ).filter(
        F.col("mimetype").startswith("video/")  # F7 mimetype gate
        & (F.octet_length("payload") > 0)
    )
    return contour_fps_of(mm, FRAME_BYTES).orderBy("doc_id", "frame_idx")


def video_neardup_pairs_of(videos: DataFrame) -> DataFrame:
    """Frame-coverage near-dup pairs over (doc_id, payload) videos:
    re-encodes (both coverages 1.0) and clips (the short side's
    coverage 1.0) both clear VIDEO_MIN_COVERAGE."""
    frames = contour_fps_of(videos, FRAME_BYTES)
    cands = _banded_fp_candidates(
        frames, ("doc_id", "frame_idx", "n_frames")
    )
    matched = (
        cands.filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_frames").alias("n_frames_a"),
            F.col("b.n_frames").alias("n_frames_b"),
            F.col("a.frame_idx").alias("fa"),
            F.col("b.frame_idx").alias("fb"),
        )
        .distinct()
    )
    cov_a = F.round(F.col("matched_a") / F.col("n_frames_a"), 6)
    cov_b = F.round(F.col("matched_b") / F.col("n_frames_b"), 6)
    return (
        matched.groupBy("doc_a", "doc_b", "n_frames_a", "n_frames_b")
        .agg(
            F.countDistinct("fa").alias("matched_a"),
            F.countDistinct("fb").alias("matched_b"),
        )
        .select(
            "doc_a", "doc_b", "n_frames_a", "n_frames_b",
            "matched_a", "matched_b",
            cov_a.alias("cov_a"), cov_b.alias("cov_b"),
        )
        .filter(
            F.greatest(F.col("cov_a"), F.col("cov_b"))
            >= F.lit(VIDEO_MIN_COVERAGE)
        )
        .orderBy("doc_a", "doc_b")
    )


def media_neardup_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = _spread_small_scan(
        spark, multimodal_view(spark, sf_dir), sf_dir
    ).filter(
        F.col("mimetype").startswith("video/")
        & (F.octet_length("payload") > 0)
    )
    return video_neardup_pairs_of(mm)


def media_audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-track audio contour fingerprints (duration-normalized
    65-segment energy contour) — the audio kernel's driver certificate."""
    mm = _spread_small_scan(
        spark, multimodal_view(spark, sf_dir), sf_dir
    ).filter(
        F.col("mimetype").startswith("audio/")
        & (F.octet_length("payload") >= CONTOUR_SEGMENTS)
    )
    return contour_fps_of(mm, None).select(
        "doc_id", "fp_hi", "fp_lo"
    ).orderBy("doc_id")


def audio_neardup_pairs_of(audios: DataFrame) -> DataFrame:
    """Banded hamming<=3 pairs over whole-track contour fingerprints —
    the phash pair shape, audio modality."""
    fps = contour_fps_of(audios, None).select("doc_id", "fp_hi", "fp_lo")
    cands = _banded_fp_candidates(fps, ("doc_id",))
    return (
        cands.filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def media_neardup_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = _spread_small_scan(
        spark, multimodal_view(spark, sf_dir), sf_dir
    ).filter(
        F.col("mimetype").startswith("audio/")
        & (F.octet_length("payload") >= CONTOUR_SEGMENTS)
    )
    return audio_neardup_pairs_of(mm)


# --------------------------------------------------------------------------
# Non-vacuous contour PAIR certificate (r9 verdict item 7): the corpora
# are all-distinct, so media_neardup_video/audio return EMPTY frames on
# driver data and their pair plans ride phash's in-window certificate.
# This op pairs the video corpus against a DETERMINISTICALLY RE-ENCODED
# copy of itself (quantize-to-even — the fake codec's quality-loss
# class, the planted tests' transform), so the coverage arithmetic, the
# banded frame join, and the contour kernel on BOTH raw and transformed
# payloads all hash-check on NON-EMPTY output. The transform is
# SQL-expressible over bytes (code - code % 2 on the unnested byte
# values), so the oracle runs the same fake codec.
_REENC_OFFSET = 10_000_000  # copies land above any corpus doc_id


def reencode_quantize_even_of(media: DataFrame) -> DataFrame:
    """(doc_id, payload) -> the same rows with every payload byte
    quantized to even (b & 0xFE == b - b % 2) — one Arrow map, the
    deterministic fake re-encode."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                (np.frombuffer(bytes(p), dtype=np.uint8) & 0xFE).tobytes()
                for p in pdf["payload"]
            ]
            yield pdf

    return media.select("doc_id", "payload").mapInPandas(
        go, "doc_id bigint, payload binary"
    )


def media_video_reencode_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-coverage near-dup pairs over the video corpus UNION its
    quantize-to-even re-encode (copies at doc_id + 10M): every energy
    contour moves <= PHASH_MAX_HAMMING bits under the transform
    (measured corpus-wide by the planted batch tests), so each video
    pairs with its own copy at coverage 1.0/1.0 while cross-doc pairs
    stay out (min cross-doc frame hamming 7 on this corpus)."""
    vids = (
        _spread_small_scan(spark, multimodal_view(spark, sf_dir), sf_dir)
        .filter(
            F.col("mimetype").startswith("video/")
            & (F.octet_length("payload") > 0)
        )
        .select("doc_id", "payload")
    )
    reenc = reencode_quantize_even_of(
        vids.select(
            (F.col("doc_id") + F.lit(_REENC_OFFSET)).alias("doc_id"),
            "payload",
        )
    )
    return video_neardup_pairs_of(vids.unionByName(reenc))


def _contour_cte(
    mime_mod: int, framed: bool, reenc_offset: int | None = None
) -> str:
    """Shared oracle CTEs computing (doc_id, frame_idx, n_frames,
    fp_hi, fp_lo) for the given round-robin mimetype slot.
    `reenc_offset` adds a quantize-to-even re-encoded copy of every doc
    at doc_id + offset (code - code % 2 per byte — the fake codec in
    SQL, media_video_reencode_pairs' oracle source)."""
    s = CONTOUR_SEGMENTS
    if framed:
        fb = FRAME_BYTES
        frame_expr = f"p // {fb}"
        flen_expr = (
            f"CASE WHEN p // {fb} = (nb + {fb - 1}) // {fb} - 1 "
            f"THEN nb - {fb} * ((nb + {fb - 1}) // {fb} - 1) "
            f"ELSE {fb} END"
        )
        gate = "octet_length(encode(text)) > 0"
    else:
        frame_expr = "0"
        flen_expr = "nb"
        gate = f"octet_length(encode(text)) >= {s}"
    if reenc_offset is None:
        bytes_cte = f"""
bytes AS (
  SELECT doc_id, nb, ('0x' || substr(h, 2*i - 1, 2))::BIGINT AS code,
         (i - 1) AS p
  FROM (
    SELECT doc_id, hex(encode(text)) AS h,
           octet_length(encode(text)) AS nb
    FROM documents
    WHERE doc_id % 3 = {mime_mod} AND {gate}
  ), unnest(range(1, nb + 1)) t(i)
),"""
    else:
        bytes_cte = f"""
src AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS nb, 0 AS rq
  FROM documents
  WHERE doc_id % 3 = {mime_mod} AND {gate}
  UNION ALL
  SELECT doc_id + {reenc_offset}, hex(encode(text)),
         octet_length(encode(text)), 1
  FROM documents
  WHERE doc_id % 3 = {mime_mod} AND {gate}
),
bytes AS (
  SELECT doc_id, nb, raw - rq * (raw % 2) AS code, (i - 1) AS p
  FROM (
    SELECT doc_id, nb, rq,
           ('0x' || substr(h, 2*i - 1, 2))::BIGINT AS raw, i
    FROM src, unnest(range(1, nb + 1)) t(i)
  )
),"""
    return bytes_cte + f"""
framed AS (
  SELECT doc_id, ({frame_expr}) AS frame_idx, ({flen_expr}) AS flen,
         p - ({frame_expr}) * {FRAME_BYTES if framed else 0} AS fp, code
  FROM bytes
),
kept AS (SELECT * FROM framed WHERE flen >= {s}),
nfr AS (
  SELECT doc_id, count(DISTINCT frame_idx)::BIGINT AS n_frames
  FROM kept GROUP BY doc_id
),
segs AS (
  SELECT doc_id, frame_idx, (fp * {s} // flen) AS seg,
         sum(code * code)::BIGINT AS e
  FROM kept GROUP BY doc_id, frame_idx, seg
),
cbits AS (
  SELECT doc_id, frame_idx, seg,
         (lead(e) OVER (PARTITION BY doc_id, frame_idx ORDER BY seg) > e)
           AS bit
  FROM segs
),
fps AS (
  SELECT doc_id, frame_idx::BIGINT AS frame_idx,
         sum(CASE WHEN seg >= 32 AND bit
                  THEN (1::BIGINT << (seg - 32)::INT) ELSE 0 END)::BIGINT
           AS fp_hi,
         sum(CASE WHEN seg < 32 AND bit
                  THEN (1::BIGINT << seg::INT) ELSE 0 END)::BIGINT AS fp_lo
  FROM cbits WHERE seg < {s - 1} GROUP BY doc_id, frame_idx
)"""


def _contour_band_ctes() -> str:
    mask = (1 << PHASH_BAND_BITS) - 1
    band_vals = ", ".join(
        [
            f"fp_lo & {mask}",
            f"(fp_lo >> {PHASH_BAND_BITS}) & {mask}",
            f"fp_hi & {mask}",
            f"(fp_hi >> {PHASH_BAND_BITS}) & {mask}",
        ]
    )
    return f"""
bands AS (
  SELECT *, count(*) OVER (PARTITION BY band, bval) AS bsize
  FROM (
    SELECT f.*, unnest(range({PHASH_BANDS}))::INT AS band,
           unnest([{band_vals}]) AS bval
    FROM withn f)
),
capped AS (
  SELECT * FROM bands WHERE bsize BETWEEN 2 AND {PHASH_BUCKET_CAP}
)"""


def _video_fps_oracle() -> str:
    return (
        "WITH " + _contour_cte(2, framed=True) + """
SELECT f.doc_id, f.frame_idx, n.n_frames, f.fp_hi, f.fp_lo
FROM fps f JOIN nfr n USING (doc_id)
ORDER BY doc_id, frame_idx
"""
    )


def _video_pairs_tail() -> str:
    """matched -> coverage agg -> threshold: the SQL tail shared by the
    corpus pairs oracle and the re-encode certificate's oracle."""
    return f""",
matched AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_frames AS n_frames_a, b.n_frames AS n_frames_b,
         a.frame_idx AS fa, b.frame_idx AS fb
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.fp_lo, b.fp_lo))
        + bit_count(xor(a.fp_hi, b.fp_hi)) <= {PHASH_MAX_HAMMING}
),
agg AS (
  SELECT doc_a, doc_b, n_frames_a, n_frames_b,
         count(DISTINCT fa)::BIGINT AS matched_a,
         count(DISTINCT fb)::BIGINT AS matched_b
  FROM matched GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, n_frames_a, n_frames_b, matched_a, matched_b,
       round(matched_a::DOUBLE / n_frames_a, 6) AS cov_a,
       round(matched_b::DOUBLE / n_frames_b, 6) AS cov_b
FROM agg
WHERE greatest(round(matched_a::DOUBLE / n_frames_a, 6),
               round(matched_b::DOUBLE / n_frames_b, 6))
      >= {VIDEO_MIN_COVERAGE}
ORDER BY doc_a, doc_b
"""


def _video_pairs_oracle() -> str:
    return (
        "WITH "
        + _contour_cte(2, framed=True)
        + ",\nwithn AS (SELECT f.*, n.n_frames FROM fps f "
        + "JOIN nfr n USING (doc_id)),"
        + _contour_band_ctes()
        + _video_pairs_tail()
    )


def _video_reenc_pairs_oracle() -> str:
    return (
        "WITH "
        + _contour_cte(2, framed=True, reenc_offset=_REENC_OFFSET)
        + ",\nwithn AS (SELECT f.*, n.n_frames FROM fps f "
        + "JOIN nfr n USING (doc_id)),"
        + _contour_band_ctes()
        + _video_pairs_tail()
    )


def _audio_fps_oracle() -> str:
    return (
        "WITH " + _contour_cte(1, framed=False) + """
SELECT doc_id, fp_hi, fp_lo FROM fps ORDER BY doc_id
"""
    )


def _audio_pairs_oracle() -> str:
    return (
        "WITH "
        + _contour_cte(1, framed=False)
        + ",\nwithn AS (SELECT doc_id, fp_hi, fp_lo FROM fps),"
        + _contour_band_ctes()
        + f"""
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (bit_count(xor(a.fp_lo, b.fp_lo))
        + bit_count(xor(a.fp_hi, b.fp_hi)))::BIGINT AS hamming
FROM capped a JOIN capped b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp_lo, b.fp_lo))
      + bit_count(xor(a.fp_hi, b.fp_hi)) <= {PHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""
    )


QUERIES = [
    QuerySpec("multimodal_byte_stats", multimodal_byte_stats,
              MULTIMODAL_BYTE_STATS_ORACLE,
              "typed binary columns: per-mimetype byte statistics"),
    QuerySpec("image_byte_histogram", image_byte_histogram,
              IMAGE_BYTE_HISTOGRAM_ORACLE,
              "mapInPandas binary feature extraction (decode stubbed)"),
    QuerySpec("video_frame_sample", video_frame_sample,
              VIDEO_FRAME_SAMPLE_ORACLE,
              "frame sampling fan-out over video payloads"),
    QuerySpec("audio_frame_rms", audio_frame_rms, AUDIO_FRAME_RMS_ORACLE,
              "mapInPandas frame-windowed RMS over audio payloads "
              "(integer kernel + IEEE sqrt, codec stubbed)"),
    QuerySpec("media_neardup_simhash", media_neardup_simhash,
              _media_neardup_oracle(),
              "binary-payload near-dup pairs without decoding: 60-bit "
              "simhash over byte 4-grams, capped pigeonhole bands (the "
              "text kernel, second modality)"),
    QuerySpec("media_neardup_cdc", media_neardup_cdc, _media_cdc_oracle(),
              "insertion-robust binary near-dup: content-defined "
              "chunking (rolling-window divisor boundaries) + df-capped "
              "chunk-set Jaccard — catches the EXIF-insertion class the "
              "block-stride simhash provably misses (planted test)"),
    QuerySpec("image_thumbnail_grid", image_thumbnail_grid,
              IMAGE_THUMBNAIL_ORACLE,
              "image RESIZE: 8x8 block-mean thumbnail over the grid "
              "view of the payload (Arrow mapInPandas, integer-exact "
              "floor means, decode stubbed per policy)"),
    QuerySpec("media_cdc_chunk_stats", media_cdc_chunk_stats,
              _media_cdc_stats_oracle(),
              "per-mimetype normalized-CDC chunk statistics: the "
              "hash-checked certificate of the LBFS min/max rule "
              "(max chunk <= MAX, runts bounded by doc tails)"),
    QuerySpec("media_neardup_phash", media_neardup_phash, _phash_oracle(),
              "PERCEPTUAL image near-dup: 64-bit aHash over the 8x8 "
              "block-mean thumbnail kernel + capped pigeonhole-banded "
              "hamming<=3 join — catches the re-encode duplicate class "
              "both byte-level media ops miss by design (planted test)"),
    QuerySpec("media_video_fingerprints", media_video_fingerprints,
              _video_fps_oracle(),
              "per-frame 64-bit energy-contour fingerprints (Haitsma-"
              "Kalker sign-of-delta bits over 65 equal segments) — the "
              "in-window driver certificate of the video/audio contour "
              "kernel: every frame's bits hash-checked"),
    QuerySpec("media_audio_fingerprints", media_audio_fingerprints,
              _audio_fps_oracle(),
              "whole-track duration-normalized energy-contour "
              "fingerprints — the audio face of the shared kernel, "
              "hash-checked per track"),
    QuerySpec("media_neardup_video", media_neardup_video,
              _video_pairs_oracle(),
              "PERCEPTUAL video near-dup: per-frame contour fps + "
              "banded hamming<=3 frame matching + frame-set COVERAGE "
              "(either side >= 0.8) — catches re-encodes AND clips "
              "(planted tests); empty on the all-distinct test corpora, "
              "so registered tail with the fingerprint certificate "
              "in-window"),
    QuerySpec("media_neardup_audio", media_neardup_audio,
              _audio_pairs_oracle(),
              "PERCEPTUAL audio near-dup: whole-track contour fps + "
              "the image op's banded hamming<=3 pair plan — empty on "
              "the all-distinct test corpora, registered tail with the "
              "fingerprint certificate in-window"),
    QuerySpec("media_video_reencode_pairs", media_video_reencode_pairs,
              _video_reenc_pairs_oracle(),
              "the contour PAIR plan certified on NON-EMPTY output: "
              "the video corpus paired against its deterministic "
              "quantize-to-even re-encode (the fake codec in SQL too) "
              "— coverage agg + banded frame join + kernel on raw AND "
              "transformed payloads under one driver hash"),
]
