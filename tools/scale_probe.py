"""One-decade scale probe for the cap-bounded join-family operators.

bench.py measures sf0.1 round-over-round; this tool answers the question
bench cannot: do the dedup/ANN/retrieval join caps (MINHASH_BUCKET_CAP,
the ngram DF cap, IVF nprobe, BM25's bounded query workload, the derived
packing shards) actually hold over a DECADE of data growth, or is there
a super-linear blowup hiding below the bench SF?

Method: generate synthetic documents/embeddings corpora at multiples of
the sf0.1 shape (same 31-word vocab with empirical weights, same
language/source mix, same doc-length distribution, similar exact/near
duplicate rates, unit-norm clustered embeddings) at mult=1 and mult=10
FROM THE SAME GENERATOR — both probe points share the distribution, so
the ratio isolates the engine. Each probe query runs warmup + 2 timed
passes (min taken, bench.py's protocol); the scaling exponent is
log(t_hi / t_lo) / log(mult_hi / mult_lo). Exponent ~1 = linear; the
probe flags anything above _FLAG_EXPONENT (super-linear: a cap that
stopped capping).

Writes SCALE_PROBE.json at the repo root and prints one JSON line.
Probe data lands under .scale_probe/ (gitignored); other tables are
symlinked from the base sf dir so `tables.table()` works unchanged.

Usage:  python tools/scale_probe.py [--mults 1,10] [--keep]
            [--queries a,b,...] [--out SCALE_PROBE.json]

Subset / extra-decade runs (e.g. --mults 1,30 over just the capped
production family) should pass --out with a different name so the
canonical full-decade SCALE_PROBE.json record survives.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flink_slack_pipeline_spark.plans.registry import all_queries  # noqa: E402
from kafka_flink_slack_pipeline_spark.session import get_spark  # noqa: E402
from kafka_flink_slack_pipeline_spark.tables import TABLE_NAMES  # noqa: E402

BASE_SF_DIR = "/root/testdata/sf0.1"
BASE_DOCS = 5_000  # sf0.1 documents rows
BASE_VECS = 2_000  # sf0.1 embeddings rows
_FLAG_EXPONENT = 1.3

# The cap-sensitive join family (the reason this probe exists), plus the
# packing stage whose shard derivation must grow with the corpus.
# r6 membership change (r5 verdict items 1+3): the two known-superlinear
# ORACLE-FIDELITY twins (uncapped dedup_simhash, exponent 1.51;
# dedup_ngram_prefix_join on this flat-vocab corpus, exponent 1.33-1.36 —
# both documented in the r5 SCALE_PROBE records, which survive in git
# history) leave the probe set; the production question they answered is
# now answered by dedup_ngram_adaptive, whose entropy gate must route
# this corpus' high-mult points onto the bounded df-capped path. The
# probe set therefore contains only scale-path dedup ops + the router.
PROBE_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_capped",
    "dedup_simhash_wide",
    "dedup_ngram_jaccard_capped",
    "dedup_ngram_adaptive",
    # r6 additions: the exact substring-run join (df-capped seeds — on
    # this saturating vocabulary the cap progressively removes seeds as
    # dfs cross it, so the exponent can legitimately run BELOW linear)
    # and the binary-payload simhash (block shingles, capped bands).
    "interdoc_dup_runs_exact",
    "media_neardup_simhash",
    # r7 addition: the insertion-robust CDC twin (content-defined chunk
    # boundaries + the shared df-capped Jaccard kernel).
    "media_neardup_cdc",
    # r9 addition: the perceptual member (Arrow thumbnail kernel ->
    # 64-bit aHash -> capped 4x16 banded hamming join). Only 1/3 of
    # docs are image-typed and fingerprints are 64-bit, so band
    # occupancy stays tiny at the probe mults; the kernel cost is the
    # linear mapInPandas pass.
    "media_neardup_phash",
    # r9 (second half): the video/audio contour near-dups — the shared
    # energy-contour kernel (one Arrow pass, 1 row per frame/track)
    # feeding the same capped banded join; video adds the per-pair
    # coverage agg, whose key space is bounded by matched frame pairs.
    "media_neardup_video",
    "media_neardup_audio",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "cosine_topk_ivfpq",
    "bm25_keyword_search",
    # r9 (second half): the distilled NB classifier — its model is
    # vocab-bounded, so on this saturating-vocabulary generator the
    # model groupBy must stay model-scale while the scoring join
    # scales with the corpus (linear).
    "quality_classifier_distill",
    # r9 addition: the RRF fusion — both parents' pruned plans plus a
    # bounded rank join; its exponent should track bm25's (the dense
    # side broadcasts <= 64 queries over one linear candidate scan).
    "hybrid_search_rrf",
    # r10 addition: the list-pruned fusion — the dense side swaps the
    # brute-force full-corpus cosine for the IVF probe (nprobe/k of the
    # lists), so its exponent should run BELOW the brute-force parent's
    # (the pruning claim, measured).
    "hybrid_search_rrf_ivf",
    "sequence_pack",
    # r8 addition (r7 verdict item 7): the filter+pack composition with a
    # derived shard count — the one heavy headliner that had no probe
    # point of its own (its pack stage was probed via sequence_pack).
    "corpus_export_manifest",
]


def _base_profile():
    """Empirical generation profile lifted from the base corpus once."""
    import duckdb

    vocab = duckdb.sql(
        f"""SELECT word, count(*) c FROM (
              SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
              FROM '{BASE_SF_DIR}/documents.parquet')
            WHERE word <> '' GROUP BY word ORDER BY word"""
    ).fetchall()
    lengths = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT len(regexp_split_to_array(trim(text), '\\s+'))
                FROM '{BASE_SF_DIR}/documents.parquet'"""
        ).fetchall()
    ]
    langs = duckdb.sql(
        f"SELECT lang, count(*) FROM '{BASE_SF_DIR}/documents.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    sources = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT source FROM '{BASE_SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    return vocab, lengths, langs, sources


def generate(mult: int, out_dir: str, seed: int = 42) -> None:
    """documents.parquet + embeddings.parquet at `mult` x the base shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed + mult)
    vocab, lengths, langs, sources = _base_profile()
    words = np.array([w for w, _ in vocab])
    w_p = np.array([c for _, c in vocab], dtype=np.float64)
    w_p /= w_p.sum()
    lang_names = np.array([l for l, _ in langs])
    lang_p = np.array([c for _, c in langs], dtype=np.float64)
    lang_p /= lang_p.sum()

    n_docs = BASE_DOCS * mult
    doc_lens = rng.choice(np.array(lengths), size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        texts.append(" ".join(rng.choice(words, size=int(doc_lens[i]), p=w_p)))
    # duplicate injection at the base corpus's observed rates:
    # ~0.3% exact copies, ~0.5% near copies (2 words perturbed)
    for _ in range(max(1, n_docs // 300)):
        i, j = rng.integers(0, n_docs, size=2)
        texts[int(i)] = texts[int(j)]
    for _ in range(max(1, n_docs // 200)):
        i, j = rng.integers(0, n_docs, size=2)
        toks = texts[int(j)].split()
        for _k in range(2):
            toks[int(rng.integers(0, len(toks)))] = str(
                rng.choice(words)
            )
        texts[int(i)] = " ".join(toks)
    doc_tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(lang_names, size=n_docs, p=lang_p)),
            "source": pa.array(rng.choice(np.array(sources), size=n_docs)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(doc_tbl, f"{out_dir}/documents.parquet")

    n_vecs = BASE_VECS * mult
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, size=n_vecs)
    vecs = centers[labels] + 0.6 * rng.normal(size=(n_vecs, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(emb_tbl, f"{out_dir}/embeddings.parquet")

    for t in TABLE_NAMES:  # the probe queries never read these; symlink
        p = f"{out_dir}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{BASE_SF_DIR}/{t}.parquet", p)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10")
    ap.add_argument("--keep", action="store_true",
                    help="keep generated probe data")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of PROBE_QUERIES")
    ap.add_argument("--out", default="SCALE_PROBE.json",
                    help="output file (repo-root-relative); use a "
                         "different name for subset/extra-decade runs so "
                         "the full-decade record survives")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    probe_queries = (
        [q.strip() for q in args.queries.split(",")]
        if args.queries
        else PROBE_QUERIES
    )
    unknown = set(probe_queries) - set(PROBE_QUERIES)
    if unknown:
        raise SystemExit(f"not probe members: {sorted(unknown)}")
    if args.out == "SCALE_PROBE.json" and (
        args.queries or args.mults != "1,10"
    ):
        raise SystemExit(
            "refusing to overwrite the canonical full-decade "
            "SCALE_PROBE.json with a subset/non-decade run — pass --out "
            "<other-name>.json"
        )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    probe_root = os.path.join(root, ".scale_probe")
    spark = get_spark("scale_probe")
    specs = all_queries()

    times: dict[str, dict[int, float]] = {q: {} for q in probe_queries}
    for mult in mults:
        d = os.path.join(probe_root, f"m{mult}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        print(f"generating mult={mult} ...", file=sys.stderr)
        generate(mult, d)
        for q in probe_queries:
            frame = specs[q].fn(spark, d)
            frame.count()  # warmup: codegen + model fits at frame-build
            samples = []
            for _ in range(3):  # min-of-3: this box shows multi-x host
                t0 = time.time()  # stalls; one bad pass must not set the
                frame.count()     # exponent (observed 95s vs 23s on the
                samples.append(time.time() - t0)  # same data+plan)
            times[q][mult] = round(min(samples), 3)
            print(f"  {q} @ m{mult}: {times[q][mult]}s", file=sys.stderr)

    lo, hi = min(mults), max(mults)
    report = {}
    for q in probe_queries:
        t_lo, t_hi = times[q][lo], times[q][hi]
        exp = (
            math.log(t_hi / t_lo) / math.log(hi / lo)
            if t_lo > 0 and hi > lo
            else None
        )
        report[q] = {
            "times_by_mult": {str(m): times[q][m] for m in mults},
            "exponent": round(exp, 3) if exp is not None else None,
            "superlinear": bool(exp is not None and exp > _FLAG_EXPONENT),
        }
    out = {
        "metric": "decade_scaling_exponent",
        "base": "synthetic sf0.1-shaped corpus (same generator both points)",
        "mults": mults,
        "flag_exponent": _FLAG_EXPONENT,
        "queries": report,
        "superlinear_count": sum(r["superlinear"] for r in report.values()),
    }
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(out, f, indent=2)
    if not args.keep:
        shutil.rmtree(probe_root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
