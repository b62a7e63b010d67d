"""Fold-cadence policy: the CONSUMER of the compaction knob table.

SCALE_PROBE_COMPACTION.json (tools/compaction_probe.py) measures, per
incremental store, the two costs the fold cadence trades against each
other — the serve tax (tail-mask join + batch-dir discovery, rising
~linearly in uncompacted-tail length) and the fold cost (an O(store)
rewrite whose amortized per-batch share falls ~linearly in cadence) —
with serve answers asserted bit-identical at every fold state: the
cadence is a COST knob, never a correctness knob. But the artifact
itself says where the crossing sits: "the crossing depends on the
deployment's serve:ingest ratio", and until now each store's
auto-compaction fired on its own hard-coded threshold with nothing
mapping a deployment's ratio onto the measured curve (r13 verdict
item 3). recommend_fold_cadence is that map.

MODEL (stated so the caller can judge it): folding every C batches
pays the measured fold cost at tail C once per C ingested batches
(fold_s(C) / C) and serves against an average tail that sweeps 0..C-1
between folds (mean of serve_s over that sweep). With rho = serve
calls per ingested batch, the amortized cost per ingested batch is

    cost(C) = fold_s(C) / C  +  rho * mean(serve_s(t), t = 0..C-1)

evaluated on the PROBE'S OWN measured points, piecewise-linearly
interpolated between them. Honest limits: the numbers are the probe
box's absolutes (the SHAPE is what transfers — re-run the probe on the
deployment's hardware and store sizes for absolute planning); no
extrapolation beyond the largest measured tail (a candidate cadence
out there refuses loudly rather than guessing); the sweep assumes
serves spread evenly across the fold cycle.
"""

from __future__ import annotations

import json


def _interp(points: list[tuple[float, float]], x: float) -> float:
    """Piecewise-linear interpolation over (x, y) points sorted by x;
    x must lie within the measured range (callers enforce)."""
    lo = points[0]
    for hi in points[1:]:
        if x <= hi[0]:
            if hi[0] == lo[0]:
                return hi[1]
            f = (x - lo[0]) / (hi[0] - lo[0])
            return lo[1] + f * (hi[1] - lo[1])
        lo = hi
    return points[-1][1]


def recommend_fold_cadence(
    serve_ingest_ratio: float,
    probe: dict | str,
    store: str,
    candidates: list[int] | None = None,
) -> dict:
    """Pick the fold cadence (batches between folds) minimizing the
    amortized per-ingested-batch cost for a deployment that issues
    `serve_ingest_ratio` serve calls per ingested batch, evaluated on
    the given store's measured curve in `probe` (a parsed
    SCALE_PROBE_COMPACTION.json dict, or a path to one).

    Returns {store, serve_ingest_ratio, cadence_batches,
    amortized_s_per_batch, table} where `table` lists every candidate
    with its fold_s_per_batch / serve_s_mean / amortized_s_per_batch —
    the full curve, so the recommendation is auditable, not an oracle.
    Ties resolve to the SMALLER cadence (a fresher store also bounds
    the repair window compaction provides for ordering-contract
    violations). Candidates default to every integer cadence from 1 to
    the largest measured tail; asking beyond the measured range
    refuses loudly rather than extrapolating."""
    if isinstance(probe, str):
        with open(probe) as f:
            probe = json.load(f)
    if serve_ingest_ratio < 0:
        raise ValueError(
            f"serve_ingest_ratio {serve_ingest_ratio} must be >= 0 "
            "(serve calls per ingested batch)"
        )
    stores = probe.get("stores", {})
    if store not in stores:
        raise ValueError(
            f"store {store!r} not in the probe (has: {sorted(stores)}) — "
            "re-run tools/compaction_probe.py to measure it"
        )
    rows = sorted(stores[store], key=lambda r: r["tail_batches"])
    if len(rows) < 2:
        raise ValueError(
            f"store {store!r} has {len(rows)} measured tail point(s); "
            "need >= 2 to interpolate a curve"
        )
    serve_pts = [(r["tail_batches"], r["serve_s"]) for r in rows]
    fold_pts = [(r["tail_batches"], r["fold_to_zero_s"]) for r in rows]
    max_tail = rows[-1]["tail_batches"]
    if candidates is None:
        candidates = list(range(1, max_tail + 1))
    bad = [c for c in candidates if c < 1 or c > max_tail]
    if bad:
        raise ValueError(
            f"candidate cadences {bad} outside the measured tail range "
            f"[1, {max_tail}]: extrapolating the curve would be a guess "
            "— re-run the probe with longer tails instead"
        )
    table = []
    for c in sorted(set(candidates)):
        fold_per_batch = _interp(fold_pts, c) / c
        serve_mean = sum(_interp(serve_pts, t) for t in range(c)) / c
        table.append(
            {
                "cadence_batches": c,
                "fold_s_per_batch": round(fold_per_batch, 4),
                "serve_s_mean": round(serve_mean, 4),
                "amortized_s_per_batch": round(
                    fold_per_batch + serve_ingest_ratio * serve_mean, 4
                ),
            }
        )
    best = min(
        table,
        key=lambda r: (r["amortized_s_per_batch"], r["cadence_batches"]),
    )
    return {
        "store": store,
        "serve_ingest_ratio": serve_ingest_ratio,
        "cadence_batches": best["cadence_batches"],
        "amortized_s_per_batch": best["amortized_s_per_batch"],
        "table": table,
    }
