"""Sparse-grid adversary probe for events_gapfill_locf (r8 verdict
item 7).

The gapfill's grid is `sequence(min_win, max_win, 3600)` per type —
bounded by the TIME RANGE, not by event volume. The adversary that
maximizes grid/volume is a type with a years-long range and few
events: the grid explodes while the event rollup stays tiny. The claim
to pin is two-sided:

  - runtime is AT MOST LINEAR in grid size at fixed event volume (the
    LOCF windows and the left join run over the grid — linear is the
    floor, anything above it would mean the windows amplify the grid);
  - runtime is at most linear in event volume at fixed grid (the
    bucketed rollup is the only event-side stage; no grid x events
    cross term).

Method: synthetic events tables from one generator — FIXED 30k events
spread uniformly over ranges three decades apart (≈1 / 10 / 100 / 1000
months: grid ≈ 744 / 7.4k / 74k / 744k hourly buckets per type, 5
types), plus 10x/100x-event points at the SMALLEST range (fixed
grid). Each
point runs events_gapfill_locf to completion (count action), warmup +
2 timed passes, min taken. Exponents:

  grid_exponent   = log(t_g1000 / t_g1) / log(grid1000 / grid1)
  events_exponent = log(t_e100  / t_g1) / log(100)

Writes SCALE_PROBE_GAPFILL.json at the repo root, prints one JSON line.

Usage:  python tools/gapfill_probe.py [--out SCALE_PROBE_GAPFILL.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flink_slack_pipeline_spark.operators.windows import (  # noqa: E402
    events_gapfill_locf,
)
from kafka_flink_slack_pipeline_spark.session import get_spark  # noqa: E402

BASE_EVENTS = 30_000
N_TYPES = 5
HOUR = 3600
BASE_RANGE_HOURS = 744  # ~1 month
GRID_MULTS = {"g1": 1, "g10": 10, "g100": 100, "g1000": 1000}
EPOCH0 = 1_735_689_600  # 2025-01-01T00:00:00Z


def _write_events(out_dir: str, n_events: int, range_hours: int,
                  seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    # uniform over the range, but pin each type's FIRST and LAST bucket
    # so every point's grid is exactly range_hours buckets per type
    # (min/max jitter would otherwise blur the grid-size ratio)
    secs = rng.integers(0, range_hours * HOUR, size=n_events)
    types = np.array([f"t{k}" for k in range(N_TYPES)])
    ev_types = types[np.arange(n_events) % N_TYPES]
    pin = np.arange(2 * N_TYPES)
    secs[pin] = np.where(pin < N_TYPES, 0, range_hours * HOUR - 1)
    ts = (EPOCH0 + secs).astype("datetime64[s]").astype("datetime64[us]")
    tbl = pa.table(
        {
            "event_id": pa.array(range(n_events), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(
                rng.integers(0, 1000, size=n_events), pa.int64()
            ),
            "event_type": pa.array(ev_types),
            "value": pa.array(
                np.round(rng.uniform(0, 100, size=n_events), 2)
            ),
            "props": pa.array(["{}"] * n_events),
        }
    )
    pq.write_table(tbl, f"{out_dir}/events.parquet")


def _timed(spark, d: str) -> tuple[float, int]:
    frame = events_gapfill_locf(spark, d)
    n = frame.count()  # warmup
    samples = []
    for _ in range(2):
        t0 = time.time()
        assert frame.count() == n
        samples.append(time.time() - t0)
    return round(min(samples), 3), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_PROBE_GAPFILL.json")
    args = ap.parse_args()

    spark = get_spark("gapfill_probe")
    work = tempfile.mkdtemp(prefix="gapfill_probe_")
    try:
        points: dict[str, dict] = {}
        for name, mult in GRID_MULTS.items():
            d = f"{work}/{name}"
            os.makedirs(d)
            _write_events(d, BASE_EVENTS, BASE_RANGE_HOURS * mult, seed=7)
            t, rows = _timed(spark, d)
            points[name] = {"sec": t, "grid_rows": rows,
                            "events": BASE_EVENTS}
        for emult in (10, 100):
            d = f"{work}/e{emult}"
            os.makedirs(d)
            _write_events(d, BASE_EVENTS * emult, BASE_RANGE_HOURS, seed=7)
            t, rows = _timed(spark, d)
            points[f"e{emult}"] = {"sec": t, "grid_rows": rows,
                                   "events": BASE_EVENTS * emult}

        grid_growth = (
            points["g1000"]["grid_rows"] / points["g1"]["grid_rows"]
        )
        grid_exp = round(
            math.log(points["g1000"]["sec"] / points["g1"]["sec"])
            / math.log(grid_growth),
            3,
        )
        events_exp = round(
            math.log(points["e100"]["sec"] / points["g1"]["sec"])
            / math.log(100),
            3,
        )
        # fixed-grid sanity: more events left the grid unchanged
        assert points["e100"]["grid_rows"] == points["g1"]["grid_rows"]

        out = {
            "metric": "gapfill_grid_scaling",
            "method": "fixed 30k events spread over 1/10/100/1000-"
            "month ranges (grid 744/7.4k/74k/744k hourly buckets per "
            "type, 5 types, first/last bucket pinned) + 10x/100x-event "
            "points at the 1-month range (fixed grid); warmup + 2 "
            "passes, min",
            "points": points,
            "grid_exponent": grid_exp,
            "events_exponent_at_fixed_grid": events_exp,
            "linear_or_better": grid_exp <= 1.1 and events_exp <= 1.1,
        }
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo_root, args.out), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
