"""recommend_fold_cadence (streaming/compaction_policy.py): the
consumer of the compaction knob table (r13 verdict item 3) — unit
tests on the RECORDED SCALE_PROBE_COMPACTION.json curve, no Spark.
"""

from __future__ import annotations

import json
import os

import pytest

from kafka_flink_slack_pipeline_spark.streaming.compaction_policy import (
    recommend_fold_cadence,
)

PROBE = os.path.join(
    os.path.dirname(__file__), "..", "SCALE_PROBE_COMPACTION.json"
)


def _probe():
    with open(PROBE) as f:
        return json.load(f)


def test_ingest_only_amortizes_the_fold():
    """rho = 0 (nobody serves): only the fold cost matters, and its
    per-batch share falls with cadence on the recorded bm25 curve
    (11.559/64 < 7.837/16 < 3.939/4), so the largest measured cadence
    wins."""
    r = recommend_fold_cadence(0.0, _probe(), "bm25_index")
    assert r["cadence_batches"] == 64
    assert r["amortized_s_per_batch"] == round(11.559 / 64, 4)


def test_serve_heavy_folds_often():
    """A serve-heavy deployment (10 serves per ingested batch) pays
    the rising tail tax 10x per batch: the recommendation moves to a
    small cadence, and is cheaper there than at the ingest-only
    optimum."""
    r = recommend_fold_cadence(10.0, _probe(), "bm25_index")
    assert r["cadence_batches"] <= 4
    at64 = [x for x in r["table"] if x["cadence_batches"] == 64][0]
    assert r["amortized_s_per_batch"] < at64["amortized_s_per_batch"]


def test_table_pins_to_the_measured_points():
    """At a measured tail point no interpolation is involved: the
    table's fold share at cadence 16 is exactly the recorded
    fold_to_zero_s/16, the serve mean at cadence 1 is exactly the
    recorded tail-0 serve, and every row satisfies the stated
    formula."""
    rho = 1.5
    r = recommend_fold_cadence(rho, _probe(), "bm25_index")
    by_c = {x["cadence_batches"]: x for x in r["table"]}
    assert by_c[16]["fold_s_per_batch"] == round(7.837 / 16, 4)
    assert by_c[1]["serve_s_mean"] == 2.622
    for x in r["table"]:
        assert x["amortized_s_per_batch"] == pytest.approx(
            x["fold_s_per_batch"] + rho * x["serve_s_mean"], abs=2e-4
        )


def test_funnel_curve_respects_the_tail0_bump():
    """The funnel's recorded curve serves FASTER at tail 4 (4.854s)
    than at tail 0 (5.636s) — the measured tail-0 bump. A helper that
    just reads the curve must therefore NOT recommend cadence 1 even
    for an extremely serve-heavy deployment: sweeping 0..3 is cheaper
    per serve than sitting at 0."""
    r = recommend_fold_cadence(100.0, _probe(), "funnel_sigs")
    assert r["cadence_batches"] > 1
    by_c = {x["cadence_batches"]: x for x in r["table"]}
    assert by_c[4]["serve_s_mean"] < by_c[1]["serve_s_mean"]


def test_refusals_are_loud():
    probe = _probe()
    with pytest.raises(ValueError, match="not in the probe"):
        recommend_fold_cadence(1.0, probe, "redis_store")
    with pytest.raises(ValueError, match="must be >= 0"):
        recommend_fold_cadence(-1.0, probe, "bm25_index")
    with pytest.raises(ValueError, match="outside the measured"):
        recommend_fold_cadence(
            1.0, probe, "bm25_index", candidates=[128]
        )
    with pytest.raises(ValueError, match="measured tail point"):
        recommend_fold_cadence(
            1.0, {"stores": {"x": [{"tail_batches": 0}]}}, "x"
        )
