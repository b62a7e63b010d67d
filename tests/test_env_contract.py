"""The SPARK_GRAFT_* env contract (README "Tuning environment
variables"): widths/fans are read from the documented envs, 0/unset
means built-in default, junk fails loudly naming the variable, and the
store-layout manifest pins the prefix moduli a store was landed with
(ADVICE r14: tp/dp are recomputed at serve/compaction time, so an env
mismatch would silently prune the wrong partitions)."""

from __future__ import annotations

import pytest

from kafka_flink_slack_pipeline_spark import tables
from kafka_flink_slack_pipeline_spark.streaming import retrieval_index as ri


def test_spread_width_env_is_read(spark, monkeypatch):
    df = spark.range(100)
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_WIDTH", "5")
    assert tables.spread(df).rdd.getNumPartitions() == 5
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_WIDTH", "0")  # 0 = default
    assert tables.spread(df).rdd.getNumPartitions() == max(
        2, spark.sparkContext.defaultParallelism // 2
    )


def test_env_width_rejects_junk_loudly(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_WIDTH", "sixteen")
    with pytest.raises(ValueError, match="SPARK_GRAFT_SPREAD_WIDTH"):
        tables._env_width("SPARK_GRAFT_SPREAD_WIDTH")


def test_media_width_env_is_read(spark, sf_dir, monkeypatch):
    from kafka_flink_slack_pipeline_spark.operators.multimodal import (
        _spread_small_scan,
        multimodal_view,
    )

    monkeypatch.setenv("SPARK_GRAFT_MEDIA_WIDTH", "3")
    out = _spread_small_scan(spark, multimodal_view(spark, sf_dir), sf_dir)
    assert out.rdd.getNumPartitions() == 3


def test_prefix_envs_are_read():
    # module constants resolve through the shared parser with 0=default
    assert ri._TERM_PREFIXES == (ri._env_int("SPARK_GRAFT_TERM_PREFIXES") or 16)
    assert ri._DOC_PREFIXES == (ri._env_int("SPARK_GRAFT_DOC_PREFIXES") or 8)


def test_layout_manifest_roundtrip(tmp_path):
    state = str(tmp_path / "store")
    ri._land_layout(state)  # first land writes
    ri._assert_layout(state)  # matching moduli pass
    ri._land_layout(state)  # re-land with same moduli passes


def test_layout_manifest_mismatch_fails_loudly(tmp_path, monkeypatch):
    state = str(tmp_path / "store")
    ri._land_layout(state)
    monkeypatch.setattr(ri, "_TERM_PREFIXES", ri._TERM_PREFIXES * 2)
    with pytest.raises(ValueError, match="store layout mismatch"):
        ri._assert_layout(state)
    with pytest.raises(ValueError, match="store layout mismatch"):
        ri._land_layout(state)  # appending under a drifted fan also fails


def test_layout_manifest_absent_is_trusted(tmp_path):
    # pre-manifest stores (no file) are served as-is
    ri._assert_layout(str(tmp_path / "never-landed"))
