"""Pins for the r17 scale-aware shuffle partitioning (VERDICT r16 item
4): partitions derive from data bytes, never from core count, so the
driver's 8-core scaling run and the 32-core headline run execute the
same plan shapes. Spark-free — pure arithmetic on the formula."""

from __future__ import annotations

import os

import pytest

from cognitive_score_bigdata_spark.session import (
    _SHUFFLE_BYTES_PER_PARTITION,
    scaled_shuffle_partitions,
)


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    return monkeypatch


def test_core_count_fallback_without_data_hint(clean_env):
    assert scaled_shuffle_partitions(32) == 32
    assert scaled_shuffle_partitions(8) == 8


def test_same_value_at_every_core_count_with_data_hint(clean_env, tmp_path):
    (tmp_path / "t.parquet").write_bytes(b"x" * (5 * _SHUFFLE_BYTES_PER_PARTITION))
    clean_env.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path))
    assert (
        scaled_shuffle_partitions(32)
        == scaled_shuffle_partitions(8)
        == scaled_shuffle_partitions(4)
        == 5
    )


def test_clamps_and_ceil(clean_env, tmp_path):
    (tmp_path / "t.parquet").write_bytes(b"x")  # 1 byte -> lo clamp
    clean_env.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path))
    assert scaled_shuffle_partitions(32) == 2
    (tmp_path / "t.parquet").write_bytes(
        b"x" * (_SHUFFLE_BYTES_PER_PARTITION + 1)
    )  # just over one target -> ceil to 2
    assert scaled_shuffle_partitions(32) == 2


def test_env_override_wins(clean_env, tmp_path):
    clean_env.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path))
    clean_env.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "200")
    assert scaled_shuffle_partitions(32) == 200


def test_sf01_lands_in_measured_optimum(clean_env):
    """The committed derivation constant must keep the driver's sf0.1
    bench in the measured [4, 16] plateau — if the testdata or the
    constant changes enough to leave it, this fails loudly and the
    sweep should be re-run (OPTIMIZATION_r17.md)."""
    if not os.path.isdir("/root/testdata/sf0.1"):
        pytest.skip("driver testdata not present")
    clean_env.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    assert 4 <= scaled_shuffle_partitions(32) <= 16
