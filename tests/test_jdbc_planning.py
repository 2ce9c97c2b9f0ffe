"""JDBC partition planning: pure-logic tests (no live database)."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from iq_to_hdl_migration_spark.sources.jdbc import plan_partitions

GB = 1024 ** 3


def test_small_table_single_partition():
    p = plan_partitions("id", 1, 1_000_000, size_bytes=10 * 1024 * 1024)
    assert p.num_partitions == 1
    assert p.predicates() == ["1=1"]


def test_large_table_respects_connection_cap():
    p = plan_partitions("id", 0, 10**9, size_bytes=100 * GB,
                        max_connections=64)
    assert p.num_partitions == 64  # 800 by size, capped at connections


def test_narrow_key_range_caps_partitions():
    p = plan_partitions("id", 100, 104, size_bytes=100 * GB)
    assert p.num_partitions == 5  # only 5 distinct keys


def test_predicates_cover_range_without_overlap():
    p = plan_partitions("id", 0, 999, size_bytes=GB,
                        target_bytes=128 * 1024 * 1024)
    preds = p.predicates()
    assert p.num_partitions == 8 and len(preds) == 8
    assert preds[0] == "id < 124"          # stride = 999//8 = 124
    assert preds[-1] == "id >= 868"
    for mid in preds[1:-1]:
        assert ">=" in mid and "<" in mid


@given(lo=st.integers(-10**9, 10**9), width=st.integers(0, 10**9),
       size=st.integers(0, 10**13), conns=st.integers(1, 256))
def test_plan_always_valid(lo, width, size, conns):
    p = plan_partitions("k", lo, lo + width, size, max_connections=conns)
    assert 1 <= p.num_partitions <= min(conns, max(1, width + 1), 10_000)
    assert len(p.predicates()) == p.num_partitions


def test_rejects_inverted_range():
    with pytest.raises(ValueError):
        plan_partitions("id", 10, 5, size_bytes=1)
