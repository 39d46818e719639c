"""State-store auto-selection (VERDICT r3 item 8): heap store when projected
state fits a heap fraction, RocksDB otherwise; explicit env always wins."""

import pytest

from spanner_data_validator_spark.session import (
    HEAP_BYTES_PER_KEY,
    select_state_store,
    _parse_mem_bytes,
)


def test_unknown_projection_is_rocksdb(monkeypatch):
    monkeypatch.delenv("SDV_STATE_STORE", raising=False)
    assert select_state_store(None) == "rocksdb"


def test_small_state_picks_heap(monkeypatch):
    monkeypatch.delenv("SDV_STATE_STORE", raising=False)
    assert select_state_store(2_000_000, heap_mem="48g") == "hdfs"


def test_large_state_picks_rocksdb(monkeypatch):
    monkeypatch.delenv("SDV_STATE_STORE", raising=False)
    assert select_state_store(10**12, heap_mem="48g") == "rocksdb"


def test_boundary_is_exact(monkeypatch):
    monkeypatch.delenv("SDV_STATE_STORE", raising=False)
    heap = 1 << 30
    fit = (heap // 4) // HEAP_BYTES_PER_KEY
    assert select_state_store(fit, heap_mem="1g") == "hdfs"
    assert select_state_store(fit + 1, heap_mem="1g") == "rocksdb"


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SDV_STATE_STORE", "hdfs")
    assert select_state_store(10**12) == "hdfs"
    monkeypatch.setenv("SDV_STATE_STORE", "rocksdb")
    assert select_state_store(10) == "rocksdb"


def test_env_override_validated(monkeypatch):
    monkeypatch.setenv("SDV_STATE_STORE", "bogus")
    with pytest.raises(ValueError):
        select_state_store(10)


def test_parse_mem_bytes():
    assert _parse_mem_bytes("48g") == 48 << 30
    assert _parse_mem_bytes("512m") == 512 << 20
    assert _parse_mem_bytes("1024") == 1024
