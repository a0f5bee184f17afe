"""Multi-host launch helpers: single-host no-op + batch slicing."""

import jax
import pytest

from rsis_tpu.parallel import global_batch_slice, initialize


def test_single_host_noop():
    assert initialize() is False  # no flags -> nothing happens


def test_global_batch_slice(monkeypatch):
    per, off = global_batch_slice(32)
    assert per == 32 and off == 0  # single process

    from rsis_tpu.parallel import distributed
    monkeypatch.setattr(distributed.jax, "process_count", lambda: 4)
    monkeypatch.setattr(distributed.jax, "process_index", lambda: 2)
    per, off = global_batch_slice(32)
    assert (per, off) == (8, 16)
    with pytest.raises(ValueError, match="not divisible"):
        global_batch_slice(30)
