"""Multi-host launch: single-host no-op, batch slicing, and the REAL
2-process coordinator handshake (subprocesses on localhost)."""

import os
import socket
import subprocess
import sys

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


def test_two_process_handshake():
    """Two real processes: jax.distributed.initialize on a localhost
    coordinator, global_batch_slice, make_array_from_process_local_data
    assembly, and a jitted cross-process reduction (Gloo CPU collectives).
    This is the actual multi-host path of parallel/distributed.py — not a
    monkeypatch."""
    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed handshake timed out:\n"
                    + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK global_sum=28.0" in out, out
