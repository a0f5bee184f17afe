"""Profiling: jax.profiler traces, step timing, and trace analysis.

The reference's only instrumentation is wall-clock deltas around
``torch.cuda.synchronize`` (reference: src/train.py:284-285,397-401); here
proper XLA traces are one context manager away, and the analysis that
produced docs/PERF.md's device budgets — nesting-aware self-times over the
trace's "XLA Ops" lane — is library code instead of a one-off notebook:

    with trace("/tmp/tr"):
        float(step(...))           # force the dispatch to complete
    for row in op_table(load_trace_events("/tmp/tr")):
        print(row)

Works on any Perfetto/Chrome-format trace (jax.profiler writes
``plugins/profile/<run>/*.trace.json.gz``).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import time
from collections import defaultdict
from typing import Iterable, Sequence

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(sink=None):
    """Wall-clock a device-synchronized region; appends seconds to sink.

    Synchronizes with a scalar host transfer, not ``block_until_ready``:
    over a tunneled runtime the latter returns before execution finishes
    (docs/PERF.md "measurement gotchas")."""
    start = time.perf_counter()
    yield
    float(jax.numpy.zeros(()) + 0)  # scalar transfer = real sync point
    dt = time.perf_counter() - start
    if sink is not None:
        sink.append(dt)


def find_trace_files(logdir: str) -> list[str]:
    """All trace.json(.gz) files under a jax.profiler log directory."""
    pats = ["**/*.trace.json.gz", "**/*.trace.json", "**/trace.json.gz",
            "**/trace.json"]
    out: list[str] = []
    for p in pats:
        out += glob.glob(os.path.join(logdir, p), recursive=True)
    return sorted(set(out))


def load_trace_events(logdir_or_file: str) -> list[dict]:
    """Complete ('X'-phase) events plus thread/process metadata ('M')
    from a trace file or profiler logdir.

    The 'M' metadata rows MUST survive loading: ``self_times``' lane
    filter resolves lane names ("XLA Ops") to (pid, tid) through them,
    and without them it silently falls back to every thread — host
    lanes included — which is exactly the mixed-lane table this
    function once produced by dropping them."""
    if os.path.isdir(logdir_or_file):
        files = find_trace_files(logdir_or_file)
        if not files:
            raise FileNotFoundError(
                f"no trace.json(.gz) under {logdir_or_file}")
        path = files[-1]  # most recent run
    else:
        path = logdir_or_file
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fp:
        doc = json.load(fp)
    events = doc["traceEvents"] if isinstance(doc, dict) else doc
    return [e for e in events
            if (e.get("ph") == "X" and "dur" in e) or e.get("ph") == "M"]


def _lane_tids(events: Iterable[dict], lane: str) -> dict:
    """(pid, tid) pairs whose thread_name metadata matches ``lane``."""
    tids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and lane in str(e.get("args", {}).get("name", ""))):
            tids.add((e.get("pid"), e.get("tid")))
    return tids


def self_times(events: Sequence[dict], lane: str | None = "XLA Ops"
               ) -> dict[str, float]:
    """Per-op-name SELF time (microseconds) with nesting subtracted.

    Events on one thread nest by time containment (XLA emits fusion
    parents spanning their constituent ops); naive sums double-count the
    hierarchy — the exact artifact docs/PERF.md warns about. For each
    event, the duration of its immediately-nested children is subtracted
    before accumulating under its name.

    ``lane`` filters to threads whose ``thread_name`` metadata contains
    the string (None = all threads). Falls back to all threads when no
    metadata matches (plain chrome traces)."""
    complete = [e for e in events if e.get("ph") == "X" and "dur" in e]
    if lane is not None:
        tids = _lane_tids(events, lane)
        if tids:
            complete = [e for e in complete
                        if (e.get("pid"), e.get("tid")) in tids]
    by_thread: dict = defaultdict(list)
    for e in complete:
        by_thread[(e.get("pid"), e.get("tid"))].append(e)

    out: dict[str, float] = defaultdict(float)
    for evs in by_thread.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack: list[tuple[float, float, str, float]] = []  # ts, end, name, child_dur
        for e in evs:
            ts, dur = float(e["ts"]), float(e["dur"])
            end = ts + dur
            while stack and ts >= stack[-1][1] - 1e-9:
                p_ts, p_end, p_name, p_child = stack.pop()
                out[p_name] += (p_end - p_ts) - p_child
                if stack:
                    s = stack[-1]
                    stack[-1] = (s[0], s[1], s[2], s[3] + (p_end - p_ts))
            stack.append((ts, end, e["name"], 0.0))
        while stack:
            p_ts, p_end, p_name, p_child = stack.pop()
            out[p_name] += (p_end - p_ts) - p_child
            if stack:
                s = stack[-1]
                stack[-1] = (s[0], s[1], s[2], s[3] + (p_end - p_ts))
    return dict(out)


def op_table(events: Sequence[dict], lane: str | None = "XLA Ops",
             top: int = 25, group=None) -> list[tuple[str, float]]:
    """Top-N (name, self-ms) rows, optionally regrouped by ``group(name)``
    (e.g. ``lambda n: n.split('.')[0]`` to merge fusion instances)."""
    times = self_times(events, lane)
    if group is not None:
        merged: dict[str, float] = defaultdict(float)
        for name, us in times.items():
            merged[group(name)] += us
        times = dict(merged)
    rows = sorted(times.items(), key=lambda kv: -kv[1])[:top]
    return [(name, us / 1e3) for name, us in rows]


def print_op_table(logdir: str, lane: str | None = "XLA Ops",
                   top: int = 25) -> None:
    rows = op_table(load_trace_events(logdir), lane=lane, top=top)
    width = max((len(n) for n, _ in rows), default=4)
    total = sum(ms for _, ms in rows)
    for name, ms in rows:
        print(f"{name:<{width}}  {ms:10.3f} ms")
    print(f"{'TOTAL (top ' + str(len(rows)) + ')':<{width}}  "
          f"{total:10.3f} ms")
