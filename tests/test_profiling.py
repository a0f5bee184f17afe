"""Trace-analysis oracle tests: nesting-aware self-times over synthetic
Perfetto traces with known answers, plus a live jax.profiler round-trip."""

import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from rsis_tpu.utils.profiling import (load_trace_events, op_table,
                                      print_op_table, self_times,
                                      step_timer, trace)


def _evt(name, ts, dur, pid=1, tid=7):
    return {"ph": "X", "name": name, "ts": ts, "dur": dur,
            "pid": pid, "tid": tid}


class TestSelfTimes:
    def test_flat_events_sum(self):
        evs = [_evt("a", 0, 10), _evt("b", 20, 5), _evt("a", 30, 10)]
        t = self_times(evs, lane=None)
        assert t == {"a": 20.0, "b": 5.0}

    def test_nested_child_subtracted(self):
        # fusion [0,100) containing two convs of 30 each -> self 40
        evs = [_evt("fusion", 0, 100), _evt("conv", 10, 30),
               _evt("conv", 50, 30)]
        t = self_times(evs, lane=None)
        assert t["fusion"] == 40.0
        assert t["conv"] == 60.0

    def test_three_deep_nesting(self):
        evs = [_evt("outer", 0, 100), _evt("mid", 10, 50),
               _evt("inner", 20, 10)]
        t = self_times(evs, lane=None)
        assert t == {"outer": 50.0, "mid": 40.0, "inner": 10.0}

    def test_threads_do_not_nest_across(self):
        # identical spans on DIFFERENT tids are independent, not nested
        evs = [_evt("a", 0, 100, tid=1), _evt("b", 10, 50, tid=2)]
        t = self_times(evs, lane=None)
        assert t == {"a": 100.0, "b": 50.0}

    def test_lane_filter_via_metadata(self):
        evs = [
            {"ph": "M", "name": "thread_name", "pid": 1, "tid": 3,
             "args": {"name": "XLA Ops"}},
            _evt("keep", 0, 10, tid=3),
            _evt("drop", 0, 10, tid=4),
        ]
        t = self_times(evs, lane="XLA Ops")
        assert t == {"keep": 10.0}
        # no matching metadata -> fall back to every thread
        assert self_times(evs[1:], lane="XLA Ops") == \
            {"keep": 10.0, "drop": 10.0}

    def test_back_to_back_same_ts_end(self):
        # child ends exactly at parent end; sibling starts at that ts
        evs = [_evt("p", 0, 20), _evt("c1", 0, 10), _evt("c2", 10, 10)]
        t = self_times(evs, lane=None)
        assert t == {"p": 0.0, "c1": 10.0, "c2": 10.0}


class TestOpTable:
    def test_top_and_grouping(self):
        evs = [_evt("fusion.1", 0, 3000), _evt("fusion.2", 4000, 1000),
               _evt("conv", 6000, 2000)]
        rows = op_table(evs, lane=None, top=2,
                        group=lambda n: n.split(".")[0])
        assert rows[0] == ("fusion", 4.0)
        assert rows[1] == ("conv", 2.0)

    def test_load_gz_roundtrip(self, tmp_path):
        doc = {"traceEvents": [_evt("op", 0, 5),
                               {"ph": "M", "name": "process_name"},
                               {"ph": "C", "name": "counter", "ts": 0}]}
        p = tmp_path / "x.trace.json.gz"
        with gzip.open(p, "wt") as fp:
            json.dump(doc, fp)
        evs = load_trace_events(str(p))
        # complete events AND metadata survive (lane filtering needs the
        # 'M' rows); counters and other phases are dropped
        assert [e["ph"] for e in evs] == ["X", "M"]
        assert evs[0]["name"] == "op"

    def test_loaded_events_keep_lane_filter_working(self, tmp_path):
        # the documented flow — op_table(load_trace_events(dir), lane=...)
        # — must honor the lane: dropping 'M' rows at load silently
        # disabled the filter and mixed host lanes into the table
        doc = {"traceEvents": [
            {"ph": "M", "name": "thread_name", "pid": 1, "tid": 3,
             "args": {"name": "XLA Ops"}},
            {"ph": "M", "name": "thread_name", "pid": 1, "tid": 9,
             "args": {"name": "python"}},
            _evt("device_op", 0, 10, tid=3),
            _evt("host_noise", 0, 999, tid=9),
        ]}
        p = tmp_path / "t.trace.json"
        p.write_text(json.dumps(doc))
        rows = op_table(load_trace_events(str(p)), lane="XLA Ops")
        assert rows == [("device_op", 0.01)]


class TestLiveTrace:
    def test_jax_profiler_roundtrip(self, tmp_path, capsys):
        logdir = str(tmp_path / "tr")
        x = jnp.ones((128, 128))
        f = jax.jit(lambda a: (a @ a).sum())
        float(f(x))  # compile outside the trace
        with trace(logdir):
            float(f(x))
        evs = load_trace_events(logdir)
        assert evs, "profiler produced no complete events"
        # the traced program must appear somewhere in the op names
        times = self_times(evs, lane=None)
        assert times and all(v >= 0 for v in times.values())
        print_op_table(logdir, lane=None, top=5)
        out = capsys.readouterr().out
        assert "TOTAL" in out

    def test_step_timer_sink(self):
        sink = []
        with step_timer(sink):
            float(jnp.arange(8).sum())
        assert len(sink) == 1 and sink[0] > 0
