"""The live dashboard serves the monitor's metrics and snapshots."""

import json
import os
import urllib.request

import numpy as np

from rsis_tpu.utils.dashboard import Dashboard
from rsis_tpu.utils.monitor import Monitor


def test_dashboard_serves_metrics_and_snapshots(tmp_path):
    d = str(tmp_path)
    mon = Monitor(d, enable_snapshots=True)
    mon.log("train", 0, 0, 1.5, 0.9, 0.3, 0.2)
    mon.log("val", 0, 0, 1.2, 0.8, 0.25, 0.15)
    mon.snapshot(0, np.random.rand(2, 8, 8), np.random.rand(2, 8, 8))

    dash = Dashboard(d, port=0).start()  # ephemeral port
    base = f"http://localhost:{dash.port}"
    try:
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "rsis-tpu live training" in page
        recs = json.loads(urllib.request.urlopen(base + "/metrics").read())
        assert len(recs) == 2 and recs[0]["split"] == "train"
        assert recs[1]["total"] == 1.2
        snaps = json.loads(
            urllib.request.urlopen(base + "/snapshots").read())
        assert len(snaps) == 1 and snaps[0].endswith(".png")
        img = urllib.request.urlopen(base + f"/snap/{snaps[0]}").read()
        assert img[:8] == b"\x89PNG\r\n\x1a\n"
        # unknown path -> 404
        try:
            urllib.request.urlopen(base + "/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        dash.stop()
