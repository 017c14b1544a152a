"""tools/measure_restart.py end-to-end at tiny scale: two subprocess serve
launches against one cache dir must both reach ready and produce the
cold/warm timing report (the on-chip numbers land in RESTART_TIMING.json;
this validates the harness itself)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_measure_restart_tool(tmp_path):
    import measure_restart
    out = tmp_path / "restart.json"
    rc = measure_restart.main([
        "--cache-dir", str(tmp_path / "cache"),
        "--buckets", "1,2", "--noise", "host", "--readback", "all",
        "--timeout", "300", "--out", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["cold"]["start_to_ready_s"] > 0
    assert data["warm_restart"]["start_to_ready_s"] > 0
    assert "speedup" in data
