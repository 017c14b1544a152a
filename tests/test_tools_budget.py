"""tools/check_bf16_budget.py end-to-end at tiny scale (CPU: all three
modes execute the same f32 math, so deltas must be ~0 and the report must
cover the full 16-metric vocabulary)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_bf16_budget_tool(tmp_path):
    import check_bf16_budget
    out = tmp_path / "budget.json"
    rc = check_bf16_budget.main([
        "--dep", "1", "--frames", "9", "--timestep", "20",
        "--proposals", "2", "--steps", "2", "--synthetic-frames", "36",
        "--out", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["backend"] == "cpu"
    assert len(data["metrics"]) == 16
    for k, v in data["metrics"].items():
        assert abs(v["delta"]) < 1e-3, (k, v)
    assert data["worst_abs_delta_mm"] < 1e-3
