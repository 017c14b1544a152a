#!/usr/bin/env python
"""Measure service start-to-ready: cold vs warm persistent-compile-cache
(round-5 VERDICT #3).

docs/OPERATIONS.md claims restarts reuse compiled executables through the
persistent XLA compilation cache (``utils/backend.enable_compilation_cache``,
dir ``$PAFUSE_JAX_CACHE`` or ``~/.cache/pafuse_jax``).  This tool MEASURES
that claim: it launches ``python -m pafuse_tpu.cli.serve`` as a subprocess
twice against the SAME fresh cache directory — the first run compiles cold
and populates the cache, the second is the "restart" — and records, for
each run, the wall time from process start to the ``[serve] listening``
ready line plus the reported warmup seconds.

    python tools/measure_restart.py --flagship \
        --cache-dir /tmp/pafuse_restart_cache
    python tools/measure_restart.py --keep-cache   # re-time warm only

Writes RESTART_TIMING.json at the repo root by default.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def serve_args(a):
    base = [
        "serve.port=0",                  # ephemeral; we never connect
        f"serve.noise={a.noise}", f"serve.readback={a.readback}",
        f"serve.buckets=[{a.buckets}]",
    ]
    if a.op_points:
        pts = ",".join(f"'{p}'" for p in a.op_points.split(","))
        base.append(f"serve.op_points=[{pts}]")
    if a.flagship:
        base += ["ft2d.num_proposals=5", "ft2d.sampling_timesteps=2"]
    else:
        base += ["model.number_of_frames=9", "model.dep=1",
                 "ft2d.timestep=20", "ft2d.num_proposals=2",
                 "ft2d.sampling_timesteps=2"]
    return base


def one_run(a, label: str) -> dict:
    """Start the serve CLI, wait for the ready line, kill it; return the
    timing breakdown parsed from its output."""
    env = dict(os.environ)
    env["PAFUSE_JAX_CACHE"] = a.cache_dir
    # keep the tunneled backend importable (verify-skill gotcha)
    env["PYTHONPATH"] = (REPO + os.pathsep
                         + env.get("PYTHONPATH", "/root/.axon_site"))
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "pafuse_tpu.cli.serve"] + serve_args(a),
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    ready = warm_secs = None
    lines = []
    try:
        while True:
            line = proc.stdout.readline()
            if not line:
                break
            lines.append(line.rstrip())
            m = re.search(r"warm: compiled buckets .* in ([0-9.]+)s", line)
            if m:
                warm_secs = float(m.group(1))
            if "[serve] listening" in line:
                ready = time.time() - t0
                break
            if time.time() - t0 > a.timeout:
                break
    finally:
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()
    if ready is None:
        tail = "\n".join(lines[-15:])
        raise RuntimeError(
            f"{label}: no ready line within {a.timeout}s; output tail:\n"
            f"{tail}")
    out = {"start_to_ready_s": round(ready, 1),
           "warmup_compile_s": warm_secs}
    print(f"{label}: start-to-ready {out['start_to_ready_s']}s "
          f"(warmup {warm_secs}s)", flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true",
                    help="35M-param model at the production op-point")
    ap.add_argument("--op-points", default="",
                    help="comma tier list, e.g. 5x2,1x1 (the OPERATIONS "
                         "two-tier deployment)")
    ap.add_argument("--buckets", default="1,2,4,8,16")
    ap.add_argument("--noise", default="device")
    ap.add_argument("--readback", default="mean")
    ap.add_argument("--cache-dir", default="/tmp/pafuse_restart_cache")
    ap.add_argument("--keep-cache", action="store_true",
                    help="do not clear the cache first (warm timing only)")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "RESTART_TIMING.json"))
    a = ap.parse_args(argv)

    results = {"cache_dir": a.cache_dir,
               "config": {"flagship": a.flagship, "op_points": a.op_points,
                          "buckets": a.buckets, "noise": a.noise,
                          "readback": a.readback}}
    if not a.keep_cache:
        shutil.rmtree(a.cache_dir, ignore_errors=True)
        os.makedirs(a.cache_dir, exist_ok=True)
        results["cold"] = one_run(a, "cold")
    results["warm_restart"] = one_run(a, "warm_restart")
    if "cold" in results:
        results["speedup"] = round(results["cold"]["start_to_ready_s"]
                                   / results["warm_restart"]
                                   ["start_to_ready_s"], 2)
    cache_files = sum(len(fs) for _, _, fs in os.walk(a.cache_dir))
    results["cache_entries"] = cache_files
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
