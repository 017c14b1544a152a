#!/usr/bin/env python
"""Serving latency/throughput under concurrent load.

Builds a warm LiftingService in-process (no HTTP overhead; the HTTP layer
adds ~1 ms) and measures:

  1. single-request latency (sequential, per request-size class),
  2. throughput at N concurrent clients with dynamic batching ON vs OFF —
     the co-batching win is the ratio.

Timing ends at the host-side result of every request (the service's device
readback is the honest sync through tunneled backends).

    python tools/bench_serve.py                      # tiny model, quick
    python tools/bench_serve.py --flagship           # 35M params, P=5,T=2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def percentile(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true",
                    help="35M-param part-based model at the serving "
                         "op-point (P=5, T=2, rf=27)")
    ap.add_argument("--frames", type=int, default=None,
                    help="request length in frames (default: one window)")
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=24,
                    help="total requests per concurrency measurement")
    ap.add_argument("--buckets", default=None,
                    help="comma list; default 1,4 (covers 1 client and "
                         "co-batched rows)")
    ap.add_argument("--stream", action="store_true",
                    help="measure streaming sessions instead: per-frame "
                         "emit latency (1 stream) and aggregate emit rate "
                         "at --clients concurrent streams")
    a = ap.parse_args()

    import numpy as np
    import jax
    from pafuse_tpu import serve
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.ops.attention import (select_attention_fn,
                                          select_block_fn, select_layer_fn)

    if a.flagship:
        cfg = D3DPConfig(num_proposals=5, sampling_timesteps=2)
        dtype = (jax.numpy.bfloat16 if jax.devices()[0].platform != "cpu"
                 else jax.numpy.float32)
        model = D3DP(cfg, compute_dtype=dtype,
                     attention_fn=select_attention_fn("auto"),
                     block_fn=select_block_fn("auto"),
                     layer_fn=select_layer_fn("auto"))
    else:
        cfg = D3DPConfig(frames=9, timesteps=20, sampling_timesteps=2,
                         num_proposals=2, depth=1)
        model = D3DP(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rf = cfg.frames
    frames = a.frames or rf
    buckets = ([int(b) for b in a.buckets.split(",")] if a.buckets
               else [1, 4])

    rng = np.random.RandomState(0)
    kps = rng.randn(frames, cfg.num_kps, 2).astype(np.float32)

    results = {"model": "flagship" if a.flagship else "tiny",
               "frames_per_request": frames, "buckets": buckets,
               "clients": a.clients}

    if a.stream:
        # streaming: per-frame causal emits; co-batching across streams is
        # the scaling story, so buckets should cover 1..clients rows
        from concurrent.futures import ThreadPoolExecutor
        svc = serve.LiftingService(model, params, buckets=buckets,
                                   dynamic_batching=True)
        t0 = time.time()
        svc.warmup()
        results["warmup_seconds"] = round(time.time() - t0, 1)

        sess = serve.StreamingSession(svc, seed=0)
        lat = []
        for t in range(a.requests):
            t1 = time.perf_counter()
            sess.push(kps[t % frames])
            lat.append((time.perf_counter() - t1) * 1e3)
        results["stream_frame_ms"] = {
            "p50": round(percentile(lat, 50), 1),
            "p95": round(percentile(lat, 95), 1)}
        results["stream_emits_per_s_1"] = round(
            1e3 / (sum(lat) / len(lat)), 2)

        calls0 = svc.stats["batch_calls"]

        def run_stream(i):
            s = serve.StreamingSession(svc, seed=i)
            for t in range(a.requests):
                s.push(kps[t % frames])
        t0 = time.perf_counter()
        with ThreadPoolExecutor(a.clients) as ex:
            list(ex.map(run_stream, range(a.clients)))
        dt = time.perf_counter() - t0
        results["stream_emits_per_s_concurrent"] = round(
            a.clients * a.requests / dt, 2)
        results["coalesced_calls"] = int(svc.stats["batch_calls"] - calls0)
        results["stream_scaling"] = round(
            results["stream_emits_per_s_concurrent"]
            / results["stream_emits_per_s_1"], 2)
        svc._batcher.stop()
        print(json.dumps(results))
        return

    for batching in (True, False):
        svc = serve.LiftingService(model, params, buckets=buckets,
                                   dynamic_batching=batching)
        t0 = time.time()
        svc.warmup()
        if batching:
            results["warmup_seconds"] = round(time.time() - t0, 1)

        # sequential latency (batching has no effect without concurrency)
        lat = []
        for i in range(min(a.requests, 10)):
            t0 = time.perf_counter()
            svc.lift(kps, seed=i)
            lat.append((time.perf_counter() - t0) * 1e3)
        if batching:
            results["sequential_ms"] = {
                "p50": round(percentile(lat, 50), 1),
                "p95": round(percentile(lat, 95), 1)}

        # concurrent throughput
        from concurrent.futures import ThreadPoolExecutor
        t0 = time.perf_counter()
        with ThreadPoolExecutor(a.clients) as ex:
            list(ex.map(lambda i: svc.lift(kps, seed=i), range(a.requests)))
        dt = time.perf_counter() - t0
        key = "batched" if batching else "serialized"
        results[f"{key}_req_per_s"] = round(a.requests / dt, 2)
        if batching:
            results["coalesced_calls"] = int(svc.stats["batch_calls"]
                                             - len(buckets))  # minus warmup
        if svc._batcher is not None:
            svc._batcher.stop()

    b, s = results["batched_req_per_s"], results["serialized_req_per_s"]
    results["co_batching_speedup"] = round(b / s, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
