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
    ap.add_argument("--sizes", default=None,
                    help="comma list of request sizes (frames) for the "
                         "sequential-latency ladder, e.g. 27,108,270 "
                         "(default: just --frames)")
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--clients-sweep", default=None,
                    help="comma list of concurrency levels for the batched "
                         "throughput/latency sweep, e.g. 1,4,16 "
                         "(default: just --clients)")
    ap.add_argument("--requests", type=int, default=24,
                    help="total requests per concurrency measurement")
    ap.add_argument("--buckets", default=None,
                    help="comma list; default 1,4 (covers 1 client and "
                         "co-batched rows)")
    ap.add_argument("--noise", default="host", choices=("host", "device"),
                    help="DDIM noise mode: host (default, bit-stable) or "
                         "device (per-window seeds, on-device generation)")
    ap.add_argument("--readback", default="all", choices=("all", "mean"),
                    help="hypothesis readback: all (default) or mean "
                         "(on-device aggregation, H-fold less readback)")
    ap.add_argument("--op-points", default=None,
                    help="comma list of PxT tiers served by ONE service "
                         "(first = default), e.g. 5x2,1x1; measures each "
                         "tier's sequential latency plus a mixed "
                         "--clients run split across tiers")
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
               "clients": a.clients, "noise": a.noise,
               "readback": a.readback}

    if a.stream:
        # streaming: per-frame causal emits; co-batching across streams is
        # the scaling story, so buckets should cover 1..clients rows
        from concurrent.futures import ThreadPoolExecutor
        svc = serve.LiftingService(model, params, buckets=buckets,
                                   dynamic_batching=True,
                                   noise_mode=a.noise, readback=a.readback)
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

    from concurrent.futures import ThreadPoolExecutor
    sizes = ([int(s) for s in a.sizes.split(",")] if a.sizes else [frames])
    sweep = ([int(c) for c in a.clients_sweep.split(",")]
             if a.clients_sweep else [a.clients])

    def concurrent_run(svc, n_clients, req_frames):
        """Run --requests lifts at n_clients concurrency; return
        (req/s, per-request latency list ms)."""
        req_kps = rng.randn(req_frames, cfg.num_kps, 2).astype(np.float32)
        lat = []

        def one(i):
            t1 = time.perf_counter()
            svc.lift(req_kps, seed=i)
            lat.append((time.perf_counter() - t1) * 1e3)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_clients) as ex:
            list(ex.map(one, range(a.requests)))
        dt = time.perf_counter() - t0
        return round(a.requests / dt, 2), lat

    if a.op_points:
        # multi-tier mode: ONE service, several (P, T) op-points over the
        # same resident params; per-tier sequential latency + a mixed
        # concurrent run with clients split round-robin across tiers
        tiers = [t.strip() for t in a.op_points.split(",") if t.strip()]
        svc = serve.LiftingService(model, params, buckets=buckets,
                                   noise_mode=a.noise, readback=a.readback,
                                   op_points=tiers)
        t0 = time.time()
        svc.warmup()
        results["op_points"] = tiers
        results["warmup_seconds"] = round(time.time() - t0, 1)
        results["tier_sequential_ms"] = {}
        for tier in tiers:
            lat = []
            for i in range(min(a.requests, 10)):
                t1 = time.perf_counter()
                svc.lift(kps, seed=i, op_point=tier)
                lat.append((time.perf_counter() - t1) * 1e3)
            results["tier_sequential_ms"][tier] = {
                "p50": round(percentile(lat, 50), 1),
                "p95": round(percentile(lat, 95), 1)}

        lat_by_tier = {t: [] for t in tiers}

        def one_mixed(i):
            tier = tiers[i % len(tiers)]
            t1 = time.perf_counter()
            svc.lift(kps, seed=i, op_point=tier)
            lat_by_tier[tier].append((time.perf_counter() - t1) * 1e3)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(a.clients) as ex:
            list(ex.map(one_mixed, range(a.requests)))
        dt = time.perf_counter() - t0
        results["mixed_req_per_s"] = round(a.requests / dt, 2)
        results["mixed_p50_ms"] = {
            t: round(percentile(ls, 50), 1) for t, ls in lat_by_tier.items()}
        svc.close()
        print(json.dumps(results))
        return

    for batching in (True, False):
        svc = serve.LiftingService(model, params, buckets=buckets,
                                   dynamic_batching=batching,
                                   noise_mode=a.noise, readback=a.readback)
        t0 = time.time()
        svc.warmup()
        if batching:
            results["warmup_seconds"] = round(time.time() - t0, 1)

            # sequential latency ladder (batching has no effect w/o
            # concurrency): one warm service, every request size
            results["sequential_ms"] = {}
            for size in sizes:
                req_kps = rng.randn(size, cfg.num_kps,
                                    2).astype(np.float32)
                lat = []
                for i in range(min(a.requests, 10)):
                    t1 = time.perf_counter()
                    svc.lift(req_kps, seed=i)
                    lat.append((time.perf_counter() - t1) * 1e3)
                results["sequential_ms"][str(size)] = {
                    "p50": round(percentile(lat, 50), 1),
                    "p95": round(percentile(lat, 95), 1),
                    "frames_per_s": round(
                        size * 1e3 / (sum(lat) / len(lat)), 1)}

            # concurrency sweep (co-batching on): throughput AND
            # per-request latency percentiles per level
            calls_before_sweep = int(svc.stats["batch_calls"])
            results["batched_sweep"] = {}
            for n_clients in sweep:
                rps, lat = concurrent_run(svc, n_clients, frames)
                results["batched_sweep"][str(n_clients)] = {
                    "req_per_s": rps,
                    "p50_ms": round(percentile(lat, 50), 1),
                    "p95_ms": round(percentile(lat, 95), 1)}
            results["batched_req_per_s"] = (
                results["batched_sweep"][str(a.clients)]["req_per_s"]
                if str(a.clients) in results["batched_sweep"]
                else list(results["batched_sweep"].values())[-1]
                ["req_per_s"])
            # device calls consumed by the whole sweep: co-batching shows
            # up as calls << requests (each call carries several requests)
            results["coalesced_calls"] = int(svc.stats["batch_calls"]
                                             - calls_before_sweep)
        else:
            # co-batching OFF: one A/B point at --clients
            rps, lat = concurrent_run(svc, a.clients, frames)
            results["serialized_req_per_s"] = rps
            results["serialized_p50_ms"] = round(percentile(lat, 50), 1)
            results["serialized_p95_ms"] = round(percentile(lat, 95), 1)
        if svc._batcher is not None:
            svc._batcher.stop()

    b, s = results["batched_req_per_s"], results["serialized_req_per_s"]
    results["co_batching_speedup"] = round(b / s, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
