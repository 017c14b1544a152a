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


def pcts(xs, ndigits=1):
    """p50/p95/p99 dict in ms for a latency list (already in ms)."""
    return {f"p{p}": round(percentile(xs, p), ndigits)
            for p in (50, 95, 99)}


def run_paced_stream(serve_mod, svc, kps, fps, duration, seed=0,
                     op_point=None):
    """Drive one StreamingSession from a paced source at ``fps`` for
    ``duration`` seconds.  The client loop is the natural one: push every
    frame that has arrived since the last push returned (adaptive catch-up
    batching — ``push`` accepts (F, J, 2), so falling behind batches
    instead of queueing round trips).

    Returns (emit_lags_ms, push_sizes, emits_per_s): ``emit_lags_ms[i]`` is
    the wall time from frame i's ARRIVAL (source clock) to the push that
    carried it returning — the end-to-end freshness a live consumer sees."""
    import time as _t
    import numpy as np
    sess = serve_mod.StreamingSession(svc, seed=seed, op_point=op_point)
    n_total = int(round(duration * fps))
    t0 = _t.perf_counter()
    arrivals = t0 + np.arange(n_total) / fps
    nxt = 0
    lags, sizes = [], []
    while nxt < n_total:
        now = _t.perf_counter()
        avail = int(np.searchsorted(arrivals[nxt:], now, side="right"))
        if avail == 0:
            _t.sleep(max(0.0, arrivals[nxt] - now))
            continue
        frames = np.stack([kps[(nxt + i) % kps.shape[0]]
                           for i in range(avail)])
        sess.push(frames)
        done = _t.perf_counter()
        lags.extend((done - arrivals[nxt + i]) * 1e3 for i in range(avail))
        sizes.append(avail)
        nxt += avail
    emits_per_s = n_total / (_t.perf_counter() - t0)
    return lags, sizes, emits_per_s


def main(argv=None):
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
    ap.add_argument("--paced", type=float, default=0.0, metavar="FPS",
                    help="with --stream: drive each session from a PACED "
                         "source at FPS (e.g. 25); each push carries every "
                         "frame that arrived since the last push returned "
                         "(adaptive catch-up batching — the natural client "
                         "loop).  Reports per-frame EMIT LAG percentiles "
                         "(emit completion - frame arrival), sustained "
                         "emits/s and push-size distribution")
    ap.add_argument("--duration", type=float, default=10.0,
                    help="paced/mixed measurement length in seconds")
    ap.add_argument("--mixed-streams", type=int, default=0,
                    help="with --op-points: run N paced streaming clients "
                         "on the LAST tier concurrently with --clients "
                         "batch-lift clients on the FIRST tier for "
                         "--duration seconds; reports per-class "
                         "p50/p95/p99 (the HOL-blocking probe: tiers "
                         "never co-batch, so cross-tier interference is "
                         "dispatch-thread head-of-line blocking)")
    a = ap.parse_args(argv)

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
        tiers = ([t.strip() for t in a.op_points.split(",") if t.strip()]
                 if a.op_points else None)
        svc = serve.LiftingService(model, params, buckets=buckets,
                                   dynamic_batching=True,
                                   noise_mode=a.noise, readback=a.readback,
                                   op_points=tiers)
        t0 = time.time()
        svc.warmup()
        results["warmup_seconds"] = round(time.time() - t0, 1)

        if a.paced:
            # paced real-time envelope PER TIER: emit-lag distribution +
            # whether the session sustains the source rate with the
            # catch-up-batching client loop (single stream, then
            # --clients concurrent streams)
            results["paced_fps"] = a.paced
            results["duration_s"] = a.duration
            for tier in (tiers or [None]):
                key = tier or "default"
                lags, sizes, eps = run_paced_stream(
                    serve, svc, kps, a.paced, a.duration, seed=0,
                    op_point=tier)
                results[f"paced_1_{key}"] = {
                    "emit_lag_ms": pcts(lags),
                    "emits_per_s": round(eps, 2),
                    "push_size_p50": percentile(sizes, 50),
                    "push_size_max": max(sizes),
                    "realtime": eps >= 0.98 * a.paced and
                    percentile(sizes, 99) < a.paced,  # backlog << 1 s
                }
                if a.clients > 1:
                    from concurrent.futures import ThreadPoolExecutor as _T
                    with _T(a.clients) as ex:
                        outs = list(ex.map(
                            lambda i: run_paced_stream(
                                serve, svc, kps, a.paced, a.duration,
                                seed=i, op_point=tier),
                            range(a.clients)))
                    all_lags = [x for o in outs for x in o[0]]
                    results[f"paced_{a.clients}_{key}"] = {
                        "emit_lag_ms": pcts(all_lags),
                        "emits_per_s_total": round(
                            sum(o[2] for o in outs), 2),
                        "push_size_max": max(max(o[1]) for o in outs),
                        "realtime": all(
                            o[2] >= 0.98 * a.paced for o in outs),
                    }
            svc.close()
            print(json.dumps(results))
            return

        sess = serve.StreamingSession(svc, seed=0)
        lat = []
        for t in range(a.requests):
            t1 = time.perf_counter()
            sess.push(kps[t % frames])
            lat.append((time.perf_counter() - t1) * 1e3)
        results["stream_frame_ms"] = pcts(lat)
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
            results["tier_sequential_ms"][tier] = pcts(lat)

        if a.mixed_streams > 0:
            # two-class mixed load (the OPERATIONS deployment story):
            # --clients batch clients loop lifts on the FIRST tier while
            # --mixed-streams paced streaming clients run on the LAST tier.
            # Tiers never co-batch (different executables), so any
            # cross-class latency inflation here is dispatch/device
            # head-of-line blocking between tiers.
            from concurrent.futures import ThreadPoolExecutor as _TPE
            import threading as _th
            stop = _th.Event()
            batch_lat = []
            batch_done = [0]

            def batch_client(i):
                n = 0
                while not stop.is_set():
                    t1 = time.perf_counter()
                    svc.lift(kps, seed=i * 1000 + n, op_point=tiers[0])
                    batch_lat.append((time.perf_counter() - t1) * 1e3)
                    n += 1
                batch_done[0] += n

            fps = a.paced or 25.0
            t0 = time.perf_counter()
            with _TPE(a.clients + a.mixed_streams) as ex:
                stream_futs = [
                    ex.submit(run_paced_stream, serve, svc, kps, fps,
                              a.duration, seed=100 + i,
                              op_point=tiers[-1])
                    for i in range(a.mixed_streams)]
                batch_futs = [ex.submit(batch_client, i)
                              for i in range(a.clients)]
                stream_outs = [f.result() for f in stream_futs]
                stop.set()
                for f in batch_futs:
                    f.result()
            dt = time.perf_counter() - t0
            all_lags = [x for o in stream_outs for x in o[0]]
            results["mixed_load"] = {
                "batch_tier": tiers[0], "stream_tier": tiers[-1],
                "batch_clients": a.clients,
                "stream_clients": a.mixed_streams,
                "paced_fps": fps, "duration_s": round(dt, 1),
                "batch_ms": pcts(batch_lat),
                "batch_req_per_s": round(len(batch_lat) / dt, 2),
                "stream_emit_lag_ms": pcts(all_lags),
                "stream_emits_per_s_total": round(
                    sum(o[2] for o in stream_outs), 2),
                "stream_realtime": all(
                    o[2] >= 0.98 * fps for o in stream_outs),
            }

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
                results["sequential_ms"][str(size)] = dict(
                    pcts(lat),
                    frames_per_s=round(size * 1e3 / (sum(lat) / len(lat)),
                                       1))

            # concurrency sweep (co-batching on): throughput AND
            # per-request latency percentiles per level
            calls_before_sweep = int(svc.stats["batch_calls"])
            results["batched_sweep"] = {}
            for n_clients in sweep:
                rps, lat = concurrent_run(svc, n_clients, frames)
                results["batched_sweep"][str(n_clients)] = {
                    "req_per_s": rps,
                    "p50_ms": round(percentile(lat, 50), 1),
                    "p95_ms": round(percentile(lat, 95), 1),
                    "p99_ms": round(percentile(lat, 99), 1)}
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
