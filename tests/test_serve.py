"""Serving subsystem: bucket selection, service-level lifting, HTTP surface.

The service wraps the same lifting pipeline as the in-the-wild CLI
(reference: in_the_wild/utils.py:322-376) behind a persistent warm process;
these tests run it end to end on the CPU backend with a tiny model.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from pafuse_tpu import serve
from pafuse_tpu.diffusion import D3DP, D3DPConfig

TINY = D3DPConfig(frames=9, num_kps=134, timesteps=20, sampling_timesteps=2,
                  num_proposals=2, depth=1)


@pytest.fixture(scope="module")
def service():
    import jax
    model = D3DP(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    svc = serve.LiftingService(model, params, buckets=(1, 2, 4))
    svc.warmup()
    return svc


def test_bucket_for():
    assert serve.bucket_for(1, (1, 4, 16)) == 1
    assert serve.bucket_for(3, (1, 4, 16)) == 4
    assert serve.bucket_for(4, (1, 4, 16)) == 4
    assert serve.bucket_for(17, (1, 4, 16)) == 16  # chunked at max bucket
    assert serve.bucket_for(2, (4,)) == 4
    with pytest.raises(ValueError):
        serve.LiftingService(None, None, buckets=())


def test_lift_shapes_and_determinism(service):
    rng = np.random.RandomState(0)
    kps = rng.randn(20, 134, 2).astype(np.float32)  # 20 frames -> 3 windows
    out = service.lift(kps, seed=7)
    assert out["poses"].shape == (20, 134, 3)
    assert np.all(np.isfinite(out["poses"]))
    assert out["num_frames"] == 20
    assert out["num_hypotheses"] == 2

    again = service.lift(kps, seed=7)
    np.testing.assert_array_equal(out["poses"], again["poses"])
    other = service.lift(kps, seed=8)
    assert np.abs(out["poses"] - other["poses"]).max() > 0

    full = service.lift(kps, seed=7, all_hypotheses=True)
    assert full["poses"].shape == (2, 20, 134, 3)
    np.testing.assert_allclose(full["poses"].mean(axis=0), out["poses"],
                               rtol=0, atol=1e-6)


def test_lift_pixel_input_and_world(service):
    rng = np.random.RandomState(1)
    kps_px = (rng.rand(5, 134, 2) * [640, 480]).astype(np.float32)
    out = service.lift(kps_px, width=640, height=480, world=True,
                       all_hypotheses=True)
    assert out["poses"].shape == (2, 5, 134, 3)
    # floor rebase over the full hypothesis tensor: min z is exactly 0
    # (h3wb_diffusion.py:143 semantics — rebase before the hypothesis mean)
    assert abs(float(out["poses"][..., 2].min())) < 1e-6


def test_lift_chunking_matches_single_bucket(service):
    """A request longer than the max bucket (chunked) must equal the same
    windows run unchunked — padding/chunking cannot change results."""
    import jax
    rng = np.random.RandomState(2)
    kps = rng.randn(9 * 6, 134, 2).astype(np.float32)  # 6 windows, max bucket 4
    out = service.lift(kps, seed=3)
    # same request through a service whose single bucket fits all 6 windows
    svc_big = serve.LiftingService(service.model, service.params, buckets=(6,))
    out_big = svc_big.lift(kps, seed=3)
    np.testing.assert_allclose(out["poses"], out_big["poses"], atol=2e-5)


def test_lift_input_validation(service):
    with pytest.raises(ValueError):
        service.lift(np.zeros((5, 134, 3), np.float32))  # not 2D keypoints
    with pytest.raises(ValueError):
        service.lift(np.zeros((5, 17, 2), np.float32))   # wrong joint count
    with pytest.raises(ValueError):
        service.lift(np.zeros((0, 134, 2), np.float32))  # zero frames
    with pytest.raises(ValueError):
        # half-specified resolution would skip pixel normalization silently
        service.lift(np.zeros((5, 134, 2), np.float32), width=640)
    with pytest.raises(ValueError):
        # per-request frame cap bounds host memory
        svc_small = serve.LiftingService(service.model, service.params,
                                         buckets=(1,), max_frames=10)
        svc_small.lift(np.zeros((11, 134, 2), np.float32))
    health = service.health()
    assert health["status"] == "ok"
    assert health["errors"] == 0  # validation rejects happen outside lift


def test_http_server(service):
    server = serve.make_http_server(service, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["buckets"] == [1, 2, 4]

        kps = np.zeros((3, 134, 2), np.float32).tolist()
        body = json.dumps({"keypoints": kps, "width": 640, "height": 480,
                           "seed": 1}).encode()
        req = urllib.request.Request(f"{base}/lift", data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["shape"] == [3, 134, 3]
        poses = np.asarray(out["poses"], np.float32)
        assert poses.shape == (3, 134, 3)
        assert np.all(np.isfinite(poses))

        # malformed request -> 400, server stays up
        bad = urllib.request.Request(f"{base}/lift", data=b'{"keypoints": 1}',
                                     headers={"Content-Type":
                                              "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert ei.value.code == 404

        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["requests"] >= 1

        # Prometheus text exposition mirrors the numeric health counters
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            metrics = r.read().decode()
        assert "# TYPE pafuse_requests counter" in metrics
        assert f"pafuse_requests {health['requests']}" in metrics
        assert "pafuse_mesh_devices 1" in metrics
    finally:
        server.shutdown()
        server.server_close()


def test_mesh_sharded_service_matches_single_device(service):
    """A service sharding its window batches over the 8-device mesh must
    return the same poses as the single-device service (same host-keyed
    noise; only the execution layout differs)."""
    import jax
    from pafuse_tpu.parallel.mesh import make_mesh
    mesh = make_mesh((8,), ("data",), devices=jax.devices()[:8])
    svc = serve.LiftingService(service.model, service.params,
                               buckets=(2,), mesh=mesh)
    assert svc.buckets == (8,)  # rounded up to a device-count multiple
    assert svc.health()["mesh_devices"] == 8
    rng = np.random.RandomState(4)
    kps = rng.randn(9 * 3, 134, 2).astype(np.float32)  # 3 windows
    out_mesh = svc.lift(kps, seed=11)
    out_single = service.lift(kps, seed=11)
    np.testing.assert_allclose(out_mesh["poses"], out_single["poses"],
                               atol=2e-5)


def test_dynamic_batcher_coalesces_and_matches(service):
    """Queued concurrent requests are concatenated into ONE sampler call and
    each gets exactly its own rows back (same values as a direct run)."""
    rng = np.random.RandomState(5)
    reqs = [service._request_arrays(
                rng.randn(w, 9, 134, 2).astype(np.float32),
                rng.randn(w, 9, 134, 2).astype(np.float32), seed=i)
            for i, w in enumerate([1, 2, 1])]
    direct = [service._device_run(*r) for r in reqs]

    calls0 = service.stats["batch_calls"]
    b = serve._DynamicBatcher(service, autostart=False)
    futures = [b.submit(r) for r in reqs]     # all queued before dispatch
    b._thread.start()
    outs = [f.result(timeout=300) for f in futures]
    b.stop()
    assert service.stats["batch_calls"] == calls0 + 1   # one coalesced call
    for out, ref in zip(outs, direct):
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_device_dispatch_returns_bucket_shape(service):
    """`_device_dispatch` must return the BUCKET-shaped device array, not a
    valid-row slice: a device-side `out[:n]` re-specializes on every distinct
    coalesced row count, and through a tunneled backend each new shape is a
    remote cold compile (measured 11 s p95 stalls at 4 concurrent clients).
    Valid rows are sliced on the host after readback (`_DynamicBatcher._resolve`)."""
    rng = np.random.RandomState(11)
    for n, bucket in [(1, 1), (3, 4), (4, 4)]:
        arrs = service._request_arrays(
            rng.randn(n, 9, 134, 2).astype(np.float32),
            rng.randn(n, 9, 134, 2).astype(np.float32), seed=n)
        out = service._device_dispatch(*arrs)
        assert out.shape[0] == bucket
        # the valid front rows match the (host-sliced) chunked path
        np.testing.assert_allclose(np.asarray(out)[:n],
                                   service._device_run(*arrs), atol=2e-5)


def test_concurrent_lifts_match_sequential(service):
    """Racing lift() calls through the service's own batcher must return the
    same poses as sequential calls (co-batching changes layout only)."""
    import concurrent.futures as cf
    assert service.health()["dynamic_batching"] is True
    rng = np.random.RandomState(6)
    kps = [rng.randn(9 * w, 134, 2).astype(np.float32) for w in (1, 2, 1, 3)]
    seq = [service.lift(k, seed=i)["poses"] for i, k in enumerate(kps)]
    with cf.ThreadPoolExecutor(4) as ex:
        par = list(ex.map(lambda ik: service.lift(ik[1], seed=ik[0])["poses"],
                          enumerate(kps)))
    for a, b in zip(seq, par):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_build_service_from_config(tmp_path, monkeypatch):
    """CLI-level construction: config -> model -> warm service (no ckpt)."""
    from pafuse_tpu import config as cfg_mod
    from pafuse_tpu.cli.serve import build_service
    args = cfg_mod.load_config(overrides=[
        "model.number_of_frames=9", "model.dep=1", "ft2d.timestep=20",
        "ft2d.num_proposals=2", "ft2d.sampling_timesteps=2",
        "serve.buckets=[1,2]", "serve.shard=off",
    ])
    svc = build_service(args, warmup=False)
    assert svc.buckets == (1, 2)
    assert svc.mesh is None
    assert svc.health()["dynamic_batching"] is True  # serve.batching default
    assert svc.max_frames == 100_000                 # serve.max_frames default
    assert svc.readback == "all"                     # serve.readback default

    args_mean = cfg_mod.load_config(overrides=[
        "model.number_of_frames=9", "model.dep=1", "ft2d.timestep=20",
        "ft2d.num_proposals=2", "ft2d.sampling_timesteps=2",
        "serve.buckets=[1,2]", "serve.shard=off", "serve.readback=mean",
    ])
    assert build_service(args_mean, warmup=False).readback == "mean"

    args_off = cfg_mod.load_config(overrides=[
        "model.number_of_frames=9", "model.dep=1", "ft2d.timestep=20",
        "ft2d.num_proposals=2", "ft2d.sampling_timesteps=2",
        "serve.buckets=[1,2]", "serve.shard=off", "serve.batching=off",
    ])
    svc_off = build_service(args_off, warmup=False)
    assert svc_off.health()["dynamic_batching"] is False
    out = svc_off.lift(np.zeros((4, 134, 2), np.float32))
    assert out["poses"].shape == (4, 134, 3)
    out = svc.lift(np.zeros((4, 134, 2), np.float32))
    assert out["poses"].shape == (4, 134, 3)

    # serve.shard=auto (default) spans the 8-device test mesh
    args2 = cfg_mod.load_config(overrides=[
        "model.number_of_frames=9", "model.dep=1", "ft2d.timestep=20",
        "ft2d.num_proposals=2", "ft2d.sampling_timesteps=2",
        "serve.buckets=[1,2]",
    ])
    svc2 = build_service(args2, warmup=False)
    assert svc2.mesh is not None
    assert svc2.health()["mesh_devices"] == 8
    assert svc2.buckets == (8,)  # 1 and 2 both round up to 8


# ---------------------------------------------------------------------------
# Streaming sessions (causal real-time lifting)
# ---------------------------------------------------------------------------

def test_streaming_final_emit_matches_batch_lift(service):
    """After pushing exactly rf frames (fixed noise, delay=0), the last
    streaming emit must equal the batch lift of the same rf-frame sequence
    at its final frame: the trailing window IS the batch request's single
    window, and fixed-mode noise IS the request's window-0 draw."""
    rng = np.random.RandomState(7)
    rf = service.receptive_field
    kps = rng.randn(rf, 134, 2).astype(np.float32)

    sess = serve.StreamingSession(service, seed=3)
    emits = [sess.push(kps[t])["poses"][0] for t in range(rf)]
    batch = service.lift(kps, seed=3)["poses"]
    np.testing.assert_allclose(emits[-1], batch[-1], atol=2e-5)
    assert sess.frames_pushed == rf

    # delayed emit corresponds to an earlier frame of the same window
    sess_d = serve.StreamingSession(service, seed=3, delay=2)
    out = None
    for t in range(rf):
        out = sess_d.push(kps[t])
    assert out["frame_indices"] == [rf - 1 - 2]
    np.testing.assert_allclose(out["poses"][0], batch[rf - 1 - 2], atol=2e-5)


def test_streaming_multi_frame_push_matches_per_frame(service):
    """Pushing F frames in one call (windows batched into one sampler call)
    must emit the same poses as pushing them one at a time."""
    rng = np.random.RandomState(8)
    kps = rng.randn(6, 134, 2).astype(np.float32)

    one = serve.StreamingSession(service, seed=1)
    per = np.concatenate([one.push(k)["poses"] for k in kps])
    many = serve.StreamingSession(service, seed=1).push(kps)
    np.testing.assert_allclose(many["poses"], per, atol=2e-5)
    assert many["frame_indices"] == list(range(6))

    # fixed noise: identical trailing windows -> identical poses
    const = serve.StreamingSession(service, seed=1)
    a = const.push(kps[0])["poses"]
    b = const.push(kps[0])["poses"]  # history now [f0, f0] -> same window
    np.testing.assert_allclose(a, b, atol=2e-5)

    # per-frame noise: same window, different draw per t
    varied = serve.StreamingSession(service, seed=1, per_frame_noise=True)
    a = varied.push(kps[0])["poses"]
    b = varied.push(kps[0])["poses"]
    assert np.abs(a - b).max() > 0
    # ...but reproducible for the same (seed, t) in a fresh session
    again = serve.StreamingSession(service, seed=1, per_frame_noise=True)
    np.testing.assert_array_equal(again.push(kps[0])["poses"], a)


def test_streaming_validation_and_stats(service):
    with pytest.raises(ValueError):
        serve.StreamingSession(service, delay=service.receptive_field)
    with pytest.raises(ValueError):
        serve.StreamingSession(service, width=640)  # height missing
    sess = serve.StreamingSession(service)
    with pytest.raises(ValueError):
        sess.push(np.zeros((17, 2), np.float32))    # wrong joint count
    with pytest.raises(ValueError):
        sess.push(np.zeros((134, 3), np.float32))   # not 2D keypoints
    before = service.health()["stream_frames"]
    sess.push(np.zeros((134, 2), np.float32))
    health = service.health()
    assert health["stream_frames"] == before + 1
    assert health["stream_sessions"] >= 1


def test_streaming_world_floor_is_causal(service):
    """World-mode rebases z against the running minimum: z >= 0 always, and
    the floor only moves down (early frames can't see future minima)."""
    rng = np.random.RandomState(9)
    sess = serve.StreamingSession(service, seed=2, world=True,
                                  all_hypotheses=True)
    for t in range(4):
        out = sess.push(rng.randn(134, 2).astype(np.float32))
        assert float(out["poses"][..., 2].min()) >= -1e-6


def test_http_stream_endpoints(service):
    server = serve.make_http_server(service, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, payload):
        req = urllib.request.Request(
            f"{base}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        made = post("/stream", {"seed": 5, "delay": 1})
        sid = made["session"]
        assert made["receptive_field"] == service.receptive_field
        assert made["delay"] == 1

        kps = np.zeros((134, 2), np.float32).tolist()
        out = post(f"/stream/{sid}", {"keypoints": kps})
        assert out["shape"] == [1, 134, 3]
        assert out["frame_indices"] == [0]

        # multi-frame push through the same session
        kps3 = np.zeros((3, 134, 2), np.float32).tolist()
        out = post(f"/stream/{sid}", {"keypoints": kps3})
        assert out["shape"] == [3, 134, 3]

        # close; a second delete and a push to the dead session 404
        req = urllib.request.Request(f"{base}/stream/{sid}", method="DELETE")
        with urllib.request.urlopen(req, timeout=30) as r:
            closed = json.loads(r.read())
        assert closed == {"closed": True, "frames": 4}
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(f"/stream/{sid}", {"keypoints": kps})
        assert ei.value.code == 404

        # malformed create -> 400, server stays alive
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/stream", {"delay": 99})
        assert ei.value.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()


def test_http_stream_idle_eviction(service):
    server = serve.make_http_server(service, port=0, stream_idle_timeout=0.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, payload):
        req = urllib.request.Request(
            f"{base}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        sid = post("/stream", {})["session"]
        import time as _time
        _time.sleep(0.01)
        post("/stream", {})  # creation sweeps idle sessions
        with pytest.raises(urllib.error.HTTPError) as ei:
            post(f"/stream/{sid}",
                 {"keypoints": np.zeros((134, 2), np.float32).tolist()})
        assert ei.value.code == 404
    finally:
        server.shutdown()
        server.server_close()


# ---------------------------------------------------------------------------
# Device-noise mode (round 4): per-window seeds travel instead of noise
# tensors; same determinism contract, different noise universe.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def device_noise_service():
    import jax
    model = D3DP(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    svc = serve.LiftingService(model, params, buckets=(1, 2, 4),
                               noise_mode="device")
    svc.warmup()
    return svc


def test_device_noise_determinism_and_chunk_invariance(device_noise_service):
    svc = device_noise_service
    rng = np.random.RandomState(3)
    kps = rng.randn(20, 134, 2).astype(np.float32)  # 3 windows
    out = svc.lift(kps, seed=7)
    assert out["poses"].shape == (20, 134, 3)
    assert np.all(np.isfinite(out["poses"]))
    np.testing.assert_array_equal(out["poses"],
                                  svc.lift(kps, seed=7)["poses"])
    assert np.abs(out["poses"] - svc.lift(kps, seed=8)["poses"]).max() > 0

    # chunk/bucket invariance: the same request through a buckets=(1,)
    # service (3 chunked bucket-1 calls) gives the same noise draws —
    # a window's noise depends only on (seed, window index)
    import jax
    svc1 = serve.LiftingService(svc.model, svc.params, buckets=(1,),
                                noise_mode="device")
    np.testing.assert_allclose(svc1.lift(kps, seed=7)["poses"],
                               out["poses"], rtol=0, atol=2e-5)
    svc1._batcher.stop()


def test_device_noise_streaming_matches_batch(device_noise_service):
    """Full-buffer streaming emit == batch lift window-0, as in host mode."""
    svc = device_noise_service
    rf = svc.receptive_field
    rng = np.random.RandomState(4)
    kps = rng.randn(rf, 134, 2).astype(np.float32)
    batch = svc.lift(kps, seed=5)["poses"]
    sess = serve.StreamingSession(svc, seed=5)
    last = None
    for t in range(rf):
        last = sess.push(kps[t])
    # last emitted pose == batch lift's final frame (same window, same seed)
    np.testing.assert_allclose(last["poses"][0], batch[-1], atol=2e-5)


def test_device_noise_per_frame_streaming(device_noise_service):
    svc = device_noise_service
    rng = np.random.RandomState(5)
    kps = rng.randn(4, 134, 2).astype(np.float32)
    s1 = serve.StreamingSession(svc, seed=9, per_frame_noise=True)
    s2 = serve.StreamingSession(svc, seed=9, per_frame_noise=True)
    for t in range(4):
        a = s1.push(kps[t])["poses"]
        b = s2.push(kps[t])["poses"]
        np.testing.assert_array_equal(a, b)  # reproducible per (seed, t)


def test_window_seeds_keying():
    s = serve.LiftingService._window_seeds
    a = s(4, seed=1)
    assert a.dtype == np.uint32 and a.shape == (4,)
    assert len(set(a.tolist())) == 4           # distinct per window
    np.testing.assert_array_equal(a, s(4, seed=1))
    assert set(s(4, seed=2).tolist()) != set(a.tolist())
    # absolute-index keying: base offset reproduces the same suffix
    np.testing.assert_array_equal(s(2, seed=1, base=2), a[2:])
    # salts separate stream draws from batch draws
    assert s(4, seed=1, salt=0x51AE).tolist() != a.tolist()


def test_invalid_noise_mode():
    with pytest.raises(ValueError, match="noise_mode"):
        serve.LiftingService(None, None, noise_mode="banana")


@pytest.fixture(scope="module")
def mean_readback_service(service):
    svc = serve.LiftingService(service.model, service.params,
                               buckets=(1, 2, 4), readback="mean")
    svc.warmup()
    yield svc
    if svc._batcher is not None:
        svc._batcher.stop()


def test_mean_readback_matches_host_mean(service, mean_readback_service):
    """Device-side hypothesis aggregation == the default host-side mean.

    Stitching assigns each output frame from exactly one window, so the mean
    commutes with it; only the reduction arithmetic differs (device f32 sum
    vs numpy pairwise), hence the tiny tolerance.
    """
    rng = np.random.RandomState(3)
    for frames in (5, 20):  # sub-window and multi-window requests
        kps = rng.randn(frames, 134, 2).astype(np.float32)
        ref = service.lift(kps, seed=7)["poses"]
        got = mean_readback_service.lift(kps, seed=7)["poses"]
        assert got.shape == (frames, 134, 3)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_mean_readback_rejects_all_hypotheses(mean_readback_service):
    kps = np.zeros((5, 134, 2), np.float32)
    with pytest.raises(ValueError, match="all_hypotheses"):
        mean_readback_service.lift(kps, all_hypotheses=True)
    with pytest.raises(ValueError, match="all_hypotheses"):
        serve.StreamingSession(mean_readback_service, all_hypotheses=True)
    with pytest.raises(ValueError, match="readback"):
        serve.LiftingService(None, None, readback="median")


def test_mean_readback_streaming_and_health(service, mean_readback_service):
    svc = mean_readback_service
    rng = np.random.RandomState(4)
    kps = rng.randn(4, 134, 2).astype(np.float32)
    s_mean = serve.StreamingSession(svc, seed=9)
    s_all = serve.StreamingSession(service, seed=9)
    for t in range(4):
        a = s_mean.push(kps[t])["poses"]
        b = s_all.push(kps[t])["poses"]
        assert a.shape == (1, 134, 3)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
    assert svc.health()["readback"] == "mean"
    assert service.health()["readback"] == "all"


# ---------------------------------------------------------------------------
# Multi-op-point tiers (one process, shared params, per-tier executables)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiered_service(service):
    svc = serve.LiftingService(service.model, service.params,
                               buckets=(1, 2),
                               op_points=[(2, 2), "1x1"])
    svc.warmup()
    yield svc
    svc.close()


def test_op_point_normalization_and_validation(service, tiered_service):
    assert tiered_service.op_points == ((2, 2), (1, 1))
    assert tiered_service.default_op_point == (2, 2)
    assert tiered_service.health()["op_points"] == ["2x2", "1x1"]
    # single-tier service defaults to the model config's (P, T)
    assert service.op_points == ((2, 2),)
    with pytest.raises(ValueError, match="not served"):
        tiered_service.lift(np.zeros((5, 134, 2), np.float32),
                            op_point="3x1")
    with pytest.raises(ValueError, match=">= 1"):
        serve.LiftingService(service.model, service.params,
                             op_points=[(0, 1)])


def test_tier_matches_dedicated_service(service, tiered_service):
    """A tier must produce exactly what a service configured with that
    op-point alone produces (P/T call overrides == construction-time P/T),
    and the default tier must match the plain single-tier service."""
    import jax
    from pafuse_tpu.diffusion import D3DP
    rng = np.random.RandomState(11)
    kps = rng.randn(12, 134, 2).astype(np.float32)

    ref_default = service.lift(kps, seed=3)
    got_default = tiered_service.lift(kps, seed=3)
    np.testing.assert_allclose(got_default["poses"], ref_default["poses"],
                               rtol=0, atol=1e-6)
    assert got_default["num_hypotheses"] == 2

    import dataclasses
    cfg11 = dataclasses.replace(TINY, num_proposals=1, sampling_timesteps=1)
    model11 = D3DP(cfg11)
    svc11 = serve.LiftingService(model11, service.params, buckets=(1, 2))
    ref_11 = svc11.lift(kps, seed=3)
    got_11 = tiered_service.lift(kps, seed=3, op_point="1x1")
    np.testing.assert_allclose(got_11["poses"], ref_11["poses"],
                               rtol=0, atol=1e-6)
    assert got_11["num_hypotheses"] == 1
    svc11.close()
    # the two tiers genuinely differ (different H/S universes)
    assert np.abs(got_11["poses"] - got_default["poses"]).max() > 0


def test_tiers_do_not_mix_under_concurrency(tiered_service):
    """Concurrent requests at different tiers co-batch only within their
    own tier and reproduce the sequential results exactly."""
    from concurrent.futures import ThreadPoolExecutor
    rng = np.random.RandomState(12)
    kps = [rng.randn(9, 134, 2).astype(np.float32) for _ in range(6)]
    pts = [None, "1x1"] * 3
    seq = [tiered_service.lift(k, seed=i, op_point=p)["poses"]
           for i, (k, p) in enumerate(zip(kps, pts))]
    with ThreadPoolExecutor(6) as ex:
        conc = list(ex.map(
            lambda t: tiered_service.lift(kps[t], seed=t,
                                          op_point=pts[t])["poses"],
            range(6)))
    for s, c in zip(seq, conc):
        np.testing.assert_allclose(c, s, rtol=0, atol=2e-5)


def test_streaming_op_point(tiered_service):
    rng = np.random.RandomState(13)
    kps = rng.randn(3, 134, 2).astype(np.float32)
    s = serve.StreamingSession(tiered_service, seed=5, op_point=(1, 1))
    out = s.push(kps)
    assert out["poses"].shape == (3, 134, 3)
    assert out["num_hypotheses"] == 1
    with pytest.raises(ValueError, match="not served"):
        serve.StreamingSession(tiered_service, op_point="9x9")


def test_mesh_tiered_and_streaming_match_single_device(service,
                                                       tiered_service):
    """Round-5 multi-chip surface: op-point tiers and streaming sessions
    must behave identically when the service spans a multi-device mesh —
    tiered lifts and per-frame streaming emits on the 8-device data mesh
    equal the single-device tiered service's results (host-keyed per-window
    noise makes results bucket/padding invariant, so the mesh's rounded-up
    buckets cannot leak in)."""
    import jax
    from pafuse_tpu.parallel.mesh import make_mesh
    mesh = make_mesh((8,), ("data",), devices=jax.devices()[:8])
    svc = serve.LiftingService(service.model, service.params,
                               buckets=(2,), mesh=mesh,
                               op_points=[(2, 2), "1x1"])
    assert svc.health()["mesh_devices"] == 8
    assert svc.health()["op_points"] == ["2x2", "1x1"]
    rng = np.random.RandomState(31)
    kps = rng.randn(12, 134, 2).astype(np.float32)
    for pt in (None, "1x1"):
        got = svc.lift(kps, seed=3, op_point=pt)
        ref = tiered_service.lift(kps, seed=3, op_point=pt)
        np.testing.assert_allclose(got["poses"], ref["poses"],
                                   rtol=0, atol=2e-5, err_msg=str(pt))
    # streaming over the mesh == single-device streaming, frame by frame
    frames = rng.randn(4, 134, 2).astype(np.float32)
    s_mesh = serve.StreamingSession(svc, seed=5, op_point=(1, 1))
    s_one = serve.StreamingSession(tiered_service, seed=5, op_point=(1, 1))
    for f in frames:
        np.testing.assert_allclose(s_mesh.push(f)["poses"],
                                   s_one.push(f)["poses"],
                                   rtol=0, atol=2e-5)
    svc.close()


def test_fast_path_device_noise_mean_readback(service):
    """The recommended production combination (serve.noise=device +
    serve.readback=mean) must equal the device-noise service's host-side
    hypothesis mean."""
    svc_all = serve.LiftingService(service.model, service.params,
                                   buckets=(1, 2), noise_mode="device")
    svc_fast = serve.LiftingService(service.model, service.params,
                                    buckets=(1, 2), noise_mode="device",
                                    readback="mean")
    rng = np.random.RandomState(21)
    kps = rng.randn(12, 134, 2).astype(np.float32)
    ref = svc_all.lift(kps, seed=4)["poses"]
    got = svc_fast.lift(kps, seed=4)["poses"]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
    assert svc_fast.health()["noise_mode"] == "device"
    assert svc_fast.health()["readback"] == "mean"
    svc_all.close()
    svc_fast.close()


def test_params_are_device_committed_from_numpy(service):
    """Checkpoint loaders hand back host-numpy trees; a numpy pytree fed
    to a jitted sampler re-transfers EVERY leaf on EVERY call (measured
    6.4 s per 27-frame lift through the tunneled backend, round-5
    live-demo wedge).  The service must commit params to the device once
    at construction — and produce identical results from numpy input."""
    import numpy as np
    import jax
    np_params = jax.tree.map(lambda a: np.asarray(a), service.params)
    assert all(isinstance(leaf, np.ndarray)
               for leaf in jax.tree.leaves(np_params))
    svc2 = serve.LiftingService(service.model, np_params, buckets=(1, 2))
    try:
        assert all(isinstance(leaf, jax.Array)
                   for leaf in jax.tree.leaves(svc2.params))
        kps = np.random.RandomState(3).rand(5, 134, 2).astype(np.float32)
        a = service.lift(kps, seed=7)["poses"]
        b = svc2.lift(kps, seed=7)["poses"]
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    finally:
        svc2.close()
