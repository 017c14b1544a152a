"""Serve the lifting model over HTTP: load + warm-compile once, then answer
2D->3D requests until stopped.

Production counterpart of the reference's batch-only in-the-wild script
(/root/reference/in_the_wild/h3wb_diffusion.py) — see ``pafuse_tpu/serve.py``
for the serving design (shape buckets, resident params, serialized device
access).

Usage:
    python -m pafuse_tpu.cli.serve general.evaluate=best_epoch.npz \
        ft2d.num_proposals=5 ft2d.sampling_timesteps=2 serve.port=8012

    curl -s localhost:8012/healthz
    curl -s -X POST localhost:8012/lift -d \
        '{"keypoints": [[[x, y], ...134 joints] ...frames],
          "width": 1000, "height": 1002, "world": true}'
"""

from __future__ import annotations

import os
import sys

from pafuse_tpu import config as cfg_mod


def build_service(args, warmup: bool = True):
    """Load checkpoint + construct a warm LiftingService from a config."""
    import jax
    from pafuse_tpu import checkpoints, serve
    from pafuse_tpu.cli.main_h3wb import build_model
    from pafuse_tpu.utils.backend import ensure_backend
    ensure_backend()

    model = build_model(args, is_train=False,
                        num_proposals=args.ft2d.num_proposals,
                        sampling_timesteps=args.ft2d.sampling_timesteps)
    params = model.init_params(jax.random.PRNGKey(0))

    chk = args.general.evaluate or args.general.resume
    if chk:
        chk_path = os.path.join(args.general.checkpoint, chk)
        if not os.path.exists(chk_path):
            chk_path = chk
        print(f"[serve] loading checkpoint {chk_path}")
        if chk_path.endswith(".bin"):
            restored = checkpoints.load_torch_checkpoint(
                chk_path, params, part_based=args.general.part_based_model)
        else:
            restored = checkpoints.load_state(chk_path, params)
        params = restored["params"]
    else:
        print("[serve] WARNING: no checkpoint (general.evaluate unset) — "
              "serving untrained weights")

    buckets = args.serve.buckets
    if isinstance(buckets, str):
        buckets = [int(b) for b in buckets.split(",") if b.strip()]
    def _mode(key):
        v = str(getattr(args.serve, key, "auto")).lower()
        if v in ("false", "none", "0"):  # YAML parses bare `off` as False
            v = "off"
        if v not in ("auto", "off"):
            raise ValueError(f"serve.{key} must be auto|off, got {v!r}")
        return v

    shard = _mode("shard")
    batching = _mode("batching")
    mesh = None
    if shard == "auto" and jax.device_count() > 1:
        # serving spans all local chips by default: window batches shard
        # over the data axis (tpu.mesh_shape), params replicated
        from pafuse_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(tuple(args.tpu.mesh_shape),
                         tuple(args.tpu.mesh_axis_names))
        print(f"[serve] sharding window batches over "
              f"{mesh.devices.size}-device mesh")
    noise_mode = str(getattr(args.serve, "noise", "host")).lower()
    readback = str(getattr(args.serve, "readback", "all")).lower()
    op_points = getattr(args.serve, "op_points", None)
    if isinstance(op_points, str):
        op_points = [t for t in op_points.split(",") if t.strip()]
    service = serve.LiftingService(
        model, params, buckets=buckets, mesh=mesh,
        dynamic_batching=(batching == "auto"),
        max_frames=int(getattr(args.serve, "max_frames", 100_000)),
        noise_mode=noise_mode, readback=readback,
        op_points=op_points or None)
    if warmup:
        secs = service.warmup()
        print(f"[serve] warm: compiled buckets {service.buckets} "
              f"in {secs:.1f}s")
    return service


def main(argv=None):
    args = cfg_mod.parse_cli(argv if argv is not None else sys.argv[1:])
    from pafuse_tpu import serve

    service = build_service(args)
    server = serve.make_http_server(service, host=args.serve.host,
                                    port=int(args.serve.port))
    host, port = server.server_address[:2]
    print(f"[serve] listening on http://{host}:{port}  "
          f"(P={args.ft2d.num_proposals}, T={args.ft2d.sampling_timesteps}, "
          f"rf={service.receptive_field})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
