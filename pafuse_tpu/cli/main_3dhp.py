"""MPI-INF-3DHP 17-joint body-only train/eval entry point.

Rebuild of the reference's orphaned 3DHP stack (diffusionpose_3dhp.py +
generators_3dhp.py) as a working model family sharing all H3WB
infrastructure: monolithic MixSTE2 denoiser, millimeter scaling, per-frame
validity masks in eval.

Usage:
    python -m pafuse_tpu.cli.main_3dhp model.epochs=5 model.cs=288
"""

from __future__ import annotations

import os
import sys
from time import time

import numpy as np

from pafuse_tpu import config as cfg_mod


def build_model_3dhp(args, *, is_train: bool, num_proposals: int = 1,
                     sampling_timesteps: int = 1):
    import jax.numpy as jnp
    from pafuse_tpu import skeleton as sk
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.ops.attention import (select_attention_fn, select_block_fn, select_block_t_fn, select_layer_fn)

    from pafuse_tpu.ops.attention import set_experimental_kernels
    set_experimental_kernels(
        True if str(getattr(args.tpu, "experimental_kernels", False)
                    ).lower() in ("true", "1", "on", "yes") else None)
    cfg = D3DPConfig(
        frames=args.model.number_of_frames,
        num_kps=sk.NUM_JOINTS_3DHP,
        timesteps=args.ft2d.timestep,
        sampling_timesteps=sampling_timesteps,
        num_proposals=num_proposals,
        scale=args.ft2d.scale,
        depth=args.model.dep,
        input_size=args.model.input_size,
        cs=args.model.cs,
        part_based=False,
        mm_scale=True,
        drop_path_rate=0.1 if is_train else 0.0,
        # the reference PARSES model.dropout but never forwards it into
        # MixSTE2 (diffusionpose.py:140-153 passes no drop_rate) — a dead
        # knob there; here it drives real MLP/proj/attn dropout, matching
        # the module's documented hooks (mixste.py:35,56-59,73).  The
        # default 0.0 is bit-identical to the reference's behavior.
        dropout=float(args.model.dropout) if is_train else 0.0,
        test_time_augmentation=args.model.test_time_augmentation,
    )
    compute_dtype = (jnp.bfloat16 if args.tpu.compute_dtype == "bfloat16"
                     else jnp.float32)
    from pafuse_tpu.ops.block_grad import select_train_block_fn
    return D3DP(cfg, flip_permutation=sk.FLIP_PERMUTATION_3DHP,
                compute_dtype=compute_dtype,
                attention_fn=select_attention_fn(args.tpu.use_pallas,
                                                 train=is_train),
                block_fn=select_block_fn(args.tpu.use_pallas,
                                         train=is_train),
                layer_fn=select_layer_fn(args.tpu.use_pallas,
                                         train=is_train),
                block_t_fn=select_block_t_fn(args.tpu.use_pallas,
                                             train=is_train),
                train_block_fn=select_train_block_fn(
                    getattr(args.tpu, "train_kernel", "auto"),
                    train=is_train))


def evaluate_3dhp(model, params, test_data, args, rng=None,
                  num_proposals=1, sampling_timesteps=1):
    """Masked multi-hypothesis eval (mpjpe_diffusion_3dhp semantics)."""
    import jax
    import jax.numpy as jnp
    from pafuse_tpu import losses
    from pafuse_tpu.data import windows as win

    rf = args.model.number_of_frames
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    @jax.jit
    def sample(params, key, x2d, x2d_flip):
        return model.eval_forward(params, key, x2d, x2d_flip,
                                  num_proposals=num_proposals,
                                  sampling_timesteps=sampling_timesteps)

    # one padded window-batch shape for every sequence (pow-2 bucket of the
    # largest): a single jit specialization instead of one per sequence
    # length; padded windows carry valid=0 so the masked metric ignores them
    bs = 1
    for arrs in test_data.values():
        nw = max(1, -(-arrs["data_2d"].shape[0] // rf))
        bs = max(bs, nw)
    bs = 1 << (bs - 1).bit_length()

    total_err = None
    total_err_agg = None
    n = 0
    for seq_name, arrs in test_data.items():
        p2, p3, valid = arrs["data_2d"], arrs["data_3d"], arrs["valid"]
        flip = p2.copy()
        flip[..., 0] *= -1
        flip = flip[:, model.flip_permutation]
        w2d, w3d = win.eval_data_prepare(rf, p2, p3)
        wflip, _ = win.eval_data_prepare(rf, flip)
        idx = win.window_indices(p2.shape[0], rf)
        wvalid = valid[idx]

        pad = bs - w2d.shape[0]
        if pad > 0:
            zpad = lambda a: np.concatenate(  # noqa: E731
                [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            w2d, wflip, w3d = zpad(w2d), zpad(wflip), zpad(w3d)
            wvalid = zpad(wvalid.astype(np.float32))

        rng, sub = jax.random.split(rng)
        preds = sample(params, sub, jnp.asarray(w2d), jnp.asarray(wflip))
        err = np.asarray(losses.mpjpe_diffusion_3dhp(
            preds, jnp.asarray(w3d), jnp.asarray(wvalid)))
        err_agg = np.asarray(losses.mpjpe_diffusion_3dhp(
            preds, jnp.asarray(w3d), jnp.asarray(wvalid), mean_pos=True))
        weight = int(wvalid.sum())
        total_err = err * weight if total_err is None else total_err + err * weight
        total_err_agg = (err_agg * weight if total_err_agg is None
                         else total_err_agg + err_agg * weight)
        n += weight
        if args.ft2d.debug:
            break
    return total_err / max(n, 1), total_err_agg / max(n, 1)


def main(argv=None):
    args = cfg_mod.parse_cli(argv if argv is not None else sys.argv[1:])
    if not args.general.checkpoint:
        args.general.checkpoint = "checkpoint_3dhp"
    os.makedirs(args.general.checkpoint, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from pafuse_tpu import checkpoints, train as tr
    from pafuse_tpu.data import dhp3, sampling
    from pafuse_tpu import skeleton as sk
    from pafuse_tpu.utils.backend import ensure_backend
    ensure_backend()

    print("Loading 3DHP dataset...")
    train_data, test_data = dhp3.load_dataset(args.data.data_dir,
                                              args.data.synthetic)
    model_train = build_model_3dhp(args, is_train=True)
    model_eval = build_model_3dhp(
        args, is_train=False, num_proposals=args.ft2d.num_proposals,
        sampling_timesteps=args.ft2d.sampling_timesteps)
    state, tx = tr.create_train_state(model_train, seed=args.tpu.seed)
    print(f"INFO: Trainable parameter count: "
          f"{model_train.model.param_count(state.params) / 1e6} Million")

    lr = args.model.learning_rate
    epoch = 0
    chk = args.general.resume or args.general.evaluate
    if chk:
        chk_path = os.path.join(args.general.checkpoint, chk)
        if not os.path.exists(chk_path):
            chk_path = chk
        restored = (checkpoints.load_torch_checkpoint(
            chk_path, state.params, part_based=False)
            if chk_path.endswith(".bin") else
            checkpoints.load_state(chk_path, state.params, state.opt_state))
        # device-commit the host-numpy restored trees (round-5 fix: a
        # numpy pytree re-transfers on every jitted call)
        from pafuse_tpu.utils.backend import commit_params
        state = state._replace(params=commit_params(restored["params"]))
        if args.general.resume:
            epoch = restored.get("epoch", 0)
            lr = restored.get("lr", lr)
            if "opt_state" in restored:
                state = state._replace(opt_state=commit_params(
                    restored["opt_state"]))

    if not args.general.evaluate:
        p3, p2 = dhp3.train_arrays(train_data)
        seqs_per_batch = max(1, args.model.batch_size
                             // args.model.number_of_frames)
        gen = sampling.ChunkedSampler(
            seqs_per_batch, None, p3, p2, args.model.number_of_frames,
            augment=args.model.data_augmentation,
            flip_permutation=sk.FLIP_PERMUTATION_3DHP)
        from pafuse_tpu.runtime import PrefetchingLoader
        loader = PrefetchingLoader(gen, depth=2)
        step_fn = tr.build_train_step(model_train, tx, part_based=False,
                                      donate=args.tpu.donate_buffers)
        while epoch < args.model.epochs:
            t0 = time()
            tot, n = 0.0, 0
            pending = None  # one-deep loss pipeline (see cli/main_h3wb.py)
            for _, b3d, b2d in loader.next_epoch():
                b2d, real = tr.pad_batch(b2d, seqs_per_batch)
                b3d, _ = tr.pad_batch(b3d, seqs_per_batch)
                # train in meters: loss on the (pred*1000 vs mm GT) scale
                state, loss = step_fn(state, jnp.float32(lr),
                                      jnp.asarray(b2d), jnp.asarray(b3d))
                if pending is not None:
                    tot += float(pending[0]) * pending[1]
                pending = (loss, real)
                n += real
                if args.ft2d.debug:
                    break
            if pending is not None:
                tot += float(pending[0]) * pending[1]
            err, err_agg = evaluate_3dhp(model_eval, state.params, test_data,
                                         args)
            print(f"[{epoch + 1}] time {(time() - t0) / 60:.2f} lr {lr:f} "
                  f"train {tot / max(n, 1):.4f} "
                  f"valid P_Best {float(np.atleast_1d(err)[0]):.2f}mm "
                  f"P_Agg {float(np.atleast_1d(err_agg)[0]):.2f}mm")
            lr *= args.model.lr_decay
            epoch += 1
            if epoch % args.general.checkpoint_frequency == 0:
                checkpoints.save_state(args.general.checkpoint,
                                       f"epoch_{epoch}", params=state.params,
                                       opt_state=state.opt_state, epoch=epoch,
                                       lr=lr)
            if args.ft2d.debug and epoch >= 1:
                break

    err, err_agg = evaluate_3dhp(
        model_eval, state.params, test_data, args,
        num_proposals=args.ft2d.num_proposals,
        sampling_timesteps=args.ft2d.sampling_timesteps)
    # txt regression record mirroring the H3WB path's
    # h36m_test_log_H{P}_K{T}.txt (evaluate.write_report)
    lines = []
    for ii, (e, ea) in enumerate(zip(np.atleast_1d(err),
                                     np.atleast_1d(err_agg))):
        lines.append(f"step {ii} : 3DHP MPJPE P_Best: {float(e):f} mm")
        lines.append(f"step {ii} : 3DHP MPJPE P_Agg: {float(ea):f} mm")
    report = "\n".join(lines) + "\n"
    print(report, end="")
    log_path = os.path.join(
        args.general.checkpoint,
        f"3dhp_test_log_H{args.ft2d.num_proposals}"
        f"_K{args.ft2d.sampling_timesteps}.txt")
    with open(log_path, "a") as f:
        f.write(report)


if __name__ == "__main__":
    main()
