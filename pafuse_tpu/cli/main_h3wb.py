"""H3WB train/eval entry point — the hydra-style public surface.

Usage (same override syntax as the reference, main_h3wb.py README.md:41-62):

    python -m pafuse_tpu.cli.main_h3wb ft2d.num_proposals=20 \
        ft2d.sampling_timesteps=10 general.evaluate=best_epoch.npz

Reference behavior: ``/root/reference/main_h3wb.py`` (hydra main, 567-1369).
"""

from __future__ import annotations

import contextlib
import os
import sys
from datetime import datetime
from time import time
from typing import Dict, List

import numpy as np

from pafuse_tpu import config as cfg_mod
from pafuse_tpu.utils.misc import Logger


def build_model(args, *, is_train: bool, num_proposals: int = 1,
                sampling_timesteps: int = 1, flip_permutation=None):
    import jax.numpy as jnp
    from pafuse_tpu import skeleton as sk
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.ops.attention import (select_attention_fn, select_block_fn, select_block_t_fn, select_layer_fn)

    # one switch for every retained negative-result path (block_t / layer /
    # heads policy / packed parts) — see README "Support tiers".  Process-
    # local (not an env mutation): a later in-process build with the flag
    # off goes back to deferring to the user's env var.
    from pafuse_tpu.ops.attention import set_experimental_kernels
    set_experimental_kernels(
        True if str(getattr(args.tpu, "experimental_kernels", False)
                    ).lower() in ("true", "1", "on", "yes") else None)
    # the reference raises for any other value (diffusionpose.py:150-155);
    # silently running MixSTE2 anyway would mask the config error
    if args.model.diff_model != "MixSTE2":
        raise ValueError(
            f"The model {args.model.diff_model!r} does not exist "
            "(model.diff_model supports only 'MixSTE2')")
    compute_dtype = (jnp.bfloat16 if args.tpu.compute_dtype == "bfloat16"
                     else jnp.float32)
    cfg = D3DPConfig(
        frames=args.model.number_of_frames,
        num_kps=args.data.num_kps,
        timesteps=args.ft2d.timestep,
        sampling_timesteps=sampling_timesteps,
        num_proposals=num_proposals,
        scale=args.ft2d.scale,
        depth=args.model.dep,
        input_size=args.model.input_size,
        cs=args.model.cs,
        part_based=args.general.part_based_model,
        merge_hands=args.data.merge_hands,
        drop_path_rate=0.1 if is_train else 0.0,
        # the reference PARSES model.dropout but never forwards it into
        # MixSTE2 (diffusionpose.py:140-153 passes no drop_rate) — a dead
        # knob there; here it drives real MLP/proj/attn dropout, matching
        # the module's documented hooks (mixste.py:35,56-59,73).  The
        # default 0.0 is bit-identical to the reference's behavior.
        dropout=float(args.model.dropout) if is_train else 0.0,
        test_time_augmentation=args.model.test_time_augmentation,
    )
    from pafuse_tpu.ops.block_grad import select_train_block_fn
    return D3DP(cfg, flip_permutation=flip_permutation,
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
                    train=is_train),
                remat=bool(args.tpu.remat))


def collect_actions(dataset, subjects_test):
    """Group test actions by base name (main_h3wb.py:1100-1115)."""
    all_actions: Dict[str, List] = {}
    by_subject: Dict[str, Dict[str, List]] = {}
    for subject in subjects_test:
        by_subject.setdefault(subject, {})
        for action in dataset[subject].keys():
            name = action.split(" ")[0]
            all_actions.setdefault(name, []).append((subject, action))
            by_subject[subject].setdefault(name, []).append((subject, action))
    return all_actions, by_subject


def main(argv=None):
    args = cfg_mod.parse_cli(argv if argv is not None else sys.argv[1:])
    from pafuse_tpu.utils import observability as obs
    # MLflow run around the whole driver, params logged on entry when
    # enabled (reference: main_h3wb.py:732-744, logging.py:24-42)
    with obs.mlflow_run(args) as mlflow_on:
        return _run(args, mlflow_on)


def _run(args, mlflow_on: bool = False):
    from pafuse_tpu.utils import observability as obs

    if int(args.experiment.warmup) != 1:
        # semi-supervision warm-up exists only in the reference's legacy
        # argparse scripts (common/arguments.py:63); the hydra path reads it
        # nowhere, so a non-default value would silently do nothing
        raise ValueError("experiment.warmup is not implemented (the "
                         "reference's hydra driver ignores it); remove the "
                         "override")

    timestamp = datetime.now().strftime("%Y%m%dT%H-%M-%S")
    description = "Evaluate!" if args.general.evaluate else "Train!"
    writer = None
    if not args.general.nolog:
        logdir = f"{args.general.log}_{timestamp}"
        os.makedirs(logdir, exist_ok=True)
        writer = obs.make_summary_writer(logdir)
        if writer is not None:
            writer.add_text("description", description)
            writer.add_text("command", "python " + " ".join(sys.argv))
        sys.stdout = Logger(os.path.join(logdir, "logging.log"))
    print(description)
    print("==> Using settings:")
    print(cfg_mod.to_yaml(args))

    if not args.general.checkpoint:
        args.general.checkpoint = f"{args.general.log}_{timestamp}"
    os.makedirs(args.general.checkpoint, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from pafuse_tpu import checkpoints, evaluate as ev, train as tr
    from pafuse_tpu.data import h3wb, sampling
    from pafuse_tpu.utils.backend import ensure_backend

    if args.tpu.matmul_precision != "default":
        # TPU f32 dots default to single-pass bf16 multiplication; 'highest'
        # forces exact f32 (slower) for strict numeric-parity runs
        jax.config.update("jax_default_matmul_precision",
                          args.tpu.matmul_precision)
    print(f"JAX devices: {ensure_backend()}")

    # ---- data ------------------------------------------------------------
    print("Loading dataset...")
    dataset = h3wb.load_dataset(
        args.data.data_dir, args.data.synthetic,
        actions_per_subject=int(args.data.synthetic_actions),
        frames_per_action=int(args.data.synthetic_frames))
    keypoints = h3wb.prepare_data(dataset)

    subjects_train = args.data.subjects_train.split(",")
    # render mode evaluates the visualization subject (main_h3wb.py:653-656)
    subjects_test = ([args.viz.viz_subject] if args.general.render
                     else args.data.subjects_test.split(","))
    action_filter = (None if args.data.actions == "*"
                     else args.data.actions.split(","))

    receptive_field = args.model.number_of_frames
    print(f"INFO: Receptive field: {receptive_field} frames")

    # ---- models ----------------------------------------------------------
    # flip symmetry follows the dataset (npz-metadata-derived on real data)
    flip_perm = getattr(dataset, "flip_permutation", None)
    model_eval_final = build_model(
        args, is_train=False,
        num_proposals=args.ft2d.num_proposals,
        sampling_timesteps=args.ft2d.sampling_timesteps,
        flip_permutation=flip_perm)
    model_train = build_model(args, is_train=True,
                              flip_permutation=flip_perm)

    state, tx = tr.create_train_state(model_train, seed=args.tpu.seed)
    n_params = model_train.model.param_count(state.params)
    print(f"INFO: Trainable parameter count: {n_params / 1e6} Million")

    mesh = tr.make_mesh(tuple(args.tpu.mesh_shape),
                        tuple(args.tpu.mesh_axis_names))
    print(f"INFO: device mesh {mesh}")

    # ---- resume / evaluate checkpoint loading ----------------------------
    epoch = 0
    lr = args.model.learning_rate
    resume_ckpt = None
    chk = args.general.resume or args.general.evaluate
    if chk == "auto":
        # resume from the most recent epoch checkpoint (crash recovery)
        chk = checkpoints.latest_checkpoint(args.general.checkpoint) or ""
        if chk:
            print(f"Auto-resume from {chk}")
    if chk:
        chk_path = os.path.join(args.general.checkpoint, chk)
        if not os.path.exists(chk_path):
            chk_path = chk
        print("Loading checkpoint", chk_path)
        if chk_path.endswith(".bin"):
            restored = checkpoints.load_torch_checkpoint(
                chk_path, state.params,
                part_based=args.general.part_based_model)
        else:
            restored = checkpoints.load_state(chk_path, state.params,
                                              state.opt_state)
        # loaders return host-numpy trees; commit to device (replicated
        # under the mesh) so neither the first donated train step nor the
        # eval path re-ships the full state per call (round-5 fix)
        from pafuse_tpu.utils.backend import commit_params
        state = state._replace(params=commit_params(restored["params"],
                                                    mesh))
        if args.general.resume:
            epoch = restored.get("epoch", 0)
            if not args.model.coverlr:
                lr = restored.get("lr", lr)
            if "opt_state" in restored:
                state = state._replace(opt_state=commit_params(
                    restored["opt_state"], mesh))
            resume_ckpt = restored
        print(f"This model was trained for {restored.get('epoch', 0)} epochs")

    # ---- validation data ---------------------------------------------------
    cams_valid, poses_valid, poses_valid_2d = h3wb.fetch(
        subjects_test, keypoints, dataset, stride=args.experiment.downsample,
        action_filter=action_filter)
    print(f"INFO: Testing on {sum(p.shape[0] for p in poses_valid_2d)} frames")
    # one window-batch shape for ALL eval calls this run -> single jit
    # specialization across epochs and actions
    pin_bs = ev.pinned_window_batch(poses_valid_2d, receptive_field)

    min_loss = args.model.min_loss

    if not args.general.evaluate:
        # ---- training ------------------------------------------------------
        cams_train, poses_train, poses_train_2d = h3wb.fetch(
            subjects_train, keypoints, dataset,
            stride=args.experiment.downsample, action_filter=action_filter,
            subset=args.experiment.subset)

        seqs_per_batch = max(1, args.model.batch_size
                             // args.model.number_of_frames)
        # round to multiple of mesh size for even sharding
        n_dev = int(np.prod(mesh.devices.shape))
        seqs_per_batch = max(n_dev, (seqs_per_batch // n_dev) * n_dev)

        train_gen = sampling.ChunkedSampler(
            seqs_per_batch, cams_train, poses_train, poses_train_2d,
            args.model.number_of_frames, shuffle=True,
            augment=args.model.data_augmentation,
            flip_permutation=flip_perm)
        # background-thread prefetch: batch assembly overlaps device steps
        from pafuse_tpu.runtime import PrefetchingLoader
        train_loader = PrefetchingLoader(train_gen, depth=2)
        print(f"INFO: Training on {train_gen.num_frames() * receptive_field}"
              " frames")
        if resume_ckpt is not None and "random_state" in resume_ckpt:
            train_gen.set_random_state(resume_ckpt["random_state"])

        weights = (tr.mixste_weight_table(args.data.num_kps)
                   if args.model.weighted_loss else None)
        step_fn = tr.build_train_step(
            model_train, tx, weights=weights, mse_loss=args.model.mse_loss,
            wb_loss=args.model.wb_loss,
            part_based=args.general.part_based_model, mesh=mesh,
            donate=args.tpu.donate_buffers)

        log_path = os.path.join(args.general.checkpoint, "training_log.txt")
        quickdebug = args.ft2d.debug
        train_curve, valid_curve = [], []

        first_epoch = epoch
        while epoch < args.model.epochs:
            start_time = time()
            # one-epoch jax.profiler trace when requested (tpu.profile=true)
            prof = contextlib.ExitStack()
            if args.tpu.profile and epoch == first_epoch:
                prof.enter_context(obs.profile_trace(
                    os.path.join(args.general.checkpoint, "profile")))
            epoch_loss, n_seen = 0.0, 0
            num_batches = train_gen.batch_num()
            # one-deep loss pipeline: read step N's loss while step N+1 runs,
            # so the next batch's host assembly + transfer overlap device
            # compute (an eager float(loss) would stall the device per step)
            pending = None
            for it, (camb, b3d, b2d) in enumerate(train_loader.next_epoch()):
                if it % 10 == 0:
                    print(f"{it}/{num_batches}")
                b2d, real = tr.pad_batch(b2d, seqs_per_batch)
                b3d, _ = tr.pad_batch(b3d, seqs_per_batch)
                # per-shard host->device transfer (no replicate-then-reshard)
                b2d, b3d = tr.shard_batch((b2d, b3d), mesh)
                state, loss = step_fn(state, jnp.float32(lr), b2d, b3d)
                if pending is not None:
                    epoch_loss += pending[1] * float(pending[0])
                pending = (loss, real * receptive_field)
                n_seen += real * receptive_field
                if quickdebug:
                    break
            if pending is not None:
                epoch_loss += pending[1] * float(pending[0])
            prof.close()
            epoch_loss_mm = epoch_loss / max(n_seen, 1) * 1000
            # MLflow per-epoch metrics (reference: main_h3wb.py:892-894,
            # 977-978, 1060-1071; same key vocabulary)
            metrics_to_log = {"tr_loss": epoch_loss_mm}

            # per-epoch eval at P=1, T=1 with flip TTA (main_h3wb.py:899-978)
            val_mm, val_pb_mm = float("nan"), float("nan")
            if not args.experiment.no_eval:
                seqs = zip(cams_valid, poses_valid, poses_valid_2d)
                acc, _ = ev.evaluate_sequences(
                    model_eval_final, state.params, seqs, args,
                    receptive_field=receptive_field, num_proposals=1,
                    sampling_timesteps=1, window_batch=pin_bs, mesh=mesh,
                    quickdebug=quickdebug)
                means = acc.means_mm()
                val_mm = float(np.atleast_1d(means["P_Best"])[0])
                val_pb_mm = float(np.atleast_1d(means["P_Best_PB"])[0])
                metrics_to_log["val_mpjpe"] = val_mm
                metrics_to_log["val_pb_mpjpe"] = val_pb_mm

            elapsed = (time() - start_time) / 60
            log = (f"[{epoch + 1}] time {elapsed:.2f} lr {lr:f} "
                   f"3d_train {epoch_loss_mm:f} 3d_pos_valid {val_mm:f} "
                   f"3d_pb_pos_valid {val_pb_mm:f}")
            print(log)
            with open(log_path, "a") as f:
                f.write(log + "\n")
            if writer is not None:
                writer.add_scalar("Loss/3d training loss", epoch_loss_mm,
                                  epoch + 1)
                writer.add_scalar("Loss/3d validation loss", val_mm, epoch + 1)
                writer.add_scalar("Parameters/learing rate", lr, epoch + 1)
                writer.add_scalar("Parameters/training time per epoch",
                                  elapsed, epoch + 1)

            lr *= args.model.lr_decay
            epoch += 1

            if epoch % args.general.checkpoint_frequency == 0:
                checkpoints.save_state(
                    args.general.checkpoint, f"epoch_{epoch}",
                    params=state.params, opt_state=state.opt_state,
                    epoch=epoch, lr=lr,
                    random_state=train_gen.random_state(),
                    log_in_mlf=mlflow_on)
            if val_mm < min_loss:
                min_loss = val_mm
                checkpoints.save_state(
                    args.general.checkpoint, "best_epoch",
                    params=state.params, opt_state=state.opt_state,
                    epoch=epoch, lr=lr,
                    random_state=train_gen.random_state(),
                    log_in_mlf=mlflow_on)
                with open(log_path, "a") as f:
                    f.write("best epoch\n")
                metrics_to_log.update({"best_epoch_loss": epoch,
                                       "best_val_loss": val_mm})
            obs.log_metrics_to_mlflow(metrics_to_log, step=epoch,
                                      mlflow_on=mlflow_on)

            # training-curve PNG export (main_h3wb.py:1073-1095)
            train_curve.append(epoch_loss_mm)
            valid_curve.append(val_mm)
            if args.general.export_training_curves and epoch > 3:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                plt.figure()
                epoch_x = np.arange(3, len(train_curve)) + 1
                plt.plot(epoch_x, train_curve[3:], "--", color="C0")
                plt.plot(epoch_x, valid_curve[3:], color="C1")
                plt.legend(["3d train", "3d valid (eval)"])
                plt.ylabel("MPJPE (mm)")
                plt.xlabel("Epoch")
                plt.xlim((3, epoch))
                plt.savefig(os.path.join(args.general.checkpoint,
                                         "loss_3d.png"))
                plt.close("all")
            if quickdebug and epoch >= 1:
                break

    # ---- final evaluation (main_h3wb.py:1098-1366) -------------------------
    print("Evaluating...")
    all_actions, by_subject = collect_actions(dataset, subjects_test)

    def run_evaluation(actions, tag=None):
        per_action = {}
        per_action_p2 = {}
        for action_key in sorted(actions.keys()):
            if action_filter is not None and not any(
                    action_key.startswith(a) for a in action_filter):
                continue
            cams_act, poses_act, poses_2d_act = h3wb.fetch_actions(
                actions[action_key], keypoints, dataset,
                stride=args.experiment.downsample)
            seqs = zip(cams_act, poses_act, poses_2d_act)
            acc, p2 = ev.evaluate_sequences(
                model_eval_final, state.params, seqs, args,
                receptive_field=receptive_field,
                num_proposals=args.ft2d.num_proposals,
                sampling_timesteps=args.ft2d.sampling_timesteps,
                window_batch=pin_bs, mesh=mesh,
                quickdebug=args.ft2d.debug, collect_p2=args.ft2d.p2)
            means = acc.means_mm()
            p2m = p2.means_mm() if (p2 is not None and p2.n > 0) else None
            report = ev.format_report(means, action_key, p2m)
            print(report)
            ev.write_report(args.general.checkpoint, args.ft2d.num_proposals,
                            args.ft2d.sampling_timesteps, report)
            per_action[action_key] = means
            if p2m is not None:
                per_action_p2[action_key] = p2m

        if per_action:
            def avg_of(dicts):
                keys = next(iter(dicts.values())).keys()
                return {k: np.mean([m[k] for m in dicts.values()], axis=0)
                        for k in keys}
            avg = avg_of(per_action)
            p2_avg = avg_of(per_action_p2) if per_action_p2 else None
            # reference-format averaged block incl. part-based breakdowns
            # and P2 averages (main_h3wb.py:1253-1358)
            text = ev.format_actionwise_average(avg, p2_avg)
            print(text)
            ev.write_report(args.general.checkpoint, args.ft2d.num_proposals,
                            args.ft2d.sampling_timesteps, text)
            return avg
        return None

    if not args.general.by_subject:
        run_evaluation(all_actions)
    else:
        for subject, actions in by_subject.items():
            print("Evaluating on subject", subject)
            run_evaluation(actions, tag=subject)

    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
