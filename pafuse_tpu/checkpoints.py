"""Checkpointing: native save/restore + torch->JAX weight conversion.

Reference behavior: ``save_state`` (/root/reference/common/logging.py:83-115)
writes ``{folder}/{tag}.bin`` torch pickles containing model/optimizer/epoch/
lr/generator-RNG state; resume restores all of them (main_h3wb.py:793-801).

Native format here: a single ``.npz`` with flattened pytree keys plus a JSON
manifest — no pickle for arrays (robust, framework-free), with the host-side
RNG state pickled separately inside the npz (it is a NumPy RandomState).

``convert_torch_state_dict`` maps a released PAFUSE torch checkpoint
(``pafuse_model.bin``) onto our parameter trees: torch ``Linear.weight``
(out,in) -> ``kernel`` (in,out) transpose, LayerNorm weight -> scale,
``head.0/head.1`` -> ``head.norm/head.fc``, ``time_mlp.1/time_mlp.3`` ->
``time_mlp.fc1/fc2`` (param names from /root/reference/common/mixste.py:169-210,
part prefixes from common/diffusionpose.py:143-153).
"""

from __future__ import annotations

import io
import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Pytree <-> flat dict
# ---------------------------------------------------------------------------

def _flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_tree(flat: Dict[str, np.ndarray], structure: Any) -> Any:
    """Rebuild arrays into the shape of ``structure`` (a template pytree)."""
    def rebuild(template: Any, prefix: str) -> Any:
        if isinstance(template, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            seq = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(template)]
            if hasattr(template, "_fields"):       # namedtuple (optax states)
                return type(template)(*seq)
            return type(template)(seq) if isinstance(template, tuple) else seq
        return flat[prefix[:-1]]
    return rebuild(structure, "")


# ---------------------------------------------------------------------------
# Native save / restore
# ---------------------------------------------------------------------------

def save_state(folder: str, tag: str, *, params: Any, opt_state: Any = None,
               epoch: int = 0, lr: float = 0.0, random_state=None,
               extra: Optional[dict] = None, log_in_mlf: bool = False) -> str:
    """Write ``{folder}/{tag}.npz`` (native equivalent of logging.py:83-115).

    ``log_in_mlf`` attaches the file as an MLflow artifact when a run is
    active (reference: logging.py:112-115).  In multi-host deployments only
    process 0 writes (params are replicated; everyone else returns the
    would-be path).
    """
    path = os.path.join(folder, f"{tag}.npz")
    if jax.process_index() != 0:
        return path
    os.makedirs(folder, exist_ok=True)

    arrays = {f"params/{k}": v for k, v in _flatten_tree(
        jax.device_get(params)).items()}
    if opt_state is not None:
        flat_opt = _flatten_tree(jax.device_get(
            jax.tree_util.tree_map(lambda x: x, opt_state)))
        arrays.update({f"opt/{k}": v for k, v in flat_opt.items()})

    meta = {"epoch": int(epoch), "lr": float(lr), "extra": extra or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    if random_state is not None:
        arrays["__random_state__"] = np.frombuffer(
            pickle.dumps(random_state), dtype=np.uint8)
    np.savez(path, **arrays)
    if log_in_mlf:
        from pafuse_tpu.utils import observability as obs
        if obs.mlflow_available():
            import mlflow
            mlflow.log_artifact(path)
    return path


def load_state(path: str, params_template: Any,
               opt_state_template: Any = None) -> Dict[str, Any]:
    """Restore a native checkpoint into the given pytree templates."""
    raw = np.load(path, allow_pickle=False)
    flat_params = {k[len("params/"):]: raw[k] for k in raw.files
                   if k.startswith("params/")}
    out: Dict[str, Any] = {
        "params": _unflatten_tree(flat_params, params_template)}
    if opt_state_template is not None:
        flat_opt = {k[len("opt/"):]: raw[k] for k in raw.files
                    if k.startswith("opt/")}
        if flat_opt:
            out["opt_state"] = _unflatten_tree(flat_opt, opt_state_template)
    meta = json.loads(bytes(raw["__meta__"]).decode())
    out.update(meta)
    if "__random_state__" in raw.files:
        out["random_state"] = pickle.loads(bytes(raw["__random_state__"]))
    return out


def latest_checkpoint(folder: str) -> Optional[str]:
    """Most recent ``epoch_N.npz`` in ``folder`` (for ``resume=auto``)."""
    import re
    best, best_epoch = None, -1
    if not os.path.isdir(folder):
        return None
    for name in os.listdir(folder):
        m = re.fullmatch(r"epoch_(\d+)\.npz", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(folder, name)
    return best


# ---------------------------------------------------------------------------
# torch -> JAX conversion
# ---------------------------------------------------------------------------

def _convert_mixste_entry(jax_tree: Dict[str, Any], rel_key: str,
                          value: np.ndarray) -> bool:
    """Place one torch MixSTE2 tensor into our param tree.  Returns False if
    the key is unknown."""
    parts = rel_key.split(".")

    def put(node, path, arr):
        for p in path[:-1]:
            node = node[int(p)] if isinstance(node, list) else node[p]
        leaf = path[-1]
        if isinstance(node, list):
            node[int(leaf)] = arr
        else:
            node[leaf] = arr

    def linear(path, leaf):
        if leaf == "weight":
            put(jax_tree, path + ["kernel"], value.T.copy())
        else:
            put(jax_tree, path + ["bias"], value.copy())

    def layernorm(path, leaf):
        put(jax_tree, path + ["scale" if leaf == "weight" else "bias"],
            value.copy())

    try:
        if parts[0] == "Spatial_patch_to_embedding":
            linear(["Spatial_patch_to_embedding"], parts[1])
        elif parts[0] in ("Spatial_pos_embed", "Temporal_pos_embed"):
            jax_tree[parts[0]] = value.copy()
        elif parts[0] == "time_mlp":
            # torch Sequential: 0=sinusoidal (no params), 1=fc1, 2=GELU, 3=fc2
            idx = {"1": "fc1", "3": "fc2"}[parts[1]]
            linear(["time_mlp", idx], parts[2])
        elif parts[0] in ("STEblocks", "TTEblocks"):
            block = [parts[0], parts[1]]
            sub = parts[2]
            if sub in ("norm1", "norm2"):
                layernorm(block + [sub], parts[3])
            elif sub == "attn":
                linear(block + ["attn", parts[3]], parts[4])
            elif sub == "mlp":
                linear(block + ["mlp", parts[3]], parts[4])
            else:
                return False
        elif parts[0] in ("Spatial_norm", "Temporal_norm"):
            layernorm([parts[0]], parts[1])
        elif parts[0] == "head":
            if parts[1] == "0":
                layernorm(["head", "norm"], parts[2])
            elif parts[1] == "1":
                linear(["head", "fc"], parts[2])
            else:
                return False
        else:
            return False
    except (KeyError, IndexError):
        return False
    return True


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             params_template: Dict[str, Any],
                             part_based: bool = True) -> Dict[str, Any]:
    """Convert a PAFUSE torch ``model_pos`` state dict to our param tree.

    Args:
      state_dict: {torch_key: np.ndarray}; keys may carry ``module.`` (from
        DataParallel) and ``pose_estimator.`` prefixes.
      params_template: output of ``D3DP.init_params`` — defines the expected
        tree structure (part names -> MixSTE trees).
    """
    out = jax.tree_util.tree_map(lambda x: np.asarray(x), params_template)
    # deep-copy lists so we can mutate
    out = jax.tree_util.tree_map(lambda x: x.copy(), out)

    matched, skipped = [], []
    for key, value in state_dict.items():
        k = key
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("pose_estimator."):
            k = k[len("pose_estimator."):]
        value = np.asarray(value, dtype=np.float32)
        if part_based:
            part, _, rel = k.partition(".")
            if part not in out:
                skipped.append(key)
                continue
            ok = _convert_mixste_entry(out[part], rel, value)
        else:
            tree = out[next(iter(out))] if len(out) == 1 else out
            ok = _convert_mixste_entry(tree, k, value)
        (matched if ok else skipped).append(key)
    return out, matched, skipped


def export_torch_state_dict(params: Dict[str, Any],
                            part_based: bool = True,
                            schedule_timesteps: int | None = None
                            ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: our param tree ->
    reference-named torch-layout state dict (``pose_estimator.`` prefixed).

    Used for round-trip testing of the converter and for exporting trained
    weights back to the reference format.  Pass ``schedule_timesteps`` to
    also emit the reference D3DP's registered schedule buffers (betas,
    alphas_cumprod, ... — diffusionpose.py:107-132): the reference's
    ``evaluate`` loads checkpoints with strict=True and requires them
    (found by the flagship rehearsal, tools/rehearse_parity.py).
    """
    out: Dict[str, np.ndarray] = {}
    if schedule_timesteps is not None:
        from pafuse_tpu.diffusion import make_schedule
        sched = make_schedule(schedule_timesteps)
        for name in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                     "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                     "sqrt_recip_alphas_cumprod",
                     "sqrt_recipm1_alphas_cumprod", "posterior_variance",
                     "posterior_log_variance_clipped",
                     "posterior_mean_coef1", "posterior_mean_coef2"):
            out[name] = getattr(sched, name).copy()
        # registered by the reference but unused by us (diffusionpose.py:113)
        out["log_one_minus_alphas_cumprod"] = np.log(
            1.0 - sched.alphas_cumprod.astype(np.float64)).astype(np.float32)

    def emit_mixste(prefix: str, tree: Dict[str, Any]):
        def lin(name, p):
            out[f"{prefix}{name}.weight"] = np.asarray(p["kernel"]).T.copy()
            if "bias" in p:
                out[f"{prefix}{name}.bias"] = np.asarray(p["bias"]).copy()

        def ln(name, p):
            out[f"{prefix}{name}.weight"] = np.asarray(p["scale"]).copy()
            out[f"{prefix}{name}.bias"] = np.asarray(p["bias"]).copy()

        lin("Spatial_patch_to_embedding", tree["Spatial_patch_to_embedding"])
        out[f"{prefix}Spatial_pos_embed"] = np.asarray(tree["Spatial_pos_embed"]).copy()
        out[f"{prefix}Temporal_pos_embed"] = np.asarray(tree["Temporal_pos_embed"]).copy()
        lin("time_mlp.1", tree["time_mlp"]["fc1"])
        lin("time_mlp.3", tree["time_mlp"]["fc2"])
        for bname in ("STEblocks", "TTEblocks"):
            for i, blk in enumerate(tree[bname]):
                ln(f"{bname}.{i}.norm1", blk["norm1"])
                lin(f"{bname}.{i}.attn.qkv", blk["attn"]["qkv"])
                lin(f"{bname}.{i}.attn.proj", blk["attn"]["proj"])
                ln(f"{bname}.{i}.norm2", blk["norm2"])
                lin(f"{bname}.{i}.mlp.fc1", blk["mlp"]["fc1"])
                lin(f"{bname}.{i}.mlp.fc2", blk["mlp"]["fc2"])
        ln("Spatial_norm", tree["Spatial_norm"])
        ln("Temporal_norm", tree["Temporal_norm"])
        ln("head.0", tree["head"]["norm"])
        lin("head.1", tree["head"]["fc"])

    if part_based:
        for part, tree in params.items():
            emit_mixste(f"pose_estimator.{part}.", tree)
    else:
        tree = params[next(iter(params))] if len(params) == 1 else params
        emit_mixste("pose_estimator.", tree)
    return out


def load_torch_checkpoint(path: str, params_template: Dict[str, Any],
                          part_based: bool = True) -> Dict[str, Any]:
    """Read a reference ``.bin`` checkpoint (torch pickle) and convert it."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    state_dict = ckpt.get("model_pos", ckpt.get("state_dict", ckpt))
    np_state = {k: v.detach().cpu().numpy() for k, v in state_dict.items()}
    params, matched, skipped = convert_torch_state_dict(
        np_state, params_template, part_based)
    if skipped:
        print(f"convert_torch_state_dict: skipped {len(skipped)} keys "
              f"(e.g. {skipped[:3]})")
    print(f"convert_torch_state_dict: matched {len(matched)} tensors")
    return {"params": params, "epoch": ckpt.get("epoch", 0),
            "lr": ckpt.get("lr", 0.0)}
