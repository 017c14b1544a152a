"""Part-based denoiser routing: dedicated MixSTE networks per body part.

Reference behavior: ``/root/reference/common/diffusionpose.py:140-172``
(ModuleDict of per-part MixSTE2 + ``split_data``/``pred_parts``).

TPU redesign: the part split is a *static* gather (``jnp.take`` with
compile-time index arrays) and the merge is a concat; because the H3WB part
tables are contiguous and ordered (body=0..23, face=24..91, hands=92..133),
the concat reproduces joint order directly — we still verify this at
construction and keep an inverse permutation for layouts where it doesn't
hold (e.g. custom part groupings).  All part networks run inside one ``jit``
so XLA schedules the three sub-graphs back-to-back on the MXU without host
round-trips (vs. the reference's sequential python loop over CUDA modules).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pafuse_tpu.models import mixste
from pafuse_tpu.models.mixste import MixSTEConfig

#: per-part embedding widths (reference: diffusionpose.py:142)
PART_CHANNELS = {"body": 384, "face": 224, "hands": 256,
                 "left_hand": 256, "right_hand": 256}


@dataclasses.dataclass(frozen=True)
class PartSpec:
    name: str
    joint_indices: np.ndarray       # indices into the whole-body joint axis
    config: MixSTEConfig


def build_part_specs(parts_joint_indices: Dict[str, List[int]],
                     num_frames: int, in_chans: int, depth: int,
                     drop_path_rate: float = 0.0, drop_rate: float = 0.0,
                     attn_drop_rate: float = 0.0) -> List[PartSpec]:
    specs = []
    for name, idx in parts_joint_indices.items():
        specs.append(PartSpec(
            name=name,
            joint_indices=np.asarray(idx, dtype=np.int32),
            config=MixSTEConfig(
                num_frames=num_frames, num_joints=len(idx), in_chans=in_chans,
                embed_dim=PART_CHANNELS[name], depth=depth,
                drop_path_rate=drop_path_rate, drop_rate=drop_rate,
                attn_drop_rate=attn_drop_rate),
        ))
    return specs


def monolithic_spec(num_joints: int, num_frames: int, in_chans: int,
                    embed_dim: int, depth: int,
                    drop_path_rate: float = 0.0, drop_rate: float = 0.0,
                    attn_drop_rate: float = 0.0) -> List[PartSpec]:
    """Single whole-body network (general.part_based_model=False path,
    diffusionpose.py:150-153)."""
    return [PartSpec(
        name="whole_body",
        joint_indices=np.arange(num_joints, dtype=np.int32),
        config=MixSTEConfig(num_frames=num_frames, num_joints=num_joints,
                            in_chans=in_chans, embed_dim=embed_dim,
                            depth=depth, drop_path_rate=drop_path_rate,
                            drop_rate=drop_rate,
                            attn_drop_rate=attn_drop_rate),
    )]


class PartModel:
    """Applies one MixSTE per part and reassembles the whole-body output.

    Two execution strategies (SURVEY §7 "benchmark both"):

    * **unpacked** (default): one subgraph per part inside the same jit;
      XLA schedules them back-to-back.
    * **packed** (``packed=True``): parts padded to a common (J, C) and run
      as ONE vmapped call with masked LayerNorm/softmax
      (:mod:`pafuse_tpu.models.packed`); eval-only (stochastic depth needs
      the unpacked path), numerics match unpacked to <=1e-5 in f32.
    """

    def __init__(self, specs: List[PartSpec], packed: bool = False):
        self.specs = specs
        concat_order = np.concatenate([s.joint_indices for s in specs])
        self.num_joints = int(concat_order.max()) + 1
        assert len(concat_order) == self.num_joints, (
            "part tables must partition the joint set")
        # inverse permutation: output[concat_order[i]] = concat[i]
        self._inverse = np.argsort(concat_order).astype(np.int32)
        self._is_identity = bool(np.all(concat_order == np.arange(self.num_joints)))
        self.packed = bool(packed) and len(specs) > 1
        if self.packed:
            from pafuse_tpu.models import packed as pk
            self._plan = pk.make_pack_plan(specs)

    # -- params -------------------------------------------------------------
    def init_params(self, key) -> Dict[str, Any]:
        keys = jax.random.split(key, len(self.specs))
        return {s.name: mixste.init_mixste(k, s.config)
                for s, k in zip(self.specs, keys)}

    def param_count(self, params) -> int:
        return mixste.param_count(params)

    # -- packed-execution support --------------------------------------------
    def prepare(self, params: Dict[str, Any], train: bool = False):
        """Pre-transform params for repeated application (e.g. once before a
        DDIM ``lax.scan`` instead of per step): packs them when packed
        execution applies, else returns them unchanged."""
        if self.packed and not train:
            from pafuse_tpu.models import packed as pk
            return {"__packed__": pk.pack_params(params, self.specs,
                                                 self._plan)}
        return params

    # -- forward ------------------------------------------------------------
    def __call__(self, params: Dict[str, Any], x2d, x3d, t, *,
                 train: bool = False, rng=None,
                 compute_dtype=jnp.float32, attention_fn=None,
                 block_fn=None, train_block_fn=None, layer_fn=None,
                 block_t_fn=None, remat: bool = False):
        """Denoise: (B,F,N,2) x (B,F,N,3) x (B,) -> (B,F,N,3)."""
        if isinstance(params, dict) and "__packed__" in params:
            from pafuse_tpu.models import packed as pk
            return pk.packed_forward(params["__packed__"], self._plan,
                                     x2d, x3d, t, compute_dtype=compute_dtype)
        if self.packed and not train:
            return self(self.prepare(params), x2d, x3d, t,
                        compute_dtype=compute_dtype)
        outs = []
        rngs = (jax.random.split(rng, len(self.specs))
                if rng is not None else [None] * len(self.specs))
        for s, r in zip(self.specs, rngs):
            idx = jnp.asarray(s.joint_indices)
            out = mixste.mixste_forward(
                params[s.name], s.config,
                jnp.take(x2d, idx, axis=-2), jnp.take(x3d, idx, axis=-2), t,
                train=train, rng=r, compute_dtype=compute_dtype,
                attention_fn=attention_fn, block_fn=block_fn,
                train_block_fn=train_block_fn, layer_fn=layer_fn,
                block_t_fn=block_t_fn, remat=remat)
            outs.append(out)
        merged = jnp.concatenate(outs, axis=-2)
        if self._is_identity:
            return merged
        return jnp.take(merged, jnp.asarray(self._inverse), axis=-2)
