"""Load the *reference* PyTorch implementation for golden-value testing.

We never copy reference code; for numerical parity verification we import it
in place (read-only) with stub modules for its unavailable dependencies
(timm) and run it on CPU.  Tests skip gracefully when the reference tree is
absent.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_timm_stub():
    """The reference imports a handful of timm symbols (mixste.py:18-21);
    provide minimal equivalents so the module loads without timm."""
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    timm_data = types.ModuleType("timm.data")
    timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    timm_models = types.ModuleType("timm.models")
    timm_helpers = types.ModuleType("timm.models.helpers")
    timm_helpers.load_pretrained = lambda *a, **k: None
    timm_registry = types.ModuleType("timm.models.registry")
    timm_registry.register_model = lambda fn: fn
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_

    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.data", timm_data)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.helpers", timm_helpers)
    sys.modules.setdefault("timm.models.registry", timm_registry)
    sys.modules.setdefault("timm.models.layers", timm_layers)


def load_reference_mixste():
    """Import /root/reference/common/mixste.py and return the module, or
    None when unavailable."""
    import os
    if not os.path.isdir(REFERENCE_ROOT):
        return None
    try:
        _install_timm_stub()
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        from common import mixste as ref_mixste  # type: ignore
        return ref_mixste
    except Exception as e:  # pragma: no cover
        print(f"torch oracle unavailable: {e}")
        return None


def patch_cuda_to_cpu():
    """Make the reference's bare .cuda() calls no-ops for CPU benchmarking."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
