"""Minimal hydra-style configuration system.

The reference drives everything through hydra + OmegaConf with a single root
``config/config.yaml`` and ``group.key=value`` CLI overrides
(``/root/reference/main_h3wb.py:567``, ``config/config.yaml``).  Neither
hydra nor omegaconf is available in this environment, so this module
implements the same public surface:

* a YAML root config (:data:`DEFAULT_CONFIG_PATH`) with the same groups/keys
  as the reference (general / mlflow / data / model / experiment / viz / ft2d
  / in_the_wild),
* dotted attribute access (``cfg.model.number_of_frames``),
* ``a.b.c=value`` override strings (values parsed as YAML),
* ``to_yaml`` for logging.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Iterable, List

import yaml

DEFAULT_CONFIG_PATH = os.path.join(os.path.dirname(__file__), "configs", "config.yaml")


class ConfigNode:
    """Recursive attribute/str-key view over a nested dict."""

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, "_data", {})
        for k, v in data.items():
            self._data[k] = ConfigNode(v) if isinstance(v, dict) else v

    # -- access ------------------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(f"No config key {key!r}") from e

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = ConfigNode(value) if isinstance(value, dict) else value

    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        setattr(self, key, value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    # -- conversion ----------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self._data.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out

    def copy(self) -> "ConfigNode":
        return ConfigNode(copy.deepcopy(self.to_dict()))

    def __repr__(self) -> str:  # pragma: no cover
        return f"ConfigNode({self.to_dict()!r})"


def to_yaml(cfg: ConfigNode) -> str:
    return yaml.safe_dump(cfg.to_dict(), sort_keys=False)


def _parse_value(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def apply_overrides(cfg: ConfigNode, overrides: Iterable[str]) -> ConfigNode:
    """Apply ``a.b.c=value`` overrides in place (hydra CLI semantics).

    Unknown keys are REJECTED like hydra's strict mode — a typo such as
    ``ft2d.sampling_timestep=5`` must not silently no-op.  New keys can be
    added explicitly with hydra's ``+a.b.c=value`` syntax.
    """
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override {ov!r} is not of the form key=value")
        path, raw = ov.split("=", 1)
        path = path.strip()
        allow_new = path.startswith("+")
        if allow_new:
            path = path[1:]
        keys = path.split(".")
        node = cfg
        for i, k in enumerate(keys[:-1]):
            if k in node and not isinstance(node[k], ConfigNode):
                # an existing scalar leaf must never be silently replaced by
                # a new group ('+a.b=v' where 'a' is a value) — that destroys
                # its value and masks exactly the typos strict mode catches
                raise KeyError(
                    f"Config path component {'.'.join(keys[:i + 1])!r} in "
                    f"override {ov!r} is a value, not a group")
            if k not in node:
                if not allow_new:
                    raise KeyError(
                        f"Unknown config group {'.'.join(keys[:i + 1])!r} "
                        f"in override {ov!r} (use +{path}=... to add "
                        "new keys)")
                node[k] = {}
            node = node[k]
        if keys[-1] not in node and not allow_new:
            raise KeyError(
                f"Unknown config key {path!r} in override {ov!r} "
                f"(use +{path}=... to add new keys)")
        if keys[-1] in node and allow_new:
            # hydra errors when '+' appends a key that already exists; the
            # silent-overwrite alternative can mask a typo'd '+' prefix
            raise KeyError(
                f"Config key {path!r} already exists; drop the '+' in "
                f"override {ov!r}")
        node[keys[-1]] = _parse_value(raw)
    return cfg


def load_config(path: str | None = None,
                overrides: Iterable[str] | None = None) -> ConfigNode:
    """Load the root YAML config and apply CLI-style overrides."""
    with open(path or DEFAULT_CONFIG_PATH) as f:
        cfg = ConfigNode(yaml.safe_load(f))
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def flatten(cfg: ConfigNode, prefix: str = "") -> Dict[str, Any]:
    """Flatten to {'group.key': value} — used for MLflow-style param logging
    (reference: common/logging.py:30-42)."""
    out: Dict[str, Any] = {}
    for k, v in cfg.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, ConfigNode):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def parse_cli(argv: List[str]) -> ConfigNode:
    """Parse hydra-style CLI: every positional arg is a dotted override.

    ``--config path.yaml`` selects an alternate root config.
    """
    path = None
    overrides: List[str] = []
    it = iter(argv)
    for arg in it:
        if arg in ("--config", "-c"):
            path = next(it)
        elif arg.startswith("--config="):
            path = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    return load_config(path, overrides)
