"""Hierarchical config system (hydra/OmegaConf-equivalent, dependency-free).

The reference drives every layer from hydra YAMLs (reference:
python/train.py:168-179, config/*.yaml).  We reproduce the same surface —
YAML files, attribute access, dotted CLI overrides, snapshot-to-yaml — with a
small self-contained implementation so the framework has no hydra dependency.

Config files live in ``ndjir_tpu/configs/``; every non-default file is a
delta merged over ``default.yaml`` (same scheme as the reference's 28-file
config set, reference: config/default.yaml).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Iterator, Tuple

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class Config:
    """Nested attribute-access view over a dict tree (OmegaConf-lite).

    Nested access returns a VIEW over the same underlying dicts, so
    ``conf.a.b.c = v`` mutates the tree (like OmegaConf).  Hashable by
    content so it can be a ``jax.jit`` static argument — mutating a config
    changes its hash, which correctly triggers recompilation.
    """

    __slots__ = ("_data",)

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, "_data", data)

    # -- attribute / item access -------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            v = self._data[key]
        except KeyError as e:
            raise AttributeError(f"Config has no key {key!r}") from e
        if isinstance(v, dict):
            return Config(v)
        return v

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __getitem__(self, key: str) -> Any:
        return self.__getattr__(key)

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        v = self._data.get(key, default)
        if isinstance(v, dict):
            return Config(v)
        return v

    def keys(self):
        return self._data.keys()

    def items(self) -> Iterator[Tuple[str, Any]]:
        for k, v in self._data.items():
            yield k, (Config(v) if isinstance(v, dict) else v)

    # -- conversion ---------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._data)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self._data, sort_keys=False)

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    # -- hashing (jit static arg support) ----------------------------------
    def _freeze(self, v=None) -> Any:
        v = self._data if v is None else v
        if isinstance(v, dict):
            return tuple(sorted((k, self._freeze(x)) for k, x in v.items()))
        if isinstance(v, list):
            return tuple(self._freeze(x) for x in v)
        return v

    def __hash__(self) -> int:
        return hash(self._freeze())

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Config) and self._freeze() == other._freeze()


def _deep_merge(base: Dict[str, Any], delta: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in delta.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(s: str) -> Any:
    """Parse a CLI override value with YAML semantics (1e-3 -> float, etc.)."""
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def apply_overrides(data: Dict[str, Any], overrides) -> Dict[str, Any]:
    """Apply dotted-path overrides like ``train.n_rays=256``."""
    out = copy.deepcopy(data)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value, got {ov!r}")
        path, value = ov.split("=", 1)
        node = out
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = _parse_value(value)
    return out


def load_config(name: str = "default", overrides=None,
                config_dir: str | None = None) -> Config:
    """Load ``<config_dir>/<name>.yaml`` merged over default.yaml + overrides.

    Mirrors the reference's hydra entry (reference: python/train.py:168-179)
    where every named config is a delta on ``default``.
    """
    config_dir = config_dir or _CONFIG_DIR
    if name.endswith(".yaml"):
        name = name[:-5]
    with open(os.path.join(config_dir, "default.yaml")) as f:
        data = yaml.safe_load(f) or {}
    if name != "default":
        with open(os.path.join(config_dir, f"{name}.yaml")) as f:
            delta = yaml.safe_load(f) or {}
        data = _deep_merge(data, delta)
    data = apply_overrides(data, overrides)
    return Config(data)


def save_config(conf: Config, path: str) -> None:
    with open(path, "w") as f:
        f.write(conf.to_yaml())
