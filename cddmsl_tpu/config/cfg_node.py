"""yacs-style hierarchical config with `_BASE_` YAML inheritance.

Mirrors the public surface of the reference config system
(detectron2/config/config.py:60-297): attribute access, `merge_from_file`
with `_BASE_` chaining, `merge_from_list` for `KEY VALUE` CLI overrides,
`freeze()/defrost()`, `clone()`, and YAML dump. Implemented from scratch
(no yacs dependency).
"""

import ast
import copy
import os
from typing import Any, Dict, List

import yaml

_BASE_KEY = "_BASE_"


class CfgNode(dict):
    """A dict with attribute access, freezing, and recursive merge."""

    _FROZEN = "__frozen__"

    def __init__(self, init_dict: Dict[str, Any] = None):
        init_dict = init_dict or {}
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        for k, v in init_dict.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # ---- attribute access ----
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"CfgNode has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode._FROZEN):
            raise AttributeError(f"Cannot set '{name}': CfgNode is frozen")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    def __setitem__(self, key: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode._FROZEN):
            raise AttributeError(f"Cannot set '{key}': CfgNode is frozen")
        super().__setitem__(key, value)

    # ---- freeze ----
    def freeze(self) -> None:
        object.__setattr__(self, CfgNode._FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, CfgNode._FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode._FROZEN)

    def clone(self) -> "CfgNode":
        out = CfgNode()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return out

    # ---- merging ----
    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_a_into_b(other, self)

    def merge_from_file(self, cfg_filename: str, allow_unsafe: bool = True) -> None:
        loaded = _load_yaml_with_base(cfg_filename)
        # version migration (reference config.py merge_from_file: guess the
        # file's version and upgrade old-version keys before merging)
        from .compat import _LATEST, guess_version, upgrade_config

        target_ver = self.get("VERSION", _LATEST)
        loaded_ver = guess_version(loaded, cfg_filename)
        if loaded_ver < target_ver:
            loaded = CfgNode(loaded)
            loaded["VERSION"] = loaded_ver
            loaded = upgrade_config(loaded, to_version=target_ver)
        _merge_a_into_b(loaded, self)

    def merge_from_list(self, cfg_list: List[str]) -> None:
        assert len(cfg_list) % 2 == 0, f"Override list has odd length: {cfg_list}"
        for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
            keys = full_key.split(".")
            d = self
            for sub in keys[:-1]:
                if sub not in d:
                    raise KeyError(f"Non-existent key: {full_key}")
                d = d[sub]
            last = keys[-1]
            if last not in d:
                raise KeyError(f"Non-existent key: {full_key}")
            d[last] = _decode_value(v, d[last], full_key)

    # ---- io ----
    def dump(self) -> str:
        return yaml.safe_dump(_to_plain_dict(self), default_flow_style=None)

    def dump_to_file(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.dump())

    def __repr__(self) -> str:
        return f"CfgNode({dict.__repr__(self)})"


def _to_plain_dict(cfg: CfgNode) -> Dict[str, Any]:
    out = {}
    for k, v in cfg.items():
        out[k] = _to_plain_dict(v) if isinstance(v, CfgNode) else (list(v) if isinstance(v, tuple) else v)
    return out


def _decode_value(v: str, old: Any, full_key: str) -> Any:
    """Parse a CLI string override, checked against the old value's type."""
    if isinstance(v, str):
        try:
            parsed = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            parsed = v  # plain string
    else:
        parsed = v
    # tuple/list interchange, int->float promotion; None always allowed
    if old is None or parsed is None:
        return parsed
    if isinstance(old, tuple) and isinstance(parsed, list):
        parsed = tuple(parsed)
    if isinstance(old, list) and isinstance(parsed, tuple):
        parsed = list(parsed)
    if isinstance(old, float) and isinstance(parsed, int):
        parsed = float(parsed)
    if isinstance(old, bool) != isinstance(parsed, bool) and {type(old), type(parsed)} == {bool, int}:
        parsed = bool(parsed)
    if not isinstance(parsed, type(old)) and not (isinstance(old, (int, float)) and isinstance(parsed, (int, float))):
        raise ValueError(
            f"Type mismatch ({type(old).__name__} vs {type(parsed).__name__}) for key {full_key}: {old} vs {parsed}"
        )
    return parsed


def _merge_a_into_b(a: Any, b: CfgNode) -> None:
    """Recursively merge dict/CfgNode `a` into CfgNode `b` (in place).

    New keys are allowed (the reference uses set_new_allowed selectively; we
    allow new keys so experiment configs can extend the tree).
    """
    if not isinstance(a, dict):
        raise TypeError(f"Cannot merge non-dict {type(a)} into CfgNode")
    for k, v in a.items():
        if isinstance(v, dict):
            if k not in b or not isinstance(b[k], CfgNode):
                b[k] = CfgNode()
            _merge_a_into_b(v, b[k])
        else:
            if isinstance(v, list):
                v = tuple(v) if k not in b or isinstance(b.get(k), tuple) else v
            if k in b and b[k] is not None and v is not None:
                v = _decode_value(v, b[k], k) if isinstance(v, str) or True else v
            b[k] = v


def _load_yaml_with_base(filename: str) -> Dict[str, Any]:
    """Load a YAML file, recursively resolving `_BASE_` inheritance
    (reference: detectron2/config/config.py `load_yaml_with_base`). Also
    tolerates the reference's `BASE_:` typo (SURVEY.md §2.1 configs note) by
    treating it as `_BASE_` — implementing the intended behavior."""
    with open(filename, "r") as f:
        cfg = yaml.safe_load(f) or {}

    base_key = None
    for candidate in (_BASE_KEY, "BASE_"):
        if candidate in cfg:
            base_key = candidate
            break
    if base_key is None:
        return cfg

    base_filename = cfg.pop(base_key)
    if not os.path.isabs(base_filename):
        base_filename = os.path.join(os.path.dirname(filename), base_filename)
    base_cfg = _load_yaml_with_base(base_filename)
    _merge_plain(cfg, base_cfg)
    return base_cfg


def _merge_plain(src: Dict[str, Any], dst: Dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge_plain(v, dst[k])
        else:
            dst[k] = v
