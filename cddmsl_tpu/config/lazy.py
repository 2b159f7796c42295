"""LazyConfig / instantiate: the python-file config system
(reference detectron2/config/lazy.py:370, instantiate.py:82) without the
omegaconf dependency: configs are python modules evaluated by
`LazyConfig.load`, `LazyCall(fn)(**kwargs)` records a deferred call as a
plain dict with `_target_`, and `instantiate` resolves the tree.
"""

import importlib
import importlib.util
import os
import uuid
from typing import Any, Callable, Dict, Union


class LazyCall:
    """LazyCall(fn)(a=1, b=2) -> {"_target_": fn, "a": 1, "b": 2}."""

    def __init__(self, target: Union[Callable, str]):
        if not (callable(target) or isinstance(target, str)):
            raise TypeError(f"LazyCall target must be callable or str, got {target!r}")
        self._target = target

    def __call__(self, **kwargs) -> Dict[str, Any]:
        return {"_target_": self._target, **kwargs}


def locate(name: str) -> Any:
    """Dotted-path -> object (reference instantiate.py locate)."""
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:i]))
        except ImportError:
            continue
        obj = mod
        for attr in parts[i:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"Cannot locate {name}")


def instantiate(cfg: Any) -> Any:
    """Recursively resolve `_target_` dicts into objects."""
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(v) for v in cfg)
    if isinstance(cfg, dict):
        if "_target_" in cfg:
            kwargs = {k: instantiate(v) for k, v in cfg.items() if k != "_target_"}
            target = cfg["_target_"]
            if isinstance(target, str):
                target = locate(target)
            return target(**kwargs)
        return {k: instantiate(v) for k, v in cfg.items()}
    return cfg


class _Namespace(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    __setattr__ = dict.__setitem__


class LazyConfig:
    @staticmethod
    def load(filename: str, keys: str = None):
        """Execute a python config file, return its globals as an attribute
        dict (reference LazyConfig.load)."""
        spec = importlib.util.spec_from_file_location(
            f"_lazycfg_{uuid.uuid4().hex}", os.path.abspath(filename)
        )
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        ns = _Namespace(
            {k: v for k, v in vars(module).items() if not k.startswith("_")}
        )
        if keys:
            out = ns
            for k in keys.split("."):
                out = out[k]
            return out
        return ns

    @staticmethod
    def apply_overrides(cfg, overrides):
        """'a.b.c=value' strings -> in-place updates (reference
        LazyConfig.apply_overrides)."""
        import ast

        for o in overrides:
            key, _, value = o.partition("=")
            try:
                value = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                pass
            node = cfg
            parts = key.strip().split(".")
            for p in parts[:-1]:
                node = node[p] if isinstance(node, dict) else getattr(node, p)
            if isinstance(node, dict):
                node[parts[-1]] = value
            else:
                setattr(node, parts[-1], value)
        return cfg

    @staticmethod
    def save(cfg, filename: str):
        import pickle

        with open(filename, "wb") as f:
            pickle.dump(cfg, f)
