"""Recursive ``_target_`` instantiation (Hydra-compatible) with an alias
registry translating the reference's target strings to this framework's
factories, so the reference's shipped model YAMLs
(`/root/reference/egs/proposed/bin/conf/model/*.yaml`) instantiate our
TPU-native modules unchanged.
"""

from __future__ import annotations

import functools
import importlib
from typing import Any, Callable, Dict

# reference target -> our target (filled in by promptttspp_tpu.compat.aliases
# at import time of the models package; kept here so config/ has no model deps)
_TARGET_ALIASES: Dict[str, str] = {}
_REGISTRY: Dict[str, Callable] = {}


def register_target(name: str, fn: Callable = None, *, alias_of: str = None):
    """Register a callable under a target name, or alias one name to another.

    ``register_target("promptttspp.modules.mdn.MDNLayer", alias_of=
    "promptttspp_tpu.nn.mdn.MDNLayer")`` lets reference configs resolve.
    """
    if alias_of is not None:
        _TARGET_ALIASES[name] = alias_of
        return None
    if fn is None:  # decorator form
        def deco(f):
            _REGISTRY[name] = f
            return f

        return deco
    _REGISTRY[name] = fn
    return fn


def _locate(target: str) -> Callable:
    target = _TARGET_ALIASES.get(target, target)
    if target in _REGISTRY:
        return _REGISTRY[target]
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ImportError(f"cannot locate target '{target}'")
    try:
        module = importlib.import_module(module_name)
        return getattr(module, attr)
    except (ImportError, AttributeError):
        # dotted class path like pkg.mod.Class.InnerClass
        parent = _locate(module_name)
        return getattr(parent, attr)


def instantiate(node: Any, *args, **override_kwargs):
    """Hydra-style recursive instantiation.

    dicts with ``_target_`` become objects; ``_partial_: true`` returns a
    ``functools.partial``; other dict/list nodes are instantiated
    recursively. Non-config values pass through.
    """
    if isinstance(node, dict):
        if "_target_" in node:
            kwargs = {}
            for k, v in node.items():
                if k in ("_target_", "_partial_", "_args_", "_recursive_"):
                    continue
                kwargs[k] = instantiate(v)
            kwargs.update(override_kwargs)
            pos = [instantiate(a) for a in node.get("_args_", [])] + list(args)
            fn = _locate(node["_target_"])
            if node.get("_partial_", False):
                return functools.partial(fn, *pos, **kwargs)
            return fn(*pos, **kwargs)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node
