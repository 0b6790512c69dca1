"""Hydra-compatible config composition without the hydra/omegaconf dependency.

The reference drives everything through Hydra config groups
(`/root/reference/egs/proposed/bin/conf/*`, SURVEY.md §5.6). This module
reimplements the subset of Hydra 1.x semantics those configs use, so the
same YAML trees (group dirs, ``defaults`` lists, ``${...}`` absolute and
relative interpolation, ``key=value`` CLI overrides, ``_target_`` nodes)
compose identically here:

- ``compose(config_dir, config_name, overrides)`` -> ``Config`` (dict with
  attribute access).
- ``defaults`` entries: ``- _self_``, ``- group: name``, ``- group: null``.
- overrides: ``group=name`` (switch group), ``a.b=v`` (set, YAML-parsed),
  ``+a.b=v`` (add), ``~a.b`` (delete).
- interpolation: ``${a.b}`` absolute from root; ``${.k}`` sibling,
  ``${..k}`` parent-level, etc. (OmegaConf relative semantics). A value
  that is exactly one interpolation keeps the referent's type.
- a top-level ``hydra:`` node: ``apply_hydra_runtime`` honors the
  ``hydra.run.dir`` / ``hydra.output_subdir`` / ``hydra.job_logging``
  subset the reference configs use (chdir into the run dir, optional
  composed-config snapshot, log format) — entry points opt in;
  ``compose`` alone still treats it as inert data and drops it.
"""

from __future__ import annotations

import copy
import functools
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import yaml


class Config(dict):
    """A dict with attribute access, deep-converting nested mappings."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = self._convert(v)

    @classmethod
    def _convert(cls, v):
        if isinstance(v, Config):
            return v
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, list):
            return [cls._convert(x) for x in v]
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._convert(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._convert(value))

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def select(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def to_dict(self) -> dict:
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


# YAML 1.1 leaves '1e-3' a string (no dot); OmegaConf parses it as float.
_SCI_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce_floats(node):
    if isinstance(node, dict):
        return {k: _coerce_floats(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_coerce_floats(v) for v in node]
    if isinstance(node, str) and _SCI_FLOAT_RE.match(node):
        return float(node)
    return node


def load_yaml(path) -> Config:
    with open(path) as f:
        data = yaml.safe_load(f)
    return Config(_coerce_floats(data or {}))


def _merge(base: Config, over: dict) -> Config:
    """Recursive dict merge; ``over`` wins. Lists replace wholesale."""
    for k, v in over.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, dict):
            _merge(base[k], v)
        else:
            base[k] = Config._convert(copy.deepcopy(v))
    return base


def _parse_value(text: str):
    """YAML-parse a CLI override value ('true' -> True, '1e-3' -> float...)."""
    if text == "":
        return ""
    try:
        return _coerce_floats(yaml.safe_load(text))
    except yaml.YAMLError:
        return text


def _set_dotted(cfg: Config, dotted: str, value, allow_new: bool):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            if not allow_new and p not in node:
                raise KeyError(
                    f"override path '{dotted}' not in config (use +{dotted}=... to add)"
                )
            node[p] = Config()
        node = node[p]
    if not allow_new and parts[-1] not in node:
        raise KeyError(
            f"override key '{dotted}' not in config (use +{dotted}=... to add)"
        )
    node[parts[-1]] = Config._convert(value)


def _del_dotted(cfg: Config, dotted: str):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node[p]
    node.pop(parts[-1], None)


_INTERP_RE = re.compile(r"\$\{([A-Za-z0-9_.]*?)\}")


def _resolve_ref(root: Config, path_stack: List[Config], expr: str):
    """Resolve one interpolation expression against root / enclosing nodes.

    ``path_stack`` is the chain of dict nodes from root (inclusive) down to
    the dict that directly contains the interpolated value. Returns
    ``(value, ref_stack)`` where ``ref_stack`` is the enclosing-node chain
    of the *referent*, so any interpolations inside the referent resolve in
    their own context (OmegaConf semantics).
    """
    n_dots = len(expr) - len(expr.lstrip("."))
    key = expr[n_dots:]
    if n_dots == 0:
        node: Any = root
        ref_stack = [root]
    else:
        # OmegaConf: one leading dot = the containing node itself.
        idx = len(path_stack) - n_dots
        if idx < 0:
            raise KeyError(f"interpolation '${{{expr}}}' escapes config root")
        node = path_stack[idx]
        ref_stack = list(path_stack[: idx + 1])
    for part in key.split("."):
        if part == "":
            continue
        if not isinstance(node, dict) or part not in node:
            raise KeyError(f"interpolation '${{{expr}}}' -> missing key '{part}'")
        node = node[part]
        if isinstance(node, dict):
            ref_stack.append(node)
    if isinstance(node, dict) and ref_stack and ref_stack[-1] is node:
        ref_stack = ref_stack[:-1]
    return node, ref_stack


def _resolve_node(root: Config, node: Any, stack: List[Config], depth: int = 0):
    if depth > 32:
        raise RecursionError("interpolation cycle detected")
    if isinstance(node, dict):
        stack = stack + [node]
        for k, v in list(node.items()):
            node[k] = _resolve_node(root, v, stack, depth)
        return node
    if isinstance(node, list):
        return [_resolve_node(root, v, stack, depth) for v in node]
    if isinstance(node, str):
        m = _INTERP_RE.fullmatch(node)
        if m:  # whole-string interpolation: preserve referent type
            ref, ref_stack = _resolve_ref(root, stack, m.group(1))
            return _resolve_node(root, copy.deepcopy(ref), ref_stack, depth + 1)

        def sub(match):
            val, ref_stack = _resolve_ref(root, stack, match.group(1))
            val = _resolve_node(root, copy.deepcopy(val), ref_stack, depth + 1)
            return str(val)

        return _INTERP_RE.sub(sub, node)
    return node


def resolve(cfg: Config) -> Config:
    """Resolve all ``${...}`` interpolations in place and return cfg."""
    _resolve_node(cfg, cfg, [])
    return cfg


def compose(
    config_dir: str,
    config_name: str,
    overrides: Optional[Sequence[str]] = None,
    resolve_interpolations: bool = True,
    drop_hydra_node: bool = True,
) -> Config:
    config_dir = Path(config_dir)
    primary = load_yaml(config_dir / f"{config_name}.yaml")
    overrides = list(overrides or [])

    defaults = primary.pop("defaults", None)

    # Partition overrides into group switches vs value overrides.
    group_over: Dict[str, Optional[str]] = {}
    value_over: List[str] = []
    group_names = set()
    if defaults:
        for entry in defaults:
            if isinstance(entry, dict):
                group_names.update(entry.keys())
    for ov in overrides:
        if ov.startswith(("~", "+")) or "=" not in ov:
            value_over.append(ov)
            continue
        key, val = ov.split("=", 1)
        if key in group_names:
            group_over[key] = None if val in ("null", "None") else val
        else:
            value_over.append(ov)

    cfg = Config()
    self_merged = False
    if defaults:
        for entry in defaults:
            if entry == "_self_":
                _merge(cfg, primary)
                self_merged = True
                continue
            if not isinstance(entry, dict):
                raise ValueError(f"unsupported defaults entry: {entry!r}")
            for group, name in entry.items():
                if group in group_over:
                    name = group_over[group]
                if name is None:
                    continue
                sub = load_yaml(config_dir / group / f"{name}.yaml")
                _merge(cfg, Config({group: sub}))
    if not self_merged:
        _merge(cfg, primary)

    for ov in value_over:
        if ov.startswith("~"):
            _del_dotted(cfg, ov[1:])
        elif ov.startswith("+"):
            key, val = ov[1:].split("=", 1)
            _set_dotted(cfg, key, _parse_value(val), allow_new=True)
        else:
            key, val = ov.split("=", 1)
            _set_dotted(cfg, key, _parse_value(val), allow_new=False)

    if drop_hydra_node:
        cfg.pop("hydra", None)
    if resolve_interpolations:
        resolve(cfg)
    return cfg


def apply_hydra_runtime(cfg: Config) -> Optional[Config]:
    """Honor the ``hydra.*`` job plumbing the reference configs carry
    (`/root/reference/egs/proposed/bin/conf/train.yaml:10-19` etc.),
    matching ``@hydra.main(version_base=None)`` behavior for the subset
    used there:

    - ``hydra.run.dir``: created and chdir'd into, so the job's relative
      output paths (``output_dir: ./out``) land inside the run dir —
      CLI-overridable via ``hydra.run.dir=...``;
    - ``hydra.output_subdir``: unless null, the composed config is
      snapshotted to ``<run.dir>/<output_subdir>/config.yaml``;
    - ``hydra.job_logging``: the ``simple`` formatter's format string is
      applied to newly-attached root handlers via ``logging.basicConfig``.

    Pops and returns the hydra node (None when absent). Compose with
    ``drop_hydra_node=False`` to use this."""
    import logging
    import os

    node = cfg.pop("hydra", None)
    if node is None:
        return None
    node = Config(node)
    fmt = node.select("job_logging.formatters.simple.format")
    if fmt:
        logging.basicConfig(format=fmt)
    run_dir = node.select("run.dir")
    if run_dir:
        run_dir = Path(run_dir)
        run_dir.mkdir(parents=True, exist_ok=True)
        os.chdir(run_dir)
    subdir = node.select("output_subdir")
    if subdir:
        out = Path(subdir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "config.yaml").write_text(cfg.to_yaml())
    return node


def main(config_path: str, config_name: str):
    """Decorator mirroring ``@hydra.main(version_base=None)``: parses
    ``sys.argv`` overrides, composes, applies the hydra.* runtime
    semantics (run dir, logging), and calls the wrapped function with
    the config."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper():
            import sys

            cfg = compose(config_path, config_name, overrides=sys.argv[1:],
                          drop_hydra_node=False)
            apply_hydra_runtime(cfg)
            return fn(cfg)

        return wrapper

    return deco
