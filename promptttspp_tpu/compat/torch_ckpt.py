"""PyTorch-reference checkpoint -> flax parameter tree conversion.

Our modules name submodules after the reference's attribute names, so a
flax path maps mechanically onto a torch ``state_dict`` key:

    ("encoder", "encoders_3", "self_attn", "linear_q") / "kernel"
        -> "encoder.encoders.3.self_attn.linear_q.weight"  (transposed)

Rules:
- ``kernel``  <- ``weight`` (Dense: W^T; Conv1d: [out,in,k]->[k,in,out];
  Conv2d: [out,in,kh,kw]->[kh,kw,in,out]); if ``weight`` is absent but
  ``weight_g``/``weight_v`` exist, weight-norm is folded first
  (w = g * v / ||v||, norm over all dims but 0 — torch's default dim=0
  semantics for ConvNd/Linear).
- ``scale``/``bias`` of LayerNorm/BatchNorm <- ``weight``/``bias``;
  batch_stats ``mean``/``var`` <- ``running_mean``/``running_var``.
- ``embedding`` <- ``weight`` (no transpose).
- ``encoders_N`` path components <- ``encoders.N`` (torch ModuleList).
- everything else (gamma, beta, pos_bias_u/v, gst_embs, GRU weights,
  alpha) converts by name identity.

This doubles as the parity-test loader: tests/goldens/*.npz carry the
reference state_dict as arrays and are loaded through this module.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims except 0."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(v.dtype)


def _to_torch_key(path: Tuple[str, ...]) -> str:
    parts = []
    for p in path:
        # flax list-modules are named name_N; torch ModuleList uses name.N
        if "_" in p:
            head0 = p.split("_", 1)[0]
            if head0 in ("downs", "ups") and any(c.isdigit() for c in p):
                # nested ModuleList-of-ModuleList: downs_0_3_fn -> downs.0.3.fn
                parts.append(p.replace("_", "."))
                continue
            head, _, tail = p.rpartition("_")
            if tail.isdigit() and head and not head[-1].isdigit():
                if head in ("blocks", "encoders", "layers", "convs", "norms",
                            "upsamples", "mrfs", "resblocks", "noise_convs",
                            "mlp", "adaptor", "convs1", "convs2",
                            "activations", "residual_layers", "time_mlp",
                            "to_out", "mid_block", "in_block", "out_block",
                            "net", "flows", "decoders", "conv", "out",
                            "embed"):
                    parts.append(f"{head}.{tail}")
                    continue
        parts.append(p)
    return ".".join(parts)


def _convert_leaf(name: str, flax_val, torch_key_base: str,
                  sd: Mapping[str, np.ndarray], collection: str):
    """Return the converted array for one flax leaf."""
    get = lambda suffix: np.asarray(sd[f"{torch_key_base}.{suffix}"]
                                    if torch_key_base else sd[suffix])

    if collection == "batch_stats":
        if name == "mean":
            return get("running_mean")
        if name == "var":
            return get("running_var")
        raise KeyError(name)

    if name == "kernel":
        full = f"{torch_key_base}.weight" if torch_key_base else "weight"
        if full in sd:
            w = np.asarray(sd[full])
        else:
            w = fold_weight_norm(
                np.asarray(sd[full.replace("weight", "weight_g")]),
                np.asarray(sd[full.replace("weight", "weight_v")]),
            )
        if w.ndim == 2:  # Linear
            return w.T
        if w.ndim == 3:
            if np.ndim(flax_val) == 2 and w.shape[2] == 1:
                # torch 1x1 Conv1d loaded into a flax Dense
                return w[:, :, 0].T
            # Conv1d [out, in/g, k] -> [k, in/g, out]
            return w.transpose(2, 1, 0)
        if w.ndim == 4:  # Conv2d [out, in/g, kh, kw] -> [kh, kw, in/g, out]
            return w.transpose(2, 3, 1, 0)
        raise ValueError(f"unexpected weight ndim for {full}: {w.shape}")
    if name == "kernel_t":
        # ConvTranspose1d [in, out, K] -> [K, in, out] (no flip; the module
        # flips taps at call time)
        full = f"{torch_key_base}.weight" if torch_key_base else "weight"
        if full in sd:
            w = np.asarray(sd[full])
        else:
            w = fold_weight_norm(
                np.asarray(sd[full.replace("weight", "weight_g")]),
                np.asarray(sd[full.replace("weight", "weight_v")]),
            )
        return w.transpose(2, 0, 1)
    if name == "scale":
        # flax LayerNorm/BatchNorm scale <- torch 'weight'; but some modules
        # (ConvNeXt layer scale) have a literal torch param named 'scale'
        full_w = f"{torch_key_base}.weight" if torch_key_base else "weight"
        if full_w in sd:
            return get("weight")
        return get("scale")
    if name == "bias":
        return get("bias")
    if name == "embedding":
        return get("weight")
    if name in ("gamma", "beta"):
        return get(name).reshape(np.shape(flax_val))
    # identity-named leaves (pos_bias_u, gst_embs, GRU weights, alpha, ...);
    # squeeze torch's broadcast shapes like [1, C, 1] down to flax's [C]
    arr = get(name)
    if arr.shape != tuple(np.shape(flax_val)) and arr.size == np.size(flax_val):
        arr = arr.reshape(np.shape(flax_val))
    return arr


def convert_tree(
    flax_tree,
    state_dict: Mapping[str, np.ndarray],
    collection: str = "params",
    prefix: str = "",
    rename: Optional[Dict[str, str]] = None,
):
    """Convert a torch state_dict into the structure of ``flax_tree``.

    Args:
      flax_tree: template (e.g. ``variables['params']``).
      state_dict: torch name -> ndarray.
      collection: 'params' or 'batch_stats'.
      prefix: prepended to every generated torch key (e.g. 'encoder.').
      rename: optional rewrites of the generated torch module path (the
        dotted key *without* the parameter leaf). Keys match either the
        full base exactly or as a dotted prefix (longest match wins), so
        one entry can rewrite a whole subtree.
    """
    rename = rename or {}

    def apply_rename(base: str) -> str:
        if base in rename:
            return rename[base]
        best = None
        for key in rename:
            if base.startswith(key + ".") and (
                    best is None or len(key) > len(best)):
                best = key
        if best is not None:
            return rename[best] + base[len(best):]
        return base

    def rec(node, path):
        if isinstance(node, Mapping):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        base = f"{prefix}{_to_torch_key(path[:-1])}".strip(".")
        base = apply_rename(base)
        arr = _convert_leaf(path[-1], node, base, state_dict, collection)
        arr = np.asarray(arr)
        expected = np.shape(node)
        if tuple(arr.shape) != tuple(expected):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: torch {arr.shape} "
                f"vs flax {expected}"
            )
        return jnp.asarray(arr, dtype=jnp.result_type(node))

    return rec(flax_tree, ())


def torch_state_dict(path, kind: str) -> Dict[str, np.ndarray]:
    """Load the reference trainer's ``{epoch, model, optimizer, ...}``
    checkpoint (`/root/reference/promptttspp/trainers/tts.py:245-254`) or
    the vocoder's ``{generator: ...}`` (`app.py:35-37`) into a plain
    name->ndarray dict. Requires torch (cpu build is fine)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    key = "model" if kind == "model" else "generator"
    sd = ckpt[key] if key in ckpt else ckpt
    return {k: v.numpy() for k, v in sd.items()}


def convert_reference_checkpoint(kind: str, state_dict, cfg):
    """Convert a reference state_dict into our variables dict, building
    the flax template from ``cfg`` (the composed Hydra-style config).

    kind='model' expects the acoustic-model state_dict; kind='vocoder'
    the BigVGAN generator. Weight-norm is folded at load, mirroring the
    reference's ``remove_weight_norm_`` before inference
    (`/root/reference/egs/proposed/bin/synthesize.py:108,116`)."""
    import jax
    import jax.numpy as jnp_  # noqa: F401

    import promptttspp_tpu.models  # noqa: F401
    from promptttspp_tpu.config import instantiate

    if kind == "model":
        from promptttspp_tpu.flagship import example_batch, init_flagship
        from promptttspp_tpu.models.bert import bert_rename_map

        model = instantiate(cfg.model)
        batch = example_batch(B=1, Tp=16, Tf=64, L=16)
        variables = init_flagship(model, batch)
        rename = {"phoneme_embedding.emb": "phoneme_emb.emb"}
        n_bert = int(cfg.model.prompt_encoder.get("bert_num_layers", 12))
        for f, t in bert_rename_map(n_bert).items():
            rename[f"prompt_encoder.bert.{f}"] = \
                f"prompt_encoder.bert.model.{t}"
        out = {"params": convert_tree(variables["params"], state_dict,
                                      rename=rename)}
        if "batch_stats" in variables:
            out["batch_stats"] = convert_tree(
                variables["batch_stats"], state_dict, "batch_stats",
                rename=rename)
        else:
            out["batch_stats"] = {}
        return out

    import jax.numpy as jnp2

    vocoder = instantiate(cfg.vocoder)
    mel = jnp2.zeros((1, 64, cfg.vocoder.in_channel))
    f0 = jnp2.zeros((1, 64, 1))
    variables = jax.jit(
        vocoder.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), mel, f0, deterministic=True)
    return {"params": convert_tree(variables["params"], state_dict),
            "batch_stats": {}}
