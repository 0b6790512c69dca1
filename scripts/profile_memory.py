"""HBM footprint accounting per headline configuration (VERDICT r4 #6).

Reports, per compiled program, XLA's own compile-time memory analysis
(`jit(f).lower(args).compile().memory_analysis()`): argument bytes
(params + inputs resident in HBM), output bytes, and temp bytes (the
activation/workspace high-water mark XLA reserves) — plus host-side
pytree byte accounting for the state that persists across steps
(params, optimizer m/v, batch stats). This is the quantitative backbone
for "when is TP/PP worth it" (`parallel/pp.py` motivates PP by denoiser
HBM pressure; this script puts numbers on the slabs).

Configs (each opt-in; compile-only, nothing is executed on the chip):
  --train B TP TF     flagship train step (freeze+structural sg, bf16
                      and f32 variants)
  --serve FRAMES      the serving fused text->wav program at one frame
                      bucket (f32 decode storage vs --decode-bf16)
  --pp STAGES         static DiffNet stage-slab accounting for GPipe PP

Usage:
  python scripts/profile_memory.py --train 30 128 1000 --serve 640
  python scripts/profile_memory.py --serve 640 --decode-bf16
  python scripts/profile_memory.py --pp 4
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def tree_bytes(tree) -> int:
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "nbytes"))


def mem_analysis(compiled):
    """-> dict of the PJRT memory analysis fields (backend-dependent)."""
    try:
        ma = compiled.memory_analysis()
    except Exception as e:  # some backends lack the API
        return {"error": type(e).__name__}
    if ma is None:
        return {"error": "none"}
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes", "peak_memory_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_size_in_bytes", "").replace("_in_bytes", "")] \
                = round(v / 2**20, 1)  # MiB
    return out


def profile_train(B, TP, TF, L=32):
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          example_batch, init_flagship)
    from promptttspp_tpu.train.state import (bert_freeze_mask,
                                             create_train_state,
                                             freeze_opt_state,
                                             make_optimizer, make_train_step)

    model = build_flagship_model()
    batch = {k: jnp.asarray(v)
             for k, v in example_batch(B=B, Tp=TP, Tf=TF, L=L).items()}
    rng = jax.random.key(0, impl="rbg")
    tx = make_optimizer()
    state = create_train_state(model, batch, rng, tx)
    mask = bert_freeze_mask(state.params)
    state = freeze_opt_state(state, tx, mask)

    rows = []
    for bf16 in (False, True):
        step = make_train_step(model, tx, donate=False, bf16=bf16,
                               freeze_mask=mask)
        compiled = step.lower(state, batch, rng).compile()
        rows.append({"config": f"train B={B} Tp={TP} Tf={TF} "
                               f"{'bf16' if bf16 else 'f32'} freeze",
                     **mem_analysis(compiled)})
    persistent = {
        "params_mb": round(tree_bytes(state.params) / 2**20, 1),
        "opt_state_mb": round(tree_bytes(state.opt_state) / 2**20, 1),
        "batch_stats_mb": round(tree_bytes(state.batch_stats) / 2**20, 1),
        "batch_mb": round(tree_bytes(batch) / 2**20, 1),
    }
    return rows, persistent


def profile_serve(frames, decode_bf16=False, B=1, TP=64):
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          build_vocoder, example_batch,
                                          init_flagship, init_vocoder)
    from promptttspp_tpu.infer import Synthesizer, _host_prng_key

    sys.path.insert(0, str(REPO))
    from bench import FixedTokenizer

    model = build_flagship_model()
    variables = init_flagship(model, example_batch(B=B, Tp=TP, Tf=frames,
                                                   L=32))
    vocoder = build_vocoder("bigvgan_f0")
    voc_vars = init_vocoder(vocoder, B=B, frames=frames)
    synth = Synthesizer(
        model, variables, vocoder=vocoder, vocoder_variables=voc_vars,
        mel_stats={"mean": 0.0, "std": 1.0}, tokenizer=FixedTokenizer(),
        phone_quantum=16, frame_quantum=128, max_frames_cap=2048,
        speculative=True, return_int16=True,
        decode_param_dtype="bfloat16" if decode_bf16 else None)

    ph = jnp.zeros((B, TP), jnp.int32)
    pl = jnp.full((B,), TP, jnp.int32)
    pi, pm = (jnp.asarray(a) for a in
              FixedTokenizer().batch_encode(["x"] * B))
    lowered = synth._full_fn.lower(
        synth.variables, synth.vocoder_variables, ph, pl, pi, pm,
        None, None,
        use_max=True, noise_scale=0.0, style_rng=_host_prng_key(0),
        diffusion_rng=_host_prng_key(1), max_frames=frames)
    row = {"config": f"serve fused text->wav bucket={frames} "
                     f"decode={'bf16' if decode_bf16 else 'f32'}",
           **mem_analysis(lowered.compile())}
    row["acoustic_params_mb"] = round(tree_bytes(synth.variables) / 2**20, 1)
    row["vocoder_params_mb"] = round(
        tree_bytes(synth.vocoder_variables) / 2**20, 1)
    return [row]


def profile_pp(n_stages):
    """Static GPipe stage-slab accounting: per-stage denoiser param bytes
    (the slab each pipeline stage must hold resident; parallel/pp.py
    stacks layers into [n_layers//S, ...] slabs per stage)."""
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          example_batch, init_flagship)

    model = build_flagship_model()
    variables = init_flagship(model, example_batch(B=2, Tp=16, Tf=64, L=16))
    dn = variables["params"]["decoder"]["denoise_fn"]
    layer_keys = sorted(k for k in dn if k.startswith("residual_layers_"))
    per_layer = tree_bytes(dn[layer_keys[0]])
    shared = tree_bytes({k: v for k, v in dn.items()
                         if not k.startswith("residual_layers_")})
    L = len(layer_keys)
    slab = per_layer * (L // n_stages)
    return [{
        "config": f"pp denoiser stage slabs S={n_stages}",
        "denoiser_layers": L,
        "per_layer_params_mb": round(per_layer / 2**20, 2),
        "stage_slab_params_mb": round(slab / 2**20, 1),
        "shared_inout_params_mb": round(shared / 2**20, 1),
        "full_denoiser_params_mb": round(
            (per_layer * L + shared) / 2**20, 1),
        "note": "each GPipe stage holds 1/S of the residual stack "
                "resident; activations per microbatch tile are the "
                "[mb, Tf, C] working set in denoise_pipelined",
    }]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", nargs=3, type=int, metavar=("B", "TP", "TF"))
    ap.add_argument("--serve", type=int, metavar="FRAMES")
    ap.add_argument("--decode-bf16", action="store_true")
    ap.add_argument("--pp", type=int, metavar="STAGES")
    args = ap.parse_args()

    result = {"metric": "hbm_footprint", "backend": jax.default_backend(),
              "rows": []}
    if args.train:
        rows, persistent = profile_train(*args.train)
        result["rows"] += rows
        result["train_persistent"] = persistent
    if args.serve:
        result["rows"] += profile_serve(args.serve,
                                        decode_bf16=args.decode_bf16)
    if args.pp:
        result["rows"] += profile_pp(args.pp)
    print(json.dumps(result, indent=1))
    sys.stdout.flush()
    import os

    os._exit(0)  # dodge tunnel teardown hangs


if __name__ == "__main__":
    main()
