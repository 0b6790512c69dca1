"""HBM footprint accounting per headline configuration (VERDICT r4 #6).

For each config, the compiled executable's own memory analysis
(`jit(...).lower(...).compile().memory_analysis()`): argument bytes
(params/opt-state/batch resident between steps), output bytes, temp
bytes (XLA's live-activation high-water mark inside the program), and
generated code size. argument+output+temp ≈ the HBM the program needs
above the weights already resident — the quantitative backbone for
"when do you need TP/PP" (parallel/pp.py motivates PP in prose; this
puts numbers on it against the chip's 16 GB).

Configs:
  train      — flagship train step, B=30/Tf=1000 (the reference recipe's
               30k-frame batch), structural freeze, f32 and bf16
  serve      — fused text->wav serving program, B=1, bucket 640
  decode     — 100-step diffusion decode alone, f32 vs bf16 param storage
  pp         — analytic GPipe stage slabs for the flagship denoiser at
               model=2/4/8 (params + per-microbatch activations)

Usage: python scripts/memory_footprint.py [train serve decode pp]
"""

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

GB = 1024 ** 3


def mem_row(compiled):
    m = compiled.memory_analysis()
    if m is None:
        return None
    row = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            row[k.replace("_size_in_bytes", "_gb")] = round(v / GB, 3)
    args = getattr(m, "argument_size_in_bytes", 0) or 0
    out = getattr(m, "output_size_in_bytes", 0) or 0
    alias = getattr(m, "alias_size_in_bytes", 0) or 0
    tmp = getattr(m, "temp_size_in_bytes", 0) or 0
    # aliased donation (train state in == out) is not double-counted
    row["total_gb"] = round((args + out - alias + tmp) / GB, 3)
    return row


def tree_bytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def footprint_train():
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          example_batch)
    from promptttspp_tpu.train.state import (
        bert_freeze_mask, create_train_state, freeze_opt_state,
        make_optimizer, make_train_step)

    B, Tp, Tf = 30, 128, 1000
    model = build_flagship_model()
    batch = {k: jnp.asarray(v)
             for k, v in example_batch(B=B, Tp=Tp, Tf=Tf, L=32).items()}
    rng = jax.random.key(0, impl="rbg")
    tx = make_optimizer()
    state = create_train_state(model, batch, rng, tx)
    mask = bert_freeze_mask(state.params)
    state = freeze_opt_state(state, tx, mask)
    rows = {}
    for bf16 in (False, True):
        step = make_train_step(model, tx, bf16=bf16, freeze_mask=mask)
        compiled = jax.jit(step, donate_argnums=(0,)).lower(
            state, batch, rng).compile()
        rows[f"train_step_B{B}_Tf{Tf}_" + ("bf16" if bf16 else "f32")] = \
            mem_row(compiled)
    rows["state_bytes_gb"] = {
        "params": round(tree_bytes(state.params) / GB, 3),
        "opt_state": round(tree_bytes(state.opt_state) / GB, 3),
        "batch_stats": round(tree_bytes(state.batch_stats) / GB, 3),
        "batch": round(tree_bytes(batch) / GB, 3),
    }
    return rows


def _build_synth(decode_dtype=None):
    from promptttspp_tpu.flagship import (build_flagship_model,
                                          build_vocoder, example_batch,
                                          init_flagship, init_vocoder)
    from promptttspp_tpu.infer import Synthesizer

    sys.path.insert(0, str(REPO))
    from bench import FixedTokenizer

    model = build_flagship_model()
    variables = init_flagship(model, example_batch(B=1, Tp=64, Tf=640,
                                                   L=32))
    vocoder = build_vocoder("bigvgan_f0")
    voc_vars = init_vocoder(vocoder, B=1, frames=640)
    kw = {}
    if decode_dtype:
        kw["decode_param_dtype"] = decode_dtype
    return Synthesizer(
        model, variables, vocoder=vocoder, vocoder_variables=voc_vars,
        mel_stats={"mean": 0.0, "std": 1.0}, tokenizer=FixedTokenizer(),
        phone_quantum=16, frame_quantum=128, max_frames_cap=2048,
        speculative=True, return_int16=True, **kw)


def footprint_serve():
    synth = _build_synth()
    pids = np.ones((1, 32), np.int32)
    pmask = np.ones((1, 32), np.int32)
    phoneme = np.ones((1, 64), np.int32)
    plens = np.full((1,), 64, np.int32)
    from promptttspp_tpu.infer import _host_prng_key

    k1, k2 = _host_prng_key(0), _host_prng_key(1)
    fn = synth._full_fn
    # the fused fn is wrapped with static max_frames; reach the jit
    compiled = fn.lower(
        synth.variables, synth.vocoder_variables, phoneme, plens,
        pids, pmask, None, None, True, 0.5, k1, k2,
        max_frames=640).compile()
    weights = {
        "acoustic_params_gb": round(
            tree_bytes(synth.variables) / GB, 3),
        "vocoder_params_gb": round(
            tree_bytes(synth.vocoder_variables) / GB, 3),
    }
    return {"serve_fused_B1_bucket640": mem_row(compiled),
            "weights": weights}


def footprint_decode():
    """The serving program with f32 vs bf16-STORED decoder params
    (`decode_param_dtype` — the 100-step scan re-streams the denoiser
    weights from HBM every step, so storage dtype sets the decode's
    bandwidth bill AND its argument footprint)."""
    from promptttspp_tpu.infer import _host_prng_key

    rows = {}
    pids = np.ones((1, 32), np.int32)
    pmask = np.ones((1, 32), np.int32)
    phoneme = np.ones((1, 64), np.int32)
    plens = np.full((1,), 64, np.int32)
    k1, k2 = _host_prng_key(0), _host_prng_key(1)
    for dt in (None, "bfloat16"):
        synth = _build_synth(decode_dtype=dt)
        compiled = synth._full_fn.lower(
            synth.variables, synth.vocoder_variables, phoneme, plens,
            pids, pmask, None, None, True, 0.5, k1, k2,
            max_frames=640).compile()
        name = "serve_640_" + ("bf16_decoder_params" if dt
                               else "f32_decoder_params")
        rows[name] = mem_row(compiled)
        rows[name]["acoustic_params_gb"] = round(
            tree_bytes(synth.variables) / GB, 3)
    return rows


def footprint_pp():
    """Analytic GPipe slabs: flagship DiffNet (20 layers, C=256) at
    model=S stages — per-stage params + the per-tick activation set
    (h/cond/temb microbatch + the two rotating boundary buffers)."""
    from promptttspp_tpu.flagship import build_flagship_model

    model = build_flagship_model()
    dn = model.decoder.denoise_fn
    L, C = dn.residual_layers, dn.residual_channels
    B, T = 30, 1000
    H = dn.encoder_hidden_dim  # flagship: 256
    # per-layer params: dilated_conv [3, C, 2C], cond proj [1, H, 2C],
    # out proj [1, C, 2C] (+ biases, negligible)
    per_layer = (3 * C * 2 * C + 1 * H * 2 * C + 1 * C * 2 * C) * 4
    cycle = dn.dilation_cycle_length  # stage size must be a multiple
    rows = {"constraint": (
        f"admissible stage counts for THIS denoiser (L={L}, dilation "
        f"cycle {cycle}): S with L%S==0 and (L/S)%{cycle}==0 — pp.py "
        "raises on others")}
    for S in range(2, L + 1):
        if L % S != 0 or (L // S) % cycle != 0:
            # not a runnable stage split for this denoiser (pp.py
            # constraint) — don't publish a row for it
            continue
        M = S  # microbatches = stages (the default schedule)
        # denoise_pipelined requires B % M == 0 — use the nearest
        # admissible batch to the 30-row recipe so the row describes a
        # runnable config (30 % 4 is not)
        Bs = (B // M) * M or M
        mb = Bs // M
        act = mb * T * C * 4  # one microbatch activation [mb, T, C] f32
        slab = per_layer * (L // S)
        rows[f"pp_S{S}_B{Bs}"] = {
            "stage_param_slab_gb": round(slab / GB, 4),
            "microbatch_act_gb": round(act / GB, 4),
            # h + cond + temb resident per stage + 2 boundary buffers
            "per_stage_working_set_gb": round(
                (slab + 5 * act) / GB, 4),
        }
    return rows


def main():
    which = sys.argv[1:] or ["train", "serve", "decode", "pp"]
    out = {"metric": "memory_footprint",
           "backend": jax.default_backend()}
    prior = REPO / "results" / "memory_footprint.json"
    if which != ["train", "serve", "decode", "pp"] and prior.exists():
        # subset run: merge over the existing file instead of clobbering
        out = {**json.loads(prior.read_text()), **out}
    for name in which:
        fn = {"train": footprint_train, "serve": footprint_serve,
              "decode": footprint_decode, "pp": footprint_pp}[name]
        try:
            out[name] = fn()
        except Exception as e:  # noqa: BLE001 — report and continue
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({name: out[name]}), flush=True)
    Path(REPO / "results").mkdir(exist_ok=True)
    (REPO / "results" / "memory_footprint.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps({"metric": "memory_footprint", "saved": True}))


if __name__ == "__main__":
    main()
