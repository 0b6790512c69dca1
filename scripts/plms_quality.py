"""PLMS vs 100-step ancestral DDPM quality delta (VERDICT r2 #10).

PLMS sampling is the serving latency lever (K/speedup denoiser calls
instead of K); this quantifies what it changes. A sampler comparison is
only meaningful on a TRAINED denoiser — on random weights both chains
emit noise fields and the delta measures nothing — and no released
checkpoint is obtainable in this environment (zero egress). Training
the full TTS model end-to-end on a synthetic corpus is the wrong
instrument too: at ~110 ms/step the denoiser (whose loss term is ~2% of
the total) barely moves in any reasonable wall-clock, and the duration
predictor's drift changes the conditioning between runs.

So this trains the FLAGSHIP-SIZE decoder in isolation (GaussianDiffusion
+ 20-layer/C=256 DiffNet, norm_scale 6 — exactly the
`conf/model/prompttts_mdn_v2_wo_erg_final.yaml` decoder) on a
deterministic smooth cond->mel mapping, directly on the eps objective
(~10 ms/step, so thousands of steps are cheap), then runs the samplers
with IDENTICAL conditioning and compares.

Interpretation anchor: the 100-step ancestral chain's own seed-to-seed
spread. DDPM sampling is stochastic by design — two 100-step chains from
different initial noise differ; a PLMS delta of the same magnitude means
the sampler choice sits within the model's intrinsic sampling variation,
not a quality regression. Reference PLMS (stubbed NotImplementedError
there): `/root/reference/promptttspp/modules/nnsvs/diffusion.py:238-270`.

Usage: python scripts/plms_quality.py [train_steps] [speedups...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from promptttspp_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
import optax

B, T, H, MEL = 8, 256, 256, 80


def mcd(a, b):
    """Mel-cepstral-distortion-style distance on mel frames [T, 80]
    (dB-scaled L2 over coefficients, mean over frames)."""
    d = a - b
    return float(np.mean(np.sqrt(np.sum(d * d, axis=-1)))
                 * 10.0 / np.log(10.0) * np.sqrt(2.0))


def make_data(seed):
    """Deterministic smooth cond [B,T,H] and its target mel [B,T,80].

    cond: per-utterance random piecewise-constant 'phoneme' field,
    smoothed, embedded into H sinusoid channels. mel = fixed random
    projection of cond through tanh, scaled to +-4 (x = mel/6 in the
    flagship's normalized space, well inside the [-1, 1] sampling
    clip)."""
    rng = np.random.RandomState(seed)
    ph = np.repeat(rng.randint(0, 40, (B, T // 8)), 8, axis=1)  # [B,T]
    t = np.arange(T)
    k = np.arange(H)[None, None, :]
    cond = np.sin(ph[..., None] * (k + 1) * 0.13
                  + t[None, :, None] * 0.02 * ((k % 7) + 1))
    proj = np.random.RandomState(0).randn(H, MEL) / np.sqrt(H)
    mel = 4.0 * np.tanh(2.0 * (cond @ proj))
    return cond.astype(np.float32), mel.astype(np.float32)


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    speedups = [int(s) for s in sys.argv[2:]] or [5, 10, 20]

    from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion

    def make_model(speedup=None):
        return GaussianDiffusion(
            in_dim=H, out_dim=MEL, K_step=100, norm_scale=6.0,
            pndm_speedup=speedup,
            denoise_fn=DiffNet(in_dim=MEL, encoder_hidden_dim=H,
                               residual_layers=20, residual_channels=256,
                               kernel_size=3, dilation_cycle_length=4))

    model = make_model()
    cond, mel = make_data(seed=1)
    cond_j, mel_j = jnp.asarray(cond), jnp.asarray(mel)

    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)}, cond_j, mel_j))()
    params = variables["params"]
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, r):
        def loss_fn(p):
            noise, eps = model.apply({"params": p}, cond_j, mel_j,
                                     rngs={"diffusion": r})
            return jnp.mean(jnp.abs(noise - eps))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for i in range(train_steps):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i))
        if i % 500 == 0 or i == train_steps - 1:
            print(f"  step {i:5d}: eps L1 {float(loss):.4f}")
    print(f"trained {train_steps} steps in {time.perf_counter()-t0:.1f}s "
          f"(flagship-size 20-layer C=256 DiffNet, B{B}xT{T})")

    def sample(speedup, seed):
        m = make_model(speedup)

        @jax.jit
        def run(p, c, r):
            return m.apply({"params": p}, c, rng=r,
                           method=GaussianDiffusion.inference)
        return np.asarray(run(params, cond_j, jax.random.PRNGKey(seed)))

    ref = sample(None, seed=3)
    fit = float(np.mean(np.abs(ref - mel)))
    print(f"100-step ancestral: fit-to-target mel L1 {fit:.4f} "
          f"(target std {mel.std():.2f}) MCD-ish "
          f"{mcd(ref.reshape(-1, MEL), mel.reshape(-1, MEL)):.3f} dB")

    alt = sample(None, seed=11)
    seed_l1 = float(np.mean(np.abs(alt - ref)))
    print(f"seed-to-seed (100-step, new noise): mel L1 {seed_l1:.4f}, "
          f"MCD-ish {mcd(alt.reshape(-1, MEL), ref.reshape(-1, MEL)):.3f}"
          f" dB  <- intrinsic DDPM sampling variation, the anchor")

    for s in speedups:
        out = sample(s, seed=3)
        l1 = float(np.mean(np.abs(out - ref)))
        print(f"PLMS-{100 // s:<3} (speedup {s:>2}): vs-100-step mel L1 "
              f"{l1:.4f} ({l1 / max(seed_l1, 1e-9):.2f}x the seed-to-seed"
              f" spread), MCD-ish "
              f"{mcd(out.reshape(-1, MEL), ref.reshape(-1, MEL)):.3f} dB,"
              f" fit-to-target L1 {float(np.mean(np.abs(out - mel))):.4f}")


if __name__ == "__main__":
    main()
