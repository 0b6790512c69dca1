"""Anchor metrics for the convergence run's objective eval.

`results/convergence/convergence.json` reports MCD / mel-L1 / F0-RMSE /
VUV on a synthetic world whose scales differ from real speech, so the
raw numbers need anchors to read. This script regenerates the SAME
deterministic corpus (World seed 7, corpus seed 0 — identical to
scripts/convergence_run.py) and scores reference predictors with the
same shipped metrics (promptttspp_tpu/eval/metrics.py), on the same
eval split:

  noise-floor   the same utterance re-drawn with fresh observation
                noise (sigma=0.05) and fresh duration jitter — the
                world's own irreducible spread; no model can do better
  oracle        the generative template track (coarticulated, no noise),
                true durations — what perfect learning would score
  spk-mean      per-speaker mean training frame, repeated (true length):
                the strongest trivial spectral predictor
  global-mean   corpus-mean frame repeated (true length)

F0 anchors: oracle smoothed contour; global-mean-lF0 constant (with
oracle voicing); majority-voicing VUV.

Usage: python scripts/convergence_anchors.py [--utts 256] [--num-eval 12]
Writes results/convergence/anchors.json.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from convergence_run import N_SPK, World  # noqa: E402

from promptttspp_tpu.eval.metrics import (  # noqa: E402
    dtw_path, f0_metrics, mcd, mel_cepstra, mel_l1)


def gen_corpus(n_utts, seed=0):
    """Replays make_learnable_corpus's draw order in memory."""
    world = World()
    rng = np.random.RandomState(seed)
    utts = []
    for i in range(n_utts):
        spk_i = i % N_SPK
        n_ph = rng.randint(16, 64)
        ids, dur, mel, lf0, vuv = world.utterance(rng, n_ph, spk_i)
        utts.append(dict(spk=spk_i, ids=ids, dur=dur, mel=mel,
                         lf0=lf0, vuv=vuv))
    return world, utts


def score(gt, pred_mel, pred_f0=None, pred_vuv=None, gt_f0=None):
    path = dtw_path(mel_cepstra(gt["mel"])[:, 1:],
                    mel_cepstra(pred_mel)[:, 1:])
    row = dict(mcd=mcd(gt["mel"], pred_mel, path=path),
               mel_l1=mel_l1(gt["mel"], pred_mel, path=path),
               dur_ratio=len(pred_mel) / len(gt["mel"]))
    if pred_f0 is not None:
        f = f0_metrics(gt_f0, gt["vuv"], pred_f0, pred_vuv, path)
        row.update(f0_rmse_cents=f["f0_rmse_cents"],
                   vuv_error=f["vuv_error"])
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=256)
    ap.add_argument("--num-eval", type=int, default=12)
    ap.add_argument("--out", default="results/convergence/anchors.json")
    args = ap.parse_args()

    world, utts = gen_corpus(args.utts)
    n_eval = max(8, args.utts // 16)
    train, evals = utts[:-n_eval], utts[-n_eval:][:args.num_eval]

    spk_mean = {}
    for s in range(N_SPK):
        frames = np.concatenate([u["mel"] for u in train if u["spk"] == s])
        spk_mean[s] = frames.mean(axis=0)
    gmean = np.concatenate([u["mel"] for u in train]).mean(axis=0)
    glf0 = np.concatenate(
        [u["lf0"][u["vuv"] > 0] for u in train]).mean()
    voiced_frac = np.concatenate([u["vuv"] for u in train]).mean()
    maj_vuv = 1.0 if voiced_frac > 0.5 else 0.0

    redraw_rng = np.random.RandomState(12345)
    anchors = {k: [] for k in
               ("noise_floor", "oracle", "spk_mean", "global_mean")}
    for u in evals:
        T = len(u["mel"])
        gt_f0 = np.where(u["vuv"] > 0, np.exp(u["lf0"]), 0.0)

        # noise floor: same phones/speaker, fresh duration jitter +
        # observation noise — the world's own spread for this sentence
        # (rendered by World.render, the corpus's own math)
        dur2 = world.sample_durations(redraw_rng, u["ids"], u["spk"])
        mel2, lf02, vuv2 = world.render(u["ids"], dur2, u["spk"],
                                        noise_rng=redraw_rng)
        f02 = np.where(vuv2 > 0, np.exp(lf02), 0.0)
        anchors["noise_floor"].append(score(u, mel2, f02, vuv2, gt_f0))

        # oracle: the noiseless generative track at TRUE durations
        mel_o, lf0_o, vuv_o = world.render(u["ids"], u["dur"], u["spk"])
        f0_o = np.where(vuv_o > 0, np.exp(lf0_o), 0.0)
        anchors["oracle"].append(score(u, mel_o, f0_o, vuv_o, gt_f0))

        # trivial predictors at true length; constant F0 / majority VUV
        const_vuv = np.full(T, maj_vuv, np.float32)
        const_f0 = np.where(const_vuv > 0, np.exp(glf0), 0.0)
        anchors["spk_mean"].append(
            score(u, np.tile(spk_mean[u["spk"]], (T, 1)).astype(
                np.float32), const_f0, const_vuv, gt_f0))
        anchors["global_mean"].append(
            score(u, np.tile(gmean, (T, 1)).astype(np.float32)))

    out = {}
    for k, rows in anchors.items():
        out[k] = {m: round(float(np.mean([r[m] for r in rows])), 4)
                  for m in rows[0]}
    gt_all = np.concatenate([u["mel"] for u in train])
    out["corpus"] = dict(mel_std=round(float(gt_all.std()), 4),
                         voiced_frac=round(float(voiced_frac), 4))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
