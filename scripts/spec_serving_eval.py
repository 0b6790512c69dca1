"""Speculative-serving bucket prediction: mispredict rate and
over-provision cost under REALISTIC duration distributions
(VERDICT r4 #2 — the bench's pinned 10-frames/phone head made
"0 mispredicts" true by construction; this quantifies the policy on
durations that vary like speech).

No real aligned speech is reachable in this environment (zero egress,
pyworld/MFA absent), so durations are SIMULATED from LibriTTS-R-shaped
statistics: per-phone mean durations spread lognormally across an
84-phone inventory around a configurable global rate (read English
speech averages ~60-90 ms/phone => 6-9 frames at the 10 ms hop; the
reference's MDN head predicts exactly these per-phone log-durations,
`promptttspp/modules/variance_adaptor.py:62-102,150-157`), within-phone
lognormal variation, and an utterance-level lognormal speaking-rate
factor (the correlated component a per-phone CLT bound cannot see —
kept explicit so the margin sweep prices it honestly).

For each predictor policy the simulator reports, over N sampled
utterances (phone counts 8..160):
  - mispredict %: true frames > predicted bucket (the request re-runs
    at the true bucket: correct, ~2x latency for that request)
  - over-provision: mean predicted-bucket frames / true frames — the
    decode+vocoder compute factor the speculative dispatch wastes vs a
    perfect oracle bucket (device cost scales ~linearly in bucket
    frames; the on-chip measurement of that linearity is in
    BENCHMARKS.md via bench.py --head-fpp)
  - p50/p99 slack frames

Policies: flat frames-per-phone bound (fpp in 6..12, the shipped
default 10) and the per-phone duration-table CLT predictor
(make_spec_duration_table.py; margin in 2..8), with the table DERIVED
from a disjoint sample of the same generator — i.e. the deployment
workflow end-to-end.

Usage: python scripts/spec_serving_eval.py [--n 20000] [--json out.json]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from promptttspp_tpu.data.batching import bucket_shape  # noqa: E402

FRAME_QUANTUM = 128
MAX_FRAMES_CAP = 2048
N_PHONES = 84  # ARPA inventory (text/eng.py)


class DurationWorld:
    """Synthetic-but-speech-shaped duration generator."""

    def __init__(self, seed=0, global_fpp=7.0, phone_spread=0.35,
                 within_sigma=0.45, rate_sigma=0.15):
        rng = np.random.RandomState(seed)
        # per-phone mean frames, lognormal spread across the inventory
        # (vowels/diphthongs long, stops short — ~3x ratio at 0.35)
        self.mean = global_fpp * np.exp(
            rng.randn(N_PHONES) * phone_spread
            - 0.5 * phone_spread ** 2)
        self.within = within_sigma
        self.rate_sigma = rate_sigma
        # zipf-ish phone frequencies (schwa/t/n dominate English)
        w = 1.0 / np.arange(1, N_PHONES + 1) ** 0.7
        self.freq = w / w.sum()

    def sample_utt(self, rng, n_phones):
        ids = rng.choice(N_PHONES, size=n_phones, p=self.freq)
        rate = np.exp(rng.randn() * self.rate_sigma)
        mu = np.log(self.mean[ids] * rate) - 0.5 * self.within ** 2
        dur = np.exp(mu + rng.randn(n_phones) * self.within)
        return ids, np.maximum(np.round(dur), 1.0)


def corpus_table(world, rng, n_utts=2000):
    """The deployment workflow: derive per-phone stats from sampled
    aligned data (what make_spec_duration_table.py computes from the
    training CSV)."""
    sums = np.zeros(N_PHONES)
    sqs = np.zeros(N_PHONES)
    cnt = np.zeros(N_PHONES)
    for _ in range(n_utts):
        ids, dur = world.sample_utt(rng, rng.randint(8, 161))
        np.add.at(sums, ids, dur)
        np.add.at(sqs, ids, dur * dur)
        np.add.at(cnt, ids, 1)
    seen = cnt > 0
    mean = np.where(seen, sums / np.maximum(cnt, 1), 0)
    var = np.maximum(np.where(seen, sqs / np.maximum(cnt, 1), 0)
                     - mean ** 2, 0)
    return mean, np.sqrt(var)


def evaluate(world, policies, n=20000, seed=1):
    rng = np.random.RandomState(seed)
    utts = [world.sample_utt(rng, rng.randint(8, 161)) for _ in range(n)]
    true = np.array([d.sum() for _, d in utts])
    rows = []
    for name, predict in policies:
        if predict is None:  # oracle: the two-phase pre-pass bucket
            pred = true.astype(np.float64)
        else:
            pred = np.array([predict(ids) for ids, _ in utts], np.float64)
        bucket = np.minimum(
            np.array([bucket_shape(int(p), FRAME_QUANTUM)
                      for p in np.maximum(pred, 1)], np.float64),
            MAX_FRAMES_CAP)
        overflow = true > bucket
        # shipped semantics (infer.py _PendingRequest.result /
        # synthesize_streaming): a request whose PREDICTED bucket is
        # already at max_frames_cap cannot re-dispatch larger — it clips
        # the audio instead of counting as a mispredict. Report the two
        # outcomes separately.
        at_cap = bucket >= MAX_FRAMES_CAP
        miss = overflow & ~at_cap
        clipped = overflow & at_cap
        slack = bucket - true
        over = bucket / np.maximum(true, 1)
        rows.append(dict(
            policy=name,
            mispredict_pct=round(100.0 * miss.mean(), 3),
            clipped_at_cap_pct=round(100.0 * clipped.mean(), 3),
            over_provision_mean=round(float(over.mean()), 3),
            over_provision_p90=round(float(np.percentile(over, 90)), 3),
            slack_p50=int(np.median(slack)),
            slack_p01=int(np.percentile(slack, 1)),
        ))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--global-fpp", type=float, default=7.0)
    ap.add_argument("--rate-sigma", type=float, default=0.15)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    world = DurationWorld(global_fpp=args.global_fpp,
                          rate_sigma=args.rate_sigma)
    tbl_mean, tbl_std = corpus_table(world, np.random.RandomState(42))

    policies = []
    for fpp in (6, 7, 8, 9, 10, 11, 12):
        policies.append((
            f"flat fpp={fpp}",
            lambda ids, fpp=fpp: len(ids) * float(fpp)))
    for k in (2, 3, 4, 5, 6, 8):
        def table_pred(ids, k=k):
            return (tbl_mean[ids].sum()
                    + k * np.sqrt((tbl_std[ids] ** 2).sum()))
        policies.append((f"table margin={k}", table_pred))
    # the SHIPPED predictor (Synthesizer spec_duration_table +
    # spec_margin k + spec_rate_margin r): CLT margin + multiplicative
    # headroom for the correlated utterance-level rate component
    for k, r in ((3, 0.1), (3, 0.2), (3, 0.3), (2, 0.2)):
        def rate_pred(ids, k=k, r=r):
            return (tbl_mean[ids].sum() * (1 + r)
                    + k * np.sqrt((tbl_std[ids] ** 2).sum()))
        policies.append((f"table k={k} rate={r} (shipped)"
                         if (k, r) == (3, 0.2)
                         else f"table k={k} rate={r}", rate_pred))
    # oracle: the bucket the two-phase duration pre-pass would pick —
    # its over-provision is pure frame-quantum rounding, the floor any
    # bucketed serving pays
    policies.append(("oracle (two-phase bucket)", None))

    rows = evaluate(world, policies, n=args.n)
    widths = (28, 14, 10, 9, 9, 9)
    hdr = ("policy", "mispredict %", "over mean", "over p90",
           "slack p50", "slack p01")
    print(" | ".join(h.ljust(w) for h, w in zip(hdr, widths)))
    for r in rows:
        print(" | ".join(str(v).ljust(w) for v, w in zip(
            (r["policy"], r["mispredict_pct"], r["over_provision_mean"],
             r["over_provision_p90"], r["slack_p50"], r["slack_p01"]),
            widths)))
    out = {"metric": "spec_mispredict_sim", "n": args.n,
           "global_fpp": args.global_fpp, "rate_sigma": args.rate_sigma,
           "frame_quantum": FRAME_QUANTUM, "rows": rows}
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in ("metric", "n", "global_fpp")}))


if __name__ == "__main__":
    main()
