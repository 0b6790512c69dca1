"""Derive the speculative-serving per-phone duration table from a
training CSV (VERDICT r4 #2: replace the flat frames-per-phone bound
with duration statistics from data).

Reads the preprocess-produced dataframe CSV (columns ``seq`` = space-
separated phoneme ids, ``durations`` = space-separated frame counts —
the same MFA-alignment-derived targets the duration MDN trains on,
reference `promptttspp/preprocess/duration.py:86-117`) and writes an npz
with per-phone-id statistics:

  mean[id]  — mean frames per occurrence of phone id
  std[id]   — std of frames per occurrence
  count[id] — occurrences (ids never seen get the global mean/std)

Serve with::

  t = np.load("spec_durations.npz")
  Synthesizer(..., speculative=True,
              spec_duration_table=t["mean"], spec_duration_std=t["std"],
              spec_margin=4.0)

The predictor then buckets each request at
``sum(mean[phones]) + margin * sqrt(sum(std[phones]^2))`` — an
independent-phone CLT tail bound, so ``spec_margin`` directly dials the
mispredict probability (~k-sigma). Evidence/tuning: BENCHMARKS.md
§Speculative bucket prediction, scripts/spec_serving_eval.py.

Usage: python scripts/make_spec_duration_table.py <train.csv>
           [--out spec_durations.npz] [--n-symbols 90]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_table(rows, n_symbols: int):
    """rows: iterable of (seq_str, durations_str)."""
    sums = np.zeros((n_symbols,), np.float64)
    sqs = np.zeros((n_symbols,), np.float64)
    counts = np.zeros((n_symbols,), np.int64)
    for seq, durs in rows:
        ids = np.asarray(seq.split(), dtype=np.int64)
        d = np.asarray(durs.split(), dtype=np.float64)
        assert len(ids) == len(d), "seq/durations length mismatch"
        np.add.at(sums, ids, d)
        np.add.at(sqs, ids, d * d)
        np.add.at(counts, ids, 1)
    seen = counts > 0
    mean = np.zeros((n_symbols,))
    var = np.zeros((n_symbols,))
    mean[seen] = sums[seen] / counts[seen]
    var[seen] = np.maximum(sqs[seen] / counts[seen] - mean[seen] ** 2, 0.0)
    # unseen ids: global per-occurrence stats (conservative fallback)
    if seen.any():
        g_mean = sums[seen].sum() / counts[seen].sum()
        g_var = max(sqs[seen].sum() / counts[seen].sum() - g_mean ** 2, 0.0)
        mean[~seen] = g_mean
        var[~seen] = g_var
    mean[0] = var[0] = 0.0  # pad id
    return mean, np.sqrt(var), counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--out", default="spec_durations.npz")
    ap.add_argument("--n-symbols", type=int, default=90,
                    help="phoneme table size (text/eng.py: 90)")
    args = ap.parse_args()

    import pandas as pd

    df = pd.read_csv(args.csv)
    mean, std, count = build_table(
        zip(df["seq"].astype(str), df["durations"].astype(str)),
        args.n_symbols)
    np.savez(args.out, mean=mean, std=std, count=count)
    nz = count > 0
    print(json.dumps({
        "out": args.out, "n_symbols": args.n_symbols,
        "ids_seen": int(nz.sum()),
        "global_mean_frames_per_phone": round(
            float((mean[nz] * count[nz]).sum() / count[nz].sum()), 3),
        "mean_std_frames": round(float(std[nz].mean()), 3),
    }))


if __name__ == "__main__":
    main()
