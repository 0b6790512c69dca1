"""Offline feature preprocessing: wav + TextGrid -> durations, cf0/vuv,
mel, stats, CSVs.

Counterpart of `/root/reference/promptttspp/preprocess/preprocess.py:96-150`
and `egs/proposed/bin/compute_mel.py:28-74`, rebuilt TPU-first: instead of
a joblib pool calling C++ pyworld per utterance, utterances are padded
into length buckets and the F0 extractor (ops.f0, YIN) and the mel
frontend (ops.mel) run as batched jitted programs on the accelerator.
Outputs are per-utterance .npy files and CSVs with the reference's schema,
plus the ``finish`` idempotency markers.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import yaml

from promptttspp_tpu.data.batching import bucket_shape
from promptttspp_tpu.ops.f0 import extract_f0
from promptttspp_tpu.ops.interp import interp1d
from promptttspp_tpu.ops.masks import to_log_scale
from promptttspp_tpu.ops.mel import MelSpectrogramTransform
from promptttspp_tpu.preprocess.duration import process_textgrid


def read_wav(path) -> np.ndarray:
    """int16/float wav -> float64 in [-1, 1] (mono)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float64) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float64) / 2147483648.0
    else:
        data = data.astype(np.float64)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, sr


class BatchedFeatureExtractor:
    """Length-bucketed batched F0 + mel extraction on device."""

    def __init__(self, sample_rate=24000, hop_length=240,
                 sample_quantum=24000 * 2, transform=None,
                 f0_method: str = "yin"):
        """f0_method: "yin" (batched on-device, ops/f0.py) or "world"
        (host numpy DIO+StoneMask, preprocess/world_f0.py — the offline
        mirror of the reference's pyworld toolchain; measured deltas in
        BENCHMARKS.md / tests/test_f0_parity.py)."""
        assert f0_method in ("yin", "world")
        self.sr = sample_rate
        self.hop = hop_length
        self.quantum = sample_quantum
        self.f0_method = f0_method
        self.to_mel = transform or MelSpectrogramTransform(
            sample_rate=sample_rate, hop_length=hop_length)
        self._f0_fn = {}
        self._mel_fn = {}

    def _fns(self, Ts: int):
        if Ts not in self._f0_fn:
            self._f0_fn[Ts] = jax.jit(
                lambda w, lo, hi: extract_f0(
                    w, sample_rate=self.sr, hop_length=self.hop,
                    f0_floor=lo, f0_ceil=hi))
            self._mel_fn[Ts] = jax.jit(self.to_mel.to_mel)
        return self._f0_fn[Ts], self._mel_fn[Ts]

    def __call__(self, wavs: List[np.ndarray], f0_floor, f0_ceil):
        """wavs: list of float arrays; returns per-utt dicts of
        (f0, cf0, vuv, mel [T,80]) trimmed to each utt's frame count."""
        B = len(wavs)
        Ts = bucket_shape(max(len(w) for w in wavs), self.quantum)
        padded = np.zeros((B, Ts), np.float32)
        for i, w in enumerate(wavs):
            padded[i, : len(w)] = w
        f0_fn, mel_fn = self._fns(Ts)
        if self.f0_method == "world":
            from promptttspp_tpu.preprocess.world_f0 import (
                extract_pitch_world)

            T = 1 + Ts // self.hop
            f0 = np.zeros((B, T), np.float32)
            cf0 = np.zeros((B, T), np.float32)
            vuv = np.zeros((B, T), np.float32)
            floors = np.broadcast_to(np.asarray(f0_floor, np.float32), (B,))
            ceils = np.broadcast_to(np.asarray(f0_ceil, np.float32), (B,))
            for i in range(B):
                fi, ci, vi = extract_pitch_world(
                    padded[i], self.sr, self.hop,
                    f0_floor=float(floors[i]), f0_ceil=float(ceils[i]))
                n = min(T, len(fi))
                f0[i, :n], cf0[i, :n], vuv[i, :n] = fi[:n], ci[:n], vi[:n]
        else:
            from promptttspp_tpu.preprocess.world_f0 import fix_f0_contour

            f0_dev, _ = f0_fn(jnp.asarray(padded), jnp.asarray(f0_floor),
                              jnp.asarray(f0_ceil))
            # host-side octave contour fix (WORLD FixF0Contour analog) on
            # the training targets, then vuv/cf0 from the fixed contour
            floors = np.broadcast_to(np.asarray(f0_floor, np.float32), (B,))
            ceils = np.broadcast_to(np.asarray(f0_ceil, np.float32), (B,))
            f0 = np.stack([
                fix_f0_contour(row, float(floors[i]), float(ceils[i]))
                for i, row in enumerate(np.asarray(f0_dev))])
            vuv = (f0 > 0).astype(np.float32)
            cf0 = np.asarray(to_log_scale(interp1d(jnp.asarray(f0))))
        mel = mel_fn(jnp.asarray(padded))
        f0, vuv, cf0, mel = map(np.asarray, (f0, vuv, cf0, mel))
        out = []
        for i, w in enumerate(wavs):
            n = (len(w) + self.to_mel.n_fft // 2) // self.hop
            out.append(dict(f0=f0[i, :n], cf0=cf0[i, :n], vuv=vuv[i, :n],
                            mel=mel[i, :n]))
        return out


def preprocess_corpus(
    data_csv: Path,
    data_root: Path,
    feats_dir: Path,
    mel_dir: Path,
    df_dir: Path,
    f0_stats: Optional[Dict] = None,
    eval_ids=(),
    sample_rate: int = 24000,
    n_fft: int = 512,
    hop_length: int = 240,
    batch_size: int = 16,
    debug: bool = False,
    f0_method: str = "yin",
):
    """Full corpus pass (`preprocess.py:96-150` + `compute_mel.py`):
    durations from TextGrid, batched F0 + mel on device, global mel stats,
    train/eval CSV split by speaker."""
    feats_dir, mel_dir, df_dir = Path(feats_dir), Path(mel_dir), Path(df_dir)
    finish_marker = df_dir / "finish"
    if finish_marker.exists():
        print("preprocess: already finished (marker present)")
        return

    df = pd.read_csv(data_csv)
    if debug:
        df = df.head(50)
    extractor = BatchedFeatureExtractor(sample_rate, hop_length,
                                        f0_method=f0_method)

    rows, mel_sum, mel_sqsum, mel_count = [], 0.0, 0.0, 0
    mel_min, mel_max = np.inf, -np.inf

    records = df.to_dict("records")
    for start in range(0, len(records), batch_size):
        chunk = records[start:start + batch_size]
        wavs, metas = [], []
        for r in chunk:
            spk, utt = str(r["spk_id"]), r["item_name"]
            wav_path = Path(data_root) / spk / "wav24k" / f"{utt}.wav"
            tg_path = Path(data_root) / spk / "textgrid" / f"{utt}.TextGrid"
            if not wav_path.exists() or not tg_path.exists():
                continue
            wav, sr = read_wav(wav_path)
            assert sr == sample_rate, (sr, sample_rate)
            res = process_textgrid(spk, utt, wav, tg_path, sample_rate,
                                   n_fft, hop_length)
            if res is None:
                continue
            seq, durations = res
            wavs.append(wav.astype(np.float32))
            metas.append((r, spk, utt, seq, durations))
        if not wavs:
            continue
        floors = [
            (f0_stats or {}).get(m[1], {}).get("f0_floor", 60.0)
            for m in metas
        ]
        ceils = [
            (f0_stats or {}).get(m[1], {}).get("f0_ceil", 600.0)
            for m in metas
        ]
        feats = extractor(wavs, np.asarray(floors, np.float32),
                          np.asarray(ceils, np.float32))
        for (r, spk, utt, seq, durations), ft in zip(metas, feats):
            n = min(len(ft["mel"]), int(durations.sum()))
            for sub in ("cf0", "vuv"):
                d = feats_dir / spk / sub
                d.mkdir(parents=True, exist_ok=True)
                np.save(d / f"{utt}.npy", ft[sub][:n][None, :])
            md = mel_dir / spk
            md.mkdir(parents=True, exist_ok=True)
            mel = ft["mel"][:n]
            np.save(md / f"{utt}.npy",
                    np.ascontiguousarray(mel.T))  # [80, T] like reference
            mel_sum += mel.sum()
            mel_sqsum += (mel ** 2).sum()
            mel_count += mel.size
            mel_min = min(mel_min, float(mel.min()))
            mel_max = max(mel_max, float(mel.max()))
            row = dict(r)
            row["seq"] = " ".join(str(s) for s in seq)
            row["durations"] = " ".join(str(int(d)) for d in durations)
            rows.append(row)

    mean = mel_sum / max(mel_count, 1)
    var = mel_sqsum / max(mel_count, 1) - mean ** 2
    mel_dir.mkdir(parents=True, exist_ok=True)
    with open(mel_dir / "stats.yaml", "w") as f:
        yaml.safe_dump(
            dict(min=float(mel_min), max=float(mel_max), mean=float(mean),
                 std=float(np.sqrt(max(var, 0.0))), var=float(var)), f)
    # mels + stats are complete here, so the standalone compute_mel stage
    # (kept for reference stage-list parity) becomes an idempotent no-op
    (mel_dir / "finish").write_text("done\n")

    out = pd.DataFrame(rows)
    df_dir.mkdir(parents=True, exist_ok=True)
    out.to_csv(df_dir / "data.csv", index=False)
    eval_ids = set(int(e) for e in eval_ids)
    is_eval = out["spk_id"].astype(int).isin(eval_ids)
    out[~is_eval].to_csv(df_dir / "train.csv", index=False)
    out[is_eval].to_csv(df_dir / "eval.csv", index=False)
    finish_marker.write_text("done\n")
    print(f"preprocess: {len(out)} utterances "
          f"({int(is_eval.sum())} eval), stats mean={mean:.3f}")


def split_train_valid(df_dir: Path, filtered_df_dir: Path,
                      valid_frac: float = 0.02, seed: int = 0):
    """Speaker-stratified 98/2 train/val split
    (`egs/proposed/bin/split_df.py:22-62`)."""
    df_dir, filtered_df_dir = Path(df_dir), Path(filtered_df_dir)
    df = pd.read_csv(df_dir / "train.csv")
    rng = np.random.RandomState(seed)
    trn_parts, val_parts = [], []
    for _, g in df.groupby("spk_id"):
        idx = rng.permutation(len(g))
        n_val = max(1, int(len(g) * valid_frac)) if len(g) > 1 else 0
        val_parts.append(g.iloc[idx[:n_val]])
        trn_parts.append(g.iloc[idx[n_val:]])
    filtered_df_dir.mkdir(parents=True, exist_ok=True)
    pd.concat(trn_parts).to_csv(filtered_df_dir / "trn.csv", index=False)
    pd.concat(val_parts).to_csv(filtered_df_dir / "val.csv", index=False)


def filter_eval(df_dir: Path, filtered_df_dir: Path, hop_length: int = 240,
                sample_rate: int = 24000, min_sec: float = 3.0,
                max_sec: float = 10.0):
    """Keep eval utterances of 3-10 s (`egs/proposed/bin/filter_eval.py`)."""
    df_dir, filtered_df_dir = Path(df_dir), Path(filtered_df_dir)
    df = pd.read_csv(df_dir / "eval.csv")
    secs = df["durations"].map(
        lambda s: sum(int(d) for d in s.split()) * hop_length / sample_rate)
    kept = df[(secs >= min_sec) & (secs <= max_sec)]
    filtered_df_dir.mkdir(parents=True, exist_ok=True)
    kept.to_csv(filtered_df_dir / "eval_filtered.csv", index=False)
    print(f"filter_eval: kept {len(kept)}/{len(df)}")
