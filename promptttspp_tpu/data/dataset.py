"""Feature dataset (CSV + per-utterance npy) with sample-time prompts.

Behavioral equivalent of
`/root/reference/promptttspp/datasets/all_with_spk_prompt_norm.py:25-257`,
torch-free: numpy arrays out, seedable prompt randomness. Per item it
loads the mel (normalized by the global stats.yaml mean/std), cf0/vuv
targets, computes energy on the fly, fixes the occasional off-by-one
duration, and synthesizes a style(+speaker) prompt string.

Output layout is TPU-native: mel [T, 80], cf0/vuv/energy [T, 1].
"""

from __future__ import annotations

import random as _random
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import yaml

from promptttspp_tpu.data.prompts import build_prompt

_USE_COLS = [
    "spk_id", "item_name", "gender", "pitch", "speaking_speed", "energy",
    "style_prompt_key", "seq", "durations",
]


def read_prompt_candidate(filepath) -> Dict[str, List[str]]:
    """style_key -> list of lowercase paraphrases (`:74-86`)."""
    df = pd.read_csv(filepath, header=None, sep="|",
                     names=["style_key", "prompt"])
    out = {}
    for _, row in df.iterrows():
        out[row.iloc[0]] = [s.lower().strip() for s in row.iloc[1].split(";")]
    return out


def read_spk_prompt_candidate(filepath) -> Dict[int, List[str]]:
    """spk_id -> descriptor word list (`:88-93`)."""
    df = pd.read_csv(filepath, sep="|", header=None, names=["spk", "words"])
    return {int(r["spk"]): r["words"].split(",") for _, r in df.iterrows()}


class AllWithSpkPromptNormDataset:
    def __init__(
        self,
        file_path,
        data_root,
        feats_dir,
        mel_dir,
        prompt_candidate_file,
        spk_prompt_candidate_file,
        to_mel=None,  # accepted for config compatibility; unused (`:44`)
        use_spk_prompt: bool = True,
        p_augment: float = 0.0,
        seed: Optional[int] = None,
    ):
        df = pd.read_csv(file_path, usecols=_USE_COLS)
        self.data = df[_USE_COLS].values.tolist()
        self.lengths = [
            sum(int(d) for d in row[-1].split()) for row in self.data
        ]
        self.data_root = Path(data_root)
        self.feats_dir = Path(feats_dir)
        self.mel_dir = Path(mel_dir)
        self.prompt_candidate = read_prompt_candidate(prompt_candidate_file)
        self.spk_prompt_candidate = read_spk_prompt_candidate(
            spk_prompt_candidate_file)
        self.use_spk_prompt = use_spk_prompt
        self.p_augment = p_augment
        with open(self.mel_dir / "stats.yaml") as f:
            self.stats = yaml.safe_load(f)
        self.rng = _random.Random(seed)

    def __len__(self):
        return len(self.data)

    def num_tokens(self, index: int) -> int:
        return self.lengths[index]

    def num_phones(self, index: int) -> int:
        """Phone count from CSV metadata (no npy IO) — multi-host
        loading uses this for global shape buckets."""
        return self.data[index][-2].count(" ") + 1

    def ordered_indices(self) -> np.ndarray:
        """Length-sorted (stable) indices (`:251-257`)."""
        indices = np.arange(len(self))
        return indices[np.argsort(np.asarray(self.lengths)[indices],
                                  kind="mergesort")]

    def _load_features(self, spk, utt_id, seq, durations):
        phonemes = np.asarray([int(s) for s in seq.split()], np.int32)
        dur = np.asarray([int(d) for d in durations.split()], np.int32)

        mel = np.load(self.mel_dir / f"{spk}/{utt_id}.npy")  # [80, T]
        mel_norm = (mel - self.stats["mean"]) / self.stats["std"]
        log_cf0 = np.load(self.feats_dir / f"{spk}/cf0/{utt_id}.npy")
        vuv = np.load(self.feats_dir / f"{spk}/vuv/{utt_id}.npy")
        log_cf0 = log_cf0.reshape(-1)
        vuv = vuv.reshape(-1)
        energy = np.sqrt(np.sum(np.exp(mel) ** 2, axis=0)).reshape(-1)
        T = mel.shape[-1]
        assert T == log_cf0.shape[-1] == vuv.shape[-1]
        if T < dur.sum():  # off-by-one fix (`:185-186`)
            dur[-1] -= 1
        assert T == dur.sum(), (T, dur.sum())
        return (
            phonemes, dur,
            np.ascontiguousarray(mel_norm.T, np.float32),      # [T, 80]
            log_cf0[:, None].astype(np.float32),               # [T, 1]
            vuv[:, None].astype(np.float32),
            energy[:, None].astype(np.float32),
        )

    # -- async-pipeline split (data/prefetch.py): item_meta draws from the
    # shared prompt RNG and must be called in sampler order on one thread;
    # load_item_features is pure/thread-safe and does the heavy IO.
    def item_meta(self, idx: int) -> Dict:
        (spk_id, utt_id, gender, pitch, speaking_speed, energy_tag,
         style_prompt_key, seq, durations) = self.data[idx]
        prompt = build_prompt(
            style_prompt_key, spk_id, pitch, speaking_speed, energy_tag,
            self.prompt_candidate, self.spk_prompt_candidate, self.rng,
            use_spk_prompt=self.use_spk_prompt, p_augment=self.p_augment)
        return dict(
            spk_id=spk_id, utt_id=utt_id, seq=seq, durations=durations,
            prompt=prompt, n_frames=self.lengths[idx],
            mel_path=str(self.mel_dir / f"{spk_id}/{utt_id}.npy"),
            cf0_path=str(self.feats_dir / f"{spk_id}/cf0/{utt_id}.npy"),
            vuv_path=str(self.feats_dir / f"{spk_id}/vuv/{utt_id}.npy"),
        )

    def load_item_features(self, meta: Dict) -> Dict:
        phonemes, dur, mel, log_cf0, vuv, energy = self._load_features(
            meta["spk_id"], meta["utt_id"], meta["seq"], meta["durations"])
        return dict(
            spk_id=meta["spk_id"], utt_id=meta["utt_id"], phonemes=phonemes,
            duration=dur, mel=mel, log_cf0=log_cf0, vuv=vuv, energy=energy,
            prompt=meta["prompt"],
        )

    def __getitem__(self, idx: int):
        return self.load_item_features(self.item_meta(idx))


class PromptTTSDataset:
    """Older eager-cache variant (`datasets/prompttts.py:24-113`,
    SURVEY.md §2.3): pipe-separated rows with a FIXED prompt per row, mel
    computed from the wav at load time (our jitted transform), everything
    cached in RAM. Unused by the shipped configs; kept for API parity.
    """

    def __init__(self, file_path, data_root, feats_dir, to_mel, split="|"):
        self.data_root = Path(data_root)
        self.feats_dir = Path(feats_dir)
        self.to_mel = to_mel
        self.data = self._read(file_path, split)
        self.cache = {}
        self.lengths = []
        self._load()

    def _read(self, file_path, split):
        rows = []
        with open(file_path) as f:
            for line in f:
                spk, utt_id, _, seq, duration, prompt = \
                    line.strip().split(split)
                rows.append((spk, utt_id,
                             [int(x) for x in seq.split()],
                             [int(x) for x in duration.split()], prompt))
        return rows

    def _load(self):
        import jax
        import jax.numpy as jnp

        from promptttspp_tpu.preprocess.pipeline import read_wav

        mel_fn = jax.jit(self.to_mel.to_mel)
        for spk, utt_id, seq, duration, prompt in self.data:
            wav, _ = read_wav(self.data_root / f"{spk}/wav24k/{utt_id}.wav")
            mel = np.asarray(mel_fn(jnp.asarray(wav, jnp.float32)[None]))[0]
            n = (len(wav) + self.to_mel.n_fft // 2) // self.to_mel.hop_length
            mel = mel[:n]  # [T, n_mels]
            log_cf0 = np.load(
                self.feats_dir / f"{spk}/cf0/{utt_id}.npy").reshape(-1)
            vuv = np.load(
                self.feats_dir / f"{spk}/vuv/{utt_id}.npy").reshape(-1)
            energy = np.sqrt(np.sum(np.exp(mel) ** 2, axis=1))
            dur = np.asarray(duration, np.int32)
            T = mel.shape[0]
            if T < dur.sum():  # reflect-pad to duration total (`:68-79`)
                diff = int(dur.sum()) - T
                pad = lambda a: np.pad(a, [(0, diff)] + [(0, 0)] * (a.ndim - 1),
                                       mode="reflect")
                mel, log_cf0, vuv, energy = map(pad, (mel, log_cf0, vuv,
                                                      energy))
                T = mel.shape[0]
            assert T == dur.sum(), (T, dur.sum())
            self.cache[f"{spk}_{utt_id}"] = dict(
                spk_id=spk, utt_id=utt_id,
                phonemes=np.asarray(seq, np.int32), duration=dur,
                mel=mel.astype(np.float32),
                log_cf0=log_cf0[:, None].astype(np.float32),
                vuv=vuv[:, None].astype(np.float32),
                energy=energy[:, None].astype(np.float32), prompt=prompt)
            self.lengths.append(T)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        spk, utt_id, *_ = self.data[idx]
        return self.cache[f"{spk}_{utt_id}"]

    def num_tokens(self, index):
        return self.lengths[index]

    def ordered_indices(self):
        indices = np.arange(len(self))
        return indices[np.argsort(np.asarray(self.lengths)[indices],
                                  kind="mergesort")]
