"""Batch assembly: pad to shape buckets, tokenize prompts, emit the dict
batch the model consumes.

Counterpart of the reference collator
(`/root/reference/promptttspp/datasets/prompttts.py:116-168`), with two
TPU-native changes: (1) padded lengths are rounded up to shape buckets
(bounded XLA compilation set); (2) prompts are WordPiece-tokenized here on
host instead of inside the model's forward.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from promptttspp_tpu.data.batching import bucket_shape


class PromptTTSCollator:
    def __init__(self, tokenizer=None, phone_quantum: int = 16,
                 frame_quantum: int = 64, prompt_quantum: int = 16,
                 mel_dim: Optional[int] = None):
        self.tokenizer = tokenizer
        self.phone_quantum = phone_quantum
        self.frame_quantum = frame_quantum
        self.prompt_quantum = prompt_quantum
        self.mel_dim = mel_dim

    def __call__(self, items: List[Dict], t_phones: Optional[int] = None,
                 t_frames: Optional[int] = None,
                 prompt_pad_to: Optional[int] = None) -> Dict:
        """t_phones/t_frames/prompt_pad_to force the padded shapes —
        multi-host loading passes GLOBAL buckets so every host's local
        slice pads to the same shape (parallel/distributed.py
        host_batches). Prompt lengths aren't knowable from metadata
        (prompts are sampled per host), so multi-host runs use a fixed
        prompt_pad_to."""
        B = len(items)
        plens = np.asarray([len(it["phonemes"]) for it in items], np.int32)
        flens = np.asarray([it["mel"].shape[0] for it in items], np.int32)
        Tp = t_phones or bucket_shape(int(plens.max()), self.phone_quantum)
        Tf = t_frames or bucket_shape(int(flens.max()), self.frame_quantum)
        mel_dim = self.mel_dim or items[0]["mel"].shape[1]

        phoneme = np.zeros((B, Tp), np.int32)
        duration = np.zeros((B, Tp), np.int32)
        mel = np.zeros((B, Tf, mel_dim), np.float32)
        log_cf0 = np.zeros((B, Tf, 1), np.float32)
        vuv = np.zeros((B, Tf, 1), np.float32)
        energy = np.zeros((B, Tf, 1), np.float32)
        for i, it in enumerate(items):
            p, f = plens[i], flens[i]
            phoneme[i, :p] = it["phonemes"]
            duration[i, :p] = it["duration"]
            mel[i, :f] = it["mel"]
            log_cf0[i, :f] = it["log_cf0"]
            vuv[i, :f] = it["vuv"]
            energy[i, :f] = it["energy"]

        batch = dict(
            phoneme=phoneme, duration=duration, phone_lengths=plens,
            mel=mel, log_cf0=log_cf0, vuv=vuv, energy=energy,
            frame_lengths=flens,
            spk_ids=[it["spk_id"] for it in items],
            utt_ids=[it["utt_id"] for it in items],
            prompts=[it["prompt"] for it in items],
        )
        if self.tokenizer is not None:
            raw_ids, raw_mask = self.tokenizer.batch_encode(
                batch["prompts"], max_length=prompt_pad_to)
            L = prompt_pad_to or bucket_shape(raw_ids.shape[1],
                                              self.prompt_quantum)
            ids = np.full((B, L), self.tokenizer.pad_id, np.int32)
            mask = np.zeros((B, L), np.int32)
            ids[:, : raw_ids.shape[1]] = raw_ids
            mask[:, : raw_mask.shape[1]] = raw_mask
            batch["prompt_ids"] = ids
            batch["prompt_mask"] = mask
        return batch
