"""Asynchronous input pipeline: overlap host batch assembly with device
compute.

The reference overlaps data and compute with 8 DataLoader worker
processes + pinned memory
(`/root/reference/promptttspp/trainers/tts.py:144-150`). TPU-native
equivalent: a producer thread walks the batch sampler in order — drawing
the sample-time prompt randomness serially, so the draws are identical to
the synchronous loop — and hands each batch's heavy work (npy feature IO
via the native C++ loader when built, normalization/energy, collation,
device-count padding, tokenization, and the device_put onto the mesh) to
a thread pool. A bounded queue of in-flight futures gives multi-buffering
with backpressure; results are yielded strictly in sampler order.

Threads (not processes) suffice here: the hot work is numpy/C++ IO that
releases the GIL, and device_put overlaps the H2D copy with the previous
step's compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from promptttspp_tpu.data import native_loader
from promptttspp_tpu.data.batching import bucket_shape
from promptttspp_tpu.parallel.mesh import (pad_batch_to_multiple,
                                           pad_batch_to_rows, shard_batch)


def _collate_native(metas: List[Dict], collator, stats: Dict,
                    t_phones=None, t_frames=None,
                    prompt_pad_to=None) -> Dict:
    """Native-loader batch assembly from item_meta dicts: the C++ loader
    reads/normalizes/pads mel+cf0+vuv and computes energy in one
    multithreaded pass; phonemes/durations/prompts are assembled here.
    t_phones/t_frames/prompt_pad_to force global shapes (multi-host)."""
    B = len(metas)
    phon = [np.asarray([int(s) for s in m["seq"].split()], np.int32)
            for m in metas]
    durs = [np.asarray([int(d) for d in m["durations"].split()], np.int32)
            for m in metas]
    plens = np.asarray([len(p) for p in phon], np.int32)
    Tp = t_phones or bucket_shape(int(plens.max()), collator.phone_quantum)
    Tf = t_frames or bucket_shape(int(max(m["n_frames"] for m in metas)),
                                  collator.frame_quantum)

    feats = native_loader.load_feature_batch(
        [m["mel_path"] for m in metas], [m["cf0_path"] for m in metas],
        [m["vuv_path"] for m in metas], t_frames=Tf,
        mel_mean=float(stats["mean"]), mel_std=float(stats["std"]),
        n_mels=collator.mel_dim or 80)
    flens = feats["frame_lengths"]

    phoneme = np.zeros((B, Tp), np.int32)
    duration = np.zeros((B, Tp), np.int32)
    for i in range(B):
        # off-by-one duration fix (all_with_spk_prompt_norm.py:185-186)
        if flens[i] < durs[i].sum():
            durs[i][-1] -= 1
        assert flens[i] == durs[i].sum(), (flens[i], durs[i].sum())
        phoneme[i, :plens[i]] = phon[i]
        duration[i, :plens[i]] = durs[i]

    batch = dict(
        phoneme=phoneme, duration=duration, phone_lengths=plens,
        mel=feats["mel"], log_cf0=feats["log_cf0"], vuv=feats["vuv"],
        energy=feats["energy"], frame_lengths=flens.astype(np.int32),
        spk_ids=[m["spk_id"] for m in metas],
        utt_ids=[m["utt_id"] for m in metas],
        prompts=[m["prompt"] for m in metas],
    )
    if collator.tokenizer is not None:
        raw_ids, raw_mask = collator.tokenizer.batch_encode(
            batch["prompts"], max_length=prompt_pad_to)
        L = prompt_pad_to or bucket_shape(raw_ids.shape[1],
                                          collator.prompt_quantum)
        ids = np.full((B, L), collator.tokenizer.pad_id, np.int32)
        mask = np.zeros((B, L), np.int32)
        ids[:, : raw_ids.shape[1]] = raw_ids
        mask[:, : raw_mask.shape[1]] = raw_mask
        batch["prompt_ids"] = ids
        batch["prompt_mask"] = mask
    return batch


def prefetch_batches(
    dataset,
    sampler: Iterable[List[int]],
    collator,
    *,
    pad_multiple: int = 1,
    mesh=None,
    model_keys: Optional[Tuple[str, ...]] = None,
    num_workers: int = 8,
    prefetch_depth: int = 3,
    use_native: Optional[bool] = None,
) -> Iterator[Tuple[Dict, Dict]]:
    """Yield ``(host_batch, device_batch)`` pairs in sampler order.

    host_batch: the full numpy batch (lengths, ids, prompts) for
    host-side bookkeeping. device_batch: the model keys, padded to the
    device-count multiple and device_put with data sharding (when a mesh
    is given) — ready for the jitted step.

    use_native: None = auto (native C++ loader if built AND the dataset
    exposes the item_meta/load_item_features split with npy-backed
    features).
    """
    has_meta = hasattr(dataset, "item_meta") and hasattr(
        dataset, "load_item_features")
    native_ok = (native_loader.available() and has_meta
                 and hasattr(dataset, "stats"))
    if use_native is None:
        use_native = native_ok
    elif use_native and not native_ok:
        raise RuntimeError(
            "use_native=True but the native loader is unavailable "
            "(build it with `bash native/build.sh`) or the dataset has "
            "no item_meta/stats")

    def select(batch):
        if model_keys is None:
            return batch
        return {k: batch[k] for k in model_keys if k in batch}

    def assemble_meta(metas, kwargs, pad_rows_to, zero_weight):
        if use_native:
            batch = _collate_native(metas, collator, dataset.stats, **kwargs)
        else:
            batch = collator([dataset.load_item_features(m) for m in metas],
                             **kwargs)
        return finish(batch, pad_rows_to, zero_weight)

    def assemble_items(items, kwargs, pad_rows_to, zero_weight):
        return finish(collator(items, **kwargs), pad_rows_to, zero_weight)

    def finish(batch, pad_rows_to=None, zero_weight=False):
        if pad_rows_to is not None:
            batch = pad_batch_to_rows(batch, pad_rows_to)
        else:
            batch = pad_batch_to_multiple(batch, pad_multiple)
        if zero_weight:  # host slab entirely in the global pad region
            batch["batch_weight"] = np.zeros_like(batch["batch_weight"])
        device = select(batch)
        if mesh is not None:
            device = shard_batch(device, mesh)
        return batch, device

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch_depth, 1))
    stop = threading.Event()
    pool = ThreadPoolExecutor(max_workers=max(num_workers, 1),
                              thread_name_prefix="prefetch")

    def producer():
        try:
            for entry in sampler:
                if stop.is_set():
                    return
                # sampler entries: List[int], or (List[int], collate
                # kwargs) from parallel/distributed.py host_batches
                if isinstance(entry, tuple):
                    idx_batch, kwargs = entry[0], dict(entry[1])
                else:
                    idx_batch, kwargs = entry, {}
                pad_rows_to = kwargs.pop("_pad_rows_to", None)
                zero_weight = kwargs.pop("_zero_weight", False)
                if has_meta:
                    # serial: keeps the prompt-RNG draw order identical
                    # to the synchronous loop
                    work = pool.submit(
                        assemble_meta,
                        [dataset.item_meta(i) for i in idx_batch], kwargs,
                        pad_rows_to, zero_weight)
                else:
                    work = pool.submit(
                        assemble_items,
                        [dataset[i] for i in idx_batch], kwargs,
                        pad_rows_to, zero_weight)
                while not stop.is_set():
                    try:
                        q.put(work, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface in the consumer
            _put(e)
            return
        _put(None)

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    thread = threading.Thread(target=producer, daemon=True,
                              name="prefetch-producer")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item.result()
    finally:
        stop.set()
        while not q.empty():  # unblock a blocked producer
            try:
                q.get_nowait()
            except queue.Empty:  # pragma: no cover
                break
        pool.shutdown(wait=False, cancel_futures=True)
