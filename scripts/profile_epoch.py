"""REAL end-to-end training throughput: disk -> host pipeline -> device.

The jitted-step number (scripts/profile_train.py) is a ceiling — it times
`train_step` on a resident synthetic batch. This script measures what the
trainer actually achieves over a real on-disk npy corpus, through the real
hot-loop paths:

  sync      — inline batch assembly (train.prefetch=false)
  prefetch  — async thread-pool pipeline, Python npy loading
  native    — async pipeline + C++ feature loader (native/featloader.cpp)
  ceiling   — jitted step over pre-assembled resident batches

Each mode runs one warmup epoch (compiles every shape bucket) and then
timed epochs. Prints one JSON line per mode:
  {"mode": ..., "frames_per_sec": ..., "steps": ..., "pct_of_ceiling": ...}

Usage: python scripts/profile_epoch.py [--utts 1024] [--max-tokens 15000]
           [--epochs 2] [--tiny] [--bf16]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from promptttspp_tpu.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import yaml  # noqa: E402


def make_corpus(root: Path, n_utts: int, seed: int = 0, mel_dim: int = 80,
                t_range=(300, 1000)):
    """LibriTTS-R-shaped synthetic corpus: 3-10 s utterances (300-1000
    mel frames at hop 240/24kHz), [80,T] mel npy + cf0/vuv + CSVs."""
    rng = np.random.RandomState(seed)
    mel_dir = root / "mel63"
    feats = root / "feats"
    rows = []
    lo, hi = t_range
    for i in range(n_utts):
        spk = 10 + i % 8
        T = int(np.clip(rng.normal((lo + hi) / 2, (hi - lo) / 4), lo, hi))
        (mel_dir / str(spk)).mkdir(parents=True, exist_ok=True)
        (feats / str(spk) / "cf0").mkdir(parents=True, exist_ok=True)
        (feats / str(spk) / "vuv").mkdir(parents=True, exist_ok=True)
        utt = f"utt{i:05d}"
        np.save(mel_dir / str(spk) / f"{utt}.npy",
                (rng.randn(mel_dim, T) - 4.0).astype(np.float32))
        np.save(feats / str(spk) / "cf0" / f"{utt}.npy",
                (rng.rand(1, T) * 5).astype(np.float32))
        np.save(feats / str(spk) / "vuv" / f"{utt}.npy",
                (rng.rand(1, T) > 0.4).astype(np.float32))
        n_ph = max(T // 8, 4)
        dur = rng.multinomial(T - n_ph, np.ones(n_ph) / n_ph) + 1
        seq = " ".join(str(x) for x in rng.randint(1, 90, n_ph))
        rows.append(f"{spk},{utt},M,normal,normal,normal,K1,"
                    f"{seq},{' '.join(str(d) for d in dur)}")
    (mel_dir / "stats.yaml").write_text(yaml.dump(
        {"mean": -4.0, "std": 2.0, "min": -11.0, "max": 1.0, "var": 4.0}))
    (root / "train.csv").write_text(
        "spk_id,item_name,gender,pitch,speaking_speed,energy,"
        "style_prompt_key,seq,durations\n" + "\n".join(rows) + "\n")
    (root / "style.csv").write_text(
        "K1|a man speaks slowly with a low voice;a calm low slow voice;"
        "the speech is deep and slow\n")
    (root / "spk.csv").write_text("\n".join(
        f"{s}|deep,calm,soft,warm,clear,steady,low,quiet"
        for s in range(10, 18)) + "\n")


class Vocab30kTokenizer:
    """Hash-bucket WordPiece stand-in with the flagship's vocab size, so
    tokenization cost is realistic without shipping the 30k vocab file."""

    pad_id = 0

    def batch_encode(self, texts, max_length=None):
        seqs = [[101] + [1000 + (hash(w) % 28000) for w in t.split()] + [102]
                for t in texts]
        L = max_length or max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), L), np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s[:L]
            mask[i, :len(s)] = 1
        return ids, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=1024)
    ap.add_argument("--max-tokens", type=int, default=15000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke) instead of flagship")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--modes", default="ceiling,sync,prefetch,native")
    ap.add_argument("--t-range", default="300,1000",
                    help="min,max utterance frames")
    ap.add_argument("--batch-quantum", type=int, default=8,
                    help="pad batch size up to this multiple with "
                    "zero-weight rows (bounds compile count)")
    ap.add_argument("--frame-quantum", type=int, default=64)
    ap.add_argument("--phone-quantum", type=int, default=16)
    args = ap.parse_args()

    from promptttspp_tpu.data import native_loader
    from promptttspp_tpu.data.batching import (ShuffleBatchSampler,
                                               batch_by_size)
    from promptttspp_tpu.data.collate import PromptTTSCollator
    from promptttspp_tpu.data.dataset import AllWithSpkPromptNormDataset
    from promptttspp_tpu.data.prefetch import prefetch_batches
    from promptttspp_tpu.parallel.mesh import (make_mesh,
                                               pad_batch_to_multiple,
                                               shard_batch)
    from promptttspp_tpu.train.state import (create_train_state,
                                             make_optimizer, make_train_step)
    from promptttspp_tpu.train.trainer import MODEL_BATCH_KEYS, model_batch

    mel_dim = 20 if args.tiny else 80
    t_range = tuple(int(x) for x in args.t_range.split(","))
    tmp = tempfile.mkdtemp(prefix="profile_epoch_")
    root = Path(tmp)
    print(f"corpus: {args.utts} utts -> {root}", file=sys.stderr)
    make_corpus(root, args.utts, mel_dim=mel_dim, t_range=t_range)

    ds = AllWithSpkPromptNormDataset(
        file_path=root / "train.csv", data_root=root,
        feats_dir=root / "feats", mel_dir=root / "mel63",
        prompt_candidate_file=root / "style.csv",
        spk_prompt_candidate_file=root / "spk.csv", seed=0)
    collator = PromptTTSCollator(tokenizer=Vocab30kTokenizer(),
                                 mel_dim=mel_dim,
                                 frame_quantum=args.frame_quantum,
                                 phone_quantum=args.phone_quantum)
    mesh = make_mesh()
    n_data = mesh.shape["data"]
    batches = batch_by_size(ds.ordered_indices(), ds.num_tokens,
                            max_tokens=args.max_tokens,
                            required_batch_size_multiple=n_data)
    batches = [b for b in batches if len(b) % n_data == 0] or batches
    sampler = ShuffleBatchSampler(batches, shuffle=True, seed=0)
    pad_mult = max(n_data, args.batch_quantum)
    print(f"{len(batches)} batches/epoch", file=sys.stderr)

    if args.tiny:
        sys.path.insert(0, str(REPO / "tests"))
        from test_train import tiny_model
        model = tiny_model()
    else:
        from promptttspp_tpu.flagship import build_flagship_model
        model = build_flagship_model()

    first = pad_batch_to_multiple(
        collator([ds[i] for i in batches[0]]), pad_mult)
    tx = make_optimizer()
    state = create_train_state(model, model_batch(first),
                               jax.random.PRNGKey(0), tx)
    train_step = make_train_step(model, tx, donate=False, bf16=args.bf16)
    rng = jax.random.PRNGKey(1)

    def run_epoch(loader):
        n_frames = 0
        nonlocal state
        for batch, dev in loader:
            n_frames += int(np.sum(batch["frame_lengths"]))
            state, metrics = train_step(state, dev, rng)
        # block_until_ready does NOT block over the tunneled backend;
        # only a device->host readback drains the dispatch queue. The
        # last step's metrics chain through state, so reading one leaf
        # proves every step of the epoch completed.
        float(np.asarray(jax.tree_util.tree_leaves(metrics)[0]).sum())
        return n_frames

    def sync_loader():
        for idx in sampler:
            b = pad_batch_to_multiple(collator([ds[i] for i in idx]),
                                      pad_mult)
            yield b, shard_batch(model_batch(b), mesh)

    def sync_native_loader():
        # synchronous loop, but feature IO through the C++ loader (its
        # threads run outside the GIL): the 1-core-host-friendly fast path
        from promptttspp_tpu.data.prefetch import _collate_native

        for idx in sampler:
            metas = [ds.item_meta(i) for i in idx]
            b = pad_batch_to_multiple(
                _collate_native(metas, collator, ds.stats), pad_mult)
            yield b, shard_batch(model_batch(b), mesh)

    def prefetch_loader(native, device_put_in_worker=True):
        return prefetch_batches(
            ds, sampler, collator, pad_multiple=pad_mult,
            mesh=mesh if device_put_in_worker else None,
            model_keys=MODEL_BATCH_KEYS, num_workers=args.workers,
            prefetch_depth=3, use_native=native)

    def prefetch_host_loader(native):
        # device_put on the consumer thread (tunneled backends serialize
        # transfers behind one lock; keep the worker pool IO-only)
        for b, dev in prefetch_loader(native, device_put_in_worker=False):
            yield b, shard_batch(dev, mesh)

    modes = args.modes.split(",")
    results = {}

    # warmup: compile all shape buckets once
    print("warmup epoch (compiling buckets)...", file=sys.stderr)
    run_epoch(sync_loader())

    if "ceiling" in modes:
        resident = [(b, d) for b, d in sync_loader()]
        t0 = time.perf_counter()
        frames = 0
        for _ in range(args.epochs):
            frames += run_epoch(iter(resident))
        dt = time.perf_counter() - t0
        results["ceiling"] = frames / dt
        del resident

    def timed_epochs(loader_fn):
        # epoch-pure shuffle: advance the sampler like the trainer does,
        # so each epoch sees a fresh batch order (IO / bucketing
        # patterns match real training, not a replay of epoch 0)
        t0 = time.perf_counter()
        frames = 0
        for e in range(args.epochs):
            sampler.set_epoch(e + 1)
            frames += run_epoch(loader_fn())
        return frames / (time.perf_counter() - t0)

    loaders = {
        "sync": sync_loader,
        "sync_native": sync_native_loader,
        "prefetch": lambda: prefetch_loader(False),
        "native": lambda: prefetch_loader(True),
        "prefetch_host": lambda: prefetch_host_loader(False),
        "native_host": lambda: prefetch_host_loader(True),
    }
    for mode in modes:
        if mode == "ceiling":
            continue
        if "native" in mode and not native_loader.available():
            print("native loader not built; skipping", file=sys.stderr)
            continue
        results[mode] = timed_epochs(loaders[mode])

    ceiling = results.get("ceiling")
    for mode, fps in results.items():
        print(json.dumps({
            "mode": mode, "frames_per_sec": round(fps),
            "steps_per_epoch": len(batches),
            "pct_of_ceiling": round(100 * fps / ceiling, 1) if ceiling else None,
            "bf16": args.bf16, "devices": jax.device_count(),
        }))


if __name__ == "__main__":
    main()
