"""Async input pipeline: prefetch_batches must produce bit-identical
batches, in identical order (including the sample-time prompt RNG draws),
to the synchronous loop — in both the Python path and the native C++
loader path."""

import subprocess
from pathlib import Path

import numpy as np
import pytest
import yaml

from promptttspp_tpu.data.collate import PromptTTSCollator
from promptttspp_tpu.data.dataset import AllWithSpkPromptNormDataset
from promptttspp_tpu.data.prefetch import prefetch_batches
from promptttspp_tpu.parallel.mesh import pad_batch_to_multiple, shard_batch

from test_train import SyntheticDataset, TokenHashTokenizer

REPO = Path(__file__).resolve().parent.parent

ARRAY_KEYS = ("phoneme", "duration", "phone_lengths", "mel", "log_cf0",
              "vuv", "energy", "frame_lengths", "batch_weight")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """On-disk npy corpus in the dataset's expected layout; one utterance
    has the reference's off-by-one duration excess
    (all_with_spk_prompt_norm.py:185-186)."""
    root = tmp_path_factory.mktemp("prefetch_corpus")
    rng = np.random.RandomState(0)
    mel_dir = root / "mel63"
    feats = root / "feats"
    rows = []
    for i, (spk, T) in enumerate([(11, 40), (11, 55), (22, 72), (22, 38),
                                  (11, 61), (22, 47)]):
        (mel_dir / str(spk)).mkdir(parents=True, exist_ok=True)
        (feats / str(spk) / "cf0").mkdir(parents=True, exist_ok=True)
        (feats / str(spk) / "vuv").mkdir(parents=True, exist_ok=True)
        utt = f"utt{i}"
        np.save(mel_dir / str(spk) / f"{utt}.npy",
                rng.randn(80, T).astype(np.float32) - 4.0)
        np.save(feats / str(spk) / "cf0" / f"{utt}.npy",
                (rng.rand(1, T) * 5).astype(np.float32))
        np.save(feats / str(spk) / "vuv" / f"{utt}.npy",
                (rng.rand(1, T) > 0.4).astype(np.float32))
        n_ph = 4 + i % 3
        dur = rng.multinomial(T - n_ph, np.ones(n_ph) / n_ph) + 1
        if i == 2:  # off-by-one: CSV durations sum to T+1
            dur[-1] += 1
        seq = " ".join(str(x) for x in rng.randint(1, 90, n_ph))
        rows.append(f"{spk},{utt},M,normal,normal,normal,K1,"
                    f"{seq},{' '.join(str(d) for d in dur)}")
    (mel_dir / "stats.yaml").write_text(yaml.dump(
        {"mean": -4.2, "std": 2.3, "min": -11.0, "max": 1.0, "var": 5.29}))
    (root / "train.csv").write_text(
        "spk_id,item_name,gender,pitch,speaking_speed,energy,"
        "style_prompt_key,seq,durations\n" + "\n".join(rows) + "\n")
    (root / "style.csv").write_text(
        "K1|a man speaks slowly;a calm low voice;a slow deep voice\n")
    (root / "spk.csv").write_text(
        "11|deep,calm,soft,warm,clear,steady\n"
        "22|bright,quick,clear,light,crisp,sharp\n")
    return root


def make_ds(corpus, seed=7):
    return AllWithSpkPromptNormDataset(
        file_path=corpus / "train.csv", data_root=corpus,
        feats_dir=corpus / "feats", mel_dir=corpus / "mel63",
        prompt_candidate_file=corpus / "style.csv",
        spk_prompt_candidate_file=corpus / "spk.csv", seed=seed)


BATCHES = [[0, 1], [2, 3, 4], [5]]


def sync_batches(ds, collator, pad_multiple=1):
    out = []
    for idx in BATCHES:
        b = pad_batch_to_multiple(collator([ds[i] for i in idx]),
                                  pad_multiple)
        out.append(b)
    return out


def assert_batches_equal(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["prompts"] == w["prompts"]
        assert g["utt_ids"] == w["utt_ids"]
        for k in ARRAY_KEYS:
            np.testing.assert_allclose(
                np.asarray(g[k]), np.asarray(w[k]), rtol=1e-4, atol=1e-5,
                err_msg=f"key {k}")


def test_python_path_matches_sync(corpus):
    collator = PromptTTSCollator(tokenizer=TokenHashTokenizer())
    want = sync_batches(make_ds(corpus), collator)
    got = [host for host, _ in prefetch_batches(
        make_ds(corpus), BATCHES, collator, use_native=False,
        num_workers=4, prefetch_depth=2)]
    assert_batches_equal(got, want)


def test_native_path_matches_sync(corpus):
    from promptttspp_tpu.data import native_loader

    if not native_loader.available():
        subprocess.run(["bash", str(REPO / "native" / "build.sh")],
                       check=True)
    collator = PromptTTSCollator(tokenizer=TokenHashTokenizer())
    want = sync_batches(make_ds(corpus), collator)
    got = [host for host, _ in prefetch_batches(
        make_ds(corpus), BATCHES, collator, use_native=True,
        num_workers=4, prefetch_depth=2)]
    assert_batches_equal(got, want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["prompt_ids"], w["prompt_ids"])
        np.testing.assert_array_equal(g["prompt_mask"], w["prompt_mask"])


def test_generic_dataset_with_mesh():
    """Datasets without the meta split (items path) + on-device batches
    sharded over the mesh's data axis."""
    import jax
    from promptttspp_tpu.parallel.mesh import make_mesh
    from promptttspp_tpu.train.trainer import MODEL_BATCH_KEYS, model_batch

    ds = SyntheticDataset(8, seed=3)
    collator = PromptTTSCollator(tokenizer=TokenHashTokenizer())
    mesh = make_mesh()
    batches = [[0, 1, 2], [3, 4, 5, 6, 7]]
    want = []
    for idx in batches:
        b = pad_batch_to_multiple(collator([ds[i] for i in idx]), 8)
        want.append(shard_batch(model_batch(b), mesh))
    got = list(prefetch_batches(
        ds, batches, collator, pad_multiple=8, mesh=mesh,
        model_keys=MODEL_BATCH_KEYS, num_workers=2, prefetch_depth=2))
    assert len(got) == 2
    for (host, dev), w in zip(got, want):
        assert host["mel"].shape[0] % 8 == 0
        for k in w:
            arr = dev[k]
            assert isinstance(arr, jax.Array)
            assert not arr.sharding.is_fully_replicated or arr.ndim == 0
            np.testing.assert_array_equal(np.asarray(arr), np.asarray(w[k]))


def test_worker_exception_propagates():
    class Exploding(SyntheticDataset):
        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom")
            return super().__getitem__(i)

    collator = PromptTTSCollator(tokenizer=TokenHashTokenizer())
    with pytest.raises(ValueError, match="boom"):
        list(prefetch_batches(Exploding(6), [[0, 1], [2, 3]], collator,
                              num_workers=2))


def test_trainer_sync_native_path(corpus):
    """TTSTrainer._sync_batches(native=True) — the train.input_pipeline=
    sync_native knob — matches the Python sync path bit-for-bit."""
    from promptttspp_tpu.config import Config
    from promptttspp_tpu.parallel.mesh import make_mesh
    from promptttspp_tpu.train.trainer import TTSTrainer

    collator = PromptTTSCollator(tokenizer=TokenHashTokenizer())
    mesh = make_mesh()

    def run(native):
        tr = TTSTrainer(Config({}), train_ds=make_ds(corpus))
        return [b for b, _ in tr._sync_batches(
            iter(BATCHES), collator, mesh, 8, native=native)]

    assert_batches_equal(run(True), run(False))
    for g, w in zip(run(True), run(False)):
        np.testing.assert_array_equal(g["prompt_ids"], w["prompt_ids"])
