import random

import numpy as np

from promptttspp_tpu.data.batching import (
    ShuffleBatchSampler, batch_by_size, bucket_shape)
from promptttspp_tpu.data.collate import PromptTTSCollator
from promptttspp_tpu.data.prompts import (
    augment_style_prompt, build_prompt, combine_with_spk_prompt,
    words_to_prompt)


def test_batch_by_size_semantics():
    lens = [3, 4, 5, 6, 7, 8, 20]
    batches = batch_by_size(range(7), lambda i: lens[i], max_tokens=20)
    # fairseq rule: close batch when (n+1)*max_len exceeds max_tokens
    flat = [i for b in batches for i in b]
    assert flat == list(range(7))
    for b in batches:
        max_len = max(lens[i] for i in b)
        assert len(b) * max_len <= 20


def test_batch_by_size_multiple():
    lens = [5] * 10
    batches = batch_by_size(range(10), lambda i: lens[i], max_tokens=20,
                            required_batch_size_multiple=4)
    assert batches[0] == [0, 1, 2, 3]


def test_shuffle_batch_sampler_deterministic():
    batches = [[1], [2], [3], [4]]
    s1 = list(iter(ShuffleBatchSampler(list(batches), seed=5)))
    s2 = list(iter(ShuffleBatchSampler(list(batches), seed=5)))
    assert s1 == s2
    assert sorted(x[0] for x in s1) == [1, 2, 3, 4]


def test_shuffle_batch_sampler_epoch_pure():
    """Order is a pure function of (seed, epoch) — a sampler that jumps
    straight to epoch k (resume) sees the exact order one that iterated
    epochs 1..k (continuous run) sees (VERDICT r2 #8)."""
    batches = [[i] for i in range(32)]
    cont = ShuffleBatchSampler(list(batches), seed=7)
    orders = {}
    for ep in range(1, 4):
        cont.set_epoch(ep)
        orders[ep] = list(iter(cont))
    resumed = ShuffleBatchSampler(list(batches), seed=7)
    resumed.set_epoch(3)
    assert list(iter(resumed)) == orders[3]
    # epochs genuinely differ and permute the same set
    assert orders[1] != orders[2] != orders[3]
    for ep in orders:
        assert sorted(x[0] for x in orders[ep]) == list(range(32))
    # different seed -> different stream
    other = ShuffleBatchSampler(list(batches), seed=8)
    other.set_epoch(3)
    assert list(iter(other)) != orders[3]


def test_bucket_shape():
    assert bucket_shape(17, 16) == 32
    assert bucket_shape(16, 16) == 16
    assert bucket_shape(1, 64) == 64


def test_collator_shapes_and_padding():
    rng = np.random.RandomState(0)
    items = []
    for Tp, Tf in [(5, 40), (9, 70)]:
        items.append(dict(
            spk_id=0, utt_id="u",
            phonemes=rng.randint(1, 90, Tp).astype(np.int32),
            duration=np.full(Tp, Tf // Tp, np.int32),
            mel=rng.randn(Tf, 80).astype(np.float32),
            log_cf0=rng.randn(Tf, 1).astype(np.float32),
            vuv=np.ones((Tf, 1), np.float32),
            energy=np.ones((Tf, 1), np.float32),
            prompt="hello world",
        ))
    batch = PromptTTSCollator(phone_quantum=16, frame_quantum=64)(items)
    assert batch["phoneme"].shape == (2, 16)
    assert batch["mel"].shape == (2, 128, 80)
    assert batch["phone_lengths"].tolist() == [5, 9]
    assert batch["frame_lengths"].tolist() == [40, 70]
    assert batch["phoneme"][0, 5:].sum() == 0  # zero padding
    assert batch["mel"][0, 40:].sum() == 0


def test_words_to_prompt():
    rng = random.Random(0)
    p = words_to_prompt(["deep", "calm", "bright", "soft", "warm", "clear"],
                        rng)
    assert p.endswith(".")
    assert any(t in p for t in ("speaker identity", "voice characteristics",
                                "speaker's voice"))


def test_combine_patterns():
    rng = random.Random(1)
    cand = {7: ["deep", "calm", "soft", "warm", "clear"]}
    seen = set()
    for _ in range(50):
        out = combine_with_spk_prompt("A style.", 7, cand, rng)
        seen.add(("A style." in out, "described as" in out))
    assert len(seen) >= 3  # multiple combination patterns exercised
    # unknown speaker: unchanged
    assert combine_with_spk_prompt("A style.", 99, cand, rng) == "A style."


def test_augment_style_prompt():
    rng = random.Random(2)
    base = "a man speaks with high-pitched voice slowly and loudly today"
    out = augment_style_prompt(base, "very high", "very slow", "very loud",
                               p_augment=1.0, rng=rng)
    assert " high-pitched " not in f" {out} " or "high-pitched" in out
    for adv_target in ("high-pitched", "slowly", "loudly"):
        idx = out.find(adv_target)
        assert idx > 0
    # adverb inserted before at least one keyword
    assert any(a in out for a in
               ["very", "extremely", "highly", "really", "particularly"])
    # p_augment=0 -> unchanged
    assert augment_style_prompt(base, "very high", "n", "n", 0.0, rng) == base


def test_build_prompt_full():
    rng = random.Random(3)
    out = build_prompt(
        "F_p-high_s-slow_e-loud", 7, "very high", "slow", "loud",
        {"F_p-high_s-slow_e-loud": ["a woman speaks slowly"]},
        {7: ["deep", "calm", "soft", "warm", "clear"]},
        rng)
    assert isinstance(out, str) and len(out) > 0
