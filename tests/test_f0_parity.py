"""Quantitative F0 parity evidence (VERDICT r1 Missing #4).

The reference's F0 targets come from pyworld DIO+StoneMask
(`/root/reference/promptttspp/preprocess/pitch.py:20-35`). pyworld is not
installable here and no real speech ships with either repo, so the
evidence is built from two independent measurements on speech-like
signals with KNOWN ground-truth F0 (glottal pulse trains with jitter,
vibrato, formant filtering, an unvoiced noise segment):

1. the TPU YIN path (ops/f0.py) vs ground truth — tight bounds;
2. the from-scratch WORLD-style DIO+StoneMask reimplementation
   (preprocess/world_f0.py, the offline mirror of the reference
   toolchain) vs ground truth;
3. cross-agreement between the two estimators — the measured deltas
   quoted in BENCHMARKS.md.

Bounds asserted here are what BENCHMARKS.md publishes; tighten them only
with re-measured numbers.
"""

import numpy as np
import pytest
from scipy import signal as sps

from promptttspp_tpu.ops.f0 import extract_f0
from promptttspp_tpu.preprocess.world_f0 import (dio, extract_pitch_world,
                                                 stonemask)

FS, HOP = 24000, 240
CLIPS = [(0, 140), (1, 110), (2, 220), (3, 90), (4, 300), (5, 180),
         (6, 260), (7, 400)]


def speech_like(fs=FS, dur=2.0, seed=0, base=140, vib=0.08, jitter=1):
    """Glottal pulse train -> formant filters (500/1500/2500 Hz), with
    vibrato, per-pulse jitter, additive noise, and an unvoiced hiss
    segment at 0.9-1.2 s. Returns (wav, f0_track (0=unvoiced), voiced)."""
    rng = np.random.RandomState(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    f0_track = base * (1 + vib * np.sin(2 * np.pi * 0.7 * t))
    voiced = np.ones(n, bool)
    voiced[int(0.9 * fs):int(1.2 * fs)] = False
    phase = np.cumsum(f0_track / fs)
    pulses = np.zeros(n)
    for i in np.where(np.diff(np.floor(phase)) > 0)[0]:
        j = i + rng.randint(-jitter, jitter + 1)
        if 0 <= j < n and voiced[j]:
            pulses[j] = 1.0 + 0.1 * rng.randn()
    out = pulses.copy()
    for fc, bw in [(500, 80), (1500, 120), (2500, 160)]:
        r = np.exp(-np.pi * bw / fs)
        theta = 2 * np.pi * fc / fs
        out = sps.lfilter([1.0], [1.0, -2 * r * np.cos(theta), r * r], out)
    hiss = np.where(~voiced, rng.randn(n) * 0.15, 0.0)
    x = (out / np.abs(out).max() * 0.6 + rng.randn(n) * 0.02
         + sps.lfilter([1, -0.95], [1], hiss))
    return x.astype(np.float64), np.where(voiced, f0_track, 0.0), voiced


def metrics(f0_est, f0_true, voiced_true):
    est_v = f0_est > 0
    both = voiced_true & est_v
    cents = 1200 * np.abs(np.log2(
        np.maximum(f0_est[both], 1e-9) / f0_true[both]))
    return dict(
        vuv=float((voiced_true == est_v).mean()),
        med_cents=float(np.median(cents)),
        p90_cents=float(np.percentile(cents, 90)),
        octave_frac=float((cents > 600).mean()),
    )


def frame_truth(f0_track, voiced, n_frames):
    idx = np.minimum(np.arange(n_frames) * HOP, len(f0_track) - 1)
    return f0_track[idx], voiced[idx]


@pytest.fixture(scope="module")
def estimates():
    out = []
    for seed, base in CLIPS:
        x, f0_track, voiced = speech_like(seed=seed, base=base)
        f0_y, _ = extract_f0(x.astype(np.float32), FS, HOP,
                             f0_floor=60.0, f0_ceil=500.0)
        f0_y = np.asarray(f0_y)
        times, f0_d = dio(x, FS, f0_floor=60, f0_ceil=500, frame_period=10)
        f0_w = stonemask(x, FS, times, f0_d)
        n = min(len(f0_y), len(f0_w))
        ft, vt = frame_truth(f0_track, voiced, n)
        out.append((base, f0_y[:n], f0_w[:n], ft, vt))
    return out


def test_yin_vs_ground_truth(estimates):
    """The shipped TPU path: VUV >= 0.95, median <= 5 cents,
    p90 <= 15 cents, octave errors <= 6% on every clip."""
    for base, f0_y, _, ft, vt in estimates:
        m = metrics(f0_y, ft, vt)
        assert m["vuv"] >= 0.95, (base, m)
        assert m["med_cents"] <= 5.0, (base, m)
        assert m["p90_cents"] <= 15.0, (base, m)
        assert m["octave_frac"] <= 0.06, (base, m)


def test_world_vs_ground_truth(estimates):
    """The offline DIO+StoneMask mirror: VUV >= 0.95, median <= 20
    cents, p90 <= 50 cents, octave errors <= 1% (spurious formant locks
    are unvoiced by the contour fix)."""
    for base, _, f0_w, ft, vt in estimates:
        m = metrics(f0_w, ft, vt)
        assert m["vuv"] >= 0.95, (base, m)
        assert m["med_cents"] <= 20.0, (base, m)
        assert m["p90_cents"] <= 50.0, (base, m)
        assert m["octave_frac"] <= 0.01, (base, m)


def test_cross_estimator_agreement(estimates):
    """YIN vs WORLD-style deltas (the number BENCHMARKS.md quotes):
    voicing agreement >= 0.93, median <= 25 cents on co-voiced frames."""
    for base, f0_y, f0_w, ft, vt in estimates:
        agree = float(((f0_y > 0) == (f0_w > 0)).mean())
        both = (f0_y > 0) & (f0_w > 0)
        cents = 1200 * np.abs(np.log2(f0_y[both] / f0_w[both]))
        assert agree >= 0.93, (base, agree)
        assert float(np.median(cents)) <= 25.0, (base, np.median(cents))


def test_extract_pitch_world_api():
    """Reference-shaped API contract: T = 1 + len(wav)//hop, cf0 is the
    log of gap-interpolated f0, vuv binary."""
    x, f0_track, voiced = speech_like(seed=9, base=150, dur=1.0)
    f0, cf0, vuv = extract_pitch_world(x, FS, HOP,
                                       f0_floor=60.0, f0_ceil=500.0)
    n = 1 + len(x) // HOP
    assert f0.shape == cf0.shape == vuv.shape == (n,)
    assert set(np.unique(vuv)).issubset({0.0, 1.0})
    v = f0 > 0
    np.testing.assert_allclose(cf0[v], np.log(f0[v]), rtol=1e-6)
    assert (cf0[~v] > 0).any()  # gaps interpolated, not zeroed


def test_pipeline_world_method(tmp_path):
    """BatchedFeatureExtractor(f0_method="world") produces the same
    layout as the YIN path and sane values."""
    from promptttspp_tpu.preprocess.pipeline import BatchedFeatureExtractor

    x, f0_track, voiced = speech_like(seed=3, base=120, dur=1.0)
    for method in ("yin", "world"):
        ex = BatchedFeatureExtractor(FS, HOP, f0_method=method)
        (feats,) = ex([x.astype(np.float32)], np.float32(60.0),
                      np.float32(500.0))
        n = (len(x) + ex.to_mel.n_fft // 2) // HOP
        assert feats["f0"].shape == (n,)
        assert feats["mel"].shape[0] == n
        voiced_est = feats["f0"] > 0
        assert voiced_est.mean() > 0.5  # mostly voiced clip
        med = np.median(feats["f0"][voiced_est])
        assert 100 < med < 140, (method, med)


def test_pipeline_yin_contour_fix():
    """The preprocessing pipeline's YIN path applies the host-side
    octave contour fix (fix_f0_contour): on a clip where raw YIN shows
    octave errors, the pipeline's training targets have (near-)none."""
    from promptttspp_tpu.preprocess.pipeline import BatchedFeatureExtractor

    x, f0_track, voiced = speech_like(seed=5, base=180)
    ex = BatchedFeatureExtractor(FS, HOP)
    (feats,) = ex([x.astype(np.float32)], np.float32(60.0),
                  np.float32(500.0))
    n = len(feats["f0"])
    ft, vt = frame_truth(f0_track, voiced, n)
    m = metrics(feats["f0"], ft, vt)
    assert m["octave_frac"] <= 0.01, m
    assert m["vuv"] >= 0.95, m
    # cf0/vuv must be derived from the FIXED contour
    v = feats["f0"] > 0
    np.testing.assert_array_equal(feats["vuv"], v.astype(np.float32))
    np.testing.assert_allclose(feats["cf0"][v], np.log(feats["f0"][v]),
                               rtol=1e-5)


def test_f0_edge_cases():
    """No crashes, sane behavior on degenerate inputs (pure noise,
    silence, very short clips). The YIN path rejects pure noise via its
    CMND voicing threshold; the WORLD-style mirror shares the DIO
    family's known weakness of voicing band-limited noise (pyworld does
    too), so only finiteness is asserted for it there."""
    rng = np.random.RandomState(0)
    noise = rng.randn(FS // 2)
    f0, cf0, vuv = extract_pitch_world(noise, FS, HOP,
                                       f0_floor=60.0, f0_ceil=500.0)
    assert np.isfinite(f0).all() and np.isfinite(cf0).all()

    f0s, _, vuvs = extract_pitch_world(np.zeros(FS // 2), FS, HOP,
                                       f0_floor=60.0, f0_ceil=500.0)
    assert (f0s == 0).all()

    f0y, vuvy = extract_f0(noise.astype(np.float32), FS, HOP,
                           f0_floor=60.0, f0_ceil=500.0)
    assert float(np.asarray(vuvy).mean()) < 0.5
    f0z, vuvz = extract_f0(np.zeros(FS // 2, np.float32), FS, HOP,
                           f0_floor=60.0, f0_ceil=500.0)
    assert float(np.asarray(f0z).max()) == 0.0

    # short clip (fewer frames than the median-filter window)
    short, _, _ = speech_like(seed=1, base=150, dur=0.2)
    f0sh, _, _ = extract_pitch_world(short, FS, HOP,
                                     f0_floor=60.0, f0_ceil=500.0)
    assert np.isfinite(f0sh).all()
