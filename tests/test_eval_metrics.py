"""Objective eval metrics (promptttspp_tpu/eval/metrics.py): MCD / mel
L1 / F0 / VUV on signals with known ground truth."""

import numpy as np

from promptttspp_tpu.eval.metrics import (
    dtw_path, evaluate_pair, mcd, mel_cepstra, mel_l1, summarize)


def _harmonic(f0, sr=24000, dur=0.6, n_harm=6):
    t = np.arange(int(sr * dur)) / sr
    w = sum(0.5 ** k * np.sin(2 * np.pi * f0 * (k + 1) * t)
            for k in range(n_harm))
    return (0.3 * w / np.max(np.abs(w))).astype(np.float32)


def test_mel_cepstra_constant_is_c0_only():
    lm = np.full((7, 80), 2.5)
    c = mel_cepstra(lm)
    np.testing.assert_allclose(c[:, 1:], 0.0, atol=1e-9)
    assert np.all(c[:, 0] > 0)


def test_dtw_identity_and_stretch():
    x = np.random.RandomState(0).randn(50, 12)
    p = dtw_path(x, x)
    np.testing.assert_array_equal(p[:, 0], p[:, 1])  # diagonal
    # frame-doubled copy aligns each original frame to its two copies
    y = np.repeat(x, 2, axis=0)
    p2 = dtw_path(x, y)
    assert np.all(x[p2[:, 0]] == y[p2[:, 1]])


def test_mcd_zero_on_identical_positive_on_different():
    rng = np.random.RandomState(1)
    a = rng.randn(60, 80)
    assert mcd(a, a) < 1e-9
    assert mel_l1(a, a) < 1e-9
    b = a + rng.randn(60, 80) * 0.5
    assert mcd(a, b) > 0.5


def test_evaluate_pair_identical():
    wav = _harmonic(150.0)
    m = evaluate_pair(wav, wav.copy())
    assert m["mcd"] < 1e-6
    assert m["mel_l1"] < 1e-6
    assert m["vuv_error"] == 0.0
    assert m["f0_rmse_cents"] < 1e-6
    assert m["dur_ratio"] == 1.0


def test_evaluate_pair_f0_shift_measured_in_cents():
    # 100-cent (one semitone) F0 shift with the same spectral envelope
    # shape: F0 RMSE ≈ 100 cents, and voicing still agrees
    a = _harmonic(150.0)
    b = _harmonic(150.0 * 2 ** (100 / 1200))
    m = evaluate_pair(a, b)
    assert 70 < m["f0_rmse_cents"] < 130
    assert m["vuv_error"] < 0.2


def test_evaluate_pair_duration_mismatch_aligns():
    # same content, 25% slower synthesis: DTW absorbs the stretch, so
    # MCD stays near zero while dur_ratio reports the mismatch
    a = _harmonic(180.0, dur=0.6)
    b = _harmonic(180.0, dur=0.75)
    m = evaluate_pair(a, b)
    assert m["mcd"] < 1.0
    np.testing.assert_allclose(m["dur_ratio"], 1.25, rtol=0.02)


def test_summarize_nan_safe():
    s = summarize([{"mcd": 1.0, "f0_rmse_cents": float("nan")},
                   {"mcd": 3.0, "f0_rmse_cents": 50.0}])
    assert s["mcd"] == 2.0
    assert s["f0_rmse_cents"] == 50.0
