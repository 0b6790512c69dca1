import numpy as np
import pytest

import jax.numpy as jnp

from promptttspp_tpu.ops.f0 import extract_f0, extract_pitch
from promptttspp_tpu.ops.filters import butter_lowpass, filtfilt, lfilter, lowpass_filter
from promptttspp_tpu.ops.interp import interp1d
from promptttspp_tpu.ops.mel import MelSpectrogramTransform, mel_filterbank
from promptttspp_tpu.ops.stft import spectrogram


@pytest.fixture(scope="module")
def wav():
    rng = np.random.RandomState(0)
    t = np.arange(24000) / 24000.0
    sig = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.randn(24000)
    return sig.astype(np.float32)


def test_spectrogram_matches_torch_stft(wav):
    import torch

    ours = np.asarray(spectrogram(jnp.asarray(wav)[None], 512, 240, 480, power=1.0))[0]
    ref = torch.stft(
        torch.from_numpy(wav), n_fft=512, hop_length=240, win_length=480,
        window=torch.hann_window(480), center=True, pad_mode="reflect",
        return_complex=True, normalized=False, onesided=True,
    ).abs().numpy().T  # torch gives [freq, time]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 512, 80, 63.0, 12000.0)
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    # every filter has positive area and the bank covers the band
    assert (fb.sum(axis=0) > 0).all()
    freqs = np.linspace(0, 12000, 257)
    active = fb.sum(axis=1) > 0
    assert not active[freqs < 55].any()  # nothing below f_min
    assert active[(freqs > 200) & (freqs < 11000)].all()


def test_mel_transform_shapes_and_log_floor(wav):
    tfm = MelSpectrogramTransform()
    mel = np.asarray(tfm(jnp.asarray(wav)[None]))
    assert mel.shape == (1, 1 + 24000 // 240, 80)
    assert mel.min() >= np.log(1e-5) - 1e-6
    # silence maps to the clamp floor
    silent = np.asarray(tfm(jnp.zeros((1, 2400))))
    np.testing.assert_allclose(silent, np.log(1e-5), atol=1e-3)


def test_lfilter_matches_scipy(wav):
    from scipy import signal

    b, a = butter_lowpass(5, 20, 100)
    x = wav[:500][None]
    ours = np.asarray(lfilter(jnp.asarray(x), b, a))[0]
    ref = signal.lfilter(b, a, x[0])
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_filtfilt_pad_matches_scipy():
    from scipy import signal

    rng = np.random.RandomState(1)
    x = rng.randn(300).astype(np.float64).astype(np.float32)
    b, a = butter_lowpass(5, 20, 100)
    ours = np.asarray(filtfilt(jnp.asarray(x)[None], b, a, pad=True))[0]
    ref = signal.filtfilt(b, a, x, padlen=3 * max(len(a), len(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=2e-3)


def test_lowpass_filter_short_input_passthrough():
    x = jnp.ones((1, 10))
    out = lowpass_filter(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_interp1d_gap_fill():
    f0 = np.zeros(10, np.float32)
    f0[2] = 100.0
    f0[6] = 200.0
    out = np.asarray(interp1d(jnp.asarray(f0)))
    np.testing.assert_allclose(out[:3], [100, 100, 100])
    np.testing.assert_allclose(out[2:7], [100, 125, 150, 175, 200])
    np.testing.assert_allclose(out[6:], [200, 200, 200, 200])


def test_interp1d_all_unvoiced():
    out = np.asarray(interp1d(jnp.zeros((2, 8))))
    np.testing.assert_array_equal(out, 0.0)


def test_f0_sine():
    t = np.arange(24000 * 2) / 24000.0
    wav = 0.6 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    f0, vuv = extract_f0(jnp.asarray(wav)[None], f0_floor=60.0, f0_ceil=600.0)
    f0, vuv = np.asarray(f0)[0], np.asarray(vuv)[0]
    core = slice(5, len(f0) - 5)
    assert vuv[core].mean() > 0.95
    voiced = f0[core][vuv[core] > 0]
    np.testing.assert_allclose(voiced, 220.0, rtol=0.02)


def test_f0_silence_and_batch_bounds():
    rng = np.random.RandomState(0)
    t = np.arange(24000) / 24000.0
    sine330 = 0.5 * np.sin(2 * np.pi * 330.0 * t)
    silence = 0.001 * rng.randn(24000)
    wav = np.stack([sine330, silence]).astype(np.float32)
    f0, vuv = extract_f0(
        jnp.asarray(wav), f0_floor=np.array([100.0, 100.0]),
        f0_ceil=np.array([500.0, 500.0]),
    )
    f0, vuv = np.asarray(f0), np.asarray(vuv)
    assert vuv[1].mean() < 0.2
    voiced = f0[0][vuv[0] > 0]
    assert len(voiced) > 50
    np.testing.assert_allclose(np.median(voiced), 330.0, rtol=0.02)


def test_extract_pitch_api():
    t = np.arange(24000) / 24000.0
    wav = 0.5 * np.sin(2 * np.pi * 150.0 * t).astype(np.float32)
    f0, cf0, vuv = extract_pitch(jnp.asarray(wav), 24000, 240, 60.0, 600.0)
    f0, cf0, vuv = map(np.asarray, (f0, cf0, vuv))
    assert f0.shape == cf0.shape == vuv.shape == (1 + 24000 // 240,)
    # cf0 is log-scale and continuous
    voiced_cf0 = cf0[vuv > 0]
    np.testing.assert_allclose(np.exp(np.median(voiced_cf0)), 150.0, rtol=0.02)
