import numpy as np

from promptttspp_tpu.data_prep.audio_metrics import (
    a_weighting_db, estimate_syllables, integrated_loudness,
    perceptual_loudness)
from promptttspp_tpu.data_prep.stats import (
    GenderScaler, norm2label, pseudo_label, style_key)


def test_a_weighting_reference_points():
    # 0 dB at 1 kHz by definition; ~-19.1 dB at 100 Hz; ~+1.2 dB at 2 kHz
    w = a_weighting_db(np.array([1000.0, 100.0, 2000.0]))
    assert abs(w[0]) < 0.05
    assert abs(w[1] - (-19.1)) < 0.5
    assert abs(w[2] - 1.2) < 0.3


def test_integrated_loudness_sine():
    # BS.1770: a 997 Hz full-scale sine reads -3.01 LUFS (stereo 0 LUFS,
    # mono channel = -3.01); amplitude 0.5 is 6.02 dB lower.
    sr = 48000
    t = np.arange(sr * 2) / sr
    sine = np.sin(2 * np.pi * 997.0 * t)
    l_full = integrated_loudness(sine, sr)
    assert abs(l_full - (-3.01)) < 0.2
    l_half = integrated_loudness(0.5 * sine, sr)
    assert abs((l_full - l_half) - 6.02) < 0.1
    # silence gates out
    assert integrated_loudness(np.zeros(sr), sr) == -np.inf


def test_perceptual_loudness_monotone_in_level():
    sr = 24000
    t = np.arange(sr) / sr
    quiet = 0.05 * np.sin(2 * np.pi * 440 * t)
    loud = 0.5 * np.sin(2 * np.pi * 440 * t)
    lq = perceptual_loudness(quiet, sr).mean()
    ll = perceptual_loudness(loud, sr).mean()
    # 20 dB level difference = factor 100 in power = +ln(100) in log-power
    assert abs((ll - lq) - np.log(100)) < 0.3


def test_syllables():
    assert estimate_syllables("cat") == 1
    assert estimate_syllables("hello") == 2
    assert estimate_syllables("beautiful") >= 3
    assert estimate_syllables("the") == 1
    assert estimate_syllables("table") == 2
    assert estimate_syllables("") == 0


def test_norm2label_thresholds():
    assert norm2label(-2.0, 5) == "very low"
    assert norm2label(-1.0, 5) == "low"
    assert norm2label(0.0, 5) == "normal"
    assert norm2label(1.0, 5) == "high"
    assert norm2label(2.0, 5) == "very high"
    assert norm2label(-1.0, 3) == "low"
    assert norm2label(0.0, 3) == "normal"


def test_scaler_and_style_key():
    sc = GenderScaler().fit({"M": [1.0, 2.0, 3.0], "F": [10.0, 20.0]})
    assert abs(sc.normalize(2.0, "M")) < 1e-9
    label = pseudo_label(3.0, "M", sc, ["low", "normal", "high"], level=5)
    assert label in ("high", "very high")
    assert style_key("M", "very high", "slow", "normal") == \
        "M_p-high_s-slow_e-normal"
