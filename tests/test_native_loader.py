"""Native C++ feature loader vs the Python dataset path."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def built():
    from promptttspp_tpu.data import native_loader

    if not native_loader.available():
        subprocess.run(["bash", str(REPO / "native" / "build.sh")],
                       check=True)
    assert native_loader.available()
    return native_loader


def test_native_matches_python(built, tmp_path):
    rng = np.random.RandomState(0)
    mel_paths, cf0_paths, vuv_paths = [], [], []
    refs = []
    mean, std = -4.2, 2.3
    for i, T in enumerate([37, 80, 41]):
        mel = rng.randn(80, T).astype(np.float32) - 4.0
        cf0 = rng.rand(1, T).astype(np.float32) * 5
        vuv = (rng.rand(1, T) > 0.4).astype(np.float32)
        np.save(tmp_path / f"mel{i}.npy", mel)
        np.save(tmp_path / f"cf0{i}.npy", cf0)
        np.save(tmp_path / f"vuv{i}.npy", vuv)
        mel_paths.append(tmp_path / f"mel{i}.npy")
        cf0_paths.append(tmp_path / f"cf0{i}.npy")
        vuv_paths.append(tmp_path / f"vuv{i}.npy")
        refs.append((mel, cf0, vuv))

    Tf = 96
    out = built.load_feature_batch(mel_paths, cf0_paths, vuv_paths, Tf,
                                   mel_mean=mean, mel_std=std)
    assert out["mel"].shape == (3, Tf, 80)
    for i, (mel, cf0, vuv) in enumerate(refs):
        T = mel.shape[1]
        np.testing.assert_array_equal(out["frame_lengths"][i], T)
        # normalized mel, transposed
        np.testing.assert_allclose(
            out["mel"][i, :T], ((mel - mean) / std).T, rtol=1e-5, atol=1e-5)
        assert out["mel"][i, T:].sum() == 0
        np.testing.assert_allclose(out["log_cf0"][i, :T, 0], cf0[0],
                                   rtol=1e-6)
        np.testing.assert_allclose(out["vuv"][i, :T, 0], vuv[0])
        # energy = sqrt(sum(exp(mel)^2)) on UNnormalized mel
        energy = np.sqrt((np.exp(mel) ** 2).sum(axis=0))
        np.testing.assert_allclose(out["energy"][i, :T, 0], energy,
                                   rtol=1e-4)


def test_native_float64_and_errors(built, tmp_path):
    mel = np.random.randn(80, 10).astype(np.float64)
    np.save(tmp_path / "mel64.npy", mel)
    cf0 = np.zeros((1, 10), np.float32)
    np.save(tmp_path / "cf0.npy", cf0)
    np.save(tmp_path / "vuv.npy", cf0)
    out = built.load_feature_batch(
        [tmp_path / "mel64.npy"], [tmp_path / "cf0.npy"],
        [tmp_path / "vuv.npy"], 16, 0.0, 1.0)
    np.testing.assert_allclose(out["mel"][0, :10], mel.astype(np.float32).T,
                               rtol=1e-6)

    with pytest.raises(RuntimeError, match="cannot open"):
        built.load_feature_batch(
            [tmp_path / "missing.npy"], [tmp_path / "cf0.npy"],
            [tmp_path / "vuv.npy"], 16, 0.0, 1.0)


def test_native_fortran_order(built, tmp_path):
    """np.save of a transposed array writes F-order without copying
    (e.g. mel.T of a C-order [T, 80] frame-major array) — the loader
    must read it identically to the C-order equivalent."""
    rng = np.random.RandomState(7)
    T = 23
    mel_tc = rng.randn(T, 80).astype(np.float32) - 4.0   # C-order [T, 80]
    mel_f = mel_tc.T                                     # F-order [80, T]
    assert mel_f.flags["F_CONTIGUOUS"] and not mel_f.flags["C_CONTIGUOUS"]
    np.save(tmp_path / "mel_f.npy", mel_f)
    np.save(tmp_path / "mel_c.npy", np.ascontiguousarray(mel_f))
    cf0 = rng.rand(1, T).astype(np.float32)
    np.save(tmp_path / "cf0.npy", cf0)
    np.save(tmp_path / "vuv.npy", (cf0 > 0.5).astype(np.float32))

    outs = [built.load_feature_batch(
        [tmp_path / name], [tmp_path / "cf0.npy"], [tmp_path / "vuv.npy"],
        32, -4.0, 2.0) for name in ("mel_f.npy", "mel_c.npy")]
    np.testing.assert_array_equal(outs[0]["mel"], outs[1]["mel"])
    np.testing.assert_array_equal(outs[0]["energy"], outs[1]["energy"])
    np.testing.assert_allclose(outs[0]["mel"][0, :T],
                               (mel_tc + 4.0) / 2.0, rtol=1e-5, atol=1e-5)
