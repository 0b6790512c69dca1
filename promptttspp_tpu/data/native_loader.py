"""ctypes binding for the native C++ feature-batch loader
(native/featloader.cpp) — the TPU build's replacement for the reference's
DataLoader worker processes. Falls back transparently to the Python path
when the shared library hasn't been built (``bash native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libfeatloader.so"
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ffl_load_batch.restype = ctypes.c_int
    lib.ffl_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def _paths_array(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def load_feature_batch(
    mel_paths: List[str],
    cf0_paths: List[str],
    vuv_paths: List[str],
    t_frames: int,
    mel_mean: float,
    mel_std: float,
    n_mels: int = 80,
    n_threads: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Returns dict(mel [B,Tf,n_mels], log_cf0/vuv/energy [B,Tf,1],
    frame_lengths [B]) with normalization/energy/padding done natively."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(
            "native loader not built; run `bash native/build.sh`")
    n = len(mel_paths)
    mel = np.zeros((n, t_frames, n_mels), np.float32)
    cf0 = np.zeros((n, t_frames, 1), np.float32)
    vuv = np.zeros((n, t_frames, 1), np.float32)
    energy = np.zeros((n, t_frames, 1), np.float32)
    flens = np.zeros((n,), np.int32)
    errbuf = ctypes.create_string_buffer(512)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.ffl_load_batch(
        _paths_array(mel_paths), _paths_array(cf0_paths),
        _paths_array(vuv_paths), n, t_frames, n_mels,
        ctypes.c_float(mel_mean), ctypes.c_float(mel_std),
        fptr(mel), fptr(cf0), fptr(vuv), fptr(energy),
        flens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads or (os.cpu_count() or 1), errbuf, 512)
    if rc != 0:
        raise RuntimeError(f"native loader failed: {errbuf.value.decode()}")
    return dict(mel=mel, log_cf0=cf0, vuv=vuv, energy=energy,
                frame_lengths=flens)
