"""Shared helpers for the data_prep CLIs (counterpart of the reference
`data_prep/common.py`)."""

import logging
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LOG_FORMAT = "%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s"


def get_logger(verbose=0, filename=None, name="promptttspp_tpu"):
    logger = logging.getLogger(name)
    if verbose >= 100:
        logger.setLevel(logging.DEBUG)
    elif verbose > 0:
        logger.setLevel(logging.INFO)
    else:
        logger.setLevel(logging.WARN)
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(LOG_FORMAT))
    logger.addHandler(sh)
    if filename is not None:
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.FileHandler(filename=filename)
        fh.setLevel(logging.INFO)
        fh.setFormatter(logging.Formatter(LOG_FORMAT))
        logger.addHandler(fh)
    return logger


def load_libritts_spk_metadata(path="external/speakers.tsv", debug=False):
    """speakers.tsv -> {spk: {gender, subset, name}}."""
    spk2meta = {}
    with open(path) as f:
        for line in f.readlines()[1:]:
            vals = line.strip().split("\t")
            if len(vals) == 4:
                spk, gender, subset, name = vals
            elif len(vals) == 3:
                spk, gender, subset = vals
                name = "Unknown"
            else:
                continue
            spk2meta[spk] = {"gender": gender, "subset": subset, "name": name}
    if debug:
        keep = {1188, 1995, 260, 89, 90, 91, 100, 101, 102, 1001}
        spk2meta = {k: v for k, v in spk2meta.items() if int(k) in keep}
    return spk2meta


def read_wav_any(path):
    """wav file -> (float64 mono in [-1,1], sr)."""
    import numpy as np
    from scipy.io import wavfile

    sr, x = wavfile.read(path)
    if x.dtype == np.int16:
        x = x / 32768.0
    elif x.dtype == np.int32:
        x = x / 2147483648.0
    else:
        x = x.astype(np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    return x, sr
