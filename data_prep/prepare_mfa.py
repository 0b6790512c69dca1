"""Restructure LibriTTS-R per speaker and pair wav + .normalized.txt as
.lab for MFA (counterpart of `/root/reference/data_prep/prepare_mfa.py`)."""

import argparse
import shutil
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from common import get_logger, load_libritts_spk_metadata


def get_parser():
    p = argparse.ArgumentParser(
        description="Restructure the LibriTTS-R dataset for convenience")
    p.add_argument("in_dir", type=str, help="LibriTTS original data root")
    p.add_argument("out_dir", type=str, help="Output directory")
    p.add_argument("--n_jobs", type=int, default=8)
    p.add_argument("--speakers_tsv", type=str,
               default="external/speakers.tsv")
    p.add_argument("--debug", action="store_true")
    return p


def process_spk(spk, meta, in_dir, out_dir, logger):
    subset = meta["subset"]
    wav_files = sorted((in_dir / subset).glob(f"*/*/{spk}_*.wav"))
    if not wav_files:
        logger.warning(f"No wav files found for {spk} {meta}")
        return
    spk_out = out_dir / spk
    spk_out.mkdir(exist_ok=True, parents=True)
    for wav_file in wav_files:
        utt_id = wav_file.stem
        text_file = wav_file.parent / f"{utt_id}.normalized.txt"
        if not text_file.exists():
            logger.warning(f"Text file not found for {wav_file}")
            continue
        shutil.copy2(wav_file, spk_out / wav_file.name)
        shutil.copy2(text_file, spk_out / f"{utt_id}.lab")


def main():
    args = get_parser().parse_args(sys.argv[1:])
    in_dir, out_dir = Path(args.in_dir), Path(args.out_dir)
    out_dir.mkdir(exist_ok=True, parents=True)
    logger = get_logger(100, "log/prepare_mfa.log", "prepare_mfa")
    spk2meta = load_libritts_spk_metadata(args.speakers_tsv, debug=args.debug)
    with ThreadPoolExecutor(max_workers=args.n_jobs) as ex:
        list(ex.map(
            lambda item: process_spk(item[0], item[1], in_dir, out_dir,
                                     logger),
            spk2meta.items()))


if __name__ == "__main__":
    main()
