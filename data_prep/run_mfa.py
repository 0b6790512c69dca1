"""Run the Montreal Forced Aligner per speaker (counterpart of
`/root/reference/data_prep/run_mfa.py`). MFA stays an external offline
tool; alignment artifacts are inputs to this framework, not runtime."""

import argparse
import subprocess
import sys
from pathlib import Path

from common import get_logger, load_libritts_spk_metadata


def get_parser():
    p = argparse.ArgumentParser(description="Run MFA on LibriTTS-R")
    p.add_argument("in_dir", type=str,
                   help="per-speaker restructured data root")
    p.add_argument("mfa_out_dir", type=str, help="Output directory")
    p.add_argument("--n_jobs", type=int, default=1)
    p.add_argument("--speakers_tsv", type=str,
               default="external/speakers.tsv")
    p.add_argument("--debug", action="store_true")
    return p


def main():
    args = get_parser().parse_args(sys.argv[1:])
    spk2meta = load_libritts_spk_metadata(args.speakers_tsv, debug=args.debug)
    in_dir, mfa_out = Path(args.in_dir), Path(args.mfa_out_dir)
    mfa_out.mkdir(exist_ok=True, parents=True)
    logger = get_logger(100, "log/run_mfa.log", "run_mfa")

    for spk in spk2meta:
        spk_in = in_dir / spk
        if not spk_in.exists():
            logger.warning(f"No input dir for {spk}; skipping")
            continue
        cmd = (f"mfa align {spk_in} english_us_arpa english_us_arpa "
               f"{mfa_out / spk} --num_jobs {args.n_jobs} --clean --quiet "
               "--use_mp")
        logger.info(cmd)
        r = subprocess.run(cmd, shell=True, stdout=subprocess.PIPE)
        if r.returncode != 0:
            logger.error(f"Error in MFA for {spk}")


if __name__ == "__main__":
    main()
