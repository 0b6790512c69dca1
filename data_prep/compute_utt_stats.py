"""Per-utterance stats for pseudo-labeling (counterpart of
`/root/reference/data_prep/compute_utt_stats.py`): LUFS + per-frame
A-weighted loudness + F0 mean/std (batched YIN on device) + syllable rate.
"""

import argparse
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import yaml

from common import REPO, get_logger, load_libritts_spk_metadata, read_wav_any  # noqa: F401

from promptttspp_tpu.data_prep.stats import compute_utt_stats  # noqa: E402


def get_parser():
    p = argparse.ArgumentParser(description="Compute per-utterance statistics")
    p.add_argument("in_dir", type=str,
                   help="per-speaker finalized data root (wav24k/textgrid)")
    p.add_argument("f0_stats", type=str, help="per-speaker f0 stats yaml")
    p.add_argument("--out_filename", type=str,
                   default="libritts_r_metadata.yaml")
    p.add_argument("--num_jobs", type=int, default=8)
    p.add_argument("--speakers_tsv", type=str,
               default="external/speakers.tsv")
    p.add_argument("--debug", action="store_true")
    return p


def main():
    args = get_parser().parse_args(sys.argv[1:])
    spk2meta = load_libritts_spk_metadata(args.speakers_tsv, debug=args.debug)
    in_dir = Path(args.in_dir)
    logger = get_logger(100, "log/compute_utt_stats.log", "compute_utt_stats")
    with open(args.f0_stats) as f:
        f0_stats = yaml.safe_load(f)

    jobs = []
    for spk in spk2meta:
        spk_dir = in_dir / spk
        if not spk_dir.exists():
            continue
        for tg in sorted((spk_dir / "textgrid").glob("*.TextGrid")):
            jobs.append((spk, tg, spk_dir / "wav24k" / f"{tg.stem}.wav"))

    def work(job):
        spk, tg, wav_path = job
        wav, sr = read_wav_any(wav_path)
        st = f0_stats.get(spk, {})
        return tg.stem, compute_utt_stats(
            wav, sr, tg, f0_floor=st.get("f0_floor", 70.0),
            f0_ceil=st.get("f0_ceil", 800.0))

    metadata = {}
    with ThreadPoolExecutor(max_workers=args.num_jobs) as ex:
        for utt_id, meta in ex.map(work, jobs):
            metadata[utt_id] = meta
    with open(args.out_filename, "w") as f:
        yaml.dump(metadata, f)
    logger.info(f"wrote {len(metadata)} entries to {args.out_filename}")


if __name__ == "__main__":
    main()
