"""Gender-conditioned pseudo-labeling of pitch/speed/energy -> style keys
and the training metadata CSV (counterpart of
`/root/reference/data_prep/add_style_prompt_tags.py`)."""

import argparse
import sys
from pathlib import Path

import pandas as pd
import yaml

from common import REPO, get_logger, load_libritts_spk_metadata  # noqa: F401

from promptttspp_tpu.data.dataset import read_prompt_candidate  # noqa: E402
from promptttspp_tpu.data_prep.stats import (  # noqa: E402
    GenderScaler, pseudo_label, style_key)


def get_parser():
    p = argparse.ArgumentParser(
        description="Add style prompt tags to metadata")
    p.add_argument("in_dir", type=str, help="LibriTTS original data root")
    p.add_argument("utt_stats", type=str, help="per-utt stats yaml")
    p.add_argument("style_prompt_candidates", type=str)
    p.add_argument("--out_filename", type=str,
                   default="metadata_w_style_prompt_tags.csv")
    p.add_argument("--failed_list_dir", type=str, default=None,
                   help="dir of *_list.txt with failed restoration utt ids")
    p.add_argument("--speakers_tsv", type=str,
               default="external/speakers.tsv")
    p.add_argument("--debug", action="store_true")
    return p


def main():
    args = get_parser().parse_args(sys.argv[1:])
    in_dir = Path(args.in_dir)
    spk2meta = load_libritts_spk_metadata(args.speakers_tsv, debug=args.debug)
    logger = get_logger(100, "log/add_style_prompt.log", "add_style_prompt")

    with open(args.utt_stats) as f:
        per_utt = yaml.safe_load(f)
    style_prompt_dict = read_prompt_candidate(args.style_prompt_candidates)

    failed = set()
    if args.failed_list_dir:
        for path in Path(args.failed_list_dir).glob("*_list.txt"):
            for line in open(path):
                if line.strip():
                    failed.add(Path(line.strip()).stem)

    # gender-conditioned scalers over valid utterances
    fields = {"raw_loudness_mean": {}, "raw_lf0_mean": {},
              "raw_speaking_rate": {}}
    for field in fields:
        by_gender = {"F": [], "M": []}
        for utt_id, meta in per_utt.items():
            if meta["invalid"] == 1:
                continue
            g = spk2meta[utt_id.split("_")[0]]["gender"]
            by_gender[g].append(meta[field])
        fields[field] = GenderScaler().fit(by_gender)

    rows = []
    for idx, (utt_id, v) in enumerate(per_utt.items()):
        if args.debug and idx > 100:
            break
        spk_id = utt_id.split("_")[0]
        gender = spk2meta[spk_id]["gender"]

        subset = spk2meta[spk_id]["subset"]
        subset2 = utt_id.split("_", 2)[1]
        text_path = (in_dir / subset / spk_id / subset2 /
                     f"{utt_id}.normalized.txt")
        content_prompt = (text_path.read_text().strip()
                          if text_path.exists() else "")

        pitch = pseudo_label(v["raw_lf0_mean"], gender,
                             fields["raw_lf0_mean"],
                             ["low", "normal", "high"], level=5)
        speed = pseudo_label(v["raw_speaking_rate"], gender,
                             fields["raw_speaking_rate"],
                             ["slow", "normal", "fast"], level=5)
        energy = pseudo_label(v["raw_loudness_mean"], gender,
                              fields["raw_loudness_mean"],
                              ["low", "normal", "high"], level=5)
        key = style_key(gender, pitch, speed, energy)
        if key not in style_prompt_dict:
            logger.warning(f"{utt_id}: no prompt candidates for {key}")

        rows.append({
            "item_name": utt_id, "spk_id": spk_id, "gender": gender,
            "pitch": pitch, "speaking_speed": speed, "energy": energy,
            "content_prompt": content_prompt, "style_prompt_key": key,
            "raw_f0_mean": v["raw_f0_mean"], "raw_f0_scale": v["raw_f0_scale"],
            "raw_lf0_mean": v["raw_lf0_mean"],
            "raw_lf0_scale": v["raw_lf0_scale"],
            "raw_speaking_rate": v["raw_speaking_rate"],
            "raw_loudness_lufs": v["raw_loudness_lufs"],
            "raw_loudness_mean": v["raw_loudness_mean"],
            "raw_loudness_scale": v["raw_loudness_scale"],
            "invalid": v["invalid"],
        })

    df = pd.DataFrame(rows)
    df.loc[df.content_prompt.str.startswith("-"), "invalid"] = 1
    df.loc[df.item_name.isin(failed), "invalid"] = 1
    df.to_csv(args.out_filename, index=False, header=True)
    logger.info(f"Saved to {args.out_filename}")


if __name__ == "__main__":
    main()
