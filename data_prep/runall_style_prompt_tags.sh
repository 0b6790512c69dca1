#!/bin/bash
# Style-prompt tagging driver (counterpart of the reference
# `data_prep/runall_style_prompt_tags.sh`): per-utterance acoustic stats
# (LUFS, F0, syllable rate) -> gender-normalized 5-level labels ->
# metadata CSV with style_prompt_key + content prompts.
set -e

libritts_r_dir=${LIBRITTS_R_DIR:-./LibriTTS_R}
metadata_dir=${METADATA_DIR:-../metadata}
output_dir=${OUTPUT_DIR:-./out}

n_jobs=64
merged_dir=${output_dir}/libritts_r_per_spk_cleaned
f0_stats=${metadata_dir}/libritts_r_f0_stats.yaml
style_prompt_candidates=${metadata_dir}/style_prompt_candidates.csv

if [ ! -d "${merged_dir}" ]; then
    echo "You must first create the dataset with MFA alignments (runall_mfa.sh)"
    exit 1
fi

utt_metadata=${output_dir}/libritts_r_per_utt_metadata.yaml
out_csv_file=${output_dir}/metadata_w_style_prompt_key.csv

if [ ! -e "${utt_metadata}" ]; then
    python compute_utt_stats.py "${merged_dir}" "${f0_stats}" \
        --out_filename "${utt_metadata}" --num_jobs ${n_jobs}
fi

python add_style_prompt_tags.py "${libritts_r_dir}" "${utt_metadata}" \
    "${style_prompt_candidates}" --out_filename "${out_csv_file}"
