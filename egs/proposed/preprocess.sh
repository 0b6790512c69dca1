#!/bin/bash
# Feature pipeline driver (counterpart of the reference
# egs/proposed/preprocess.sh:1-7, same 4-stage list):
# preprocess -> split -> compute_mel -> split, plus eval filtering.
# Our preprocess.py already extracts mels + stats.yaml inline (batched
# on-device), so compute_mel is an idempotent no-op unless the mel tree
# was removed or the transform changed.
set -e
cd "$(dirname "$0")"
python bin/preprocess.py "$@"
python bin/split_df.py "$@"
python bin/compute_mel.py "$@"
python bin/split_df.py "$@"
python bin/filter_eval.py "$@"
