#!/bin/bash
# Feature pipeline driver (counterpart of the reference
# egs/proposed/preprocess.sh): preprocess -> split -> filter.
set -e
cd "$(dirname "$0")"
python bin/preprocess.py "$@"
python bin/split_df.py "$@"
python bin/filter_eval.py "$@"
