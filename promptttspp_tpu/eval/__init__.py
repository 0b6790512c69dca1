from promptttspp_tpu.eval.metrics import (  # noqa: F401
    dtw_path, evaluate_pair, f0_metrics, mcd, mel_cepstra, mel_l1,
    summarize)
