"""The vendored corpus metadata (metadata/, VERDICT r2 #9) must parse
through the exact consumers that read it at preprocess/train time, so a
fresh clone can run the egs pipeline on real data."""

from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]
META = REPO / "metadata"


def test_f0_stats_yaml_schema():
    with open(META / "libritts_r_f0_stats.yaml") as f:
        stats = yaml.safe_load(f)
    assert len(stats) > 2000  # per-speaker entries
    for spk in ("100", "1001"):
        entry = stats[spk]
        # the preprocess pipeline reads f0_floor/f0_ceil per speaker
        # (preprocess/pipeline.py:182-186; reference pitch.py:24-27)
        assert 0 < entry["f0_floor"] < entry["f0_ceil"] <= 700
        assert set(entry) >= {"f0_floor", "f0_ceil", "f0_mean", "f0_scale"}


def test_style_prompt_candidates_through_loader():
    from promptttspp_tpu.data.dataset import read_prompt_candidate

    cand = read_prompt_candidate(META / "style_prompt_candidates.csv")
    assert len(cand) == 54  # 54 style keys
    # keys follow the {M,F}_p-*_s-*_e-* pattern the datasets join on
    assert "M_p-low_s-slow_e-low" in cand
    assert all(isinstance(v, list) and len(v) >= 5 for v in cand.values())


def test_speaker_prompt_candidates_through_loader():
    from promptttspp_tpu.data.dataset import read_spk_prompt_candidate

    cand = read_spk_prompt_candidate(META / "speaker_prompt_candidates.csv")
    assert len(cand) == 404  # 404 annotated speakers
    assert all(isinstance(k, int) for k in cand)
    assert all(isinstance(v, list) and v for v in cand.values())


def test_conf_paths_point_at_vendored_assets():
    """conf/path/default.yaml names must match the files on disk."""
    import re

    text = (REPO / "conf" / "path" / "default.yaml").read_text()
    for key, fname in [
        ("f0_stats_file", "libritts_r_f0_stats.yaml"),
        ("prompt_candidate_file", "style_prompt_candidates.csv"),
        ("spk_prompt_candidate_file", "speaker_prompt_candidates.csv"),
    ]:
        m = re.search(rf"{key}: \$\{{\.root\}}/metadata/(\S+)", text)
        assert m, f"{key} missing from conf/path/default.yaml"
        assert m.group(1) == fname
        assert (META / fname).exists()
