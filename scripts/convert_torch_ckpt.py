"""Convert a reference PyTorch checkpoint into this framework's orbax
format.

Usage:
    python scripts/convert_torch_ckpt.py model  <in.ckpt> <out_dir>
    python scripts/convert_torch_ckpt.py vocoder <in.ckpt> <out_dir>

Model checkpoints are the reference trainer's
``{epoch, model, optimizer, lr_scheduler}`` dicts
(`/root/reference/promptttspp/trainers/tts.py:245-254`); vocoder
checkpoints carry the generator under ``generator`` (`app.py:35-37`).
Weight-norm is folded; optimizer state is NOT converted (warm-start only).
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def torch_state_dict(path, kind):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    key = "model" if kind == "model" else "generator"
    sd = ckpt[key] if key in ckpt else ckpt
    return {k: v.numpy() for k, v in sd.items()}


def main():
    kind, in_path, out_dir = sys.argv[1], sys.argv[2], Path(sys.argv[3])

    import jax
    import orbax.checkpoint as ocp

    import promptttspp_tpu.models  # noqa: F401
    from promptttspp_tpu.compat.torch_ckpt import convert_tree
    from promptttspp_tpu.config import compose, instantiate
    from promptttspp_tpu.flagship import example_batch, init_flagship

    sd = torch_state_dict(in_path, kind)

    if kind == "model":
        cfg = compose(REPO / "conf", "train")
        model = instantiate(cfg.model)
        batch = example_batch(B=1, Tp=16, Tf=64, L=16)
        variables = init_flagship(model, batch)
        rename = {"phoneme_embedding.emb": "phoneme_emb.emb"}
        # the reference's BERT lives under prompt_encoder.bert.model.*
        from promptttspp_tpu.models.bert import bert_rename_map

        for f, t in bert_rename_map(12).items():
            rename[f"prompt_encoder.bert.{f}"] = \
                f"prompt_encoder.bert.model.{t}"
        converted = {"params": convert_tree(variables["params"], sd,
                                            rename=rename)}
        if "batch_stats" in variables:
            converted["batch_stats"] = convert_tree(
                variables["batch_stats"], sd, "batch_stats", rename=rename)
    else:
        cfg = compose(REPO / "conf", "synthesize")
        vocoder = instantiate(cfg.vocoder)
        import jax.numpy as jnp

        mel = jnp.zeros((1, 64, cfg.vocoder.in_channel))
        f0 = jnp.zeros((1, 64, 1))
        variables = vocoder.init(jax.random.PRNGKey(0), mel, f0,
                                 deterministic=True)
        converted = {"params": convert_tree(variables["params"], sd)}

    tree = {"epoch": 0, "step": np.int32(0), "params": converted["params"],
            "batch_stats": converted.get("batch_stats", {}),
            "opt_state": {}}
    ocp.PyTreeCheckpointer().save(out_dir.absolute(), tree, force=True)
    print(f"converted {kind} checkpoint -> {out_dir}")


if __name__ == "__main__":
    main()
