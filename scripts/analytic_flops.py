"""Analytic model-FLOPs accounting for the flagship train step
(VERDICT r4 #3: report true MFU — analytic model FLOPs / time / peak —
next to HFU, whose numerator is XLA's executed-HLO flop count and can
only overstate utilization via padding/rematerialization).

Counting convention (the standard MFU one):
- every matmul/conv counts 2*M*K*N multiply-accumulate flops, derived
  from the ACTUAL kernel shapes in the params tree (so config overrides
  are automatically respected);
- attention adds its quadratic scores/context matmuls explicitly
  (2*B*T^2*C each; the rel-pos bd term uses its true 2T-1 width);
- backward = 2x forward for every module that receives gradients
  (dL/dW and dL/dx are each a matmul of the forward's cost); the frozen
  BERT trunk counts forward only (its last layer's attention + the
  adaptor MLP are trainable — reference `modules/prompt_encoder.py:
  28-31`);
- elementwise/norm/mask/loss flops are NOT counted (they are noise at
  these shapes and inflating the numerator would flatter MFU);
- the duration->frame alignment expansion x@path (2*B*Tp*Tf*C) is
  counted (it is a real matmul, `utils/model.py:37-47`).

Used by profile_train_breakdown.py; standalone:
    python scripts/analytic_flops.py [B] [Tp] [Tf] [L]
"""

import math
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _kernel_flops(path: str, shape, B, Tp, Tf, L, heads=2):
    """Forward flops for one kernel leaf, from its path and shape."""
    if not path.endswith("/kernel") and "/gru/weight" not in path:
        return 0.0, None
    # ---- sequence length this op runs at
    if path.startswith("/encoder/"):
        T = Tp
    elif path.startswith("/decoder/denoise_fn/"):
        T = Tf if ("residual" in path or "projection" in path
                   and "mlp" not in path) else 1
        if "/mlp_" in path or "diffusion_projection" in path:
            T = 1  # per-step embedding MLP: [B, C] not [B, T, C]
    elif "/duration_predictor/" in path:
        T = Tp
    elif ("/pitch_predictor/" in path or "/frame_prior_network/" in path
          or "/pitch_emb/" in path):
        T = Tf
    elif "/ref_enc/convs_" in path:
        # 6 strided-2 conv2d over [B, Tf, 80, 1]
        i = int(re.search(r"convs_(\d+)", path).group(1)) // 3
        t = math.ceil(Tf / 2 ** (i + 1))
        f = math.ceil(80 / 2 ** (i + 1))
        kh, kw, cin, cout = shape
        return 2.0 * B * t * f * kh * kw * cin * cout, "reference_encoder"
    elif "/ref_enc/gru/" in path:
        if "bias" in path:
            return 0.0, None
        t = math.ceil(Tf / 2 ** 6)
        h3, cin = shape
        return 2.0 * B * t * h3 * cin, "reference_encoder"
    elif "/stl/" in path:
        T = 10 if ("linear_k" in path or "linear_v" in path) else 1
    elif path.startswith("/prompt_encoder/"):
        T = L if "/bert/" in path else 1
    elif path.startswith("/style_mdn/"):
        T = 1
    else:
        return 0.0, None
    if len(shape) == 2:  # dense [Cin, Cout]
        cin, cout = shape
        fl = 2.0 * B * T * cin * cout
    elif len(shape) == 3:  # conv1d WIO [k, Cin, Cout] (Cin=1: depthwise)
        k, cin, cout = shape
        fl = 2.0 * B * T * k * cin * cout
    else:
        return 0.0, None
    top = path.split("/")[1]
    return fl, top


def train_flops(params, B, Tp, Tf, L, bert_frozen=True):
    """-> (total_train_flops, {component: train_flops}) for one step."""
    per = {}
    # the trainable BERT layer is the LAST one whatever the depth
    # (bert_freeze_mask semantics) — derive its index, don't hardcode 11
    last_bert = max(int(k.rsplit("_", 1)[1])
                    for k in params["prompt_encoder"]["bert"]
                    if k.startswith("encoder_layer_"))

    def walk(tree, path=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + "/" + k)
            return
        fl, top = _kernel_flops(path, tuple(tree.shape), B, Tp, Tf, L)
        if fl <= 0:
            return
        if top == "prompt_encoder" and bert_frozen:
            # frozen trunk: fwd only; trainable last-layer attention +
            # adaptor MLP: fwd + 2x bwd
            trainable = (f"encoder_layer_{last_bert}/attention" in path
                         or "/adaptor_" in path)
            fl *= 3.0 if trainable else 1.0
        else:
            fl *= 3.0  # fwd + 2x bwd
        per[top] = per.get(top, 0.0) + fl

    walk(params)
    # attention widths from the ACTUAL kernel shapes (config overrides
    # must flow into the quadratic terms, not just the matmul walk)
    enc_blocks = params["encoder"]["encoder"]
    blocks = [k for k in enc_blocks if k.startswith("encoders_")]
    n_blocks = len(blocks)
    C = enc_blocks[blocks[0]]["self_attn"]["linear_q"]["kernel"].shape[1]
    # conformer rel-pos attention quadratic terms, per block:
    # scores q·k^T (2BT^2C), rel bd q·p^T (2BT(2T-1)C), context a·v
    attn = n_blocks * (2.0 * B * Tp * Tp * C
                       + 2.0 * B * Tp * (2 * Tp - 1) * C
                       + 2.0 * B * Tp * Tp * C)
    per["encoder"] = per.get("encoder", 0.0) + 3.0 * attn
    # BERT attention quadratic (scores + context), fwd-only when frozen
    # except the last layer
    bert = params["prompt_encoder"]["bert"]
    bl = [k for k in bert if k.startswith("encoder_layer_")]
    bert_h = bert[bl[0]]["attention_self"]["query"]["kernel"].shape[1]
    battn1 = 2.0 * 2.0 * B * L * L * bert_h
    mult = (len(bl) - 1) * 1.0 + 1 * 3.0 if bert_frozen else len(bl) * 3.0
    per["prompt_encoder"] = per.get("prompt_encoder", 0.0) + mult * battn1
    # duration->frame alignment expansion x @ path [B,Tp,Tf]
    per["align_expand"] = 3.0 * 2.0 * B * Tp * Tf * C
    return sum(per.values()), per


def main():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Tp = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    Tf = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from promptttspp_tpu.flagship import (
        build_flagship_model, example_batch, init_flagship)

    model = build_flagship_model()
    v = init_flagship(model, example_batch(B=2, Tp=16, Tf=64, L=16))
    total, per = train_flops(v["params"], B, Tp, Tf, L)
    print(f"analytic train-step model FLOPs  B={B} Tp={Tp} Tf={Tf} L={L}")
    for k, fl in sorted(per.items(), key=lambda kv: -kv[1]):
        print(f"  {k:22s} {fl / 1e9:9.2f} GFLOP ({fl / total * 100:5.1f}%)")
    print(f"  {'TOTAL':22s} {total / 1e9:9.2f} GFLOP")


if __name__ == "__main__":
    main()
