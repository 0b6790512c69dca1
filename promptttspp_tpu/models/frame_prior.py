"""Frame prior network (`/root/reference/promptttspp/modules/frame_prior.py:37-92`).

Absolute positional encoding + LayerNorm, then n_layers of
[conv k17 -> GELU -> dropout -> residual -> LayerNorm] over frame-level
features. [B, Tf, C] in/out. The PE here is the local duplicate
(`modules/embedding.py`), identical math to the ESPnet one.
"""

from __future__ import annotations

import flax.linen as nn

from promptttspp_tpu.nn.embedding import PositionalEncoding, RelPositionalEncoding
from promptttspp_tpu.nn.layers import ChannelLayerNorm, conv1d


class FramePriorNetwork(nn.Module):
    out_channels: int
    hidden_channels: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    pos_enc_p_dropout: float = 0.1
    use_pos_enc: bool = True
    use_rel: bool = False

    def setup(self):
        if self.use_pos_enc:
            cls = RelPositionalEncoding if self.use_rel else PositionalEncoding
            self.embed = cls(self.hidden_channels, self.pos_enc_p_dropout,
                             name="embed")
            self.norm_emb = ChannelLayerNorm(self.hidden_channels, name="norm_emb")
        self.convs = [
            conv1d(self.hidden_channels, self.kernel_size, name=f"convs_{i}")
            for i in range(self.n_layers)
        ]
        self.norms = [
            ChannelLayerNorm(self.hidden_channels, name=f"norms_{i}")
            for i in range(self.n_layers)
        ]
        self.drop = nn.Dropout(self.p_dropout)

    def __call__(self, x, mask, train: bool = False):
        """x [B, Tf, C]; mask float [B, Tf, 1]."""
        det = not train
        if self.use_pos_enc:
            x = x * mask
            x = self.embed(x, deterministic=det)
            if self.use_rel:
                x = x[0]
            x = self.norm_emb(x)
        for conv, norm in zip(self.convs, self.norms):
            res = conv(x * mask)
            res = nn.gelu(res, approximate=False)
            res = self.drop(res, deterministic=det)
            x = norm(x + res)
        return x * mask
