"""Variance adaptor: MDN duration, alignment expansion, frame prior, pitch.

Behavioral equivalent of
`/root/reference/promptttspp/modules/variance_adaptor.py:23-206`, in the
[B, T, C] layout. Training uses ground-truth durations; inference derives
durations from the most-probable mixture component (exp(mu + sigma^2/2),
rounded, clamped to >= 1). Batched inference keeps static shapes: callers
pass ``max_frames`` and get a frame mask back instead of dynamically-sized
tensors.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from promptttspp_tpu.nn.layers import ChannelLayerNorm, conv1d
from promptttspp_tpu.nn.mdn import MDNLayer, mdn_get_most_probable_sigma_and_mu
from promptttspp_tpu.ops.masks import expand_by_durations, sequence_mask


class PredictorLayer(nn.Module):
    """conv k -> ReLU -> ChannelLayerNorm -> dropout (`:23-37`)."""

    channels: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        x = conv1d(self.channels, self.kernel_size, name="conv")(x)
        x = nn.relu(x)
        x = ChannelLayerNorm(self.channels, name="norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x * mask


class Predictor(nn.Module):
    """Conv stack -> Conv1d(out) (`:40-59`); pitch: 5 layers k5, out 2."""

    channels: int
    out_channels: int
    kernel_size: int
    dropout: float
    num_layers: int
    detach: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        if self.detach:
            x = jax.lax.stop_gradient(x)
        for i in range(self.num_layers):
            x = PredictorLayer(
                self.channels, self.kernel_size, self.dropout,
                name=f"layers_{i}",
            )(x, mask, train=train)
        return conv1d(self.out_channels, 1, name="out_layer")(x) * mask

    def infer(self, x, mask):
        return self(x, mask, train=False)


class MDNPredictor(nn.Module):
    """Conv trunk + MDN head (`:62-102`); duration: 2 layers k3, G=4.

    The MDN head runs in fp32 when ``disable_amp`` (the reference's
    mdn_disable_amp fp32 island under autocast)."""

    channels: int
    out_channels: int
    kernel_size: int
    dropout: float
    num_layers: int
    num_gaussians: int = 4
    dim_wise: bool = True
    detach: bool = False
    disable_amp: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        if self.detach:
            x = jax.lax.stop_gradient(x)
        for i in range(self.num_layers):
            x = PredictorLayer(
                self.channels, self.kernel_size, self.dropout,
                name=f"layers_{i}",
            )(x, mask, train=train)
        if self.disable_amp:
            x = x.astype(jnp.float32)
        return MDNLayer(
            self.channels, self.out_channels, self.num_gaussians,
            self.dim_wise, name="out_layer",
        )(x)

    def infer_log_duration(self, x, mask, train: bool = False):
        """Most-probable log-duration [B, Tp, 1] (`:97-102`)."""
        log_pi, log_sigma, mu = self(x, mask, train=train)
        sigma, mu = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
        sigma_sq = jnp.maximum(jnp.square(sigma), 1e-14)
        return mu + sigma_sq / 2.0


def PitchEmb(in_channels: int, out_channels: int, kernel_size: int = 1):
    """Conv1d(1 -> C, k=1) pitch embedding (config `_target_:
    torch.nn.Conv1d`, `conf/model/...final.yaml:52-56`). Returns a bare
    nn.Conv so its flax path matches the torch key ``pitch_emb.weight``."""
    return conv1d(out_channels, kernel_size)


class VarianceAdaptor(nn.Module):
    """(`variance_adaptor.py:105-206`). Submodules are injected (built by
    config instantiate), mirroring the reference's composition."""

    duration_predictor: nn.Module
    pitch_predictor: nn.Module
    pitch_emb: nn.Module
    energy_predictor: Optional[nn.Module] = None
    energy_emb: Optional[nn.Module] = None
    frame_prior_network: Optional[nn.Module] = None

    def _expand(self, x, durations, phone_mask, num_frames):
        return expand_by_durations(
            x, durations, phone_mask, num_frames
        )

    def __call__(self, x, phone_mask, frame_mask, duration, log_cf0, vuv,
                 energy=None, train: bool = False):
        """Training path with ground-truth targets.

        x [B,Tp,C]; phone_mask bool [B,Tp]; frame_mask bool [B,Tf];
        duration int [B,Tp]; log_cf0 [B,Tf,1]; vuv [B,Tf,1].
        Returns (x [B,Tf,C], mdn_out, log_cf0_pred, vuv_pred, energy_pred).
        """
        pmask = phone_mask[:, :, None].astype(x.dtype)
        fmask = frame_mask[:, :, None].astype(x.dtype)
        Tf = fmask.shape[1]

        mdn_out = self.duration_predictor(x, pmask, train=train)

        x = self._expand(x, duration, phone_mask, Tf)
        if self.frame_prior_network is not None:
            x = self.frame_prior_network(x, fmask, train=train)

        pitch_out = self.pitch_predictor(x, fmask, train=train)
        log_cf0_pred, vuv_pred = jnp.split(pitch_out, 2, axis=-1)
        pitch = self.pitch_emb(log_cf0) * fmask

        if self.energy_predictor is not None:
            energy_pred = self.energy_predictor(x, fmask, train=train)
            energy_e = self.energy_emb(energy) * fmask
        else:
            energy_pred = None
            energy_e = 0.0

        x = x + pitch + energy_e
        return x, mdn_out, log_cf0_pred, vuv_pred, energy_pred

    def infer(self, x, phone_mask, max_frames: int, train: bool = False):
        """Batched inference (`infer_batch`, `:178-206`) with static
        ``max_frames``. Returns (x [B,max_frames,C], frame_lengths [B],
        frame_mask bool, log_cf0, vuv, raw_frame_lengths [B]).

        ``raw_frame_lengths`` is the UNCLIPPED duration sum — equal to
        ``frame_lengths`` unless the utterance overflowed ``max_frames``.
        The speculative single-dispatch serving path (infer.py) reads it
        to detect a frame-bucket misprediction without a separate
        duration pre-pass."""
        pmask = phone_mask[:, :, None].astype(x.dtype)
        log_duration = self.duration_predictor.infer_log_duration(x, pmask)
        duration = jnp.clip(jnp.round(jnp.exp(log_duration)), 1, None)
        duration = (duration[..., 0] * phone_mask).astype(jnp.int32)  # [B,Tp]

        raw_frame_lengths = jnp.sum(duration, axis=-1)
        frame_lengths = jnp.minimum(raw_frame_lengths, max_frames)
        frame_mask = sequence_mask(frame_lengths, max_frames)
        fmask = frame_mask[:, :, None].astype(x.dtype)

        x = self._expand(x, duration, phone_mask, max_frames)
        if self.frame_prior_network is not None:
            x = self.frame_prior_network(x, fmask, train=train)

        pitch_out = self.pitch_predictor.infer(x, fmask)
        log_cf0, vuv = jnp.split(pitch_out, 2, axis=-1)
        pitch = self.pitch_emb(log_cf0) * fmask

        energy_e = 0.0
        if self.energy_predictor is not None:
            energy = self.energy_predictor.infer(x, fmask)
            energy_e = self.energy_emb(energy) * fmask

        x = x + pitch + energy_e
        return x, frame_lengths, frame_mask, log_cf0, vuv, raw_frame_lengths
