"""PromptTTS++ top model (MDN duration + MDN style + diffusion decoder).

Behavioral equivalent of
`/root/reference/promptttspp/models/prompttts_mdn_v2_final/model.py:28-344`,
restructured for TPU:

- batches are dicts of static-shaped, mask-carrying [B, T, C] arrays;
- prompts are pre-tokenized ids (host-side WordPiece) instead of raw
  strings inside forward;
- the fp32 MDN islands (`mdn_disable_amp`) are explicit casts;
- inference is batched with a static ``max_frames`` (compiles once per
  frame bucket) and returns frame lengths alongside padded mel.

Loss formula parity (`model.py:128-183`): L1 eps-prediction / 8, MDN NLL
duration (masked mean), L1 cf0, L1 vuv, style MDN NLL on the detached GST
embedding, optional L1 energy.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from promptttspp_tpu.nn.mdn import (
    mdn_get_most_probable_sigma_and_mu,
    mdn_loss,
    mdn_sample_sigma_and_mu,
)
from promptttspp_tpu.ops.masks import sequence_mask, to_log_scale


def _l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class PromptTTSMDNDurCFG(nn.Module):
    phoneme_embedding: nn.Module
    encoder: nn.Module
    variance_adaptor: nn.Module
    reference_encoder: nn.Module
    prompt_encoder: nn.Module
    decoder: nn.Module
    out_conv: Optional[nn.Module] = None
    style_mdn: Optional[nn.Module] = None
    norm_style_emb: bool = False
    mdn_disable_amp: bool = False
    loss_dec_scale: float = 8.0

    def _encode_phones(self, phoneme, phone_lengths, train,
                       row_weight=None):
        """[B,Tp] ids -> [B,Tp,C] encoder output. row_weight [B] or
        None: weight-0 (padded) rows are excluded from the conformer
        conv module's BatchNorm batch statistics."""
        Tp = phoneme.shape[1]
        phone_mask = sequence_mask(phone_lengths, Tp)  # bool [B,Tp]
        pmask = phone_mask[:, :, None].astype(jnp.float32)
        x = self.phoneme_embedding(phoneme, pmask)
        x = self.encoder(x, phone_lengths, train=train,
                         row_weight=row_weight)
        return x, phone_mask

    def _style_from_prompt_dist(self, log_pi, log_sigma, mu, use_max,
                                noise_scale, rng=None):
        """sample_style_emb (`model.py:185-196`) -> [B, 1, C]."""
        if use_max:
            sigma, mu_sel = mdn_get_most_probable_sigma_and_mu(log_pi, log_sigma, mu)
        else:
            sigma, mu_sel = mdn_sample_sigma_and_mu(rng, log_pi, log_sigma, mu)
        if noise_scale != 0.0:
            noise_rng = rng if rng is not None else self.make_rng("style")
            eps = jax.random.normal(noise_rng, sigma.shape, sigma.dtype)
        else:
            eps = 0.0
        style = mu_sel + sigma * eps * noise_scale
        if self.norm_style_emb:
            style = _l2_normalize(style, axis=-1)
        return style  # [B, 1, C]

    def __call__(self, batch: Dict[str, Any], train: bool = False):
        phoneme = batch["phoneme"]            # [B, Tp] int
        duration = batch["duration"]          # [B, Tp] int
        phone_lengths = batch["phone_lengths"]
        mel = batch["mel"]                    # [B, Tf, 80]
        log_cf0 = batch["log_cf0"]            # [B, Tf, 1]
        vuv = batch["vuv"]                    # [B, Tf, 1]
        energy = batch.get("energy")          # [B, Tf, 1] or None
        frame_lengths = batch["frame_lengths"]
        prompt_ids = batch["prompt_ids"]      # [B, L]
        prompt_mask = batch["prompt_mask"]    # [B, L]

        # Per-row loss weights (0 for rows appended by
        # ``pad_batch_to_multiple`` so device-count padding cannot
        # contaminate any masked reduction; the reference instead never
        # pads — it drops non-divisible batches, `tts.py:138-142`).
        w = batch.get("batch_weight")
        if w is None:
            w = jnp.ones((phoneme.shape[0],), jnp.float32)
        w_b11 = w[:, None, None].astype(jnp.float32)

        x, phone_mask = self._encode_phones(phoneme, phone_lengths, train,
                                            row_weight=w)
        Tf = mel.shape[1]
        frame_mask = sequence_mask(frame_lengths, Tf)
        fmask = frame_mask[:, :, None].astype(jnp.float32) * w_b11

        style_emb = self.reference_encoder(mel, frame_lengths, train=train,
                                           row_weight=w)
        prompt_emb = self.prompt_encoder(prompt_ids, prompt_mask, train=train)
        if self.norm_style_emb:
            style_emb = _l2_normalize(style_emb, axis=-1)
            prompt_emb = _l2_normalize(prompt_emb, axis=-1)

        if self.style_mdn is not None:
            p_in = prompt_emb.astype(jnp.float32) if self.mdn_disable_amp else prompt_emb
            style_mdn_out = self.style_mdn(p_in)

        x = x + style_emb

        x, mdn_out, log_cf0_pred, vuv_pred, energy_pred = self.variance_adaptor(
            x, phone_mask, frame_mask, duration, log_cf0, vuv, energy,
            train=train,
        )

        noise, eps_pred = self.decoder(
            cond=x, y=mel, mask=fmask,
            t=batch.get("diffusion_t"), noise=batch.get("diffusion_noise"),
        )
        noise = noise * fmask
        eps_pred = eps_pred * fmask
        n_frames = jnp.sum(fmask)
        loss_dec = jnp.sum(jnp.abs(noise - eps_pred)) / n_frames / self.loss_dec_scale

        log_duration = to_log_scale(duration.astype(jnp.float32))[:, :, None]
        pmask_btc = phone_mask[:, :, None]
        dur_nll = mdn_loss(*mdn_out, log_duration, reduce=False, mask=pmask_btc)
        pweight = pmask_btc.astype(jnp.float32) * w_b11
        loss_dur = (jnp.sum(jnp.where(pmask_btc, dur_nll, 0.0) * pweight)
                    / jnp.sum(pweight))

        loss_cf0 = jnp.sum(jnp.abs(log_cf0_pred - log_cf0) * fmask) / n_frames
        loss_vuv = jnp.sum(jnp.abs(vuv_pred - vuv) * fmask) / n_frames

        n_rows = jnp.sum(w)
        if self.style_mdn is not None:
            target = jax.lax.stop_gradient(style_emb).astype(style_mdn_out[0].dtype)
            style_nll = mdn_loss(*style_mdn_out, target)  # [B] or [B,D] dim-wise
            w_rows = w.reshape((-1,) + (1,) * (style_nll.ndim - 1))
            denom = n_rows * (style_nll.size // style_nll.shape[0])
            loss_style = jnp.sum(style_nll * w_rows.astype(style_nll.dtype)) / denom
        else:
            sq = jnp.square(jax.lax.stop_gradient(style_emb) - prompt_emb)
            loss_style = (jnp.sum(sq * w_b11)
                          / (n_rows * sq.shape[1] * sq.shape[2]))

        loss = loss_dec + loss_dur + loss_cf0 + loss_vuv + loss_style
        losses = dict(dec=loss_dec, dur=loss_dur, cf0=loss_cf0, vuv=loss_vuv,
                      style=loss_style)
        if energy_pred is not None:
            loss_energy = jnp.sum(jnp.abs(energy_pred - energy) * fmask) / n_frames
            loss = loss + loss_energy
            losses["energy"] = loss_energy
        losses["loss"] = loss
        return losses

    def infer(
        self,
        phoneme,
        phone_lengths,
        max_frames: int,
        prompt_ids=None,
        prompt_mask=None,
        reference_mel=None,
        ref_lengths=None,
        use_max: bool = True,
        noise_scale: float = 1.0,
        return_f0: bool = False,
        style_rng=None,
        diffusion_rng=None,
        x_T=None,
        zero_noise: bool = False,
        return_raw_lengths: bool = False,
    ):
        """Batched inference (`model.py:261-325` infer_batch) with static
        ``max_frames``. Returns (mel, frame_lengths[, log_cf0, vuv]
        [, raw_frame_lengths]) — raw lengths are the unclipped duration
        sums (speculative serving reads them to detect bucket overflow
        without a separate duration pre-pass, infer.py)."""
        x, frame_lengths, frame_mask, log_cf0, vuv, raw_lens = \
            self.infer_cond(
                phoneme, phone_lengths, max_frames,
                prompt_ids=prompt_ids, prompt_mask=prompt_mask,
                reference_mel=reference_mel, ref_lengths=ref_lengths,
                use_max=use_max, noise_scale=noise_scale,
                style_rng=style_rng)
        fmask = frame_mask[:, :, None].astype(jnp.float32)

        mel = self.decoder.inference(x, rng=diffusion_rng, x_T=x_T,
                                     zero_noise=zero_noise)
        mel = mel * fmask

        out = (mel, frame_lengths)
        if return_f0:
            out = out + (log_cf0, vuv)
        if return_raw_lengths:
            out = out + (raw_lens,)
        return out

    def infer_cond(
        self,
        phoneme,
        phone_lengths,
        max_frames: int,
        prompt_ids=None,
        prompt_mask=None,
        reference_mel=None,
        ref_lengths=None,
        use_max: bool = True,
        noise_scale: float = 1.0,
        style_rng=None,
    ):
        """Everything up to (but excluding) the diffusion decoder:
        -> (cond [B,Tf,C], frame_lengths, frame_mask, log_cf0, vuv,
        raw_frame_lengths). Split out so the frame-level decode can run
        separately — e.g. sharded over the mesh's data axis for long
        utterances (parallel/sp.py; SURVEY §5.7c)."""
        assert (prompt_ids is not None) ^ (reference_mel is not None), \
            "exactly one of style inputs must be given"

        x, phone_mask = self._encode_phones(phoneme, phone_lengths, train=False)

        if prompt_ids is not None:
            style_emb = self.prompt_encoder(prompt_ids, prompt_mask, train=False)
            if self.norm_style_emb:
                style_emb = _l2_normalize(style_emb, axis=-1)
            if self.style_mdn is not None:
                p_in = (style_emb.astype(jnp.float32)
                        if self.mdn_disable_amp else style_emb)
                log_pi, log_sigma, mu = self.style_mdn(p_in)
                style_emb = self._style_from_prompt_dist(
                    log_pi, log_sigma, mu, use_max, noise_scale, rng=style_rng)
        else:
            style_emb = self.reference_encoder(reference_mel, ref_lengths,
                                               train=False)
            if self.norm_style_emb:
                style_emb = _l2_normalize(style_emb, axis=-1)

        x = x + style_emb

        return self.variance_adaptor.infer(x, phone_mask, max_frames)

    def infer_frame_lengths(
        self,
        phoneme,
        phone_lengths,
        prompt_ids=None,
        prompt_mask=None,
        reference_mel=None,
        ref_lengths=None,
        use_max: bool = True,
        noise_scale: float = 0.0,
        style_rng=None,
    ):
        """Cheap duration-only pre-pass (phone-level compute only) so the
        caller can pick a frame bucket before running the frame-level
        pipeline — the two-phase answer to XLA static shapes."""
        x, phone_mask = self._encode_phones(phoneme, phone_lengths,
                                            train=False)
        if prompt_ids is not None:
            style_emb = self.prompt_encoder(prompt_ids, prompt_mask,
                                            train=False)
            if self.norm_style_emb:
                style_emb = _l2_normalize(style_emb, axis=-1)
            if self.style_mdn is not None:
                p_in = (style_emb.astype(jnp.float32)
                        if self.mdn_disable_amp else style_emb)
                log_pi, log_sigma, mu = self.style_mdn(p_in)
                style_emb = self._style_from_prompt_dist(
                    log_pi, log_sigma, mu, use_max, noise_scale,
                    rng=style_rng)
        else:
            style_emb = self.reference_encoder(reference_mel, ref_lengths,
                                               train=False)
            if self.norm_style_emb:
                style_emb = _l2_normalize(style_emb, axis=-1)
        x = x + style_emb
        pmask = phone_mask[:, :, None].astype(x.dtype)
        log_duration = self.variance_adaptor.duration_predictor \
            .infer_log_duration(x, pmask)
        duration = jnp.clip(jnp.round(jnp.exp(log_duration)), 1, None)
        duration = (duration[..., 0] * phone_mask).astype(jnp.int32)
        return jnp.sum(duration, axis=-1)

    def generate_style_emb(self, prompt_ids, prompt_mask, reference_mel,
                           ref_lengths, use_max: bool = True,
                           noise_scale: float = 1.0, style_rng=None):
        """(`model.py:327-344`) -> (prompt_emb, ref_emb), each [B, 1, C]."""
        prompt_emb = self.prompt_encoder(prompt_ids, prompt_mask, train=False)
        if self.norm_style_emb:
            prompt_emb = _l2_normalize(prompt_emb, axis=-1)
        if self.style_mdn is not None:
            p_in = (prompt_emb.astype(jnp.float32)
                    if self.mdn_disable_amp else prompt_emb)
            log_pi, log_sigma, mu = self.style_mdn(p_in)
            prompt_emb = self._style_from_prompt_dist(
                log_pi, log_sigma, mu, use_max, noise_scale, rng=style_rng)
        if self.norm_style_emb:
            prompt_emb = _l2_normalize(prompt_emb, axis=-1)
        ref_emb = self.reference_encoder(reference_mel, ref_lengths, train=False)
        if self.norm_style_emb:
            ref_emb = _l2_normalize(ref_emb, axis=-1)
        return prompt_emb, ref_emb
