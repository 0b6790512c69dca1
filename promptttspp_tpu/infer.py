"""High-level synthesis: text (+ style prompt or reference mel) -> waveform.

Counterpart of the reference's inference plumbing
(`/root/reference/app.py:49-82`, `egs/proposed/bin/synthesize.py:93-221`):
phoneme sequence -> model.infer -> F0 zero-phase lowpass (fs=100, 20 Hz)
and vuv gating -> mel denormalization -> F0-aware BigVGAN.

TPU-native two-phase shape handling: a phone-level duration pre-pass picks
the frame bucket, then the frame-level pipeline runs under one of a small
set of compiled shapes (phone buckets x frame buckets).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from promptttspp_tpu.data.batching import bucket_shape
from promptttspp_tpu.ops.filters import lowpass_filter


def _host_prng_key(seed: int) -> np.ndarray:
    """Raw threefry2x32 key built on the host. ``jax.random.PRNGKey``
    runs a (tiny) jitted program — on a tunneled backend that is a
    device dispatch per key, pure request latency. jax.random accepts
    raw uint32[2] legacy key arrays everywhere."""
    return np.array([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                    np.uint32)


class _PendingRequest:
    """Handle for an in-flight speculative request (synthesize_async):
    the fused text->wav program is already dispatched; ``result()``
    blocks on the ONE readback that delivers the audio and verifies the
    bucket prediction (re-dispatching transparently on overflow)."""

    def __init__(self, synth, n_items, dispatch_args, pred, return_mels,
                 outputs):
        self._synth = synth
        self._n = n_items
        self._args = dispatch_args
        self._pred = pred
        self._return_mels = return_mels
        self._out = outputs

    def result(self):
        """-> (wavs, mels) exactly like ``synthesize``."""
        synth = self._synth
        wav, mel_denorm, flens, raw = self._out
        if not self._return_mels:
            mel_denorm = None
        wav, mel_denorm, flens, raw = jax.device_get(
            (wav, mel_denorm, flens, raw))
        if int(raw.max()) > self._pred \
                and self._pred < synth.max_frames_cap:
            # bucket overflow: re-run at the true bucket (correct, just
            # slower for this request)
            synth.spec_mispredicts += 1
            mf = min(bucket_shape(int(raw.max()), synth.frame_quantum),
                     synth.max_frames_cap)
            out = synth._full_fn(synth.variables, synth.vocoder_variables,
                                 *self._args, max_frames=mf)
            wav, mel_denorm, flens, raw = out
            if not self._return_mels:
                mel_denorm = None
            wav, mel_denorm, flens, raw = jax.device_get(
                (wav, mel_denorm, flens, raw))
        wavs, mels = [], []
        for i in range(self._n):
            n = int(flens[i])
            if self._return_mels:
                mels.append(np.asarray(mel_denorm[i, :n]))
            wavs.append(np.asarray(wav[i, : n * synth.upsample, 0]))
        return wavs, mels


class Synthesizer:
    def __init__(
        self,
        model,
        variables: Dict,
        vocoder=None,
        vocoder_variables: Optional[Dict] = None,
        mel_stats: Optional[Dict] = None,
        tokenizer=None,
        to_mel=None,
        phone_quantum: int = 16,
        frame_quantum: int = 128,
        max_frames_cap: int = 2048,
        vocoder_mode: str = "batched",
        mesh=None,
        chunk_frames: int = 256,
        halo_frames: int = 16,
        upsample: int = 240,
        frame_sharded_decode: bool = False,
        decode_param_dtype: Optional[str] = None,
        decode_pipelined: bool = False,
        pipeline_microbatches: int = 1,
        speculative: bool = False,
        spec_frames_per_phone: float = 10.0,
        spec_duration_table: Optional[np.ndarray] = None,
        spec_duration_std: Optional[np.ndarray] = None,
        spec_margin: float = 3.0,
        spec_rate_margin: float = 0.2,
        return_int16: bool = False,
        first_chunk_frames: Optional[int] = None,
    ):
        """vocoder_mode: "batched" (one call over the utterance batch),
        "chunked" (fold fixed-size mel chunks into the batch axis — one
        compiled shape for any length), or "sharded" (chunked + the chunk
        batch spread over ``mesh``'s data axis; vocoders/streaming.py).

        frame_sharded_decode: run the 100-step diffusion decode with the
        frame axis sharded over ``mesh``'s data axis (parallel/sp.py) —
        exact sequence parallelism for long utterances.

        decode_pipelined: run every denoiser call of the decode as the
        exact GPipe schedule over ``mesh``'s model axis (parallel/pp.py)
        — for denoisers scaled past one chip's HBM. Batch must divide
        into ``pipeline_microbatches``.

        speculative: collapse a request to ONE device dispatch. The
        default (two-phase) request pays a duration pre-pass plus a
        blocking ``frame_lens`` readback — a full host<->device RTT —
        before the fused program can even be dispatched. Speculative
        mode instead predicts the frame bucket on the host from the
        phone count (``spec_frames_per_phone`` frames per phone, ~10 =
        100 ms/phone covers normal speech) and dispatches the fused
        text->wav program immediately; the program itself returns the
        UNCLIPPED duration sums, so one readback both delivers the audio
        and verifies the prediction. On overflow (true frames > bucket)
        the request transparently re-runs at the right bucket — always
        correct, just slower for that request (track via
        ``spec_mispredicts``/``spec_requests``).

        spec_duration_table / spec_duration_std: per-phone-id expected
        frames and std (arrays indexed by phoneme id; derive from a
        training CSV with ``scripts/make_spec_duration_table.py``). When
        given, the bucket prediction is per-request statistical instead
        of the flat frames-per-phone bound: predicted frames =
        sum(mean[phones]) * (1 + ``spec_rate_margin``)
        + ``spec_margin`` * sqrt(sum(std[phones]^2)).
        The additive term is the independent-per-phone CLT tail; the
        multiplicative term covers utterance-level speaking-rate
        variation, which is CORRELATED across the utterance and
        dominates the tail for long texts (a pure k-sigma CLT margin
        under-covers it — quantified in BENCHMARKS.md §Speculative,
        scripts/spec_serving_eval.py; defaults margin=3, rate=0.2 sit
        at <1% mispredict on speech-shaped duration statistics). Note
        the diffusion
        noise tensor is drawn at the bucket shape, so a speculatively
        larger bucket yields a different (equally valid) sample than the
        exact-bucket dispatch would — the same class of shape-dependence
        the frame quantum already introduces.

        return_int16: quantize the waveform to PCM16 inside the fused
        program — halves the wav readback payload (it is the format the
        audio ships in anyway); only the fused/speculative paths honor
        it."""
        assert vocoder_mode in ("batched", "chunked", "sharded")
        if decode_pipelined:
            if mesh is None:
                from promptttspp_tpu.parallel.mesh import make_mesh

                mesh = make_mesh()
            model = model.clone(decoder=model.decoder.clone(
                pipeline_mesh=mesh,
                pipeline_microbatches=pipeline_microbatches))
        self.model = model
        if decode_param_dtype is not None:
            # bf16-stored denoiser weights: the 100-step scan re-streams
            # every DiffNet weight from HBM each step, so storage dtype —
            # not compute dtype — sets the decode's bandwidth bill. Flax
            # promotes bf16 params against f32 activations, so the math
            # still runs f32 (and TPU matmuls already multiply in bf16 by
            # default). Pair with `+model.decoder.infer_io_dtype=bfloat16`
            # for the hoisted cond projections.
            dt = jnp.dtype(decode_param_dtype)
            dn = jax.tree.map(
                lambda a: a.astype(dt)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                variables["params"]["decoder"]["denoise_fn"])
            variables = dict(variables)
            variables["params"] = dict(variables["params"])
            variables["params"]["decoder"] = dict(
                variables["params"]["decoder"])
            variables["params"]["decoder"]["denoise_fn"] = dn
        self.variables = variables
        self.vocoder = vocoder
        self.vocoder_variables = vocoder_variables
        self.mel_stats = mel_stats or {"mean": 0.0, "std": 1.0}
        self.tokenizer = tokenizer
        self.to_mel = to_mel
        self.phone_quantum = phone_quantum
        self.frame_quantum = frame_quantum
        self.max_frames_cap = max_frames_cap
        self.vocoder_mode = vocoder_mode
        self.chunk_frames = chunk_frames
        self.first_chunk_frames = first_chunk_frames
        self.halo_frames = halo_frames
        self.upsample = upsample
        self.frame_sharded_decode = frame_sharded_decode
        self.speculative = speculative
        self.spec_frames_per_phone = float(spec_frames_per_phone)
        self.spec_duration_table = None
        self.spec_duration_std = None
        if spec_duration_table is not None:
            tbl = np.asarray(spec_duration_table, np.float64).copy()
            tbl[0] = 0.0  # pad id contributes no frames
            self.spec_duration_table = tbl
            std = (np.zeros_like(tbl) if spec_duration_std is None
                   else np.asarray(spec_duration_std, np.float64).copy())
            std[0] = 0.0
            self.spec_duration_std = std
        self.spec_margin = float(spec_margin)
        self.spec_rate_margin = float(spec_rate_margin)
        self.return_int16 = return_int16
        self.spec_requests = 0
        self.spec_mispredicts = 0
        if (vocoder_mode == "sharded" or frame_sharded_decode) \
                and mesh is None:
            from promptttspp_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        self.mesh = mesh

        # variables are explicit jit arguments: closure-captured params
        # would be inlined as giant HLO constants (slow/fragile compiles)
        self._dur_fn = jax.jit(self._duration_pass,
                               static_argnames=("use_max",))
        self._infer_fn = jax.jit(
            self._infer_pass,
            static_argnames=("max_frames", "use_max", "noise_scale",
                             "zero_noise"))
        self._cond_fn = jax.jit(
            self._cond_pass,
            static_argnames=("max_frames", "use_max", "noise_scale"))
        self._voc_fn = None
        if vocoder is not None:
            self._voc_fn = jax.jit(
                lambda vv, mel, f0: vocoder.apply(
                    vv, mel, f0, deterministic=True))
        # single-dispatch request path (VERDICT r2 #1): acoustic infer +
        # F0 lowpass/gating + mel denorm + vocoder as ONE compiled
        # program per (phone, frame) bucket — a request is 2 dispatches
        # total (duration pre-pass picks the frame bucket, then this)
        self._full_fn = None
        if vocoder is not None:
            self._full_fn = jax.jit(
                self._full_pass,
                static_argnames=("max_frames", "use_max", "noise_scale",
                                 "zero_noise"))
        self._acoustic_fn = jax.jit(
            self._acoustic_pass,
            static_argnames=("max_frames", "use_max", "noise_scale"))
        self._mel_fn = None
        if to_mel is not None:
            self._mel_fn = jax.jit(to_mel.to_mel)

    # ---------------------------------------------------------- jit bodies
    # prompt_ids/reference_mel are mutually exclusive; the absent one is
    # passed as None (a static empty pytree under jit), so each
    # conditioning mode gets its own specialization — mirroring the
    # reference's two model.infer branches
    # (`/root/reference/egs/proposed/bin/synthesize.py:178-213`).
    def _duration_pass(self, variables, phoneme, phone_lengths, prompt_ids,
                       prompt_mask, reference_mel, ref_lengths, use_max,
                       style_rng):
        return self.model.apply(
            variables, phoneme, phone_lengths,
            prompt_ids=prompt_ids, prompt_mask=prompt_mask,
            reference_mel=reference_mel, ref_lengths=ref_lengths,
            use_max=use_max, noise_scale=0.0, style_rng=style_rng,
            method=type(self.model).infer_frame_lengths)

    def _infer_pass(self, variables, phoneme, phone_lengths, prompt_ids,
                    prompt_mask, reference_mel, ref_lengths, use_max,
                    noise_scale, style_rng, diffusion_rng, max_frames,
                    x_T=None, zero_noise=False):
        return self.model.apply(
            variables, phoneme, phone_lengths, max_frames,
            prompt_ids=prompt_ids, prompt_mask=prompt_mask,
            reference_mel=reference_mel, ref_lengths=ref_lengths,
            use_max=use_max, noise_scale=noise_scale,
            style_rng=style_rng, diffusion_rng=diffusion_rng,
            x_T=x_T, zero_noise=zero_noise,
            return_f0=True, return_raw_lengths=True,
            method=type(self.model).infer)

    def _full_pass(self, variables, voc_variables, phoneme, phone_lengths,
                   prompt_ids, prompt_mask, reference_mel, ref_lengths,
                   use_max, noise_scale, style_rng, diffusion_rng,
                   max_frames, x_T=None, zero_noise=False):
        """text -> wav in one compiled program: infer + F0 post + mel
        denorm + vocoder, no host round-trips between stages. Also
        returns the unclipped duration sums so the speculative path can
        verify its bucket prediction from the same dispatch."""
        mel, flens, log_cf0, vuv, raw_lens = self._infer_pass(
            variables, phoneme, phone_lengths, prompt_ids, prompt_mask,
            reference_mel, ref_lengths, use_max, noise_scale, style_rng,
            diffusion_rng, max_frames, x_T=x_T, zero_noise=zero_noise)
        f0, mel_denorm = self._postprocess(mel, log_cf0, vuv)
        wav = self.vocoder.apply(voc_variables, mel_denorm, f0,
                                 deterministic=True)
        if self.return_int16:
            # quantize to PCM16 on device: halves the wav readback bytes
            # (the audible format anyway); traced statically via ctor flag
            wav = jnp.clip(jnp.round(wav * 32767.0), -32768.0,
                           32767.0).astype(jnp.int16)
        return wav, mel_denorm, flens, raw_lens

    def _postprocess(self, mel, log_cf0, vuv):
        """F0 smoothing + vuv gating (`app.py:76-79`) and mel
        denormalization (`app.py:80`) — the ONE definition both the
        fused single-dispatch path and the chunked/sharded fallbacks
        run through."""
        log_cf0 = lowpass_filter(log_cf0[..., 0], fs=100, cutoff=20)
        f0 = jnp.exp(log_cf0)
        f0 = jnp.where(vuv[..., 0] > 0.5, f0, 0.0)[..., None]
        mel_denorm = mel * self.mel_stats["std"] + self.mel_stats["mean"]
        return f0, mel_denorm

    def _acoustic_pass(self, variables, phoneme, phone_lengths, prompt_ids,
                       prompt_mask, reference_mel, ref_lengths, use_max,
                       noise_scale, style_rng, diffusion_rng, max_frames):
        """Acoustic model + F0 post + mel denorm in one program — the
        streaming request's first dispatch (the vocoder then runs
        chunk-by-chunk, vocoders/streaming.py)."""
        mel, flens, log_cf0, vuv, raw_lens = self._infer_pass(
            variables, phoneme, phone_lengths, prompt_ids, prompt_mask,
            reference_mel, ref_lengths, use_max, noise_scale, style_rng,
            diffusion_rng, max_frames)
        f0, mel_denorm = self._postprocess(mel, log_cf0, vuv)
        return mel_denorm, f0, flens, raw_lens

    def _cond_pass(self, variables, phoneme, phone_lengths, prompt_ids,
                   prompt_mask, reference_mel, ref_lengths, use_max,
                   noise_scale, style_rng, max_frames):
        return self.model.apply(
            variables, phoneme, phone_lengths, max_frames,
            prompt_ids=prompt_ids, prompt_mask=prompt_mask,
            reference_mel=reference_mel, ref_lengths=ref_lengths,
            use_max=use_max, noise_scale=noise_scale,
            style_rng=style_rng, method=type(self.model).infer_cond)

    # ------------------------------------------------------------- helpers
    def _pad_phonemes(self, seqs: Sequence[Sequence[int]]):
        B = len(seqs)
        Tp = bucket_shape(max(len(s) for s in seqs), self.phone_quantum)
        phoneme = np.zeros((B, Tp), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, s in enumerate(seqs):
            phoneme[i, : len(s)] = s
            lens[i] = len(s)
        # host arrays on purpose: jit transfers them with the dispatch;
        # materializing jnp arrays here would add a host->device round
        # trip AND make the later np.max(plens) a blocking readback
        return phoneme, lens

    def _encode_prompts(self, prompts: Sequence[str]):
        assert self.tokenizer is not None, "tokenizer required for prompts"
        ids, mask = self.tokenizer.batch_encode(prompts)
        L = bucket_shape(ids.shape[1], 16)
        ids_p = np.full((ids.shape[0], L), self.tokenizer.pad_id, np.int32)
        mask_p = np.zeros((ids.shape[0], L), np.int32)
        ids_p[:, : ids.shape[1]] = ids
        mask_p[:, : ids.shape[1]] = mask
        return ids_p, mask_p

    def _pad_ref_mels(self, mels: Sequence[np.ndarray]):
        """Normalize raw log-mels with the global stats and pad to a frame
        bucket (the reference normalizes at the call site,
        `/root/reference/app.py:67`, `synthesize.py:175`)."""
        B = len(mels)
        Tf = bucket_shape(max(m.shape[0] for m in mels), self.frame_quantum)
        C = mels[0].shape[1]
        out = np.zeros((B, Tf, C), np.float32)
        lens = np.zeros((B,), np.int32)
        mean, std = self.mel_stats["mean"], self.mel_stats["std"]
        for i, m in enumerate(mels):
            out[i, : m.shape[0]] = (np.asarray(m, np.float32) - mean) / std
            lens[i] = m.shape[0]
        return out, lens

    def wav_to_mel(self, wav: np.ndarray) -> np.ndarray:
        """24 kHz wav [Ts] -> raw log-mel [T, 80] (reference wav->mel on
        the fly, `/root/reference/egs/proposed/bin/synthesize.py:172-174`)."""
        assert self.to_mel is not None, "to_mel transform required for wavs"
        return np.asarray(self._mel_fn(jnp.asarray(wav, jnp.float32)))

    # ------------------------------------------------------------- prewarm
    def _speculative_grid(self, max_phones: int):
        """The exact (phone_bucket, frame_bucket) program set speculative
        happy-path serving touches: for each phone bucket, the frame
        buckets its admissible phone counts predict."""
        pq, fq = self.phone_quantum, self.frame_quantum
        if self.spec_duration_table is not None:
            t = self.spec_duration_table[1:]
            s = self.spec_duration_std[1:]
            mean_fpp = float(t[t > 0].mean()) if (t > 0).any() else 10.0
            mean_var = float((s[t > 0] ** 2).mean()) if (t > 0).any() else 0.0
        pairs = []
        # every admissible phone bucket up to max_phones (once predicted
        # frames hit max_frames_cap the per-bucket frame set collapses to
        # ~{cap}, so larger buckets stay cheap — do NOT stop early: a
        # request with more phones still dispatches ITS phone bucket and
        # must find it compiled)
        for p in range(pq, bucket_shape(max_phones, pq) + 1, pq):
            frames = set()
            for l in range(p - pq + 1, p + 1):
                if self.spec_duration_table is not None:
                    f = (l * mean_fpp * (1.0 + self.spec_rate_margin)
                         + self.spec_margin * np.sqrt(l * mean_var))
                else:
                    f = l * self.spec_frames_per_phone
                fb = min(bucket_shape(max(1, int(np.ceil(f))), fq),
                         self.max_frames_cap)
                frames.add(fb)
                if self.spec_duration_table is not None:
                    # content-dependent predictions: pad one bucket out
                    # each way so atypical texts stay on prewarmed shapes
                    frames.add(max(fq, fb - fq))
                    frames.add(min(self.max_frames_cap, fb + fq))
            pairs.extend((p, f) for f in sorted(frames))
        return pairs

    def prewarm(self, batch_sizes=(1,), prompt_lens=(32,),
                grid: str = "speculative", max_phones: int = 256,
                use_max: bool = True, noise_scale: float = 0.5,
                streaming: bool = False, log=None):
        """Compile the fused text->wav serving programs ahead of the
        first request (the first request per (batch, phone-bucket,
        frame-bucket, prompt-len) shape otherwise pays the full XLA
        compile — minutes on a slow host). With JAX's persistent
        compilation cache enabled (``jax_compilation_cache_dir`` /
        ``JAX_COMPILATION_CACHE_DIR``), one deploy-time prewarm run makes
        every later process's first request a cache deserialization —
        measured numbers in BENCHMARKS.md §Serving cold start; CLI:
        ``scripts/prewarm_serving.py``.

        grid="speculative": exactly the shapes speculative happy-path
        serving can hit for phone counts up to ``max_phones`` (plus the
        duration pre-pass programs, which two-phase and mispredict
        re-dispatch share). grid="full": every (phone, frame) bucket pair
        up to (max_phones, max_frames_cap) — covers mispredict re-runs
        too. Returns [{B, Tp, Tf, L, seconds}, ...] per program.

        streaming=True additionally compiles the
        ``synthesize_streaming`` program set: the acoustic-only pass
        (text -> mel+F0, a DIFFERENT program than the fused text->wav)
        for every grid entry, plus the chunk-shaped streaming vocoder
        programs (chunk_frames / first_chunk_frames — utterance-length
        independent, so one warm run covers all lengths).
        """
        assert self._full_fn is not None, "prewarm requires a vocoder"
        pq, fq = self.phone_quantum, self.frame_quantum
        if grid == "speculative":
            pairs = self._speculative_grid(max_phones)
        elif grid == "full":
            phones = range(pq, bucket_shape(max_phones, pq) + 1, pq)
            pairs = [(p, f) for p in phones
                     for f in range(fq, self.max_frames_cap + 1, fq)]
        else:
            raise ValueError(f"unknown prewarm grid {grid!r}")
        rows = []
        import time as _time

        for B in batch_sizes:
            for L in prompt_lens:
                pids = np.ones((B, L), np.int32)
                pmask = np.ones((B, L), np.int32)
                k1, k2 = _host_prng_key(0), _host_prng_key(1)
                dur_warmed = set()
                for p, f in pairs:
                    phoneme = np.ones((B, p), np.int32)
                    plens = np.full((B,), p, np.int32)
                    t0 = _time.perf_counter()
                    out = self._full_fn(
                        self.variables, self.vocoder_variables, phoneme,
                        plens, pids, pmask, None, None, use_max,
                        noise_scale, k1, k2, max_frames=f)
                    jax.device_get(out[2])  # force the compile+run
                    if streaming:
                        sout = self._acoustic_fn(
                            self.variables, phoneme, plens, pids, pmask,
                            None, None, use_max, noise_scale, k1, k2,
                            max_frames=f)
                        jax.device_get(sout[2])
                    if p not in dur_warmed:
                        # the duration pre-pass for this phone bucket
                        # (the two-phase and mispredict-verification
                        # sibling) — frame-bucket independent, so once
                        # per phone bucket
                        dur_warmed.add(p)
                        jax.device_get(self._dur_fn(
                            self.variables, phoneme, plens, pids, pmask,
                            None, None, use_max, k1))
                    dt = _time.perf_counter() - t0
                    rows.append(dict(B=B, Tp=p, Tf=f, L=L,
                                     seconds=round(dt, 2)))
                    if log is not None:
                        log(f"prewarm B={B} Tp={p} Tf={f} L={L}: "
                            f"{dt:.1f}s")
            if streaming:
                # the chunk-shaped streaming vocoder programs (one per
                # chunk shape, utterance-length independent): one warm
                # run over first_chunk + one full chunk compiles both
                from promptttspp_tpu.vocoders.streaming import (
                    vocode_streaming)

                t0 = _time.perf_counter()
                T = (self.first_chunk_frames
                     or self.chunk_frames) + self.chunk_frames
                mel = jnp.zeros((B, T, self.model.decoder.out_dim),
                                jnp.float32)
                f0 = jnp.zeros((B, T, 1), jnp.float32)
                for wav in vocode_streaming(
                        self.vocoder, self.vocoder_variables, mel, f0,
                        chunk_frames=self.chunk_frames,
                        halo_frames=self.halo_frames,
                        upsample=self.upsample,
                        first_chunk_frames=self.first_chunk_frames,
                        deterministic=True):
                    jax.device_get(wav)
                dt = _time.perf_counter() - t0
                rows.append(dict(B=B, Tp=0, Tf=T, L=0,
                                 seconds=round(dt, 2),
                                 program="streaming_vocoder_chunks"))
                if log is not None:
                    log(f"prewarm streaming vocoder chunks B={B}: "
                        f"{dt:.1f}s")
        return rows

    def _predict_frames(self, phoneme, plens) -> int:
        """Host-side frame-bucket prediction for speculative dispatch.

        With a per-phone duration table: predicted frames = sum of the
        request's per-phone means scaled by (1 + ``spec_rate_margin``)
        (correlated speaking-rate headroom) + ``spec_margin`` standard
        deviations of the sum (independent-phone CLT bound). Without
        one: the flat ``spec_frames_per_phone`` upper bound on the max
        phone count."""
        if self.spec_duration_table is not None:
            ids = np.asarray(phoneme)
            n = len(self.spec_duration_table)
            # ids outside the table (custom inventory / stale table):
            # fall back to the flat per-phone upper bound for those
            # positions instead of crashing the request
            known = ids < n
            safe = np.where(known, ids, 0)
            mean = np.where(known & (ids > 0),
                            self.spec_duration_table[safe],
                            np.where(ids > 0, self.spec_frames_per_phone,
                                     0.0)).sum(axis=1)
            var = np.where(known, self.spec_duration_std[safe] ** 2,
                           0.0).sum(axis=1)
            frames = float(np.max(
                mean * (1.0 + self.spec_rate_margin)
                + self.spec_margin * np.sqrt(var)))
        else:
            frames = float(np.max(plens)) * self.spec_frames_per_phone
        return min(
            bucket_shape(max(1, int(np.ceil(frames))), self.frame_quantum),
            self.max_frames_cap)

    # ---------------------------------------------------------------- API
    def _dispatch_speculative(self, n_items, phoneme, plens, prompt_ids,
                              prompt_mask, ref_mel, ref_lens, use_max,
                              noise_scale, style_rng, diffusion_rng,
                              return_mels):
        """Predict the frame bucket from the phone count, dispatch the
        fused text->wav program, return WITHOUT blocking."""
        self.spec_requests += 1
        pred = self._predict_frames(phoneme, plens)
        args = (phoneme, plens, prompt_ids, prompt_mask, ref_mel, ref_lens,
                use_max, noise_scale, style_rng, diffusion_rng)
        out = self._full_fn(self.variables, self.vocoder_variables, *args,
                            max_frames=pred)
        return _PendingRequest(self, n_items, args, pred, return_mels, out)

    def synthesize_async(
        self,
        phoneme_seqs: Sequence[Sequence[int]],
        prompts: Optional[Sequence[str]] = None,
        reference_mels: Optional[Sequence[np.ndarray]] = None,
        use_max: bool = True,
        noise_scale: float = 0.5,
        seed: int = 0,
        return_mels: bool = False,
    ) -> _PendingRequest:
        """Dispatch a speculative single-dispatch request without
        blocking; the returned handle's ``result()`` performs the one
        readback (-> (wavs, mels) exactly like ``synthesize``).

        This is the serving-queue primitive: submit request N+1 before
        resolving request N and the device computes N+1 while N's audio
        streams back to the host — sustained throughput becomes
        device-compute-bound instead of round-trip-bound (on a tunneled
        host link the difference is the entire transport cost).

        Requires ``speculative=True`` with the fused batched vocoder
        path (the same conditions ``synthesize`` needs for its
        single-dispatch branch)."""
        if not (self.speculative and self._full_fn is not None
                and self.vocoder_mode == "batched"
                and not self.frame_sharded_decode):
            raise ValueError(
                "synthesize_async requires speculative=True, a vocoder, "
                "vocoder_mode='batched', and frame_sharded_decode=False")
        n_cond = sum(x is not None for x in (prompts, reference_mels))
        assert n_cond == 1, "exactly one of prompts / reference_mels"
        phoneme, plens = self._pad_phonemes(phoneme_seqs)
        if prompts is not None:
            prompt_ids, prompt_mask = self._encode_prompts(prompts)
            ref_mel, ref_lens = None, None
        else:
            prompt_ids, prompt_mask = None, None
            ref_mel, ref_lens = self._pad_ref_mels(reference_mels)
        return self._dispatch_speculative(
            len(phoneme_seqs), phoneme, plens, prompt_ids, prompt_mask,
            ref_mel, ref_lens, use_max, noise_scale,
            _host_prng_key(seed), _host_prng_key(seed + 1), return_mels)

    def synthesize(
        self,
        phoneme_seqs: Sequence[Sequence[int]],
        prompts: Optional[Sequence[str]] = None,
        reference_mels: Optional[Sequence[np.ndarray]] = None,
        reference_wavs: Optional[Sequence[np.ndarray]] = None,
        use_max: bool = True,
        noise_scale: float = 0.5,
        seed: int = 0,
        return_mels: bool = True,
        x_T=None,
        zero_noise: bool = False,
    ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Synthesize with EXACTLY ONE of style-prompt strings,
        raw log-mel references [T,80], or 24 kHz reference wavs.
        Returns (list of wav float arrays, list of mel [T,80] arrays).

        return_mels=False skips the mel device->host transfer (returns
        ``[]`` for mels) — on serving setups where the host link is the
        bottleneck, the ~200 KB/utt mel readback is pure latency.

        x_T / zero_noise inject a fixed initial diffusion state and zero
        the ancestral noise — deterministic hooks for parity tests
        (tests/test_e2e_wav_parity.py); x_T must match the exact frame
        bucket, so these route through the two-phase path."""
        n_cond = sum(x is not None
                     for x in (prompts, reference_mels, reference_wavs))
        assert n_cond == 1, (
            "exactly one of prompts / reference_mels / reference_wavs")
        if reference_wavs is not None:
            reference_mels = [self.wav_to_mel(w) for w in reference_wavs]

        phoneme, plens = self._pad_phonemes(phoneme_seqs)
        if prompts is not None:
            prompt_ids, prompt_mask = self._encode_prompts(prompts)
            ref_mel, ref_lens = None, None
        else:
            prompt_ids, prompt_mask = None, None
            ref_mel, ref_lens = self._pad_ref_mels(reference_mels)
        style_rng = _host_prng_key(seed)
        diffusion_rng = _host_prng_key(seed + 1)

        fused_ok = (self._full_fn is not None
                    and self.vocoder_mode == "batched"
                    and not self.frame_sharded_decode)

        # the speculative branch never threads x_T/zero_noise into its
        # dispatch (x_T must match the exact frame bucket; zero_noise is
        # a parity hook) — both route through the two-phase path below
        if fused_ok and self.speculative and x_T is None and not zero_noise:
            return self._dispatch_speculative(
                len(phoneme_seqs), phoneme, plens, prompt_ids, prompt_mask,
                ref_mel, ref_lens, use_max, noise_scale, style_rng,
                diffusion_rng, return_mels).result()

        frame_lens = self._dur_fn(self.variables, phoneme, plens, prompt_ids,
                                  prompt_mask, ref_mel, ref_lens, use_max,
                                  style_rng)
        max_frames = min(
            bucket_shape(int(np.max(np.asarray(frame_lens))),
                         self.frame_quantum),
            self.max_frames_cap)

        if fused_ok:
            # fused request: dispatch #2 of 2 (after the duration
            # pre-pass) runs the whole acoustic+post+vocoder program
            wav, mel_denorm, flens, _raw = self._full_fn(
                self.variables, self.vocoder_variables, phoneme, plens,
                prompt_ids, prompt_mask, ref_mel, ref_lens, use_max,
                noise_scale, style_rng, diffusion_rng,
                max_frames=max_frames, x_T=x_T, zero_noise=zero_noise)
            wav_np = np.asarray(wav)
            mel_np = np.asarray(mel_denorm) if return_mels else None
            flens_np = np.asarray(flens)
            wavs, mels = [], []
            for i in range(len(phoneme_seqs)):
                n = int(flens_np[i])
                if return_mels:
                    mels.append(mel_np[i, :n])
                wavs.append(wav_np[i, : n * self.upsample, 0])
            return wavs, mels

        if self.frame_sharded_decode:
            # exact sequence parallelism: conditioner replicated, the
            # 100-step decode sharded along frames (parallel/sp.py)
            from promptttspp_tpu.parallel.sp import decode_frames_sharded

            cond, flens, frame_mask, log_cf0, vuv, _raw = self._cond_fn(
                self.variables, phoneme, plens, prompt_ids, prompt_mask,
                ref_mel, ref_lens, use_max, noise_scale, style_rng,
                max_frames=max_frames)
            mel = decode_frames_sharded(
                self.mesh, self.model, self.variables, cond,
                diffusion_rng=diffusion_rng)
            mel = mel * frame_mask[:, :, None].astype(mel.dtype)
        else:
            mel, flens, log_cf0, vuv, _raw = self._infer_fn(
                self.variables, phoneme, plens, prompt_ids, prompt_mask,
                ref_mel, ref_lens, use_max, noise_scale, style_rng,
                diffusion_rng, max_frames=max_frames, x_T=x_T,
                zero_noise=zero_noise)

        f0, mel_denorm = self._postprocess(mel, log_cf0, vuv)

        wavs, mels = [], []
        flens_np = np.asarray(flens)
        if self._voc_fn is not None:
            if self.vocoder_mode == "sharded":
                from promptttspp_tpu.vocoders.streaming import vocode_sharded

                wav = np.asarray(vocode_sharded(
                    self.mesh, self.vocoder, self.vocoder_variables,
                    mel_denorm, f0, chunk_frames=self.chunk_frames,
                    halo_frames=self.halo_frames, upsample=self.upsample,
                    deterministic=True))
            elif self.vocoder_mode == "chunked":
                from promptttspp_tpu.vocoders.streaming import vocode_chunked

                wav = np.asarray(vocode_chunked(
                    self.vocoder, self.vocoder_variables, mel_denorm, f0,
                    chunk_frames=self.chunk_frames,
                    halo_frames=self.halo_frames, upsample=self.upsample,
                    deterministic=True))
            else:
                wav = np.asarray(
                    self._voc_fn(self.vocoder_variables, mel_denorm, f0))
        else:
            wav = None
        # one mel readback (not one per item), skipped entirely when the
        # caller opted out — the ~200 KB/utt transfer is pure latency
        mel_np = np.asarray(mel_denorm) if return_mels else None
        for i in range(len(phoneme_seqs)):
            n = int(flens_np[i])
            if return_mels:
                mels.append(mel_np[i, :n])
            if wav is not None:
                wavs.append(wav[i, : n * self.upsample, 0])
        return wavs, mels


    def synthesize_streaming(
        self,
        phoneme_seqs: Sequence[Sequence[int]],
        prompts: Optional[Sequence[str]] = None,
        reference_mels: Optional[Sequence[np.ndarray]] = None,
        use_max: bool = True,
        noise_scale: float = 0.5,
        seed: int = 0,
    ):
        """Incremental synthesis: yields waveform chunks
        [B, chunk_frames*upsample] (the last one shorter) as they are
        computed, instead of waiting for the full utterance.

        Time-to-first-audio = one fused acoustic dispatch (text ->
        denormalized mel + gated F0, the diffusion decode included) plus
        ONE vocoder chunk (``chunk_frames`` x 10 ms of audio; a smaller
        ``first_chunk_frames`` ramps the first chunk down so the first
        audio costs proportionally less vocoder compute) — the
        vocoder runs chunk-by-chunk with halo context and a
        phase-continuous NSF source (vocoders/streaming.py), so the
        stitched stream equals the batched waveform in the interior.
        With speculative=True the acoustic pass skips the duration
        pre-pass exactly like ``synthesize`` (bucket predicted from the
        phone count, verified from the same dispatch).

        The generator's final ``return`` value (via StopIteration) is
        the per-item frame lengths; slice item i's concatenated stream
        to ``flens[i] * upsample`` samples."""
        assert self.vocoder is not None, "streaming requires a vocoder"
        n_cond = sum(x is not None for x in (prompts, reference_mels))
        assert n_cond == 1, "exactly one of prompts / reference_mels"

        phoneme, plens = self._pad_phonemes(phoneme_seqs)
        if prompts is not None:
            prompt_ids, prompt_mask = self._encode_prompts(prompts)
            ref_mel, ref_lens = None, None
        else:
            prompt_ids, prompt_mask = None, None
            ref_mel, ref_lens = self._pad_ref_mels(reference_mels)
        style_rng = _host_prng_key(seed)
        diffusion_rng = _host_prng_key(seed + 1)
        margs = (self.variables, phoneme, plens, prompt_ids, prompt_mask,
                 ref_mel, ref_lens, use_max, noise_scale, style_rng,
                 diffusion_rng)

        if self.speculative:
            self.spec_requests += 1
            pred = self._predict_frames(phoneme, plens)
            mel_denorm, f0, flens, raw = self._acoustic_fn(
                *margs, max_frames=pred)
            flens_np, raw_np = jax.device_get((flens, raw))
            if int(raw_np.max()) > pred and pred < self.max_frames_cap:
                self.spec_mispredicts += 1
                mf = min(bucket_shape(int(raw_np.max()), self.frame_quantum),
                         self.max_frames_cap)
                mel_denorm, f0, flens, raw = self._acoustic_fn(
                    *margs, max_frames=mf)
                flens_np = np.asarray(flens)
        else:
            frame_lens = self._dur_fn(self.variables, phoneme, plens,
                                      prompt_ids, prompt_mask, ref_mel,
                                      ref_lens, use_max, style_rng)
            max_frames = min(
                bucket_shape(int(np.max(np.asarray(frame_lens))),
                             self.frame_quantum),
                self.max_frames_cap)
            mel_denorm, f0, flens, _raw = self._acoustic_fn(
                *margs, max_frames=max_frames)
            flens_np = np.asarray(flens)

        from promptttspp_tpu.vocoders.streaming import vocode_streaming

        for wav in vocode_streaming(
                self.vocoder, self.vocoder_variables, mel_denorm, f0,
                chunk_frames=self.chunk_frames,
                halo_frames=self.halo_frames, upsample=self.upsample,
                first_chunk_frames=self.first_chunk_frames,
                deterministic=True):
            yield np.asarray(wav)[:, :, 0]
        return flens_np


def write_wav(path, wav: np.ndarray, sample_rate: int = 24000):
    from scipy.io import wavfile

    wav = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sample_rate, (wav * 32767.0).astype(np.int16))
