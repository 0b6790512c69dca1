"""Synthesizer-level tests: reference-mel conditioning parity vs a direct
model.infer call, wav->mel plumbing, and the conditioning XOR contract
(VERDICT r1 Missing #1 — serving-surface coverage of both conditioning
trees, matching `/root/reference/egs/proposed/bin/synthesize.py:148-214`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promptttspp_tpu.data.batching import bucket_shape
from promptttspp_tpu.infer import Synthesizer

MEL = 20
MEAN, STD = -1.3, 2.1


@pytest.fixture(scope="module")
def tiny():
    import tests.test_train as tt

    model = tt.tiny_model()
    ds = tt.SyntheticDataset(4)
    from promptttspp_tpu.data.collate import PromptTTSCollator
    from promptttspp_tpu.train.trainer import model_batch

    batch = PromptTTSCollator(tokenizer=tt.TokenHashTokenizer())(
        [ds[i] for i in range(4)])
    mb = model_batch(batch)
    rngs = {k: jax.random.PRNGKey(i) for i, k in
            enumerate(("params", "dropout", "diffusion", "style"))}
    variables = model.init(rngs, mb, train=True)
    return model, variables, ds


def _make_synth(model, variables, tokenizer=None, to_mel=None):
    return Synthesizer(model, variables, tokenizer=tokenizer, to_mel=to_mel,
                       mel_stats={"mean": MEAN, "std": STD},
                       frame_quantum=64, max_frames_cap=512)


def test_ref_conditioned_matches_direct_infer(tiny):
    model, variables, ds = tiny
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    # raw (denormalized-domain) reference log-mels of unequal length
    rng = np.random.RandomState(7)
    raw_refs = [rng.randn(37, MEL).astype(np.float32) * STD + MEAN,
                rng.randn(25, MEL).astype(np.float32) * STD + MEAN]

    synth = _make_synth(model, variables)
    wavs, mels = synth.synthesize([list(s) for s in seqs],
                                  reference_mels=raw_refs, seed=3)
    assert wavs == []  # no vocoder attached
    assert len(mels) == 2

    # direct model call with identical padding/rng choices
    Tp = bucket_shape(max(len(s) for s in seqs), 16)
    phoneme = np.zeros((2, Tp), np.int32)
    plens = np.zeros((2,), np.int32)
    for i, s in enumerate(seqs):
        phoneme[i, : len(s)] = s
        plens[i] = len(s)
    Tr = bucket_shape(37, 64)
    ref = np.zeros((2, Tr, MEL), np.float32)
    rlens = np.array([37, 25], np.int32)
    for i, m in enumerate(raw_refs):
        ref[i, : m.shape[0]] = (m - MEAN) / STD

    flens_pre = model.apply(
        variables, jnp.asarray(phoneme), jnp.asarray(plens),
        reference_mel=jnp.asarray(ref), ref_lengths=jnp.asarray(rlens),
        use_max=True, noise_scale=0.0,
        style_rng=jax.random.PRNGKey(3),
        method=type(model).infer_frame_lengths)
    max_frames = min(bucket_shape(int(np.max(np.asarray(flens_pre))), 64),
                     512)
    mel, flens, _, _ = model.apply(
        variables, jnp.asarray(phoneme), jnp.asarray(plens), max_frames,
        reference_mel=jnp.asarray(ref), ref_lengths=jnp.asarray(rlens),
        use_max=True, noise_scale=0.5,
        style_rng=jax.random.PRNGKey(3),
        diffusion_rng=jax.random.PRNGKey(4),
        return_f0=True, method=type(model).infer)
    mel_denorm = np.asarray(mel) * STD + MEAN
    flens_np = np.asarray(flens)
    for i in range(2):
        np.testing.assert_allclose(mels[i], mel_denorm[i, : flens_np[i]],
                                   atol=1e-5, rtol=1e-5)


def test_ref_and_prompt_modes_differ(tiny):
    """Both serving modes run end-to-end and produce different styles."""
    import tests.test_train as tt

    model, variables, ds = tiny
    seq = list(ds[0]["phonemes"])
    synth = _make_synth(model, variables, tokenizer=tt.TokenHashTokenizer())
    _, mels_prompt = synth.synthesize([seq], prompts=["a low calm voice"],
                                      seed=5)
    raw_ref = np.random.RandomState(11).randn(30, MEL).astype(np.float32)
    _, mels_ref = synth.synthesize([seq], reference_mels=[raw_ref], seed=5)
    assert mels_prompt[0].shape[1] == mels_ref[0].shape[1] == MEL
    # different conditioning -> different output (not a no-op branch)
    a, b = mels_prompt[0], mels_ref[0]
    n = min(a.shape[0], b.shape[0])
    assert not np.allclose(a[:n], b[:n], atol=1e-3)


def test_wav_to_mel_and_reference_wavs(tiny):
    from promptttspp_tpu.ops.mel import MelSpectrogramTransform

    model, variables, ds = tiny
    to_mel = MelSpectrogramTransform(n_mels=MEL)
    synth = _make_synth(model, variables, to_mel=to_mel)
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(24000) / 24000.0)
           ).astype(np.float32)
    m = synth.wav_to_mel(wav)
    assert m.shape[1] == MEL and m.shape[0] == 24000 // 240 + 1
    _, mels = synth.synthesize([list(ds[0]["phonemes"])],
                               reference_wavs=[wav])
    assert mels[0].shape[1] == MEL


def test_sharded_vocoder_mode_matches_batched(tiny):
    """Synthesizer(vocoder_mode="sharded") — chunk batch spread over the
    8-virtual-device mesh (VERDICT r1 #9) — produces the same waveform as
    the plain batched call, up to halo-context tolerance."""
    import tests.test_train as tt

    from promptttspp_tpu.parallel.mesh import make_mesh
    from promptttspp_tpu.vocoders.bigvgan_f0 import F0AwareBigVGAN

    model, variables, ds = tiny
    voc = F0AwareBigVGAN(
        sampling_rate=24000, harmonic_num=2, in_channel=MEL,
        upsample_initial_channel=16,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),))
    mel0 = jnp.zeros((1, 16, MEL))
    f00 = jnp.zeros((1, 16, 1))
    voc_vars = voc.init(jax.random.PRNGKey(2), mel0, f00,
                        deterministic=True)

    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    # NSF upsample factor is prod(upsample_rates)=8, not 240
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=512, upsample=8)
    batched = Synthesizer(model, variables, **kw)
    sharded = Synthesizer(model, variables, vocoder_mode="sharded",
                          mesh=make_mesh(), chunk_frames=16, halo_frames=12,
                          **kw)
    wav_b, _ = batched.synthesize(seqs, prompts=["a", "b"], seed=2)
    wav_s, _ = sharded.synthesize(seqs, prompts=["a", "b"], seed=2)
    assert len(wav_b) == len(wav_s) == 2
    margin = 12 * 8  # halo_frames * upsample: edge context differs
    # (zero-pad in the full call vs edge-replication in chunks)
    for a, b in zip(wav_b, wav_s):
        assert a.shape == b.shape
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # phase-continuous chunking (streaming.py _chunk_phase0) makes
        # sharded synthesis match the full batched call to float
        # tolerance in the interior
        if len(a) > 2 * margin:
            np.testing.assert_allclose(a[margin:-margin],
                                       b[margin:-margin], atol=5e-3)


def _tiny_vocoder():
    from promptttspp_tpu.vocoders.bigvgan_f0 import F0AwareBigVGAN

    voc = F0AwareBigVGAN(
        sampling_rate=24000, harmonic_num=2, in_channel=MEL,
        upsample_initial_channel=16,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),))
    voc_vars = voc.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, MEL)),
                        jnp.zeros((1, 16, 1)), deterministic=True)
    return voc, voc_vars


def test_speculative_single_dispatch_matches_two_phase(tiny):
    """Speculative serving (ONE dispatch, bucket predicted from the
    phone count) returns bitwise the two-phase result when the predicted
    bucket lands on the same frame bucket the duration pre-pass picks."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=512, upsample=8)
    two_phase = Synthesizer(model, variables, **kw)
    wav_ref, mel_ref = two_phase.synthesize(seqs, prompts=prompts, seed=2)

    # pick the per-phone ratio so prediction == the exact bucket
    exact_bucket = bucket_shape(max(m.shape[0] for m in mel_ref), 64)
    ratio = exact_bucket / max(len(s) for s in seqs)
    spec = Synthesizer(model, variables, speculative=True,
                       spec_frames_per_phone=ratio, **kw)
    wav_s, mel_s = spec.synthesize(seqs, prompts=prompts, seed=2)
    assert spec.spec_requests == 1 and spec.spec_mispredicts == 0
    for a, b in zip(wav_ref, wav_s):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(mel_ref, mel_s):
        np.testing.assert_array_equal(a, b)


def test_synthesize_async_pipelines_requests(tiny):
    """synthesize_async dispatches without blocking; two handles in
    flight resolve to exactly the synchronous results (the serving-queue
    primitive that overlaps request N+1's compute with N's readback)."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    synth = Synthesizer(
        model, variables, vocoder=voc, vocoder_variables=voc_vars,
        tokenizer=tt.TokenHashTokenizer(),
        mel_stats={"mean": MEAN, "std": STD},
        frame_quantum=64, max_frames_cap=512, upsample=8,
        speculative=True, spec_frames_per_phone=8.0)
    ref1 = synth.synthesize(seqs, prompts=prompts, seed=2,
                            return_mels=True)
    ref2 = synth.synthesize(seqs[::-1], prompts=prompts[::-1], seed=5,
                            return_mels=True)

    h1 = synth.synthesize_async(seqs, prompts=prompts, seed=2,
                                return_mels=True)
    h2 = synth.synthesize_async(seqs[::-1], prompts=prompts[::-1], seed=5,
                                return_mels=True)  # in flight behind h1
    out1, out2 = h1.result(), h2.result()
    for (wr, mr), (wa, ma) in ((ref1, out1), (ref2, out2)):
        for a, b in zip(wr, wa):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(mr, ma):
            np.testing.assert_array_equal(a, b)

    synth_nospec = Synthesizer(
        model, variables, vocoder=voc, vocoder_variables=voc_vars,
        tokenizer=tt.TokenHashTokenizer(),
        mel_stats={"mean": MEAN, "std": STD},
        frame_quantum=64, max_frames_cap=512, upsample=8)
    with pytest.raises(ValueError):
        synth_nospec.synthesize_async(seqs, prompts=prompts)


def test_return_int16_quantizes_on_device(tiny):
    """return_int16=True ships PCM16 from the fused program; values are
    the f32 waveform quantized (round + clip), same lengths."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=512, upsample=8,
              speculative=True, spec_frames_per_phone=8.0)
    f32 = Synthesizer(model, variables, **kw)
    wav_f, _ = f32.synthesize(seqs, prompts=prompts, seed=2)
    i16 = Synthesizer(model, variables, return_int16=True, **kw)
    wav_i, _ = i16.synthesize(seqs, prompts=prompts, seed=2)
    for a, b in zip(wav_f, wav_i):
        assert b.dtype == np.int16 and a.shape == b.shape
        expect = np.clip(np.round(a * 32767.0), -32768, 32767)
        np.testing.assert_array_equal(expect.astype(np.int16), b)


def test_speculative_mispredict_redispatches_correctly(tiny):
    """A too-small bucket prediction is detected from the fused
    program's own unclipped duration sums and transparently re-run at
    the true bucket — the result equals the two-phase request exactly."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=16, max_frames_cap=512, upsample=8)
    two_phase = Synthesizer(model, variables, **kw)
    wav_ref, mel_ref = two_phase.synthesize(seqs, prompts=prompts, seed=2)
    assert max(m.shape[0] for m in mel_ref) > 16  # overflow is real

    spec = Synthesizer(model, variables, speculative=True,
                       spec_frames_per_phone=0.01, **kw)
    wav_s, mel_s = spec.synthesize(seqs, prompts=prompts, seed=2)
    assert spec.spec_mispredicts == 1
    for a, b in zip(wav_ref, wav_s):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(mel_ref, mel_s):
        np.testing.assert_array_equal(a, b)


def test_decode_pipelined_knob(tiny):
    """Synthesizer(decode_pipelined=True) routes the decode through the
    GPipe schedule (multi-stage exactness is pinned in tests/test_pp.py;
    this exercises the serving knob end-to-end on the mesh)."""
    import tests.test_train as tt

    from promptttspp_tpu.parallel.mesh import make_mesh

    model, variables, ds = tiny
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    kw = dict(tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=512)
    plain = Synthesizer(model, variables, **kw)
    # tiny decoder: 2 layers, cycle 2 -> one stage holds the whole cycle
    piped = Synthesizer(model, variables, decode_pipelined=True,
                        pipeline_microbatches=2,
                        mesh=make_mesh(data=8, model=1), **kw)
    _, mel_ref = plain.synthesize(seqs, prompts=prompts, seed=4)
    _, mel_pp = piped.synthesize(seqs, prompts=prompts, seed=4)
    for a, b in zip(mel_ref, mel_pp):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_streaming_synthesis_matches_batched(tiny):
    """synthesize_streaming yields chunk-by-chunk audio whose
    concatenation equals the batched waveform in the interior (halo
    context differs at the utterance edges), and returns per-item frame
    lengths via StopIteration."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    synth = Synthesizer(
        model, variables, vocoder=voc, vocoder_variables=voc_vars,
        tokenizer=tt.TokenHashTokenizer(),
        mel_stats={"mean": MEAN, "std": STD},
        frame_quantum=64, max_frames_cap=512, upsample=8,
        chunk_frames=16, halo_frames=12)
    wav_b, _ = synth.synthesize(seqs, prompts=prompts, seed=2)

    gen = synth.synthesize_streaming(seqs, prompts=prompts, seed=2)
    chunks = []
    while True:
        try:
            chunks.append(next(gen))
        except StopIteration as stop:
            flens = stop.value
            break
    assert len(chunks) >= 2  # actually incremental
    stream = np.concatenate(chunks, axis=1)
    margin = 12 * 8  # halo_frames * upsample edge context
    for i in range(2):
        n = int(flens[i]) * 8
        a, b = wav_b[i], stream[i, :n]
        assert a.shape == b.shape
        if len(a) > 2 * margin:
            np.testing.assert_allclose(a[margin:-margin],
                                       b[margin:-margin], atol=5e-3)


def test_conditioning_xor(tiny):
    model, variables, ds = tiny
    synth = _make_synth(model, variables)
    seq = [list(ds[0]["phonemes"])]
    with pytest.raises(AssertionError):
        synth.synthesize(seq)
    with pytest.raises(AssertionError):
        synth.synthesize(seq, prompts=["x"],
                         reference_mels=[np.zeros((10, MEL), np.float32)])


def test_decode_param_dtype_tracks_f32(tiny):
    """Synthesizer(decode_param_dtype="bfloat16") — bf16-stored denoiser
    weights — yields the same chain as f32 to bf16-rounding tolerance."""
    import tests.test_train as tt

    model, variables, ds = tiny
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]

    tok = tt.TokenHashTokenizer
    ref_synth = _make_synth(model, variables, tokenizer=tok())
    bf_synth = Synthesizer(model, variables, tokenizer=tok(),
                           mel_stats={"mean": MEAN, "std": STD},
                           frame_quantum=64, max_frames_cap=512,
                           decode_param_dtype="bfloat16")
    _, mels_ref = ref_synth.synthesize(seqs, prompts=prompts, seed=5)
    _, mels_bf = bf_synth.synthesize(seqs, prompts=prompts, seed=5)
    for a, b in zip(mels_ref, mels_bf):
        assert a.shape == b.shape  # same durations picked
        assert np.all(np.isfinite(b))
        # same chain (not a different sample), deviation ~ bf16 rounding
        assert np.mean(np.abs(a - b)) < 0.05 * STD


def test_zero_noise_routes_two_phase_under_speculative(tiny):
    """synthesize(zero_noise=True) on a speculative Synthesizer must NOT
    take the speculative branch (which never threads zero_noise into its
    dispatch) — it routes two-phase and equals the non-speculative
    zero_noise result exactly (ADVICE r4 #1)."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=512, upsample=8)
    plain = Synthesizer(model, variables, **kw)
    wav_ref, mel_ref = plain.synthesize(seqs, prompts=prompts, seed=2,
                                        zero_noise=True)
    spec = Synthesizer(model, variables, speculative=True,
                       spec_frames_per_phone=8.0, **kw)
    wav_s, mel_s = spec.synthesize(seqs, prompts=prompts, seed=2,
                                   zero_noise=True)
    assert spec.spec_requests == 0  # speculative branch not taken
    for a, b in zip(wav_ref, wav_s):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(mel_ref, mel_s):
        np.testing.assert_array_equal(a, b)
    # and zero_noise is actually honored: a second seed gives the same
    # mel (ancestral noise zeroed -> deterministic given the style)
    wav_s2, _ = spec.synthesize(seqs, prompts=prompts, seed=2,
                                zero_noise=True)
    for a, b in zip(wav_s, wav_s2):
        np.testing.assert_array_equal(a, b)


def test_return_mels_false_all_paths(tiny):
    """return_mels=False returns [] for mels (and skips the readback) on
    the speculative, fused two-phase, AND unfused fallback paths
    (ADVICE r4 #2); waveforms are unaffected."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=512, upsample=8)
    fused = Synthesizer(model, variables, **kw)
    wav_ref, mel_ref = fused.synthesize(seqs, prompts=prompts, seed=2)
    assert len(mel_ref) == 2
    wav_no, mel_no = fused.synthesize(seqs, prompts=prompts, seed=2,
                                      return_mels=False)
    assert mel_no == []
    for a, b in zip(wav_ref, wav_no):
        np.testing.assert_array_equal(a, b)

    spec = Synthesizer(model, variables, speculative=True,
                       spec_frames_per_phone=8.0, **kw)
    wav_sp, mel_sp = spec.synthesize(seqs, prompts=prompts, seed=2,
                                     return_mels=False)
    assert mel_sp == []

    chunked = Synthesizer(model, variables, vocoder_mode="chunked",
                          chunk_frames=16, halo_frames=8, **kw)
    wav_ch, mel_ch = chunked.synthesize(seqs, prompts=prompts, seed=2,
                                        return_mels=False)
    assert mel_ch == [] and len(wav_ch) == 2


def test_spec_duration_table_predictor(tiny):
    """Per-phone duration-table prediction: the bucket tracks the
    request's expected total frames + margin sigmas instead of the flat
    frames-per-phone bound, and the result still equals two-phase."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    prompts = ["a low calm voice", "bright fast speech"]
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=512, upsample=8)
    n_sym = int(max(max(s) for s in seqs)) + 1
    table = np.full((n_sym,), 6.0)
    std = np.full((n_sym,), 2.0)
    spec = Synthesizer(model, variables, speculative=True,
                       spec_duration_table=table, spec_duration_std=std,
                       spec_margin=3.0, spec_rate_margin=0.0, **kw)
    # host math check: mean=6*len, var=4*len per item, pad id excluded
    phoneme, plens = spec._pad_phonemes(seqs)
    L = max(len(s) for s in seqs)
    expect = 6.0 * L + 3.0 * np.sqrt(4.0 * L)
    got = spec._predict_frames(phoneme, plens)
    assert got == min(bucket_shape(int(np.ceil(expect)), 64), 512)

    two_phase = Synthesizer(model, variables, **kw)
    wav_ref, mel_ref = two_phase.synthesize(seqs, prompts=prompts, seed=2)
    wav_s, mel_s = spec.synthesize(seqs, prompts=prompts, seed=2)
    assert spec.spec_requests == 1
    # equality only guaranteed when both picked the same bucket
    if spec.spec_mispredicts == 0 and got == bucket_shape(
            max(m.shape[0] for m in mel_ref), 64):
        for a, b in zip(mel_ref, mel_s):
            np.testing.assert_array_equal(a, b)
    for w in wav_s:
        assert np.isfinite(w).all()


def test_prewarm_compiles_program_grid(tiny):
    """prewarm() runs the fused program for every grid entry without a
    request; subsequent speculative requests on prewarmed shapes hit the
    compiled cache (smoke: results stay correct)."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    kw = dict(vocoder=voc, vocoder_variables=voc_vars,
              tokenizer=tt.TokenHashTokenizer(),
              mel_stats={"mean": MEAN, "std": STD},
              frame_quantum=64, max_frames_cap=256, upsample=8,
              phone_quantum=16)
    spec = Synthesizer(model, variables, speculative=True,
                       spec_frames_per_phone=8.0, **kw)
    rows = spec.prewarm(batch_sizes=(2,), prompt_lens=(16,),
                        grid="speculative", max_phones=32)
    assert rows and all(r["Tf"] <= 256 and r["Tp"] % 16 == 0
                        for r in rows)
    # speculative grid covers the prediction for every phone count <= 32
    covered = {(r["Tp"], r["Tf"]) for r in rows}
    for l in (1, 9, 17, 32):
        p = bucket_shape(l, 16)
        f = min(bucket_shape(int(np.ceil(l * 8.0)), 64), 256)
        assert (p, f) in covered
    # full grid enumerates every pair
    rows_full = spec.prewarm(batch_sizes=(2,), prompt_lens=(16,),
                             grid="full", max_phones=16)
    assert {(r["Tp"], r["Tf"]) for r in rows_full} == {
        (16, f) for f in (64, 128, 192, 256)}
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    wavs, _ = spec.synthesize(seqs, prompts=["a", "b"], seed=2)
    assert len(wavs) == 2 and all(np.isfinite(w).all() for w in wavs)


class _GridStub:
    """Host-side Synthesizer surface for the pure-python bucket logic."""

    phone_quantum, frame_quantum, max_frames_cap = 16, 128, 2048
    spec_duration_table = None
    spec_duration_std = None
    spec_frames_per_phone = 10.0
    spec_margin = 3.0
    spec_rate_margin = 0.2


def test_speculative_grid_covers_all_phone_buckets():
    """The prewarm grid must include EVERY phone bucket up to max_phones
    — including those past the point where predicted frames hit
    max_frames_cap (a larger request still dispatches its own phone
    bucket and must find it compiled)."""
    pairs = Synthesizer._speculative_grid(_GridStub(), 256)
    assert {p for p, _ in pairs} == set(range(16, 257, 16))
    # buckets past the cap predict the cap
    assert (256, 2048) in pairs
    assert all(f <= 2048 for _, f in pairs)


def test_predict_frames_handles_out_of_table_ids():
    """Phoneme ids beyond the duration table fall back to the flat
    per-phone bound instead of crashing the request (stale table /
    custom inventory)."""
    s = _GridStub()
    s.frame_quantum, s.max_frames_cap = 1, 100000
    s.spec_margin, s.spec_rate_margin = 0.0, 0.0
    s.spec_duration_table = np.array([0.0, 5.0, 5.0])
    s.spec_duration_std = np.zeros(3)
    phoneme = np.array([[1, 2, 7, 0]])  # id 7 >= table size; 0 = pad
    got = Synthesizer._predict_frames(s, phoneme, np.array([3]))
    assert got == int(np.ceil(5.0 + 5.0 + s.spec_frames_per_phone))


def test_prewarm_streaming_programs(tiny):
    """prewarm(streaming=True) compiles the acoustic-only pass for each
    grid entry plus the chunk-shaped streaming vocoder programs, and a
    streaming request on a prewarmed shape still yields a correct
    stitched stream."""
    import tests.test_train as tt

    model, variables, ds = tiny
    voc, voc_vars = _tiny_vocoder()
    spec = Synthesizer(model, variables, vocoder=voc,
                       vocoder_variables=voc_vars,
                       tokenizer=tt.TokenHashTokenizer(),
                       mel_stats={"mean": MEAN, "std": STD},
                       frame_quantum=64, max_frames_cap=128, upsample=8,
                       phone_quantum=16, chunk_frames=32,
                       first_chunk_frames=16, halo_frames=4,
                       speculative=True, spec_frames_per_phone=8.0)
    rows = spec.prewarm(batch_sizes=(2,), prompt_lens=(16,),
                        grid="speculative", max_phones=16,
                        streaming=True)
    assert any(r.get("program") == "streaming_vocoder_chunks"
               for r in rows)
    seqs = [list(ds[i]["phonemes"]) for i in range(2)]
    gen = spec.synthesize_streaming(seqs, prompts=["a", "b"], seed=3)
    chunks = []
    while True:
        try:
            chunks.append(next(gen))
        except StopIteration as e:
            flens = e.value
            break
    assert len(chunks) >= 1 and all(np.isfinite(c).all() for c in chunks)
    # first chunk is the TTFA ramp (16 frames x 8 upsample)
    assert chunks[0].shape[1] == 16 * 8
    assert len(flens) == 2
