"""End-to-end training smoke tests on the 8-virtual-device CPU mesh:
synthetic dataset -> dynamic batching -> sharded train steps -> loss
finite & decreasing-ish -> checkpoint -> resume."""

import numpy as np
import pytest

import jax

from promptttspp_tpu.config import Config

C, MEL = 32, 20


class SyntheticDataset:
    """Implements the dataset protocol (num_tokens / ordered_indices /
    __getitem__ -> feature dict) without files."""

    def __init__(self, n=24, seed=0):
        self.rng = np.random.RandomState(seed)
        self.items = []
        for i in range(n):
            Tp = self.rng.randint(6, 12)
            dur = self.rng.randint(1, 4, size=Tp).astype(np.int32)
            Tf = int(dur.sum())
            self.items.append(dict(
                spk_id=i % 4, utt_id=f"utt{i}",
                phonemes=self.rng.randint(1, 90, Tp).astype(np.int32),
                duration=dur,
                mel=self.rng.randn(Tf, MEL).astype(np.float32),
                log_cf0=self.rng.randn(Tf, 1).astype(np.float32),
                vuv=(self.rng.rand(Tf, 1) > 0.3).astype(np.float32),
                energy=self.rng.rand(Tf, 1).astype(np.float32),
                prompt=f"a test prompt {i}",
            ))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    def num_tokens(self, i):
        return int(self.items[i]["duration"].sum())

    def ordered_indices(self):
        lens = [self.num_tokens(i) for i in range(len(self))]
        return np.argsort(np.asarray(lens), kind="mergesort")


class TokenHashTokenizer:
    """Cheap deterministic tokenizer for tests."""

    pad_id = 0

    def batch_encode(self, texts, max_length=None):
        seqs = [[1] + [2 + (hash(w) % 50) for w in t.split()] + [3]
                for t in texts]
        L = max_length or max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), L), np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s[:L]
            mask[i, :len(s)] = 1
        return ids, mask


def tiny_model(dropout: bool = True):
    """dropout=False zeroes every dropout rate — used by padding tests
    to isolate BatchNorm batch-stat effects from dropout-draw shape
    dependence."""
    dr = (lambda r: r) if dropout else (lambda r: 0.0)
    from promptttspp_tpu.models.bert import BertConfig
    from promptttspp_tpu.models.diffusion import DiffNet, GaussianDiffusion
    from promptttspp_tpu.models.frame_prior import FramePriorNetwork
    from promptttspp_tpu.models.phoneme_embedding import PhonemeEmbedding
    from promptttspp_tpu.models.prompt_encoder import PromptEncoder
    from promptttspp_tpu.models.prompttts import PromptTTSMDNDurCFG
    from promptttspp_tpu.models.style_encoder import StyleEncoder
    from promptttspp_tpu.models.variance_adaptor import (
        MDNPredictor, PitchEmb, Predictor, VarianceAdaptor)
    from promptttspp_tpu.nn.conformer import ConformerEncoder
    from promptttspp_tpu.nn.mdn import MDNLayer

    return PromptTTSMDNDurCFG(
        phoneme_embedding=PhonemeEmbedding(90, C, do_scale=False,
                                           init_normal=False),
        encoder=ConformerEncoder(
            idim=C, attention_dim=C, attention_heads=2, linear_units=64,
            num_blocks=1, positionwise_layer_type="conv1d",
            positionwise_conv_kernel_size=9, dropout_rate=dr(0.1),
            pos_enc_layer_type="rel_pos",
            selfattention_layer_type="rel_selfattn", macaron_style=True,
            use_cnn_module=True, cnn_module_kernel=7, rel_pos_type="new"),
        variance_adaptor=VarianceAdaptor(
            duration_predictor=MDNPredictor(
                channels=C, out_channels=1, kernel_size=3, dropout=dr(0.5),
                num_layers=1, num_gaussians=2, dim_wise=True, detach=True,
                disable_amp=True),
            pitch_predictor=Predictor(
                channels=C, out_channels=2, kernel_size=5, dropout=dr(0.5),
                num_layers=2, detach=False),
            pitch_emb=PitchEmb(1, C, 1),
            frame_prior_network=FramePriorNetwork(
                out_channels=C, hidden_channels=C, n_layers=1,
                kernel_size=17, p_dropout=dr(0.1))),
        reference_encoder=StyleEncoder(
            idim=MEL, gst_tokens=4, gst_heads=2, conv_layers=2,
            conv_chans_list=(4, 8), conv_kernel_size=3, conv_stride=2,
            gru_layers=1, gru_units=C, gst_token_dim=C),
        prompt_encoder=PromptEncoder(
            in_channels=32, mid_channels=32, out_channels=C,
            bert_config=BertConfig(
                vocab_size=64, hidden_size=32, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=32,
                hidden_dropout=dr(0.1), attention_dropout=dr(0.1))),
        style_mdn=MDNLayer(in_dim=C, out_dim=C, num_gaussians=2,
                           dim_wise=True),
        decoder=GaussianDiffusion(
            in_dim=C, out_dim=MEL,
            denoise_fn=DiffNet(in_dim=MEL, encoder_hidden_dim=C,
                               residual_layers=2, residual_channels=16,
                               kernel_size=3, dilation_cycle_length=2),
            K_step=10, schedule_type="linear", norm_scale=6.0),
        norm_style_emb=True,
        mdn_disable_amp=True,
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from promptttspp_tpu.train.trainer import TTSTrainer

    out = tmp_path_factory.mktemp("train_out")
    cfg = Config({
        "output_dir": str(out),
        "train": {"seed": 0, "num_epochs": 2, "save_interval": 2,
                  "lr_scheduler": {"warmup_steps": 10}},
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98], "weight_decay": 0.0},
        "dataset": {"dynamic_batch": True, "max_tokens": 400},
    })
    trainer = TTSTrainer(
        cfg, train_ds=SyntheticDataset(24), valid_ds=SyntheticDataset(8, 1),
        tokenizer=TokenHashTokenizer(), model=tiny_model(),
        freeze_bert=False)
    state = trainer.run()
    return trainer, state, out, cfg


def test_devices():
    assert jax.device_count() == 8
    assert jax.default_backend() == "cpu"


def test_training_runs_and_logs(trained):
    trainer, state, out, cfg = trained
    assert int(state.step) > 0
    assert (out / "logs" / "train.log").exists()
    assert (out / "logs" / "loss.csv").exists()
    assert (out / "config.yaml").exists()
    csv = (out / "logs" / "loss.csv").read_text().strip().splitlines()
    assert len(csv) == 3  # header + 2 epochs
    losses = [float(line.split(",")[1]) for line in csv[1:]]
    assert all(np.isfinite(losses))


def test_checkpoint_resume(trained):
    from promptttspp_tpu.train import checkpoint as ckpt_lib

    trainer, state, out, cfg = trained
    assert (out / "ckpt" / "last").exists()
    assert (out / "ckpt" / "epoch-0002").exists()

    restored, epoch = ckpt_lib.restore_checkpoint(out / "ckpt" / "last", state)
    assert epoch == 2
    assert int(restored.step) == int(state.step)
    leaf = jax.tree.leaves(restored.params)[0]
    ref = jax.tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref))


def test_resume_continues(trained, tmp_path):
    from promptttspp_tpu.train.trainer import TTSTrainer

    trainer, state, out, cfg = trained

    class RecordingDataset(SyntheticDataset):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.accesses = []

        def __getitem__(self, i):
            self.accesses.append(int(i))
            return super().__getitem__(i)

    ds2 = RecordingDataset(24)
    cfg2 = Config(dict(cfg))
    cfg2.output_dir = str(tmp_path)
    cfg2.ckpt_path = str(out / "ckpt" / "last")
    trainer2 = TTSTrainer(
        cfg2, train_ds=ds2, valid_ds=None,
        tokenizer=TokenHashTokenizer(), model=tiny_model(),
        freeze_bert=False)
    state2 = trainer2.run(num_epochs=3)  # resumes at epoch 3
    assert int(state2.step) > int(state.step)

    # resume determinism (VERDICT r2 #8): the resumed run's epoch-3 data
    # order must equal the (seed, epoch)-pure sampler order a continuous
    # run would use at epoch 3
    expected_sampler = trainer2._batches(ds2, True, 0, 8)
    expected_sampler.set_epoch(3)
    expected = [i for b in expected_sampler for i in b]
    assert ds2.accesses[-len(expected):] == expected


def test_bf16_train_step(trained):
    """bf16 compute with f32 master params: one step, finite loss, f32
    params preserved."""
    import jax.numpy as jnp

    from promptttspp_tpu.parallel.mesh import make_mesh, shard_batch
    from promptttspp_tpu.train.state import make_optimizer, make_train_step
    from promptttspp_tpu.train.trainer import model_batch
    from promptttspp_tpu.data.collate import PromptTTSCollator

    trainer, state, out, cfg = trained
    model = tiny_model()
    tx = make_optimizer(warmup_steps=10)
    step = make_train_step(model, tx, donate=False, bf16=True)
    ds = SyntheticDataset(8, 2)
    batch = PromptTTSCollator(tokenizer=TokenHashTokenizer())(
        [ds[i] for i in range(8)])
    mesh = make_mesh()
    with mesh:
        sharded = shard_batch(model_batch(batch), mesh)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.dtype == jnp.float32


def test_auto_input_pipeline(monkeypatch):
    """Unset knobs pick the measured-fastest mode for the host: async
    prefetch only when there are spare cores for its workers; inline
    (with the C++ loader when usable) otherwise (VERDICT r2 #5)."""
    from promptttspp_tpu.train import trainer as tr

    ds = SyntheticDataset(4)
    monkeypatch.setattr(tr.os, "cpu_count", lambda: 8)
    assert tr._auto_input_pipeline(ds) == "prefetch"
    monkeypatch.setattr(tr.os, "cpu_count", lambda: 1)
    # synthetic in-memory dataset has no file-backed item metadata, so
    # the inline path must not claim the native loader
    assert tr._auto_input_pipeline(ds) == "sync"


def test_bert_freeze_mask_follows_tree_depth():
    """VERDICT r2 #4: the freeze boundary must come from the params tree.
    With a 2-layer BERT, exactly encoder_layer_1's attention (self +
    output dense/LayerNorm) is trainable; everything else under bert is
    frozen; non-bert params all train (reference
    `modules/prompt_encoder.py:28-31`)."""
    from promptttspp_tpu.train.state import bert_freeze_mask

    leaf = np.zeros(())
    layer = lambda: {  # noqa: E731
        "attention_self": {"query": {"kernel": leaf}},
        "attention_output_dense": {"kernel": leaf},
        "attention_output_LayerNorm": {"scale": leaf},
        "intermediate_dense": {"kernel": leaf},
        "output_dense": {"kernel": leaf},
        "output_LayerNorm": {"scale": leaf},
    }
    params = {
        "prompt_encoder": {
            "bert": {
                "embeddings_word_embeddings": {"embedding": leaf},
                "encoder_layer_0": layer(),
                "encoder_layer_1": layer(),
            },
            "conv_0": {"kernel": leaf},
        },
        "encoder": {"dense": {"kernel": leaf}},
    }
    mask = bert_freeze_mask(params)
    bert = mask["prompt_encoder"]["bert"]
    # everything outside bert trains
    assert mask["encoder"]["dense"]["kernel"] is True
    assert mask["prompt_encoder"]["conv_0"]["kernel"] is True
    # layer 0 fully frozen, embeddings frozen
    assert not any(jax.tree.leaves(bert["encoder_layer_0"]))
    assert bert["embeddings_word_embeddings"]["embedding"] is False
    # last layer: exactly the attention sub-block trains
    l1 = bert["encoder_layer_1"]
    assert l1["attention_self"]["query"]["kernel"] is True
    assert l1["attention_output_dense"]["kernel"] is True
    assert l1["attention_output_LayerNorm"]["scale"] is True
    assert l1["intermediate_dense"]["kernel"] is False
    assert l1["output_dense"]["kernel"] is False
    assert l1["output_LayerNorm"]["scale"] is False


def test_freeze_mask_train_step_updates_only_last_attention(trained):
    """One masked train step on the tiny model (1-layer BERT): frozen
    BERT leaves bit-identical, last-layer attention leaves updated."""
    from promptttspp_tpu.data.collate import PromptTTSCollator
    from promptttspp_tpu.parallel.mesh import make_mesh, shard_batch
    from promptttspp_tpu.train.state import (
        bert_freeze_mask, make_optimizer, make_train_step)
    from promptttspp_tpu.train.trainer import model_batch

    from promptttspp_tpu.train.state import freeze_opt_state

    trainer, state, out, cfg = trained
    model = tiny_model()
    mask = bert_freeze_mask(state.params)
    tx = make_optimizer(warmup_steps=10)
    state = freeze_opt_state(state, tx, mask)
    step = make_train_step(model, tx, donate=False, freeze_mask=mask)
    ds = SyntheticDataset(8, 3)
    batch = PromptTTSCollator(tokenizer=TokenHashTokenizer())(
        [ds[i] for i in range(8)])
    mesh = make_mesh()
    with mesh:
        sharded = shard_batch(model_batch(batch), mesh)
        new_state, _ = step(state, sharded, jax.random.PRNGKey(0))

    flat_old = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_new = jax.tree.leaves(new_state.params)
    flat_mask = jax.tree.leaves(mask)
    assert len(flat_old) == len(flat_new) == len(flat_mask)
    n_frozen = n_trained_bert = 0
    for (path, old), new, m in zip(flat_old, flat_new, flat_mask):
        keys = [getattr(p, "key", "") for p in path]
        in_bert = "prompt_encoder" in keys and "bert" in keys
        if not m:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
            n_frozen += 1
        elif in_bert:
            assert not np.array_equal(np.asarray(old), np.asarray(new)), \
                f"trainable BERT leaf did not update: {keys}"
            n_trained_bert += 1
    assert n_frozen > 0 and n_trained_bert > 0


def test_emergency_checkpoint_on_crash(tmp_path):
    """A mid-epoch failure must persist a crash checkpoint before
    re-raising (SURVEY §5.3; trainer.run's failure handler)."""
    from promptttspp_tpu.train import checkpoint as ckpt_lib
    from promptttspp_tpu.train.trainer import TTSTrainer

    class ExplodingDataset(SyntheticDataset):
        def __init__(self):
            super().__init__(16, seed=4)
            self.calls = 0

        def __getitem__(self, i):
            self.calls += 1
            if self.calls > 20:  # fail on a later batch, mid-epoch
                raise RuntimeError("disk on fire")
            return super().__getitem__(i)

    cfg = Config({
        "output_dir": str(tmp_path),
        "train": {"seed": 0, "num_epochs": 2, "save_interval": 10,
                  "lr_scheduler": {"warmup_steps": 10},
                  "prefetch": False},
        "optimizer": {"lr": 1e-3, "betas": [0.9, 0.98], "weight_decay": 0.0},
        "dataset": {"dynamic_batch": True, "max_tokens": 200},
    })
    trainer = TTSTrainer(cfg, train_ds=ExplodingDataset(),
                         tokenizer=TokenHashTokenizer(), model=tiny_model(),
                         freeze_bert=False)
    with pytest.raises(RuntimeError, match="disk on fire"):
        trainer.run()

    crash = tmp_path / "ckpt" / "crash"
    assert crash.exists(), "no emergency checkpoint written"
    # the crash checkpoint must be restorable and carry progressed steps
    state = trainer._last_state
    restored, epoch = ckpt_lib.restore_checkpoint(crash, state)
    assert epoch == -1  # crash marker epoch
    assert int(restored.step) > 0
