"""Training runtime: the TPU-native counterpart of the reference's
``TTSTrainer`` (`/root/reference/promptttspp/trainers/tts.py:36-258`).

Differences by design (SURVEY.md §5.8):
- single-program SPMD over a ``jax.sharding.Mesh`` instead of
  mp.spawn+DDP: the global token-bucketed batch is sharded on the mesh's
  data axis; gradient mean is an XLA collective;
- shape-bucketed padding bounds recompilation (the torch loop pads every
  batch to its own max);
- checkpointing via orbax with the reference's cadence/contents;
- same observability surface: ``logs/train.log``, ``logs/loss.csv``,
  TensorBoard scalars per epoch, resolved-config snapshot.
"""

from __future__ import annotations

import logging
import os
import random
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from promptttspp_tpu.config import Config, instantiate
from promptttspp_tpu.data.batching import ShuffleBatchSampler, batch_by_size
from promptttspp_tpu.data.collate import PromptTTSCollator
from promptttspp_tpu.data.prefetch import prefetch_batches
from promptttspp_tpu.parallel.distributed import (
    host_batches, init_distributed)
from promptttspp_tpu.parallel.mesh import (
    make_mesh, pad_batch_to_multiple, pad_batch_to_rows, shard_batch)
from promptttspp_tpu.train import checkpoint as ckpt_lib
from promptttspp_tpu.train.state import (
    bert_freeze_mask, create_train_state, freeze_opt_state,
    make_eval_step, make_optimizer, make_train_step)
from promptttspp_tpu.train.tracker import Tracker

MODEL_BATCH_KEYS = (
    "phoneme", "duration", "phone_lengths", "mel", "log_cf0", "vuv",
    "energy", "frame_lengths", "prompt_ids", "prompt_mask", "batch_weight",
)


def model_batch(batch: Dict) -> Dict:
    return {k: batch[k] for k in MODEL_BATCH_KEYS if k in batch}


def _auto_input_pipeline(ds) -> str:
    """Pick the input-pipeline mode for this host (VERDICT r2 #5):
    async "prefetch" when there are spare cores for its workers,
    otherwise inline assembly — with the C++ feature loader when it is
    built and the dataset exposes file-backed item metadata."""
    from promptttspp_tpu.data import native_loader

    cores = os.cpu_count() or 1
    native_ok = (native_loader.available() and hasattr(ds, "item_meta")
                 and getattr(ds, "stats", None) is not None)
    if cores >= 4:
        return "prefetch"
    return "sync_native" if native_ok else "sync"


@jax.jit
def _metric_add(acc: Dict, metrics: Dict) -> Dict:
    """Single-dispatch device-side accumulation of the step's scalar
    metrics (keeps the hot loop free of host syncs)."""
    return jax.tree.map(lambda a, m: a + m, acc, metrics)


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)


class TTSTrainer:
    """Composes model/optimizer/data from a Hydra-compatible config and
    runs the epoch loop. Datasets and tokenizer are injectable for tests
    (`TTSTrainer(cfg, train_ds=..., valid_ds=..., tokenizer=...)`)."""

    def __init__(self, cfg: Config, train_ds=None, valid_ds=None,
                 tokenizer=None, model=None, freeze_bert: bool = True):
        self.cfg = cfg
        self.train_ds = train_ds
        self.valid_ds = valid_ds
        self.tokenizer = tokenizer
        self._model = model
        self.freeze_bert = freeze_bert

        self.output_dir = Path(cfg.get("output_dir", "./out"))
        self.log_dir = self.output_dir / "logs"
        self.ckpt_dir = self.output_dir / "ckpt"
        self.is_main = True  # refined by run() after init_distributed

    # ------------------------------------------------------------- setup
    def _build_model(self):
        if self._model is not None:
            return self._model
        import promptttspp_tpu.models  # noqa: F401 (registers aliases)

        return instantiate(self.cfg.model)

    def _build_datasets(self):
        if self.train_ds is None:
            self.train_ds = instantiate(self.cfg.dataset.train)
        if self.valid_ds is None and self.cfg.select("dataset.valid"):
            self.valid_ds = instantiate(self.cfg.dataset.valid)

    def _setup_logging(self):
        # rank-0-only observability, like the reference (`tts.py:61-79`)
        logger = logging.getLogger("promptttspp_tpu.train")
        logger.setLevel(logging.INFO)
        if not self.is_main:
            self.logger = logger
            self.writer = None
            return
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        (self.output_dir / "config.yaml").write_text(self.cfg.to_yaml())
        # the logger is module-global: drop file handlers left by a
        # previous trainer (another output_dir in the same process) and
        # attach this run's
        log_path = str(self.log_dir / "train.log")
        for h in list(logger.handlers):
            if isinstance(h, logging.FileHandler) and \
                    h.baseFilename != log_path:
                logger.removeHandler(h)
                h.close()
        if not any(isinstance(h, logging.FileHandler)
                   for h in logger.handlers):
            fh = logging.FileHandler(log_path)
            fh.setFormatter(logging.Formatter(
                "[%(asctime)s][%(levelname)s][%(module)s | %(lineno)s] "
                "%(message)s"))
            logger.addHandler(fh)
        if not any(type(h) is logging.StreamHandler
                   for h in logger.handlers):
            logger.addHandler(logging.StreamHandler())
        self.logger = logger
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(str(self.log_dir))
        except Exception:  # pragma: no cover - tensorboardX optional
            self.writer = None

    # --------------------------------------------------------------- run
    def _batches(self, ds, shuffle: bool, seed: int, n_data: int):
        train_cfg = self.cfg.get("dataset", Config())
        if train_cfg.get("dynamic_batch", True):
            indices = ds.ordered_indices()
            batches = batch_by_size(
                indices, ds.num_tokens,
                max_tokens=train_cfg.get("max_tokens", 10000),
                required_batch_size_multiple=n_data,
            )
            # keep only world-size-divisible batches (`tts.py:138-142`)
            batches = [b for b in batches if len(b) % n_data == 0] or batches
        else:
            bs = self.cfg.select("train.batch_size", 32)
            idx = list(range(len(ds)))
            batches = [idx[i:i + bs] for i in range(0, len(idx), bs)]
        return ShuffleBatchSampler(batches, shuffle=shuffle, seed=seed)

    def run(self, num_epochs: Optional[int] = None):
        cfg = self.cfg
        seed = cfg.select("train.seed", 42)
        seed_everything(seed)
        # multi-host: jax.distributed.initialize when configured (env or
        # train.distributed.*); no-op in single-process runs (SURVEY §5.8)
        init_distributed(
            coordinator_address=cfg.select(
                "train.distributed.coordinator_address"),
            num_processes=cfg.select("train.distributed.num_processes"),
            process_id=cfg.select("train.distributed.process_id"),
        )
        self.is_main = jax.process_index() == 0
        # persistent XLA compilation cache: dynamic-batch training
        # compiles one program per shape bucket; caching them makes
        # restarts/resumes start hot (the reference has no analog)
        cache_dir = cfg.select("train.compilation_cache_dir")
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        self._setup_logging()
        self._build_datasets()

        # train.mesh.model_spans_processes=true places the model axis
        # ACROSS hosts (each host = pipeline stage(s); stage-boundary
        # ppermute rides the inter-host link) instead of the standard
        # pod layout (data across hosts, model within) — the placement
        # GPipe exists for (parallel/pp.py). TP matmul sharding is
        # disabled on such a mesh (see tp.shard_params).
        model_spans = bool(cfg.select(
            "train.mesh.model_spans_processes", False))
        mesh = make_mesh(model=cfg.select("train.mesh.model", 1),
                         model_spans_processes=model_spans)
        n_data = mesh.shape["data"]
        model = self._build_model()

        # pipeline parallelism over the decoder's residual stack
        # (parallel/pp.py): train.mesh.pipeline_microbatches=M routes
        # every epsilon prediction through the exact GPipe schedule on
        # the mesh's 'model' axis, composed with DP on 'data'. Requires a
        # GaussianDiffusion decoder; batches must split into M
        # microbatches on top of the data-axis multiple.
        pp_micro = int(cfg.select("train.mesh.pipeline_microbatches", 0)
                       or 0)
        if pp_micro:
            model = model.clone(decoder=model.decoder.clone(
                pipeline_mesh=mesh, pipeline_microbatches=pp_micro,
                pipeline_batch_axis="data"))
            self._model = model
        batch_mult = n_data * max(1, pp_micro)

        collator = PromptTTSCollator(tokenizer=self.tokenizer)
        sampler = self._batches(self.train_ds, True, seed, batch_mult)

        # init from the first batch's shapes
        first = collator([self.train_ds[i] for i in next(iter(sampler))])
        first = pad_batch_to_multiple(first, batch_mult)

        rng = jax.random.PRNGKey(seed)
        tx = make_optimizer(
            base_lr=cfg.select("optimizer.lr", 1e-3),
            warmup_steps=cfg.select("train.lr_scheduler.warmup_steps", 4000),
            betas=tuple(cfg.select("optimizer.betas", [0.9, 0.98])),
            weight_decay=cfg.select("optimizer.weight_decay", 0.0),
        )
        state = create_train_state(model, model_batch(first), rng, tx)
        mask = None
        if self.freeze_bert and self.cfg.select(
                "model.prompt_encoder._target_"):
            # freeze boundary derived from the params tree, NOT a config
            # depth: bert_num_layers overrides must keep exactly the last
            # layer's attention trainable (reference
            # `modules/prompt_encoder.py:28-31`). The freeze is
            # structural: opt_state covers the trainable subtree only
            # (no optimizer traffic/memory for the frozen 110M params).
            mask = bert_freeze_mask(state.params)
            state = freeze_opt_state(state, tx, mask)

        if jax.process_count() > 1 or mesh.shape["model"] > 1:
            # one placement path for DP, TP, and multi-host: TP specs on
            # the model axis (pure replication when model == 1); in
            # multi-process runs the PRNG-deterministic host values are
            # lifted to global arrays (model axis must be host-local —
            # the standard pod layout, data across hosts)
            from promptttspp_tpu.parallel.tp import shard_state

            # with the decoder pipelined over the model axis, its params
            # are stage-partitioned inside the schedule — keep them out
            # of the TP matmul sharding (the two placements conflict)
            state = shard_state(
                state, mesh,
                replicate_under=("denoise_fn",) if pp_micro else (),
                tp=not model_spans)

        n_params = sum(x.size for x in jax.tree.leaves(state.params))
        self.logger.info(f"number of trainable params: {n_params / 1e6:.3f} M")

        # resume / warm start (`tts.py:95-114`)
        start_epoch = 1
        if cfg.get("ckpt_path"):
            state, last_epoch = ckpt_lib.restore_checkpoint(
                cfg.ckpt_path, state)
            start_epoch = last_epoch + 1
            self.logger.info(f"resumed from {cfg.ckpt_path} at epoch "
                             f"{last_epoch}")
        elif cfg.get("pretrained"):
            state = ckpt_lib.load_pretrained_params(cfg.pretrained, state)
            self.logger.info(f"warm start from {cfg.pretrained}")

        # train.fp16 is the reference's AMP switch (trainers/tts.py:92,203);
        # on TPU the half precision is bfloat16, so honor it as an alias
        train_step = make_train_step(
            model, tx, bf16=(cfg.select("train.bf16", False)
                             or cfg.select("train.fp16", False)),
            freeze_mask=mask)
        eval_step = make_eval_step(model)
        # rbg keys: key derivation stays threefry, but bulk bit
        # generation (the ~40M dropout uniforms per step) uses the TPU's
        # hardware RNG — measured 28.8 -> 25.2 ms/step on the flagship
        # (threefry mask generation was 12% of the step); also the
        # partitionable-by-construction impl for SPMD meshes. Streams
        # stay deterministic per (seed, backend); dropout/diffusion
        # noise draws differ from the threefry streams, which no
        # numerical contract depends on (parity tests inject noise
        # explicitly or run eval mode).
        step_rng = jax.random.key(seed + 1, impl="rbg")

        num_epochs = num_epochs or cfg.select("train.num_epochs", 1000)
        save_interval = cfg.select("train.save_interval", 20)
        tracker = Tracker(str(self.log_dir / "loss.csv")
                          if self.is_main else None)
        global_step = int(state.step)

        # profiling hooks (SURVEY.md §5.1: the reference has none; we
        # expose jax.profiler traces via train.profile_steps)
        profile_steps = cfg.select("train.profile_steps", 0)
        profile_dir = str(self.log_dir / "profile")

        # failure handling (SURVEY.md §5.3: the reference has none — bare
        # try/except around ckpt loads only): on any exception mid-epoch,
        # persist an emergency checkpoint before re-raising so long runs
        # are resumable from the crash point.
        try:
            state = self._train_loop(
                state, sampler, collator, mesh, batch_mult, train_step,
                eval_step, step_rng, start_epoch, num_epochs, save_interval,
                tracker, global_step, profile_steps, profile_dir)
        except Exception:
            try:
                ckpt_lib.save_checkpoint(
                    self.ckpt_dir / "crash",
                    getattr(self, "_last_state", state), epoch=-1,
                    block=True)
                self.logger.exception(
                    "training failed; emergency checkpoint -> "
                    f"{self.ckpt_dir / 'crash'}")
            except Exception:  # pragma: no cover
                self.logger.exception("emergency checkpoint also failed")
            raise
        # join the final epoch's async checkpoint before returning
        ckpt_lib.wait_until_finished()
        return state

    def _sync_batches(self, sampler, collator, mesh, n_data, ds=None,
                      native: bool = False):
        """Synchronous assembly (train.input_pipeline=sync|sync_native):
        each batch built inline, exactly the reference's no-worker
        DataLoader; native=True routes feature IO through the C++ loader
        (its threads run outside the GIL — the best path on
        core-constrained hosts, see BENCHMARKS.md). Sampler entries may
        be (indices, collate_kwargs) tuples from host_batches."""
        ds = ds if ds is not None else self.train_ds
        if native:
            from promptttspp_tpu.data.prefetch import _collate_native
        for entry in sampler:
            if isinstance(entry, tuple):
                idx_batch, kwargs = entry[0], dict(entry[1])
            else:
                idx_batch, kwargs = entry, {}
            pad_rows_to = kwargs.pop("_pad_rows_to", None)
            zero_weight = kwargs.pop("_zero_weight", False)
            if native:
                metas = [ds.item_meta(i) for i in idx_batch]
                batch = _collate_native(metas, collator, ds.stats, **kwargs)
            else:
                batch = collator([ds[i] for i in idx_batch], **kwargs)
            if pad_rows_to is not None:
                batch = pad_batch_to_rows(batch, pad_rows_to)
            else:
                batch = pad_batch_to_multiple(batch, n_data)
            if zero_weight:  # slab entirely in the global pad region
                batch["batch_weight"] = np.zeros_like(batch["batch_weight"])
            yield batch, shard_batch(model_batch(batch), mesh)

    def _train_loop(self, state, sampler, collator, mesh, n_data,
                    train_step, eval_step, step_rng, start_epoch,
                    num_epochs, save_interval, tracker, global_step,
                    profile_steps, profile_dir):
        cfg = self.cfg
        seed = cfg.select("train.seed", 42)
        # input pipeline (replaces the reference's 8-worker DataLoader +
        # pin_memory, `tts.py:144-150`):
        #   "prefetch"      async thread pool, native C++ loader when
        #                   built (default — right for multi-core hosts)
        #   "sync"          inline Python assembly
        #   "sync_native"   inline + C++ loader (GIL-free IO threads;
        #                   best on core-constrained hosts)
        # train.prefetch=false is honored as "sync" for back-compat.
        # When neither knob is set, the mode is auto-selected for the
        # host: async prefetch needs spare cores to run its workers on
        # (on a 1-2 core host the workers fight the dispatch thread and
        # invert, BENCHMARKS.md epoch table), so core-constrained hosts
        # get the inline path with the GIL-free C++ loader when usable.
        pipeline = cfg.select("train.input_pipeline")
        if pipeline is None:
            if cfg.select("train.prefetch") is not None:
                pipeline = "prefetch" if cfg.select("train.prefetch") \
                    else "sync"
            else:
                pipeline = _auto_input_pipeline(self.train_ds)
                self.logger.info(
                    f"input pipeline auto-selected: {pipeline} "
                    f"({os.cpu_count()} host cores)")
        num_workers = cfg.select("train.num_workers", 8)
        prefetch_depth = cfg.select("train.prefetch_depth", 3)
        n_proc = jax.process_count()
        # rows this host holds per global batch = its span of the data
        # axis (mesh-derived: 1/n_proc in the standard pod layout, the
        # FULL batch when the data axis does not cross processes — e.g.
        # the GPipe model axis placed across hosts with data=1)
        if n_proc > 1:
            from promptttspp_tpu.parallel.distributed import (
                mesh_process_slice)

            sl = mesh_process_slice(mesh, n_data)
            local_pad = max(1, sl.stop - sl.start)
        else:
            local_pad = n_data  # rows this host pads to
        with mesh:
            for epoch in range(start_epoch, num_epochs + 1):
                # order is a pure function of (seed, epoch): resumed and
                # continuous runs see identical data order (VERDICT r2 #8)
                sampler.set_epoch(epoch)
                tracker.reset()
                t0 = time.time()
                n_frames = 0
                if n_proc > 1:
                    # per-host row blocks with global shape buckets
                    epoch_sampler = host_batches(
                        sampler, self.train_ds, collator,
                        prompt_pad_to=cfg.select("train.prompt_pad_to", 64),
                        mesh=mesh, row_multiple=n_data)
                else:
                    epoch_sampler = sampler
                if pipeline == "prefetch":
                    loader = prefetch_batches(
                        self.train_ds, epoch_sampler, collator,
                        pad_multiple=local_pad, mesh=mesh,
                        model_keys=MODEL_BATCH_KEYS,
                        num_workers=num_workers,
                        prefetch_depth=prefetch_depth)
                else:
                    loader = self._sync_batches(
                        epoch_sampler, collator, mesh, local_pad,
                        native=(pipeline == "sync_native"))
                # metrics accumulate ON DEVICE (one async scalar-add
                # dispatch per step); the only host syncs are a cheap
                # scalar readback every host_sync_every steps (bounds
                # Python's async-dispatch run-ahead — without it a whole
                # epoch of steps can queue, pinning their input buffers
                # and inflating device memory) and the per-epoch metric
                # readback — a per-step float() would block the dispatch
                # pipeline on every step's device round-trip
                host_sync_every = cfg.select("train.host_sync_every", 64)
                metric_sums = None
                n_steps = 0
                for batch, sharded in loader:
                    n_frames += int(np.sum(batch["frame_lengths"]))
                    if profile_steps and global_step == profile_steps:
                        jax.profiler.start_trace(profile_dir)
                    state, metrics = train_step(state, sharded, step_rng)
                    self._last_state = state
                    if host_sync_every and n_steps % host_sync_every == \
                            host_sync_every - 1:
                        float(np.asarray(metrics["loss"]).sum())
                    if profile_steps and global_step == profile_steps + 3:
                        # readback, not block_until_ready: the latter is
                        # a no-op on tunneled backends and would stop
                        # the trace while steps are still queued
                        float(np.asarray(metrics["loss"]).sum())
                        jax.profiler.stop_trace()
                        self.logger.info(f"profile trace -> {profile_dir}")
                    global_step += 1
                    n_steps += 1
                    metric_sums = metrics if metric_sums is None \
                        else _metric_add(metric_sums, metrics)
                if metric_sums is not None:
                    tracker.update({k: float(v) / n_steps
                                    for k, v in metric_sums.items()})
                dt = time.time() - t0
                avgs = tracker.averages()
                fps = n_frames / max(dt, 1e-9)
                self.logger.info(
                    f"epoch {epoch}: " +
                    ", ".join(f"{k}={v:.4f}" for k, v in avgs.items()) +
                    f", frames/s={fps:.1f}")
                if self.writer is not None:
                    for k, v in avgs.items():
                        self.writer.add_scalar(f"train/{k}", v, global_step)
                    self.writer.add_scalar("perf/frames_per_sec", fps,
                                           global_step)

                if self.valid_ds is not None:
                    vtracker = Tracker()
                    vsampler = self._batches(self.valid_ds, False, seed,
                                             n_data)
                    if n_proc > 1:
                        vsampler = host_batches(
                            vsampler, self.valid_ds, collator,
                            prompt_pad_to=cfg.select(
                                "train.prompt_pad_to", 64),
                            mesh=mesh)
                    for batch, sharded in self._sync_batches(
                            vsampler, collator, mesh, local_pad,
                            ds=self.valid_ds):
                        out = eval_step(state, sharded, step_rng)
                        vals = {k: float(v) for k, v in out.items()}
                        vtracker.update(vals)
                        # per-batch valid scalars at the global step,
                        # matching the reference (`tts.py:236-238`)
                        if self.writer is not None:
                            for k, v in vals.items():
                                self.writer.add_scalar(f"valid/{k}", v,
                                                       global_step)
                    vavgs = vtracker.averages()
                    self.logger.info(
                        f"epoch {epoch} valid: " +
                        ", ".join(f"{k}={v:.4f}" for k, v in vavgs.items()))

                ckpt_lib.save_checkpoint(self.ckpt_dir / "last", state, epoch)
                if epoch % save_interval == 0:
                    ckpt_lib.save_checkpoint(
                        self.ckpt_dir / f"epoch-{epoch:04d}", state, epoch)
                tracker.write(epoch)

        return state
