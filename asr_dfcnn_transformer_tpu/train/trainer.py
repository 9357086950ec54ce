"""Train loops for the AM, LM and end-to-end models.

Mirrors the capabilities of the reference drivers (``lm_and_am/train.py``,
``train_atten.py``, ``end2end/model.py:74-126``) as pjit-sharded JAX:

- polynomial-decay-with-cycle Adam (acoustic_model.py:82-89),
- loss/metric prints on a cadence (train.py:72-73), metrics to JSONL,
- per-epoch dev sweep with metric-gated best-checkpoint save and
  resume-from-latest (train.py:45-50, 77-96),
- the whole step — device-side fbank (+ optional colored-noise
  augmentation), model forward, CTC/CE loss, grads, Adam update — is ONE
  jitted program per length bucket; batches arrive as raw audio.

Sharding: batch arrays are placed with their leading axis over the mesh's
``data`` axis, params replicated (optionally tensor-parallel for the
transformers via parallel.param_shardings); XLA inserts the gradient psum.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from asr_dfcnn_transformer_tpu.audio import (batched_fbank, add_noise_batch,
                                             SpecAugmentConfig, spec_augment)
from asr_dfcnn_transformer_tpu.audio.fbank import FbankConfig
from asr_dfcnn_transformer_tpu.audio.lfr import batched_lfr
from asr_dfcnn_transformer_tpu.core import constants
from asr_dfcnn_transformer_tpu.data.loader import AMBatch, LMBatch
from asr_dfcnn_transformer_tpu.models.dfcnn import (
    frames_from_samples,
    logit_lengths,
)
from asr_dfcnn_transformer_tpu.models.speech_transformer import e2e_loss
from asr_dfcnn_transformer_tpu.models.transformer_lm import lm_loss_and_acc
from asr_dfcnn_transformer_tpu.ops import (
    batched_edit_distance,
    ctc_greedy_decode,
    ctc_loss,
)
from asr_dfcnn_transformer_tpu.parallel import (
    make_mesh,
    replicated,
    shard_batch,
)
from asr_dfcnn_transformer_tpu.train.checkpoint import CheckpointManager
from asr_dfcnn_transformer_tpu.train.schedule import polynomial_decay_with_cycle


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class MetricWriter:
    """JSONL metric log + stdout — the primary observability layer
    replacing the reference's TensorBoard scalars + prints (SURVEY.md §5).

    :meth:`enable_tensorboard` additionally tees every numeric metric
    into real TensorBoard event files (clean-room writer,
    ``utils/tb_events.py``) so ``tensorboard --logdir <workdir>/tb``
    works exactly as it does for the reference's trainers
    (lm_and_am/train.py:51-53, end2end/model.py:105-112)."""

    def __init__(self, workdir: str, name: str):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, f"{name}_metrics.jsonl")
        self._workdir = workdir
        self._name = name
        self.tb = None

    def enable_tensorboard(self, logdir: Optional[str] = None):
        """Create (or return) the TensorBoard event-file sink."""
        if self.tb is None:
            from asr_dfcnn_transformer_tpu.utils.tb_events import (
                TBEventWriter)
            self.tb = TBEventWriter(
                logdir or os.path.join(self._workdir, "tb", self._name))
        return self.tb

    def write(self, step: int, **metrics):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            split = metrics.get("split")
            prefix = f"{self._name}/{split}/" if split else f"{self._name}/"
            for k, v in rec.items():
                if k in ("step", "time", "split", "epoch"):
                    continue
                if isinstance(v, float) and np.isfinite(v):
                    self.tb.scalar(prefix + k, v, rec["step"])
            self.tb.flush()


def _weighted_mean(values, weights):
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def _dev_mean(evals, key):
    """Weight-aware mean of a per-batch dev metric.

    Each eval dict carries ``weight`` = how many real rows (or target
    tokens) the batch metric averaged over, so trailing partial batches
    whose weight-0 backfilled rows were already masked out don't skew the
    epoch metric (reference protocol averages per utterance,
    train.py:77-89)."""
    if not evals:
        return float("nan")
    w = np.array([float(e.get("weight", 1.0)) for e in evals])
    v = np.array([float(e[key]) for e in evals])
    return float(np.sum(v * w) / max(w.sum(), 1.0))


class _TrainerBase:
    def __init__(self, workdir: str, name: str, lr: float, decay_steps: int,
                 min_lr: float, mesh=None, max_to_keep: int = 5):
        self.workdir = workdir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.schedule = polynomial_decay_with_cycle(lr, decay_steps, min_lr)
        self.tx = optax.adam(self.schedule)
        self.ckpt = CheckpointManager(os.path.join(workdir, f"ckpt_{name}"),
                                      max_to_keep)
        self.metrics = MetricWriter(workdir, name)
        self.state: Optional[TrainState] = None

    # -- observability / failure detection ------------------------------

    def enable_tensorboard(self):
        """Tee metrics into TensorBoard event files under
        ``<workdir>/tb/<name>`` (CLI ``--tensorboard``)."""
        return self.metrics.enable_tensorboard()

    profile_steps: int = 0  # >0: jax.profiler trace of the first N steps

    def maybe_profile(self, global_count: int):
        """Start/stop a jax.profiler trace around the first
        ``profile_steps`` steps (written to <workdir>/profile; view with
        TensorBoard or xprof). The reference has no profiling at all
        (SURVEY.md §5)."""
        if not self.profile_steps:
            return
        if global_count == 1:
            jax.profiler.start_trace(os.path.join(self.workdir, "profile"))
        elif global_count == 1 + self.profile_steps:
            jax.profiler.stop_trace()
            self.profile_steps = 0

    def nan_guard(self, loss: float, limit: int = 5):
        """Failure detection: abort after ``limit`` consecutive non-finite
        losses instead of silently training on NaNs."""
        if np.isfinite(loss):
            self._nan_count = 0
        else:
            self._nan_count = getattr(self, "_nan_count", 0) + 1
            if self._nan_count >= limit:
                raise RuntimeError(
                    f"{self._nan_count} consecutive non-finite losses — "
                    f"aborting (last checkpoint is resumable)")

    def _make_state(self, variables) -> TrainState:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=self.tx.init(params))
        return jax.device_put(state, replicated(self.mesh))

    #: set True (CLI --force-model-mismatch) to downgrade a structural
    #: identity mismatch at restore from an error to a warning
    allow_model_mismatch: bool = False

    def restore_or_init(self, init_fn) -> TrainState:
        from asr_dfcnn_transformer_tpu.train import identity
        template = init_fn()
        has_ckpt = self.ckpt.latest_step() is not None
        if has_ckpt and getattr(self, "model", None) is not None:
            # architecture stamp check BEFORE orbax touches the tree: a
            # same-shaped param tree under a different architecture (e.g.
            # a prenet_heads=4 SpeechTransformer checkpoint restored at
            # heads=1) silently computes a different function, and a
            # different-shaped one would surface as an opaque orbax
            # tree-mismatch ValueError instead of naming the fields
            identity.check_identity(self.ckpt.directory, self.model,
                                    override=self.allow_model_mismatch)
        restored = (self.ckpt.restore_latest(jax.tree.map(np.asarray,
                                                          template))
                    if has_ckpt else None)
        if restored is not None:
            if getattr(self, "model", None) is not None and \
                    identity.read_identity(self.ckpt.directory) is None:
                # ratchet: stamp pre-stamp checkpoints on first touch
                identity.write_identity(self.ckpt.directory, self.model)
            self.state = jax.device_put(restored, replicated(self.mesh))
        else:
            self.state = template
            if getattr(self, "model", None) is not None:
                identity.write_identity(self.ckpt.directory, self.model)
        return self.state

    def save(self, epoch: int):
        self.ckpt.save(epoch, jax.tree.map(np.asarray, self.state))

    def save_best(self, metric: Optional[float] = None):
        self.ckpt.save_best(jax.tree.map(np.asarray, self.state),
                            metric=metric)

    def _best_gate(self, mode: str) -> float:
        """Initial value for the best-checkpoint gate: the persisted
        metric of the best checkpoint on disk, so resumed runs never
        clobber a better historical best (checkpoint.py:save_best)."""
        stored = self.ckpt.best_metric()
        if stored is not None:
            return stored
        return float("inf") if mode == "min" else -float("inf")


# --------------------------------------------------------------------------
# Acoustic model trainer
# --------------------------------------------------------------------------

class AMTrainer(_TrainerBase):
    """DFCNN/SE-DFCNN/BiGRU CTC trainer (train_acoustic_model semantics,
    train.py:21-96)."""

    def __init__(self, model, workdir: str, lr: float = 7e-4,
                 decay_steps: int = 5000, min_lr: float = 1e-6,
                 feature_dim: int = 200, mesh=None,
                 augment_noise: bool = False,
                 augment_spec=None, max_to_keep: int = 5):
        super().__init__(workdir, "am", lr, decay_steps, min_lr, mesh,
                         max_to_keep)
        self.model = model
        self.feature_dim = feature_dim
        self.fbank_cfg = FbankConfig(nfilt=feature_dim)
        self.augment_noise = augment_noise
        # SpecAugment (beyond reference — audio/specaugment.py):
        # None = off, True = default SpecAugmentConfig, or a config.
        if augment_spec is True:
            augment_spec = SpecAugmentConfig()
        self.augment_spec = augment_spec or None
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def init_state(self, rng, example_batch: AMBatch) -> TrainState:
        feats, _ = self._features(jnp.asarray(example_batch.signals),
                                  jnp.asarray(example_batch.signal_lengths),
                                  example_batch.bucket_frames)
        variables = self.model.init(rng, feats, train=False)
        return self._make_state(variables)

    def _features(self, signals, signal_lengths, bucket_frames):
        feats, valid = batched_fbank(signals, signal_lengths,
                                     cfg=self.fbank_cfg,
                                     out_frames=bucket_frames)
        return feats[..., None], valid  # NHWC

    def _build_train_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",),
                           donate_argnums=(0,))
        def step(state: TrainState, signals, signal_lengths, pinyin,
                 pinyin_lengths, weights, rng, bucket_frames):
            if self.augment_noise:
                rng, nkey = jax.random.split(rng)
                signals = add_noise_batch(nkey, signals, signal_lengths)
            if self.augment_spec is not None:
                rng, skey = jax.random.split(rng)

            def loss_fn(params):
                feats, valid = self._features(signals, signal_lengths,
                                              bucket_frames)
                if self.augment_spec is not None:
                    feats = spec_augment(skey, feats, valid,
                                         self.augment_spec)
                logits, updates = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                in_len = logit_lengths(frames_from_samples(signal_lengths),
                                       logits.shape[1])
                losses = ctc_loss(logits, in_len, pinyin, pinyin_lengths,
                                  blank_id=-1)
                return _weighted_mean(losses, weights), updates

            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_params, new_opt = self._apply(grads, state)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=updates.get("batch_stats", state.batch_stats),
                opt_state=new_opt)
            return new_state, {"loss": loss,
                               "lr": self.schedule(state.step)}

        return step

    def _apply(self, grads, state):
        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        return optax.apply_updates(state.params, updates), new_opt

    def _build_eval_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",))
        def step(state: TrainState, signals, signal_lengths, pinyin,
                 pinyin_lengths, weights, bucket_frames):
            feats, _ = self._features(signals, signal_lengths, bucket_frames)
            logits = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                feats, train=False)
            in_len = logit_lengths(frames_from_samples(signal_lengths),
                                   logits.shape[1])
            losses = ctc_loss(logits, in_len, pinyin, pinyin_lengths,
                              blank_id=-1)
            decoded, dec_len = ctc_greedy_decode(
                logits, in_len, blank_id=-1,
                max_output_len=pinyin.shape[1])
            dist = batched_edit_distance(decoded, dec_len,
                                         pinyin, pinyin_lengths)
            ler = dist.astype(jnp.float32) / jnp.maximum(
                pinyin_lengths.astype(jnp.float32), 1.0)
            return {"loss": _weighted_mean(losses, weights),
                    "ler": _weighted_mean(ler, weights),
                    "weight": jnp.sum(weights)}

        return step

    def train_step(self, batch: AMBatch, rng) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    batch.pinyin, batch.pinyin_lengths,
                                    batch.weights))
        self.state, metrics = self._train_step(self.state, *b, rng,
                                               batch.bucket_frames)
        return metrics

    def eval_step(self, batch: AMBatch) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    batch.pinyin, batch.pinyin_lengths,
                                    batch.weights))
        return self._eval_step(self.state, *b, batch.bucket_frames)

    def fit(self, train_batches: Callable[[], Iterator[AMBatch]],
            dev_batches: Callable[[], Iterator[AMBatch]],
            epochs: int, rng=None, log_every: int = 2) -> Dict[str, float]:
        """Epoch loop with dev-WER-gated best save (train.py:54-96)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        best_wer = self._best_gate("min")
        last = {}
        start_epoch = (self.ckpt.latest_step() or -1) + 1
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            for i, batch in enumerate(train_batches()):
                rng, sub = jax.random.split(rng)
                self.maybe_profile(int(self.state.step) + 1)
                m = self.train_step(batch, sub)
                if i % log_every == 0:
                    loss = float(m["loss"])
                    self.nan_guard(loss)
                    self.metrics.write(int(self.state.step), epoch=epoch,
                                       split="train", **m)
            evals = [self.eval_step(b) for b in dev_batches()]
            wer = _dev_mean(evals, "ler")
            loss = _dev_mean(evals, "loss")
            dt = time.time() - t0
            self.metrics.write(int(self.state.step), epoch=epoch,
                               split="dev", loss=loss, wer=wer, seconds=dt)
            print(f"[am] epoch {epoch}: dev_loss {loss:.3f} "
                  f"dev_wer {wer:.3f} ({dt:.1f}s)", flush=True)
            self.save(epoch)
            if evals and wer < best_wer:
                best_wer = wer
                self.save_best(metric=wer)
            last = {"epoch": epoch, "dev_loss": loss, "dev_wer": wer}
        return last


# --------------------------------------------------------------------------
# CTC-attention trainer (LFR fbank -> hanzi CTC)
# --------------------------------------------------------------------------

class AttenTrainer(_TrainerBase):
    """Trainer for the CTCAttention model (train_atten.py semantics:
    same skeleton as the AM trainer but LFR features and hanzi CTC
    targets, train_atten.py:18-93 + data_loader2.py:130-136)."""

    def __init__(self, model, workdir: str, lr: float = 7e-4,
                 decay_steps: int = 5000, min_lr: float = 1e-6,
                 feature_dim: int = 200, lfr_m: int = 4, lfr_n: int = 3,
                 mesh=None, max_to_keep: int = 5):
        super().__init__(workdir, "atten", lr, decay_steps, min_lr, mesh,
                         max_to_keep)
        self.model = model
        self.fbank_cfg = FbankConfig(nfilt=feature_dim)
        self.lfr_m, self.lfr_n = lfr_m, lfr_n
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _features(self, signals, signal_lengths, bucket_frames):
        feats, valid = batched_fbank(signals, signal_lengths,
                                     cfg=self.fbank_cfg,
                                     out_frames=bucket_frames)
        lfr, lfr_valid = batched_lfr(feats, valid, self.lfr_m, self.lfr_n)
        return lfr[..., None], lfr_valid

    def init_state(self, rng, batch: AMBatch) -> TrainState:
        feats, valid = self._features(jnp.asarray(batch.signals),
                                      jnp.asarray(batch.signal_lengths),
                                      batch.bucket_frames)
        variables = self.model.init(rng, feats, valid, train=False)
        return self._make_state(variables)

    def _build_train_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",),
                           donate_argnums=(0,))
        def step(state: TrainState, signals, signal_lengths, hanzi,
                 hanzi_lengths, weights, rng, bucket_frames):
            def loss_fn(params):
                feats, valid = self._features(signals, signal_lengths,
                                              bucket_frames)
                (logits, in_len), updates = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats, valid, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                losses = ctc_loss(logits, in_len, hanzi, hanzi_lengths,
                                  blank_id=-1)
                return _weighted_mean(losses, weights), updates

            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            upd, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
            new_params = optax.apply_updates(state.params, upd)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=updates.get("batch_stats", state.batch_stats),
                opt_state=new_opt)
            return new_state, {"loss": loss,
                               "lr": self.schedule(state.step)}

        return step

    def _build_eval_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",))
        def step(state: TrainState, signals, signal_lengths, hanzi,
                 hanzi_lengths, weights, bucket_frames):
            feats, valid = self._features(signals, signal_lengths,
                                          bucket_frames)
            logits, in_len = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                feats, valid, train=False)
            losses = ctc_loss(logits, in_len, hanzi, hanzi_lengths,
                              blank_id=-1)
            decoded, dec_len = ctc_greedy_decode(
                logits, in_len, blank_id=-1,
                max_output_len=hanzi.shape[1])
            dist = batched_edit_distance(decoded, dec_len, hanzi,
                                         hanzi_lengths)
            ler = dist.astype(jnp.float32) / jnp.maximum(
                hanzi_lengths.astype(jnp.float32), 1.0)
            return {"loss": _weighted_mean(losses, weights),
                    "ler": _weighted_mean(ler, weights),
                    "weight": jnp.sum(weights)}

        return step

    def train_step(self, batch: AMBatch, rng) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    batch.hanzi, batch.hanzi_lengths,
                                    batch.weights))
        self.state, metrics = self._train_step(self.state, *b, rng,
                                               batch.bucket_frames)
        return metrics

    def eval_step(self, batch: AMBatch) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    batch.hanzi, batch.hanzi_lengths,
                                    batch.weights))
        return self._eval_step(self.state, *b, batch.bucket_frames)

    def fit(self, train_batches, dev_batches, epochs: int, rng=None,
            log_every: int = 2) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        best_wer = self._best_gate("min")
        last = {}
        start_epoch = (self.ckpt.latest_step() or -1) + 1
        for epoch in range(start_epoch, epochs):
            for i, batch in enumerate(train_batches()):
                rng, sub = jax.random.split(rng)
                m = self.train_step(batch, sub)
                if i % log_every == 0:
                    self.nan_guard(float(m["loss"]))
                    self.metrics.write(int(self.state.step), epoch=epoch,
                                       split="train", **m)
            evals = [self.eval_step(b) for b in dev_batches()]
            wer = _dev_mean(evals, "ler")
            self.metrics.write(int(self.state.step), epoch=epoch,
                               split="dev", wer=wer)
            print(f"[atten] epoch {epoch}: dev_wer {wer:.3f}", flush=True)
            self.save(epoch)
            if evals and wer < best_wer:
                best_wer = wer
                self.save_best(metric=wer)
            last = {"epoch": epoch, "dev_wer": wer}
        return last


# --------------------------------------------------------------------------
# Language model trainer
# --------------------------------------------------------------------------

class LMTrainer(_TrainerBase):
    """Transformer LM trainer (train_language_model semantics,
    train.py:100-165): CE loss, padding-masked accuracy, acc-gated best
    save."""

    def __init__(self, model, workdir: str, lr: float = 5e-5,
                 decay_steps: int = 5000, min_lr: float = 1e-6, mesh=None,
                 max_to_keep: int = 5):
        super().__init__(workdir, "lm", lr, decay_steps, min_lr, mesh,
                         max_to_keep)
        self.model = model
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def init_state(self, rng, example_batch: LMBatch) -> TrainState:
        variables = self.model.init(rng, jnp.asarray(example_batch.pinyin),
                                    train=False)
        return self._make_state(variables)

    def _build_train_step(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, pinyin, hanzi, weights, rng):
            def loss_fn(params):
                logits = self.model.apply(
                    {"params": params}, pinyin, train=True,
                    rngs={"dropout": rng})
                # zero out back-filled rows by masking their targets to PAD
                tgt = jnp.where(weights[:, None] > 0, hanzi, constants.PAD)
                loss, acc = lm_loss_and_acc(logits, tgt)
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=new_params,
                                      opt_state=new_opt)
            return new_state, {"loss": loss, "acc": acc,
                               "lr": self.schedule(state.step)}

        return step

    def _build_eval_step(self):
        @jax.jit
        def step(state: TrainState, pinyin, hanzi, weights):
            logits = self.model.apply({"params": state.params}, pinyin,
                                      train=False)
            tgt = jnp.where(weights[:, None] > 0, hanzi, constants.PAD)
            loss, acc = lm_loss_and_acc(logits, tgt)
            ntok = jnp.sum((tgt != constants.PAD).astype(jnp.float32))
            return {"loss": loss, "acc": acc, "weight": ntok}

        return step

    def train_step(self, batch: LMBatch, rng) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.pinyin, batch.hanzi, batch.weights))
        self.state, metrics = self._train_step(self.state, *b, rng)
        return metrics

    def eval_step(self, batch: LMBatch) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.pinyin, batch.hanzi, batch.weights))
        return self._eval_step(self.state, *b)

    def fit(self, train_batches, dev_batches, epochs: int, rng=None,
            log_every: int = 10) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        best_acc = self._best_gate("max")
        last = {}
        start_epoch = (self.ckpt.latest_step() or -1) + 1
        for epoch in range(start_epoch, epochs):
            for i, batch in enumerate(train_batches()):
                rng, sub = jax.random.split(rng)
                m = self.train_step(batch, sub)
                if i % log_every == 0:
                    self.nan_guard(float(m["loss"]))
                    self.metrics.write(int(self.state.step), epoch=epoch,
                                       split="train", **m)
            evals = [self.eval_step(b) for b in dev_batches()]
            acc = _dev_mean(evals, "acc")
            loss = _dev_mean(evals, "loss")
            self.metrics.write(int(self.state.step), epoch=epoch,
                               split="dev", loss=loss, acc=acc)
            print(f"[lm] epoch {epoch}: dev_loss {loss:.3f} "
                  f"dev_acc {acc:.3f}", flush=True)
            self.save(epoch)
            if evals and acc > best_acc:
                best_acc = acc
                self.save_best(metric=acc)
            last = {"epoch": epoch, "dev_loss": loss, "dev_acc": acc}
        return last


# --------------------------------------------------------------------------
# Joint AM+LM trainer
# --------------------------------------------------------------------------

class JointTrainer(_TrainerBase):
    """Trainer for models.AMLMJoint — the working version of the
    reference's broken joint driver (am_lm_train.py:27-116): one step
    optimizes CTC(AM) + CE(LM on the AM's greedy pinyin output)."""

    def __init__(self, model, workdir: str, lr: float = 7e-4,
                 decay_steps: int = 5000, min_lr: float = 1e-6,
                 feature_dim: int = 200, mesh=None, max_to_keep: int = 5):
        super().__init__(workdir, "joint", lr, decay_steps, min_lr, mesh,
                         max_to_keep)
        self.model = model
        self.fbank_cfg = FbankConfig(nfilt=feature_dim)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _features(self, signals, signal_lengths, bucket_frames):
        feats, valid = batched_fbank(signals, signal_lengths,
                                     cfg=self.fbank_cfg,
                                     out_frames=bucket_frames)
        return feats[..., None], valid

    def init_state(self, rng, batch: AMBatch) -> TrainState:
        feats, _ = self._features(jnp.asarray(batch.signals),
                                  jnp.asarray(batch.signal_lengths),
                                  batch.bucket_frames)
        variables = self.model.init(
            rng, feats, jnp.asarray(batch.frame_lengths),
            jnp.asarray(batch.pinyin), jnp.asarray(batch.pinyin_lengths),
            jnp.asarray(batch.hanzi), train=False)
        return self._make_state(variables)

    def _build_train_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",),
                           donate_argnums=(0,))
        def step(state: TrainState, signals, signal_lengths, pinyin,
                 pinyin_lengths, hanzi, weights, rng, bucket_frames):
            def loss_fn(params):
                feats, _ = self._features(signals, signal_lengths,
                                          bucket_frames)
                out, updates = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    feats, frames_from_samples(signal_lengths), pinyin,
                    pinyin_lengths,
                    hanzi, train=True, weights=weights,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng})
                return out["loss"], (out, updates)

            (loss, (out, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            upd, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
            new_params = optax.apply_updates(state.params, upd)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=updates.get("batch_stats", state.batch_stats),
                opt_state=new_opt)
            return new_state, {"loss": loss, "am_loss": out["am_loss"],
                               "lm_loss": out["lm_loss"],
                               "lm_acc": out["lm_acc"],
                               "lr": self.schedule(state.step)}

        return step

    def _build_eval_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",))
        def step(state: TrainState, signals, signal_lengths, pinyin,
                 pinyin_lengths, hanzi, weights, bucket_frames):
            feats, _ = self._features(signals, signal_lengths, bucket_frames)
            out = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                feats, frames_from_samples(signal_lengths), pinyin,
                pinyin_lengths, hanzi, train=False, weights=weights)
            return {"loss": out["loss"], "am_loss": out["am_loss"],
                    "lm_loss": out["lm_loss"], "lm_acc": out["lm_acc"],
                    "weight": jnp.sum(weights)}

        return step

    def train_step(self, batch: AMBatch, rng) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    batch.pinyin, batch.pinyin_lengths,
                                    batch.hanzi, batch.weights))
        self.state, metrics = self._train_step(self.state, *b, rng,
                                               batch.bucket_frames)
        return metrics

    def eval_step(self, batch: AMBatch) -> Dict[str, float]:
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    batch.pinyin, batch.pinyin_lengths,
                                    batch.hanzi, batch.weights))
        return self._eval_step(self.state, *b, batch.bucket_frames)

    def fit(self, train_batches, epochs: int, rng=None,
            dev_batches=None, log_every: int = 2) -> Dict[str, float]:
        """Epoch loop; with ``dev_batches`` it adds the dev sweep +
        acc-gated best save the reference's broken joint driver evidently
        intended (am_lm_train.py:97-110 references undefined tensors)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        best_acc = self._best_gate("max")
        last = {}
        start_epoch = (self.ckpt.latest_step() or -1) + 1
        for epoch in range(start_epoch, epochs):
            for i, batch in enumerate(train_batches()):
                rng, sub = jax.random.split(rng)
                m = self.train_step(batch, sub)
                if i % log_every == 0:
                    self.nan_guard(float(m["loss"]))
                    self.metrics.write(int(self.state.step), epoch=epoch,
                                       split="train", **m)
                last = {"epoch": epoch, "loss": float(m["loss"]),
                        "lm_acc": float(m["lm_acc"])}
            if dev_batches is not None:
                evals = [self.eval_step(b) for b in dev_batches()]
                acc = _dev_mean(evals, "lm_acc")
                loss = _dev_mean(evals, "loss")
                self.metrics.write(int(self.state.step), epoch=epoch,
                                   split="dev", loss=loss, lm_acc=acc)
                print(f"[joint] epoch {epoch}: dev_loss {loss:.3f} "
                      f"dev_lm_acc {acc:.3f}", flush=True)
                last.update(dev_loss=loss, dev_lm_acc=acc)
                if evals and acc > best_acc:
                    best_acc = acc
                    self.save_best(metric=acc)
            self.save(epoch)
        return last


# --------------------------------------------------------------------------
# End-to-end speech transformer trainer
# --------------------------------------------------------------------------

class E2ETrainer(_TrainerBase):
    """Speech-Transformer trainer (transformerTrain semantics,
    end2end/model.py:63-126): LFR front-end on device, teacher-forced
    decoder with [SOS]+y inputs / y+[EOS] targets padded IGNORE
    (end2end/data_loader.py:142-160, 263-302)."""

    def __init__(self, model, workdir: str, lr: float = 3e-4,
                 decay_steps: int = 5000, min_lr: float = 1e-6,
                 feature_dim: int = 80, lfr_m: int = 4, lfr_n: int = 3,
                 mesh=None, augment_spec=None, max_to_keep: int = 5):
        super().__init__(workdir, "e2e", lr, decay_steps, min_lr, mesh,
                         max_to_keep)
        self.model = model
        self.fbank_cfg = FbankConfig(nfilt=feature_dim)
        self.lfr_m, self.lfr_n = lfr_m, lfr_n
        # SpecAugment (beyond reference): masks the fbank features
        # BEFORE LFR stacking, train step only. None = off.
        if augment_spec is True:
            augment_spec = SpecAugmentConfig()
        self.augment_spec = augment_spec or None
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _features(self, signals, signal_lengths, bucket_frames,
                  spec_key=None):
        feats, valid = batched_fbank(signals, signal_lengths,
                                     cfg=self.fbank_cfg,
                                     out_frames=bucket_frames)
        if spec_key is not None and self.augment_spec is not None:
            feats = spec_augment(spec_key, feats, valid, self.augment_spec)
        lfr, lfr_valid = batched_lfr(feats, valid, self.lfr_m, self.lfr_n)
        return lfr[..., None], lfr_valid

    def make_decoder_io(self, hanzi: np.ndarray, hanzi_lengths: np.ndarray):
        """[SOS]+y inputs; y+[EOS] targets with IGNORE padding
        (end2end/data_loader.py:142-160)."""
        b, l = hanzi.shape
        dec_in = np.full((b, l + 1), constants.PAD, np.int32)
        dec_in[:, 0] = constants.SOS
        dec_in[:, 1:] = hanzi
        targets = np.full((b, l + 1), constants.IGNORE_ID, np.int32)
        for i in range(b):
            n = int(hanzi_lengths[i])
            targets[i, :n] = hanzi[i, :n]
            targets[i, n] = constants.EOS
            dec_in[i, n + 1:] = constants.PAD
        return dec_in, targets

    def init_state(self, rng, batch: AMBatch) -> TrainState:
        feats, valid = self._features(jnp.asarray(batch.signals),
                                      jnp.asarray(batch.signal_lengths),
                                      batch.bucket_frames)
        dec_in, _ = self.make_decoder_io(batch.hanzi, batch.hanzi_lengths)
        variables = self.model.init(rng, feats, valid, jnp.asarray(dec_in),
                                    train=False)
        return self._make_state(variables)

    def _build_train_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",),
                           donate_argnums=(0,))
        def step(state: TrainState, signals, signal_lengths, dec_in,
                 targets, rng, bucket_frames):
            skey = None
            if self.augment_spec is not None:
                rng, skey = jax.random.split(rng)

            def loss_fn(params):
                feats, valid = self._features(signals, signal_lengths,
                                              bucket_frames, spec_key=skey)
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out = self.model.apply(
                    variables, feats, valid, dec_in, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                logits, updates = out
                loss, acc = e2e_loss(logits, targets)
                return loss, (acc, updates)

            (loss, (acc, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates_opt, new_opt = self.tx.update(grads, state.opt_state,
                                                  state.params)
            new_params = optax.apply_updates(state.params, updates_opt)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=updates.get("batch_stats", state.batch_stats),
                opt_state=new_opt)
            return new_state, {"loss": loss, "acc": acc,
                               "lr": self.schedule(state.step)}

        return step

    def train_step(self, batch: AMBatch, rng) -> Dict[str, float]:
        dec_in, targets = self.make_decoder_io(batch.hanzi,
                                               batch.hanzi_lengths)
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    dec_in, targets))
        self.state, metrics = self._train_step(self.state, *b, rng,
                                               batch.bucket_frames)
        return metrics

    def _build_eval_step(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",))
        def step(state: TrainState, signals, signal_lengths, dec_in,
                 targets, bucket_frames):
            feats, valid = self._features(signals, signal_lengths,
                                          bucket_frames)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            logits = self.model.apply(variables, feats, valid, dec_in,
                                      train=False)
            loss, acc = e2e_loss(logits, targets)
            return {"loss": loss, "acc": acc,
                    "weight": jnp.sum(targets != constants.IGNORE_ID)}

        return step

    def eval_step(self, batch: AMBatch) -> Dict[str, float]:
        """Teacher-forced dev metrics; weight-0 backfill rows are masked
        to IGNORE so they drop out of the token-normalized loss/acc."""
        dec_in, targets = self.make_decoder_io(batch.hanzi,
                                               batch.hanzi_lengths)
        targets[np.asarray(batch.weights) == 0] = constants.IGNORE_ID
        b = shard_batch(self.mesh, (batch.signals, batch.signal_lengths,
                                    dec_in, targets))
        return self._eval_step(self.state, *b, batch.bucket_frames)

    def _epoch_marker_path(self) -> str:
        return os.path.join(self.workdir, "e2e_epochs_completed.json")

    def _write_attention_images(self, batch: AMBatch, step: int):
        """Attention-heatmap image summaries for one dev batch.

        The reference writes the first head's attention scores as a
        TensorBoard image inside every attention op
        (end2end/transformer.py:105-106, flushed every 200 steps at
        model.py:112); here each captured attention module's map for the
        first utterance / first head is dumped once per dev sweep when
        ``--tensorboard`` is on. Runs un-jitted (one capture-enabled
        ``apply`` per epoch)."""
        from asr_dfcnn_transformer_tpu.utils.introspect import (
            attention_maps)
        dec_in, _ = self.make_decoder_io(batch.hanzi, batch.hanzi_lengths)
        feats, valid = self._features(jnp.asarray(batch.signals),
                                      jnp.asarray(batch.signal_lengths),
                                      batch.bucket_frames)
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        maps = attention_maps(self.model, variables, feats, valid,
                              jnp.asarray(dec_in), train=False)
        for path, probs in maps.items():
            img = np.asarray(probs[0, 0], dtype=np.float32)
            self.metrics.tb.image(f"e2e/attention/{path}", img, step)

    def fit(self, train_batches, epochs: int, rng=None,
            log_every: int = 10, ckpt_every: int = 1000,
            dev_batches=None) -> Dict[str, float]:
        """Step-based loop with periodic checkpoints
        (end2end/model.py:101-126). Unlike the epoch-saving trainers,
        checkpoints here are step-numbered, so resume reads an epoch
        marker written at each epoch boundary (reference resumes from
        latest ckpt, train.py:45-50).

        ``dev_batches`` adds a per-epoch teacher-forced dev sweep with an
        acc-gated best save — the reference's ``eval()`` is an empty stub
        (end2end/model.py:130-132); this completes it in line with the
        other trainers."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        last = {}
        best_acc = self._best_gate("max")
        start_epoch = 0
        if self.ckpt.latest_step() is not None and \
                os.path.exists(self._epoch_marker_path()):
            with open(self._epoch_marker_path()) as f:
                start_epoch = int(json.load(f)["epochs_completed"])
        for epoch in range(start_epoch, epochs):
            for i, batch in enumerate(train_batches()):
                rng, sub = jax.random.split(rng)
                m = self.train_step(batch, sub)
                step = int(self.state.step)
                if i % log_every == 0:
                    self.nan_guard(float(m["loss"]))
                    self.metrics.write(step, epoch=epoch, split="train", **m)
                if step % ckpt_every == 0:
                    self.save(step)
                last = {"epoch": epoch, "loss": float(m["loss"]),
                        "acc": float(m["acc"])}
            if dev_batches is not None:
                evals = [self.eval_step(b) for b in dev_batches()]
                acc = _dev_mean(evals, "acc")
                loss = _dev_mean(evals, "loss")
                self.metrics.write(int(self.state.step), epoch=epoch,
                                   split="dev", loss=loss, acc=acc)
                print(f"[e2e] epoch {epoch}: dev_loss {loss:.3f} "
                      f"dev_acc {acc:.3f}", flush=True)
                last.update(dev_loss=loss, dev_acc=acc)
                if self.metrics.tb is not None:
                    first_dev = next(iter(dev_batches()), None)
                    if first_dev is not None:
                        self._write_attention_images(
                            first_dev, int(self.state.step))
                if evals and acc > best_acc:
                    best_acc = acc
                    self.save_best(metric=acc)
            self.save(int(self.state.step))
            with open(self._epoch_marker_path(), "w") as f:
                json.dump({"epochs_completed": epoch + 1}, f)
        return last
