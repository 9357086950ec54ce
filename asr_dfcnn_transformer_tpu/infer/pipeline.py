"""Batched AM -> LM inference pipeline and the accuracy-eval protocol.

The TPU-native replacement for the reference's evaluation driver
(``lm_and_am/test.py``). The reference runs TWO tf sessions, per-utterance:
CPU fbank -> AM session -> sparse-to-dense in the LM session (test.py:51) ->
LM session (test.py:25-101). Here the whole chain — device-side fbank,
DFCNN forward, CTC decode, Transformer LM argmax — is ONE jitted program
over a batch, so throughput is bounded by the MXU and not Python
round-trips; this is the BASELINE.json north-star path.

Accuracy protocol parity (test.py:74-95):
- per-utterance edit distance CLIPPED at the reference length ("否则肯定
  是增加了一堆乱七八糟的奇奇怪怪的字" — distances larger than the
  sentence length count as the full length),
- accuracy = 1 - sum(clipped distance) / sum(ref length), reported for
  pinyin and hanzi,
- a ``pred_log`` dump with per-utterance original/predicted pinyin & hanzi
  (test.py:68-72, 96-97).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr_dfcnn_transformer_tpu.audio import batched_fbank
from asr_dfcnn_transformer_tpu.audio.fbank import FbankConfig
from asr_dfcnn_transformer_tpu.core import constants
from asr_dfcnn_transformer_tpu.core.vocab import Vocab
from asr_dfcnn_transformer_tpu.models import logit_lengths
from asr_dfcnn_transformer_tpu.models.dfcnn import frames_from_samples
from asr_dfcnn_transformer_tpu.ops import ctc_beam_search_decode, ctc_greedy_decode
from asr_dfcnn_transformer_tpu.ops.edit_distance import edit_distance


def pipeline_program(am_model, am_variables, lm_model, lm_variables,
                     signals, signal_lengths, bucket_frames, *,
                     fbank_cfg: FbankConfig, decode: str, beam_width: int,
                     lm_max_len: int):
    """The traced body of the fused AM->LM inference program: device-side
    fbank -> DFCNN forward -> CTC decode -> LM argmax, one XLA program
    (the reference's test.py:25-101 chain minus its per-utterance
    sessions). Shared by ``Pipeline._build_infer`` and the AOT serving
    exporter (``infer/export_serving.py``) so the exported artifact is
    the exact live program."""
    feats, _ = batched_fbank(signals, signal_lengths, cfg=fbank_cfg,
                             out_frames=bucket_frames)
    logits = am_model.apply(am_variables, feats[..., None], train=False)
    in_len = logit_lengths(frames_from_samples(signal_lengths),
                           logits.shape[1])
    if decode == "beam":
        pny_ids, pny_len, _ = ctc_beam_search_decode(
            logits, in_len, beam_width=beam_width, topk=beam_width,
            blank_id=-1, max_decode_len=lm_max_len)
    else:
        pny_ids, pny_len = ctc_greedy_decode(
            logits, in_len, blank_id=-1, max_output_len=lm_max_len)
    han_ids = None
    if lm_model is not None:
        # the reference feeds the decoded dense pinyin ids straight
        # into the LM (test.py:57-60); padding id 0 = PAD
        lm_logits = lm_model.apply(lm_variables, pny_ids, train=False)
        han_ids = jnp.argmax(lm_logits, axis=-1).astype(jnp.int32)
        han_ids = jnp.where(
            jnp.arange(han_ids.shape[1])[None, :] < pny_len[:, None],
            han_ids, 0)
    return pny_ids, pny_len, han_ids


def infer_bucket_frames(frames: int) -> int:
    """The single-utterance inference bucket: frame count ceil'd to 128,
    capped at FEATURE_MAX_LENGTH. This is THE offline rule the streamed
    finalize (infer/streaming.py) clamps its logit count to — its
    token-exactness guarantee requires both sites to share it."""
    return min(constants.FEATURE_MAX_LENGTH,
               ((max(frames, 1) + 127) // 128) * 128)


@dataclasses.dataclass
class EvalResult:
    pinyin_accuracy: float
    hanzi_accuracy: float
    num_utterances: int
    pred_log_path: Optional[str] = None


class Pipeline:
    """AM (fbank->pinyin CTC) + LM (pinyin->hanzi) fused inference.

    Args:
      am_model / am_variables: a DFCNN-family Flax module + its variables.
      lm_model / lm_variables: TransformerLM + variables (optional; without
        an LM only pinyin comes back).
      decode: 'greedy' (tf.nn.ctc_greedy_decoder parity) or 'beam'.
    """

    def __init__(self, am_model, am_variables, lm_model=None,
                 lm_variables=None, *, acoustic_vocab: Vocab,
                 language_vocab: Optional[Vocab] = None,
                 feature_dim: int = 200, decode: str = "greedy",
                 beam_width: int = 8,
                 lm_max_len: Optional[int] = None,
                 mesh=None):
        self.am_model = am_model
        self.am_variables = am_variables
        self.lm_model = lm_model
        self.lm_variables = lm_variables
        self.av = acoustic_vocab
        self.lv = language_vocab
        self.fbank_cfg = FbankConfig(nfilt=feature_dim)
        self.decode = decode
        self.beam_width = beam_width
        if lm_max_len is None:
            # decode up to the LM's position cap (reference feeds the full
            # decoded pinyin sequence into the LM, test.py:57-60 — up to
            # its 100 learned positions), not just the 64-label training
            # cap; without an LM the training cap stands.
            lm_max_len = (getattr(lm_model, "position_max_length",
                                  constants.MAX_LABEL_LENGTH)
                          if lm_model is not None
                          else constants.MAX_LABEL_LENGTH)
        self.lm_max_len = lm_max_len
        # Optional (data, model) mesh: batches shard over the data axis so
        # one Pipeline drives every chip (the reference is single-device,
        # SURVEY.md §2.3; batch size must divide the data axis).
        self.mesh = mesh
        if mesh is not None:
            from asr_dfcnn_transformer_tpu.parallel import replicated
            self.am_variables = jax.device_put(self.am_variables,
                                               replicated(mesh))
            if self.lm_variables is not None:
                self.lm_variables = jax.device_put(self.lm_variables,
                                                   replicated(mesh))
        self._infer = self._build_infer()

    @classmethod
    def from_checkpoints(cls, workdir: str, am_model, lm_model=None, *,
                         acoustic_vocab: Vocab,
                         language_vocab: Optional[Vocab] = None,
                         use_best: bool = True, **kw) -> "Pipeline":
        """Build a pipeline from a training workdir's orbax checkpoints
        (the best-metric copy when available, else latest).

        Params-only: restores the raw checkpoint tree and keeps just
        ``params``/``batch_stats`` — no trainer construction, no optimizer
        state allocated (serving path)."""
        allow_mismatch = kw.pop("allow_model_mismatch", False)
        am_raw = cls._restore_raw(workdir, "am", use_best, model=am_model,
                                  allow_mismatch=allow_mismatch)
        if am_raw is None:
            raise FileNotFoundError(f"no AM checkpoint under {workdir}")
        am_vars = jax.tree.map(jnp.asarray,
                               {"params": am_raw["params"],
                                "batch_stats": am_raw["batch_stats"]})
        lm_vars = None
        if lm_model is not None:
            lm_raw = cls._restore_raw(workdir, "lm", use_best,
                                      model=lm_model,
                                      allow_mismatch=allow_mismatch)
            if lm_raw is None:
                raise FileNotFoundError(f"no LM checkpoint under {workdir}")
            lm_vars = jax.tree.map(jnp.asarray, {"params": lm_raw["params"]})
        return cls(am_model, am_vars, lm_model, lm_vars,
                   acoustic_vocab=acoustic_vocab,
                   language_vocab=language_vocab, **kw)

    @staticmethod
    def _restore_raw(workdir: str, name: str, use_best: bool, model=None,
                     allow_mismatch: bool = False):
        """Raw checkpoint restore; when ``model`` is given, its
        architecture is verified against the checkpoint's identity stamp
        first (train/identity.py — silent wrong-function guard)."""
        from asr_dfcnn_transformer_tpu.train.checkpoint import (
            CheckpointManager)
        ckpt_dir = os.path.join(workdir, f"ckpt_{name}")
        if model is not None:
            from asr_dfcnn_transformer_tpu.train import identity
            identity.check_identity(ckpt_dir, model,
                                    override=allow_mismatch)
        ckpt = CheckpointManager(ckpt_dir)
        raw = ckpt.restore_raw_best() if use_best else None
        return raw if raw is not None else ckpt.restore_raw_latest()

    def _build_infer(self):
        @functools.partial(jax.jit, static_argnames=("bucket_frames",))
        def run(signals, signal_lengths, bucket_frames):
            return pipeline_program(
                self.am_model, self.am_variables,
                self.lm_model, self.lm_variables,
                signals, signal_lengths, bucket_frames,
                fbank_cfg=self.fbank_cfg, decode=self.decode,
                beam_width=self.beam_width, lm_max_len=self.lm_max_len)

        return run

    # ------------------------------------------------------------------

    def recognize_batch(self, signals: np.ndarray, lengths: np.ndarray,
                        bucket_frames: int = constants.FEATURE_MAX_LENGTH):
        """signals [B, S] float32, lengths [B] -> (pinyin id array [B, L],
        pinyin lengths [B], hanzi id array or None)."""
        if self.mesh is not None:
            from asr_dfcnn_transformer_tpu.parallel import shard_batch
            # pad the batch to the data-axis size so any batch (incl. the
            # recognize_signal batch of 1) shards; pad rows are zero
            # signals whose outputs are sliced away below
            d = self.mesh.shape["data"]
            sig = np.asarray(signals, np.float32)
            b = sig.shape[0]
            b_pad = -(-b // d) * d
            if b_pad != b:
                signals = np.concatenate(
                    [sig, np.zeros((b_pad - b,) + sig.shape[1:],
                                   np.float32)])
                lengths = np.concatenate(
                    [np.asarray(lengths),
                     np.zeros((b_pad - b,), np.asarray(lengths).dtype)])
            signals, lengths = shard_batch(self.mesh, (signals, lengths))
            out = self._infer(signals, lengths, bucket_frames)
            if b_pad != b:
                out = tuple(None if o is None else o[:b] for o in out)
            return out
        return self._infer(jnp.asarray(signals), jnp.asarray(lengths),
                           bucket_frames)

    def recognize_signal(self, signal: np.ndarray,
                         bucket_frames: Optional[int] = None
                         ) -> Tuple[List[str], str]:
        """Single utterance -> (pinyin syllables, hanzi string) — the
        read_wav.py dfcnn_speech capability (read_wav.py:46-57)."""
        from asr_dfcnn_transformer_tpu.data.loader import (
            frames_for_samples, samples_for_frames)
        n = len(signal)
        if bucket_frames is None:
            bucket_frames = infer_bucket_frames(frames_for_samples(n))
        s_max = samples_for_frames(bucket_frames)
        buf = np.zeros((1, s_max), np.float32)
        buf[0, : min(n, s_max)] = signal[: s_max]
        pny_ids, pny_len, han_ids = self.recognize_batch(
            buf, np.array([min(n, s_max)]), bucket_frames)
        k = int(pny_len[0])
        pinyin = self.av.decode(np.asarray(pny_ids[0][:k]))
        hanzi = ""
        if han_ids is not None and self.lv is not None:
            hanzi = "".join(self.lv.decode(np.asarray(han_ids[0][:k])))
        return pinyin, hanzi

    def recognize_file(self, path: str) -> Tuple[List[str], str]:
        from asr_dfcnn_transformer_tpu.audio.wav import read_wav
        sig, _ = read_wav(path)
        return self.recognize_signal(sig)

    # ------------------------------------------------------------------

    def evaluate_lm(self, batches: Iterable, *,
                    pred_log_path: Optional[str] = None) -> EvalResult:
        """LM-only protocol (test_lm.py:24-94): ground-truth pinyin in,
        hanzi accuracy out, same clipped edit distance."""
        assert self.lm_model is not None and self.lv is not None
        if not hasattr(self, "_lm_infer"):
            self._lm_infer = jax.jit(lambda ids: jnp.argmax(
                self.lm_model.apply(self.lm_variables, ids, train=False),
                axis=-1).astype(jnp.int32))
        han_err = han_tot = 0
        n_utts = 0
        log_lines: List[str] = []
        for batch in batches:
            preds = np.asarray(self._lm_infer(jnp.asarray(batch.pinyin)))
            for j in range(preds.shape[0]):
                if batch.weights[j] == 0:
                    continue
                n_utts += 1
                n = int(batch.lengths[j])
                gt = list(batch.hanzi[j][:n])
                pd = list(preds[j][:n])
                d = edit_distance(gt, pd)
                han_err += min(d, len(gt))
                han_tot += len(gt)
                if pred_log_path is not None:
                    log_lines.append("原文汉字结果: "
                                     + "".join(self.lv.decode(gt)))
                    log_lines.append("预测汉字结果: "
                                     + "".join(self.lv.decode(pd)))
        acc = 1.0 - han_err / max(han_tot, 1)
        if pred_log_path is not None:
            log_lines.append(
                f"*[Test Result] 汉字 word accuracy ratio: {acc * 100}%")
            os.makedirs(os.path.dirname(os.path.abspath(pred_log_path)),
                        exist_ok=True)
            with open(pred_log_path, "w", encoding="utf-8") as f:
                f.write("\n".join(log_lines) + "\n")
        return EvalResult(float("nan"), acc, n_utts, pred_log_path)

    def evaluate(self, batches: Iterable, *, pred_log_path: Optional[str] = None,
                 manifest=None) -> EvalResult:
        """The test.py accuracy protocol over AMBatch iterables.

        ``batches``: iterable of data.loader.AMBatch (carrying gt pinyin &
        hanzi ids). Accuracy = 1 - clipped-edit-distance / ref-length
        (test.py:74-95).
        """
        from asr_dfcnn_transformer_tpu.ops.edit_distance import (
            batched_edit_distance)
        py_err = py_tot = han_err = han_tot = 0
        n_utts = 0
        log_lines: List[str] = []
        for batch in batches:
            pny_ids, pny_len, han_ids = self.recognize_batch(
                batch.signals, batch.signal_lengths, batch.bucket_frames)
            pny_ids = np.asarray(pny_ids)
            pny_len = np.asarray(pny_len)
            han_np = np.asarray(han_ids) if han_ids is not None else None
            # distances on device: one wavefront DP per batch instead of a
            # per-utterance Python loop (only the pred_log text needs host
            # work)
            d_py = np.asarray(batched_edit_distance(
                jnp.asarray(pny_ids), jnp.asarray(pny_len),
                jnp.asarray(batch.pinyin), jnp.asarray(batch.pinyin_lengths)))
            if han_np is not None:
                d_han = np.asarray(batched_edit_distance(
                    jnp.asarray(han_np), jnp.asarray(pny_len),
                    jnp.asarray(batch.hanzi),
                    jnp.asarray(batch.hanzi_lengths)))
            for j in range(pny_ids.shape[0]):
                if batch.weights[j] == 0:
                    continue
                n_utts += 1
                gt_py_n = int(batch.pinyin_lengths[j])
                py_err += min(int(d_py[j]), gt_py_n)
                py_tot += gt_py_n
                if han_np is not None:
                    gt_h_n = int(batch.hanzi_lengths[j])
                    han_err += min(int(d_han[j]), gt_h_n)
                    han_tot += gt_h_n
                if pred_log_path is not None:
                    gt_py = list(batch.pinyin[j][: batch.pinyin_lengths[j]])
                    pred_py = list(pny_ids[j][: pny_len[j]])
                    if han_np is not None:
                        gt_h = list(batch.hanzi[j][: batch.hanzi_lengths[j]])
                        pred_h = list(han_np[j][: pny_len[j]])
                    gt_py_s = " ".join(self.av.decode(gt_py))
                    pred_py_s = " ".join(self.av.decode(pred_py))
                    log_lines.append(f"原文拼音结果: {gt_py_s}")
                    log_lines.append(f"预测拼音结果: {pred_py_s}")
                    if han_np is not None and self.lv is not None:
                        log_lines.append(
                            "原文汉字结果: "
                            + "".join(self.lv.decode(gt_h)))
                        log_lines.append(
                            "预测汉字结果: "
                            + "".join(self.lv.decode(pred_h)))
        py_acc = 1.0 - py_err / max(py_tot, 1)
        han_acc = 1.0 - han_err / max(han_tot, 1) if han_tot else float("nan")
        if pred_log_path is not None:
            log_lines.append(
                f"*[Test Result] 拼音 word accuracy ratio: {py_acc * 100}%")
            if han_tot:
                log_lines.append(
                    f"*[Test Result] 汉字 word accuracy ratio: {han_acc * 100}%")
            os.makedirs(os.path.dirname(os.path.abspath(pred_log_path)),
                        exist_ok=True)
            with open(pred_log_path, "w", encoding="utf-8") as f:
                f.write("\n".join(log_lines) + "\n")
        return EvalResult(py_acc, han_acc, n_utts, pred_log_path)
