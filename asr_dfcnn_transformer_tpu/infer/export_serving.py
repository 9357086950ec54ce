"""AOT serving export: the fused AM->LM inference program serialized to
one self-contained artifact.

The live ``Pipeline`` needs the Flax model code, the checkpoint layout
and the vocab assets at import time. A serving fleet wants none of that:
it wants a versioned artifact that executes the exact program the model
was validated with. This module serializes the pipeline's jitted program
(``pipeline.pipeline_program`` — fbank -> AM -> CTC decode -> LM argmax,
one XLA computation) via ``jax.export`` (StableHLO with compatibility
guarantees) plus the weights and vocab tables, into a single ``.zip``:

    meta.json            format version, decode config, program table,
                         param key order, vocab word lists
    params.npz           every AM/LM array (stored once, shared by all
                         exported entry points)
    prog_b{B}_f{F}.bin   serialized jax.export.Exported per
                         (batch, bucket_frames) combination

``ServingPipeline.load`` then serves ``recognize_batch`` /
``recognize_signal`` with NO model code, checkpoints or asset files —
only jax + numpy and this loader. Larger batches are served by chunking
over the largest exported batch size; frame counts pick the smallest
exported bucket that fits (the ``infer_bucket_frames`` rule clamps to
the largest exported bucket, truncating the tail like the live
``recognize_signal`` does).

Backend note: auto-selected compute paths (Pallas fbank kernel, Pallas
beam backend) resolve on the EXPORTING machine — export on TPU to embed
the TPU kernels. ``platforms=("tpu", "cpu")`` cross-lowers one artifact
for both (kernel-free paths only).

Capability beyond the reference (it redefines its graphs from source at
every launch, test.py:25-101); the serving counterpart of the weight
codecs in ``infer/hdf5_import.py`` / ``infer/tf_ckpt.py``.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asr_dfcnn_transformer_tpu.core.vocab import Vocab
from asr_dfcnn_transformer_tpu.infer.pipeline import (
    Pipeline,
    pipeline_program,
)

_FORMAT_VERSION = 1


def _samples_for_bucket(bucket_frames: int) -> int:
    return (bucket_frames - 1) * 160 + 400


def export_pipeline(pipeline: Pipeline, path: str, *,
                    batch_sizes: Sequence[int] = (1, 8),
                    buckets: Sequence[int] = (128, 512, 1600),
                    platforms: Optional[Sequence[str]] = None) -> dict:
    """Serialize ``pipeline``'s inference program(s) + weights + vocabs
    to ``path`` (a zip). One entry point per (batch, bucket) pair; params
    are traced as ARGUMENTS (not baked constants) so the weights are
    stored once in ``params.npz`` no matter how many entry points export.
    Returns the meta dict that was written."""
    from jax import export as jax_export

    am_flat, am_treedef = jax.tree.flatten(pipeline.am_variables)
    lm_flat, lm_treedef = jax.tree.flatten(
        pipeline.lm_variables if pipeline.lm_model is not None else {})

    programs = []
    blobs = {}
    for bucket in sorted(set(int(b) for b in buckets)):
        if bucket % 8:
            raise ValueError(f"bucket_frames must be multiples of 8, "
                             f"got {bucket}")
        samples = _samples_for_bucket(bucket)

        def fn(am_leaves, lm_leaves, signals, lengths, bucket=bucket):
            am_vars = jax.tree.unflatten(am_treedef, am_leaves)
            lm_vars = (jax.tree.unflatten(lm_treedef, lm_leaves)
                       if pipeline.lm_model is not None else None)
            pny, pny_len, han = pipeline_program(
                pipeline.am_model, am_vars, pipeline.lm_model, lm_vars,
                signals, lengths, bucket,
                fbank_cfg=pipeline.fbank_cfg, decode=pipeline.decode,
                beam_width=pipeline.beam_width,
                lm_max_len=pipeline.lm_max_len)
            if han is None:  # exported signatures must be static
                han = jnp.zeros_like(pny)
            return pny, pny_len, han

        for batch in sorted(set(int(b) for b in batch_sizes)):
            spec = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            exp = jax_export.export(
                jax.jit(fn),
                platforms=list(platforms) if platforms else None)(
                    [spec(x) for x in am_flat],
                    [spec(x) for x in lm_flat],
                    jax.ShapeDtypeStruct((batch, samples), jnp.float32),
                    jax.ShapeDtypeStruct((batch,), jnp.int32))
            name = f"prog_b{batch}_f{bucket}.bin"
            blobs[name] = exp.serialize()
            programs.append({"batch": batch, "bucket": bucket,
                             "samples": samples, "file": name})

    meta = {
        "version": _FORMAT_VERSION,
        "decode": pipeline.decode,
        "beam_width": pipeline.beam_width,
        "feature_dim": pipeline.fbank_cfg.nfilt,
        "lm_max_len": pipeline.lm_max_len,
        "has_lm": pipeline.lm_model is not None,
        "platforms": list(platforms) if platforms else None,
        "n_am_params": len(am_flat),
        "n_lm_params": len(lm_flat),
        "programs": programs,
        "acoustic_vocab": list(pipeline.av.symbols),
        "language_vocab": (list(pipeline.lv.symbols)
                           if pipeline.lv is not None else None),
    }

    npz = io.BytesIO()
    np.savez(npz, **{f"am/{i:04d}": np.asarray(x)
                     for i, x in enumerate(am_flat)},
             **{f"lm/{i:04d}": np.asarray(x)
                for i, x in enumerate(lm_flat)})
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr("meta.json", json.dumps(meta, ensure_ascii=False))
        z.writestr("params.npz", npz.getvalue())
        for name, blob in blobs.items():
            z.writestr(name, blob)
    return meta


class ServingPipeline:
    """Artifact-only inference: ``load`` + ``recognize_*`` with no model
    code, checkpoint manager or vocab assets."""

    def __init__(self, meta: dict, exported: dict, am_leaves, lm_leaves):
        self.meta = meta
        self._exported = exported            # (batch, bucket) -> Exported
        self._am = am_leaves
        self._lm = lm_leaves
        self._calls = {}                     # (batch, bucket) -> jitted
        sym = meta["acoustic_vocab"]
        self.acoustic_vocab = Vocab(tuple(sym),
                                    {s: i for i, s in enumerate(sym)})
        self.language_vocab = None
        if meta["language_vocab"] is not None:
            sym = meta["language_vocab"]
            self.language_vocab = Vocab(tuple(sym),
                                        {s: i for i, s in enumerate(sym)})
        self._batches = sorted({b for b, _ in exported})
        self._buckets = sorted({f for _, f in exported})

    @classmethod
    def load(cls, path: str) -> "ServingPipeline":
        from jax import export as jax_export

        with zipfile.ZipFile(path, "r") as z:
            meta = json.loads(z.read("meta.json"))
            if meta["version"] != _FORMAT_VERSION:
                raise ValueError(
                    f"unsupported artifact version {meta['version']}")
            npz = np.load(io.BytesIO(z.read("params.npz")))
            am = [jnp.asarray(npz[f"am/{i:04d}"])
                  for i in range(meta["n_am_params"])]
            lm = [jnp.asarray(npz[f"lm/{i:04d}"])
                  for i in range(meta["n_lm_params"])]
            exported = {}
            for p in meta["programs"]:
                exported[(p["batch"], p["bucket"])] = (
                    jax_export.deserialize(z.read(p["file"])))
        return cls(meta, exported, am, lm)

    # -- program selection ------------------------------------------------

    def _pick_bucket(self, frames: int) -> int:
        for f in self._buckets:
            if frames <= f:
                return f
        return self._buckets[-1]             # truncate overlong signals

    def _call(self, batch: int, bucket: int):
        key = (batch, bucket)
        if key not in self._calls:
            exp = self._exported[key]
            # params as ARGUMENTS of the wrapper (a closure would bake
            # them into the jitted program as constants)
            jitted = jax.jit(lambda a, m, s, l: exp.call(a, m, s, l))
            self._calls[key] = (
                lambda s, l, _j=jitted: _j(self._am, self._lm, s, l))
        return self._calls[key]

    # -- public API -------------------------------------------------------

    def recognize_batch(self, signals: np.ndarray, lengths: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray,
                                   Optional[np.ndarray]]:
        """signals [B, S] float32 + lengths [B] -> (pinyin ids [B, L],
        pinyin lengths [B], hanzi ids [B, L] or None). Batches larger
        than the largest exported size are served in chunks; smaller
        ones are zero-padded to the smallest exported size that fits."""
        signals = np.asarray(signals, np.float32)
        lengths = np.asarray(lengths, np.int32)
        n = signals.shape[0]
        max_b = self._batches[-1]
        if n > max_b:
            parts = [self.recognize_batch(signals[i:i + max_b],
                                          lengths[i:i + max_b])
                     for i in range(0, n, max_b)]
            pny = np.concatenate([p[0] for p in parts])
            pln = np.concatenate([p[1] for p in parts])
            han = (np.concatenate([p[2] for p in parts])
                   if self.meta["has_lm"] else None)
            return pny, pln, han

        frames = max(1, 1 + (int(lengths.max()) - 400 + 159) // 160)
        bucket = self._pick_bucket(frames)
        samples = _samples_for_bucket(bucket)
        batch = next(b for b in self._batches if b >= n)
        buf = np.zeros((batch, samples), np.float32)
        m = min(signals.shape[1], samples)
        buf[:n, :m] = signals[:, :m]
        lens = np.zeros((batch,), np.int32)
        lens[:n] = np.minimum(lengths, samples)
        pny, pln, han = self._call(batch, bucket)(jnp.asarray(buf),
                                                  jnp.asarray(lens))
        pny = np.asarray(pny[:n])
        pln = np.asarray(pln[:n])
        han = np.asarray(han[:n]) if self.meta["has_lm"] else None
        return pny, pln, han

    def recognize_signal(self, signal: np.ndarray
                         ) -> Tuple[List[str], str]:
        """Single utterance -> (pinyin syllables, hanzi string) — the
        artifact-only counterpart of ``Pipeline.recognize_signal``."""
        sig = np.asarray(signal, np.float32)[None, :]
        pny, pln, han = self.recognize_batch(
            sig, np.array([sig.shape[1]], np.int32))
        k = int(pln[0])
        pinyin = self.acoustic_vocab.decode(pny[0][:k])
        hanzi = ""
        if han is not None and self.language_vocab is not None:
            hanzi = "".join(self.language_vocab.decode(han[0][:k]))
        return pinyin, hanzi
