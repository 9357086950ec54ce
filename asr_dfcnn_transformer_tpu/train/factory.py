"""Config tree -> models / trainers / pipeline.

Makes :class:`core.config.Config` the single construction surface: the
reference reads four argparse namespaces scattered across call sites
(SURVEY §2.1 Hparams); here one frozen dataclass tree drives every
builder, so a training run is reproducible from one serializable object.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import jax.numpy as jnp

from asr_dfcnn_transformer_tpu.core import vocab as vocab_mod
from asr_dfcnn_transformer_tpu.core.config import Config
from asr_dfcnn_transformer_tpu.data.loader import DataLoader
from asr_dfcnn_transformer_tpu.data.manifest import load_manifests
from asr_dfcnn_transformer_tpu.parallel import make_mesh


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def build_am_model(cfg: Config):
    from asr_dfcnn_transformer_tpu import models
    av = vocab_mod.acoustic_vocab()
    d = _dtype(cfg.am.dtype)
    name = cfg.am.model
    if name == "dfcnn":
        return models.DFCNN(av.size, dropout_rate=cfg.am.dropout_rate,
                            dtype=d)
    if name == "bigru":
        return models.BiGRUCTC(av.size, dtype=d)
    if name == "keras_dfcnn":
        return models.KerasDFCNN(av.size, dense_units=cfg.am.dense_units,
                                 dropout_rate=cfg.am.dropout_rate, dtype=d)
    if name == "se_dfcnn_fast":
        return models.SEDFCNN.fast(av.size, se_ratio=tuple(cfg.am.se_ratio),
                                   dropout_rate=cfg.am.dropout_rate, dtype=d)
    if name in ("se_dfcnn", "se_dfcnn_pre"):
        return models.SEDFCNN(av.size, se_ratio=tuple(cfg.am.se_ratio),
                              dropout_rate=cfg.am.dropout_rate,
                              se_first=(name == "se_dfcnn_pre"), dtype=d)
    raise ValueError(f"unknown am model {name!r}")


def build_lm_model(cfg: Config):
    from asr_dfcnn_transformer_tpu.models import TransformerLM
    av, lv = vocab_mod.acoustic_vocab(), vocab_mod.language_vocab()
    return TransformerLM(
        av.size, lv.size, d_model=cfg.lm.d_model,
        num_heads=cfg.lm.num_heads, num_blocks=cfg.lm.num_blocks,
        position_max_length=cfg.lm.position_max_length,
        dropout_rate=cfg.lm.dropout_rate,
        parity_attention=cfg.lm.parity_attention,
        fused_attention=cfg.lm.fused_attention,
        fused_ffn=cfg.lm.fused_ffn,
        dtype=_dtype(cfg.lm.dtype))


def build_e2e_model(cfg: Config):
    from asr_dfcnn_transformer_tpu.models import SpeechTransformer
    ev = vocab_mod.e2e_language_vocab()
    return SpeechTransformer(
        ev.size, d_model=cfg.e2e.d_model, num_heads=cfg.e2e.num_heads,
        num_enc_blocks=cfg.e2e.num_enc_blocks,
        num_dec_blocks=cfg.e2e.num_dec_blocks,
        dropout_rate=cfg.e2e.dropout_rate,
        position_max_length=cfg.e2e.position_max_length,
        fused_attention=cfg.e2e.fused_attention,
        fused_ffn=cfg.e2e.fused_ffn,
        dtype=_dtype(cfg.e2e.dtype))


def build_mesh(cfg: Config):
    return make_mesh(cfg.mesh.data_parallel, cfg.mesh.model_parallel)


def build_loader(cfg: Config, mode: str, shuffle: Optional[bool] = None,
                 e2e_vocab: bool = False) -> DataLoader:
    av = vocab_mod.acoustic_vocab()
    lv = vocab_mod.e2e_language_vocab() if e2e_vocab \
        else vocab_mod.language_vocab()
    m = load_manifests(cfg.data.data_dir, mode,
                       corpora=tuple(cfg.data.corpora),
                       use_noise=cfg.data.use_noise_manifest,
                       shuffle=cfg.data.shuffle if shuffle is None
                       else shuffle,
                       seed=cfg.train.seed,
                       data_length=cfg.data.data_length)
    return DataLoader(m, av, lv, speech_root=cfg.data.speech_data_root,
                      noise_root=cfg.data.noise_data_root,
                      feature_max_length=cfg.am.feature_max_length,
                      bucket_bounds=tuple(cfg.data.bucket_bounds))


def build_am_trainer(cfg: Config, workdir: str, mesh=None,
                     augment_noise: bool = False, augment_spec=None):
    from asr_dfcnn_transformer_tpu.train import AMTrainer
    return AMTrainer(build_am_model(cfg), workdir, lr=cfg.am.lr,
                     decay_steps=cfg.train.decay_steps,
                     min_lr=cfg.train.min_lr,
                     feature_dim=cfg.am.feature_dim,
                     mesh=mesh or build_mesh(cfg),
                     augment_noise=augment_noise,
                     augment_spec=augment_spec,
                     max_to_keep=cfg.train.max_to_keep)


def build_lm_trainer(cfg: Config, workdir: str, mesh=None):
    from asr_dfcnn_transformer_tpu.train import LMTrainer
    return LMTrainer(build_lm_model(cfg), workdir, lr=cfg.lm.lr,
                     decay_steps=cfg.train.decay_steps,
                     min_lr=cfg.train.min_lr,
                     mesh=mesh or build_mesh(cfg),
                     max_to_keep=cfg.train.max_to_keep)


def build_e2e_trainer(cfg: Config, workdir: str, mesh=None,
                      augment_spec=None):
    from asr_dfcnn_transformer_tpu.train import E2ETrainer
    return E2ETrainer(build_e2e_model(cfg), workdir, lr=cfg.e2e.lr,
                      decay_steps=cfg.train.decay_steps,
                      min_lr=cfg.train.min_lr,
                      feature_dim=cfg.e2e.feature_dim,
                      lfr_m=cfg.e2e.lfr_m, lfr_n=cfg.e2e.lfr_n,
                      mesh=mesh or build_mesh(cfg),
                      augment_spec=augment_spec,
                      max_to_keep=cfg.train.max_to_keep)


# ---- (de)serialization ---------------------------------------------------

def config_to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def config_from_json(text: str) -> Config:
    from asr_dfcnn_transformer_tpu.core import config as cmod

    raw = json.loads(text)

    def mk(cls, d):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in fields:
                continue
            ftype = fields[k].type
            kw[k] = v
        return cls(**kw)

    return cmod.Config(
        am=mk(cmod.AmConfig, raw.get("am", {})),
        lm=mk(cmod.LmConfig, raw.get("lm", {})),
        e2e=mk(cmod.E2EConfig, raw.get("e2e", {})),
        data=mk(cmod.DataConfig, raw.get("data", {})),
        train=mk(cmod.TrainConfig, raw.get("train", {})),
        mesh=mk(cmod.MeshConfig, raw.get("mesh", {})))
