import dataclasses

import jax.numpy as jnp

from asr_dfcnn_transformer_tpu.core.config import Config
from asr_dfcnn_transformer_tpu.train import factory


def test_default_config_matches_reference_hparams():
    cfg = Config()
    assert cfg.am.lr == 7e-4 and cfg.am.batch_size == 16
    assert cfg.lm.lr == 5e-5 and cfg.lm.batch_size == 64
    assert cfg.lm.num_heads == 8 and cfg.lm.num_blocks == 12
    assert cfg.lm.d_model == 512 and cfg.lm.position_max_length == 100
    assert cfg.train.decay_steps == 5000 and cfg.train.min_lr == 1e-6
    assert cfg.data.lfr_m == 4 and cfg.data.lfr_n == 3
    assert cfg.am.feature_dim == 200 and cfg.am.feature_max_length == 1600


def test_build_models_from_config():
    cfg = Config()
    cfg = cfg.replace(am=dataclasses.replace(cfg.am, dtype="float32"),
                      lm=dataclasses.replace(cfg.lm, num_blocks=1,
                                             d_model=32, num_heads=4,
                                             dtype="float32"))
    am = factory.build_am_model(cfg)
    assert am.vocab_size == 1536
    lm = factory.build_lm_model(cfg)
    assert lm.output_vocab_size == 6345 and lm.num_blocks == 1
    e2e = factory.build_e2e_model(cfg)
    assert e2e.vocab_size == 6347


def test_am_model_variants():
    for name in ("dfcnn", "se_dfcnn", "se_dfcnn_pre", "keras_dfcnn",
                 "bigru"):
        cfg = Config()
        cfg = cfg.replace(am=dataclasses.replace(cfg.am, model=name))
        m = factory.build_am_model(cfg)
        assert m is not None


def test_config_json_roundtrip():
    cfg = Config()
    cfg2 = cfg.replace(am=dataclasses.replace(cfg.am, lr=1e-3, model="dfcnn"))
    text = factory.config_to_json(cfg2)
    back = factory.config_from_json(text)
    assert back.am.lr == 1e-3 and back.am.model == "dfcnn"
    assert back.lm.d_model == 512
    assert back == cfg2 or dataclasses.asdict(back)["am"]["lr"] == 1e-3


def test_build_trainer_from_config(tmp_path):
    import jax
    from asr_dfcnn_transformer_tpu.parallel import make_mesh
    cfg = Config()
    cfg = cfg.replace(am=dataclasses.replace(cfg.am, dtype="float32"))
    mesh = make_mesh(4, 1, jax.devices()[:4])
    tr = factory.build_am_trainer(cfg, str(tmp_path), mesh=mesh)
    assert tr.model.vocab_size == 1536
    assert abs(float(tr.schedule(0)) - 7e-4) < 1e-8


def test_factory_threads_fused_backends():
    import dataclasses

    from asr_dfcnn_transformer_tpu.core.config import Config
    from asr_dfcnn_transformer_tpu.train.factory import (build_e2e_model,
                                                         build_lm_model)
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        lm=dataclasses.replace(cfg.lm, fused_attention="einsum",
                               fused_ffn="pallas"),
        e2e=dataclasses.replace(cfg.e2e, fused_attention="pallas"))
    lm = build_lm_model(cfg)
    assert lm.fused_attention == "einsum" and lm.fused_ffn == "pallas"
    e2e = build_e2e_model(cfg)
    assert e2e.fused_attention == "pallas" and e2e.fused_ffn == "auto"
