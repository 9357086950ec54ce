"""Pallas fused fbank kernel vs the XLA path (interpret mode on CPU)."""

import dataclasses

import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.audio import fbank as jf


@pytest.fixture(scope="module")
def signals():
    rng = np.random.default_rng(7)
    t = np.arange(40000) / 16000.0
    a = (0.4 * np.sin(2 * np.pi * 523 * t)
         + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    b = np.zeros_like(a)
    b[:25000] = (0.3 * np.sin(2 * np.pi * 907 * t[:25000])
                 + 0.05 * rng.standard_normal(25000)).astype(np.float32)
    return np.stack([a, b]), np.array([40000, 25000], np.int32)


def test_pallas_matches_xla_batched(signals):
    sigs, lens = signals
    cfg_x = jf.FbankConfig()
    cfg_p = dataclasses.replace(cfg_x, backend="pallas")
    fx, vx = jf.batched_fbank(sigs, lens, cfg=cfg_x, out_frames=256)
    fp, vp = jf.batched_fbank(sigs, lens, cfg=cfg_p, out_frames=256)
    assert list(np.asarray(vx)) == list(np.asarray(vp))
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fx),
                               rtol=2e-4, atol=2e-4)


def test_pallas_kernel_tile_boundaries(signals):
    """out_frames not a multiple of the 128-frame tile."""
    sigs, lens = signals
    cfg_p = dataclasses.replace(jf.FbankConfig(), backend="pallas")
    cfg_x = jf.FbankConfig()
    for t_out in (100, 130, 200):
        fp, _ = jf.batched_fbank(sigs, lens, cfg=cfg_p, out_frames=t_out)
        fx, _ = jf.batched_fbank(sigs, lens, cfg=cfg_x, out_frames=t_out)
        assert fp.shape == (2, t_out, 200)
        np.testing.assert_allclose(np.asarray(fp), np.asarray(fx),
                                   rtol=2e-4, atol=2e-4)
