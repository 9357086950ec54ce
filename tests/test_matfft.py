"""Matmul inverse-FFT (ops/matfft.py) vs numpy, and its noise-path wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.ops import matfft


def test_ifft_matmul_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (16, 64, 1024):
        x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
        ref = np.fft.ifft(x, n) * n           # unnormalized, +i exponent
        yr, yi = matfft.ifft_matmul(jnp.asarray(x.real, jnp.float32),
                                    jnp.asarray(x.imag, jnp.float32), n)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-6


def test_irfft_matmul_matches_numpy():
    rng = np.random.default_rng(1)
    for n in (32, 256, 16384):
        spec = (rng.standard_normal((2, n // 2 + 1))
                + 1j * rng.standard_normal((2, n // 2 + 1)))
        # arbitrary (non-hermitian) DC/Nyquist imag parts must be ignored,
        # matching numpy.fft.irfft
        ref = np.fft.irfft(spec, n)
        got = np.asarray(matfft.irfft_matmul(
            jnp.asarray(spec.real, jnp.float32),
            jnp.asarray(spec.imag, jnp.float32), n))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-6


def test_irfft_matmul_under_vmap():
    rng = np.random.default_rng(2)
    n = 512
    spec = (rng.standard_normal((4, n // 2 + 1)).astype(np.float32),
            rng.standard_normal((4, n // 2 + 1)).astype(np.float32))
    batched = jax.vmap(lambda r, i: matfft.irfft_matmul(r, i, n))(*spec)
    ref = np.stack([np.asarray(matfft.irfft_matmul(
        jnp.asarray(spec[0][j]), jnp.asarray(spec[1][j]), n))
        for j in range(4)])
    np.testing.assert_allclose(np.asarray(batched), ref, atol=1e-5)


def test_matfft_rejects_bad_sizes():
    x = jnp.zeros((8,)), jnp.zeros((8,))
    with pytest.raises(ValueError):
        matfft.ifft_matmul(*x, 12)      # not a power of two


def test_irfft_matmul_bf16_tolerance():
    """bf16 compute keeps the transform within ~1% of exact — the regime
    the noise path relies on (random draw + SNR mix)."""
    rng = np.random.default_rng(3)
    n = 16384
    spec = (rng.standard_normal((2, n // 2 + 1))
            + 1j * rng.standard_normal((2, n // 2 + 1)))
    ref = np.fft.irfft(spec, n)
    got = np.asarray(matfft.irfft_matmul(
        jnp.asarray(spec.real, jnp.float32),
        jnp.asarray(spec.imag, jnp.float32), n,
        compute_dtype=jnp.bfloat16))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel


def test_color_noise_matfft_path_matches_fft_path(monkeypatch):
    """The TPU (matmul, bf16-compute) branch of color_noise tracks the
    XLA-FFT branch — same key, same samples to bf16-DFT tolerance (the
    noise is normalized to max 1, so atol bounds relative error)."""
    from asr_dfcnn_transformer_tpu.audio import noise as noise_mod

    key = jax.random.PRNGKey(9)
    ref = np.asarray(noise_mod.color_noise(key, 3000, jnp.float32(-0.7)))
    monkeypatch.setattr(noise_mod, "_use_matfft", lambda: True)
    got = np.asarray(noise_mod.color_noise(key, 3000, jnp.float32(-0.7)))
    np.testing.assert_allclose(got, ref, atol=0.03)
    # spectral shape preserved: correlation with the exact path ~1
    c = np.corrcoef(got, ref)[0, 1]
    assert c > 0.999, c


def test_irfft_pallas_epilogue_bit_identical():
    """The fused interleave-epilogue kernel (ops/pallas/fft_epilogue.py,
    interpreted off-TPU) must reproduce the XLA relayout path bit for bit
    — same upcast-then-scale order, exact 1/n."""
    rng = np.random.default_rng(4)
    for n, cd in ((4096, jnp.float32), (16384, jnp.bfloat16)):
        spec = (rng.standard_normal((3, n // 2 + 1)).astype(np.float32),
                rng.standard_normal((3, n // 2 + 1)).astype(np.float32))
        xla = np.asarray(matfft.irfft_matmul(
            jnp.asarray(spec[0]), jnp.asarray(spec[1]), n,
            compute_dtype=cd, epilogue="xla"))
        pal = np.asarray(matfft.irfft_matmul(
            jnp.asarray(spec[0]), jnp.asarray(spec[1]), n,
            compute_dtype=cd, epilogue="pallas"))
        np.testing.assert_array_equal(pal, xla)


def test_irfft_pallas_epilogue_under_vmap():
    """color_noise calls irfft_matmul per-row under vmap; the kernel must
    batch correctly through pallas_call's vmap rule."""
    rng = np.random.default_rng(5)
    n = 2048
    spec = (rng.standard_normal((4, n // 2 + 1)).astype(np.float32),
            rng.standard_normal((4, n // 2 + 1)).astype(np.float32))
    got = jax.vmap(lambda r, i: matfft.irfft_matmul(
        r, i, n, epilogue="pallas"))(jnp.asarray(spec[0]),
                                     jnp.asarray(spec[1]))
    ref = np.fft.irfft(spec[0] + 1j * spec[1], n)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_irfft_rejects_bad_epilogue():
    x = jnp.zeros((9,)), jnp.zeros((9,))
    with pytest.raises(ValueError):
        matfft.irfft_matmul(*x, 16, epilogue="nope")
