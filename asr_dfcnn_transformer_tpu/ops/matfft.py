"""Inverse real FFT as MXU matmuls (two-stage Cooley-Tukey).

XLA's TPU FFT runs at ~280 GFLOP/s on v5e — the 262144-point batched
``irfft`` in the colored-noise synthesizer (``audio/noise.py``) cost
10.9 ms/batch-128, the second-largest stage of the beam+noise pipeline.
The same transform as two dense DFT matmuls + a twiddle multiply runs on
the MXU (f32 matmuls execute at the bf16 MXU rate under DEFAULT
precision, DESIGN.md §9), an order of magnitude faster. Same trick as the
fbank front-end's DFT-as-matmul (``audio/fbank.py``), scaled to big-N via
the factorization below.

Math (decimation of the inverse DFT over N = N1*N2, k = k1 + N1*k2,
n = n2 + N2*n1):

    x[n2 + N2*n1] = sum_k1 E(n1 k1 / N1) * T[n2, k1]
                    * sum_k2 X[k2, k1] * E(n2 k2 / N2)

with E(q) = exp(2i pi q) and twiddle T[n2, k1] = E(n2 k1 / N). Each inner
sum is one [N2, N2] (resp. [N1, N1]) complex matmul over the reshaped
spectrum. Real output halves the work: an N-point irfft is packed into an
N/2-point complex ifft (the classic split-radix real-packing identity,
verified against ``numpy.fft.irfft`` in tests/test_matfft.py).

Exactness: f32 DFT matmuls agree with numpy's float64 FFT to ~1e-6
relative on CPU; on TPU, XLA DEFAULT precision executes the f32 matmuls
through the MXU's bf16 datapath, measured ~3e-3 relative at n=262144 —
far below anything the consumer can see (the noise is random and mixed
at 5-10 dB SNR). Measured v5e, batch 128, n=262144: 4.35 ms vs 10.86 ms
for XLA's own irfft. Not a general FFT replacement — power-of-two sizes
only, inverse direction only, and not for consumers needing f32-exact
spectra on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _split(n: int) -> tuple[int, int]:
    """Balanced power-of-two factorization n = n1 * n2."""
    if n & (n - 1) or n < 4:
        raise ValueError(f"matfft needs a power-of-two size >= 4, got {n}")
    log = n.bit_length() - 1
    n1 = 1 << (log - log // 2)
    return n1, n // n1


def _idft_mats(n: int, dtype=jnp.float32):
    """cos/sin of the inverse-DFT matrix for size n ([n, n])."""
    k = np.arange(n)
    ang = 2.0 * np.pi / n * np.outer(k, k)
    return (jnp.asarray(np.cos(ang), jnp.float32).astype(dtype),
            jnp.asarray(np.sin(ang), jnp.float32).astype(dtype))


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cmatmul(xr, xi, mr, mi, axis: int = -1):
    """(x @ m) for complex operands held as separate real/imag f32,
    contracting ``axis`` of x with axis 0 of m WITHOUT materializing a
    transpose (the contracted axis moves to the end of the result).

    The explicit ``swapaxes`` version cost more than the matmuls
    themselves at n=262144/batch 128 (each transpose is a 268 MB
    HBM round-trip); ``dot_general`` lets the MXU stream the other
    orientation directly.
    """
    axis = axis % xr.ndim
    dn = (((axis,), (0,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
    out_r = dot(xr, mr) - dot(xi, mi)
    out_i = dot(xr, mi) + dot(xi, mr)
    return out_r.astype(xr.dtype), out_i.astype(xr.dtype)


def _ifft_stages(xr, xi, n: int, compute_dtype):
    """Both DFT stages + twiddle of the inverse DFT, WITHOUT the final
    interleave relayout: returns (zr, zi) [..., n2, n1] in compute_dtype,
    where y[n2_idx + N2*n1_idx] = z[n2_idx, n1_idx]."""
    n1, n2 = _split(n)
    batch = xr.shape[:-1]
    # [k2, k1] layout: k = k1 + n1*k2
    xr = xr.reshape(*batch, n2, n1).astype(compute_dtype)
    xi = xi.reshape(*batch, n2, n1).astype(compute_dtype)
    c2, s2 = _idft_mats(n2, compute_dtype)
    # inner transform over k2 (contract the -2 axis in place; the result
    # comes back as [..., k1, m2])
    yr, yi = _cmatmul(xr, xi, c2, s2, axis=-2)     # [..., k1, n2]
    # twiddle T[k1, n2] = E(n2*k1/N) on the [..., k1, n2] layout
    m = np.arange(n1)[:, None] * np.arange(n2)[None, :]
    ang = 2.0 * np.pi / n * m
    yr, yi = _cmul(yr, yi,
                   jnp.asarray(np.cos(ang), np.float32).astype(compute_dtype),
                   jnp.asarray(np.sin(ang), np.float32).astype(compute_dtype))
    # outer transform over k1 (the -2 axis again); result [..., n2, n1]
    c1, s1 = _idft_mats(n1, compute_dtype)
    return _cmatmul(yr, yi, c1, s1, axis=-2)       # [..., n2, n1]


@functools.partial(jax.jit, static_argnames=("n", "compute_dtype"))
def ifft_matmul(xr: jnp.ndarray, xi: jnp.ndarray, n: int,
                compute_dtype=jnp.float32):
    """Unnormalized inverse complex DFT over the last axis (length n).

    Args: xr/xi [..., n] real/imag parts. Returns (yr, yi) [..., n] in
    ``compute_dtype`` with y[m] = sum_k x[k] * exp(2i pi k m / n)  (no 1/n
    factor — callers that need numpy semantics divide; the noise path folds
    it into its gain).

    ``compute_dtype=jnp.bfloat16`` halves every HBM round-trip and runs
    the DFT matmuls at the native MXU rate (f32 accumulate); relative
    error grows from ~1e-6 to ~1e-2-level — use only where the consumer
    is insensitive (the noise synthesizer mixes at 5-10 dB SNR).
    """
    batch = xr.shape[:-1]
    zr, zi = _ifft_stages(xr, xi, n, compute_dtype)
    # output index n = n2 + N2*n1 -> need [..., n1, n2] flattening; this
    # final interleave transpose is the one unavoidable relayout. It stays
    # in compute_dtype — under bf16 that halves its HBM round-trip — so the
    # return dtype is compute_dtype; callers upcast (the upcast fuses into
    # their next elementwise pass).
    zr = jnp.swapaxes(zr, -1, -2).reshape(*batch, n)
    zi = jnp.swapaxes(zi, -1, -2).reshape(*batch, n)
    return zr, zi


@functools.partial(jax.jit, static_argnames=("n", "compute_dtype",
                                             "epilogue"))
def irfft_matmul(sr: jnp.ndarray, si: jnp.ndarray, n: int,
                 compute_dtype=jnp.float32,
                 epilogue: str = "auto") -> jnp.ndarray:
    """``numpy.fft.irfft(s, n)`` for power-of-two n >= 8 via one N/2
    matmul ifft (the packed half-size transform must itself split).

    Args: sr/si [..., n//2 + 1] — the hermitian half-spectrum's real/imag
    parts. Returns [..., n] real (f32), including numpy's 1/n norm.

    ``epilogue`` selects how the final interleave relayout runs: "xla"
    (two relayout passes), "pallas" (one fused read-z/write-x kernel,
    ``ops/pallas/fft_epilogue.py`` — bit-identical output), or "auto".
    "auto" resolves to "xla": MEASURED on the v5e (round 4,
    tools/measure_autos.py, n=262144 b128 bf16, two runs: 1.02x then
    0.91x) the kernel has no stable win — after the compute-dtype
    refinement the XLA relayouts are already near mandatory traffic.
    The kernel stays available opt-in (DESIGN.md §9).

    Packing: with S the half-spectrum and Sc[k] = conj(S[h-k]) its
    reflected conjugate (h = n/2), the length-h complex sequence

        Z[k] = (S[k] + Sc[k]) + E(k/n) * i * (S[k] - Sc[k]),  k < h

    satisfies ifft_unnorm(Z, h)[m] = n * (x[2m] + i x[2m+1]) for the
    real signal x = irfft(S, n) — even/odd samples interleave from one
    half-size transform. (With Sc[k] = conj(S[h-k]): the even/odd
    half-DFTs are Xe = (S + Sc)/2 and Xo = E(k/n) (S - Sc)/2, the packed
    spectrum is Xe + i Xo = Z/2, and the unnormalized inverse contributes
    a further factor h, so the total scale is exactly 1/n.)
    """
    h = n // 2
    # numpy.fft.irfft ignores the imaginary parts of the DC and Nyquist
    # bins (a real signal forces them to 0); match that so arbitrary
    # inputs round-trip identically
    edge = (jnp.arange(h + 1) != 0) & (jnp.arange(h + 1) != h)
    si = si * edge.astype(si.dtype)
    # reflected conjugate over k = 0..h-1 (index h-k runs h..1)
    rr = sr[..., ::-1]            # S[h], S[h-1], ..., S[0]
    ri = si[..., ::-1]
    ar, ai = sr[..., :h] + rr[..., :h], si[..., :h] - ri[..., :h]
    br, bi = sr[..., :h] - rr[..., :h], si[..., :h] + ri[..., :h]
    k = np.arange(h)
    ang = 2.0 * np.pi * k / n
    tc = jnp.asarray(np.cos(ang), jnp.float32)
    ts = jnp.asarray(np.sin(ang), jnp.float32)
    # Z = A + E(k/n) * (i * B);  i*B = (-bi, br)
    ibr, ibi = -bi, br
    tr_, ti_ = _cmul(ibr, ibi, tc, ts)
    zr, zi = ar + tr_, ai + ti_
    if epilogue == "auto":
        epilogue = "xla"        # kernel win unmeasured; see docstring
    if epilogue == "pallas":
        from asr_dfcnn_transformer_tpu.ops.pallas.fft_epilogue import (
            interleave_epilogue)
        wr, wi = _ifft_stages(zr, zi, h, compute_dtype)
        return interleave_epilogue(wr, wi, n)
    if epilogue != "xla":
        raise ValueError(f"epilogue must be auto|xla|pallas, got {epilogue}")
    yr, yi = ifft_matmul(zr, zi, h, compute_dtype=compute_dtype)
    # even/odd interleave in compute_dtype (half the relayout traffic under
    # bf16); upcast + exact 1/n scale (n is a power of two) fuse into one
    # final pass
    x = jnp.stack([yr, yi], axis=-1).reshape(*yr.shape[:-1], n)
    return x.astype(jnp.float32) * (1.0 / n)
