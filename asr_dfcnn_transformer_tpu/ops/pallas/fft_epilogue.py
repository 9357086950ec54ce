"""Fused epilogue for the matmul inverse FFT (``ops/matfft.py``).

``irfft_matmul``'s last two XLA passes are pure relayouts of the DFT-stage
output z[..., n2, n1]: the [n2, n1] -> [n1, n2] interleave transpose and
the even/odd sample stack x[2m]=Re, x[2m+1]=Im (the real-packing identity;
see matfft.py's docstring). Each is a full read+write of the tensor in
HBM. This kernel performs transpose + interleave + 1/n scale + f32 upcast
in ONE read of z and ONE write of x — the mandatory-traffic floor
(~201 MB at n=262144 / batch 128 / bf16 z, vs ~2x that for the separate
XLA passes). The relayout itself happens on VMEM-resident tiles.

Values are bit-identical to the XLA path (same upcast-then-scale order;
1/n is exact for power-of-two n), asserted in tests/test_matfft.py.

Off by default: ``matfft.irfft_matmul(epilogue="auto")`` resolves to the
XLA path until this kernel's win is measured on hardware (FbankConfig
"auto"-crossover convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _epilogue_kernel(zr_ref, zi_ref, out_ref, *, inv_n: float):
    # Upcast + 1/n scale FIRST: relayouts commute with elementwise ops, so
    # the values stay bit-identical to the XLA path's upcast-then-scale —
    # and Mosaic (this toolchain) only lowers the relayouts below for
    # 32-bit types (the bf16 variant fails to compile).
    zr = zr_ref[0].astype(jnp.float32) * inv_n   # [n2, n1]
    zi = zi_ref[0].astype(jnp.float32) * inv_n
    n2, n1 = zr.shape
    # Interleave on the SUBLANE axis (lane-minor stack + [n1, n2, 2] ->
    # [n1, 2*n2] collapse is an unsupported Mosaic shape cast): build
    # xT[2*m2 + p, m1] = z_p[m2, m1] by row interleave, then one in-VMEM
    # 2D transpose gives out[m1, 2*m2 + p].
    xt = jnp.stack([zr, zi], axis=1).reshape(2 * n2, n1)
    out_ref[0] = xt.T


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def interleave_epilogue(zr: jnp.ndarray, zi: jnp.ndarray, n: int,
                        interpret: bool | None = None) -> jnp.ndarray:
    """x[..., 2*(m2 + n2*m1) + p] = z_p[..., m2, m1] / n as one pass.

    Args: zr/zi [..., n2, n1] — the inverse-DFT stage output of
    ``matfft._ifft_stages`` for the half-size (h = n1*n2 = n/2) packed
    transform. Returns the length-n real signal [..., n] in float32,
    including numpy's 1/n irfft normalization. ``interpret=None``
    auto-interprets off TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *batch, n2, n1 = zr.shape
    if 2 * n1 * n2 != n:
        raise ValueError(f"z is [..., {n2}, {n1}]; expected n1*n2 == {n}/2")
    b = int(np.prod(batch)) if batch else 1
    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, inv_n=1.0 / n),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n2, n1), lambda i: (i, 0, 0))] * 2,
        out_specs=pl.BlockSpec((1, n1, 2 * n2), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n1, 2 * n2), jnp.float32),
        interpret=interpret,
    )(zr.reshape(b, n2, n1), zi.reshape(b, n2, n1))
    return out.reshape(*batch, n)
