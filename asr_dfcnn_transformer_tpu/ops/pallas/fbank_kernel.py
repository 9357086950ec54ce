"""Fused log-mel spectrogram Pallas kernel.

Replaces the XLA pipeline frame-gather -> rFFT/DFT -> power -> mel ->
log with one kernel step per (utterance, <=800-frame tile), and never
materializes the 2.5x-expanded frame matrix anywhere — not even in VMEM:

With hop 160 = one sublane row of a [rows, 160] view of the signal,
frame f is rows (f, f+1) plus the first 80 samples of row f+2. So the
windowed DFT factors into a sum of three matmuls against row-blocks of
the DFT bases:

    frames @ Basis = A @ Basis[0:160] + B @ Basis[160:320] + C80 @ Basis[320:400]

where A/B/C are the same signal tile shifted by 0/1/2 rows. Each grid
step DMAs one tile's row view (HBM -> VMEM, double-buffered so the next
tile's copy overlaps this one's matmuls), runs 6 MXU matmuls (cos+sin x
3 shifts) with M = up to 800 frames at once, squares, projects through
the mel bank and takes the log — all in VMEM. HBM traffic is signal in
(~1.6x 4 bytes/sample from lane padding) + log-mel out. The tile is the
whole utterance when it fits (MAX_TILE=800; the 16MB scoped-VMEM stack
bounds it — shifted row views + re/im/power temporaries are ~11KB per
frame): big-M matmuls keep the MXU fed and amortize per-step grid
overhead, which dominated the earlier 320-frame tiling at large batch
(DESIGN.md §3/§9).

Pre-emphasis and the signal-boundary mask are fused INTO the kernel
(round 3): the DMA'd row view is the raw signal (one global leading zero
row so every tile sees its previous row), and each grid step computes
``pe[t] = x[t] - 0.97 x[t-1]`` with a lane roll (+ a row roll for each
row's first sample) and zeroes samples past the utterance length — the
separate [B, S]-sized XLA pre-emphasis/mask pass that used to cost
~1.8 ms of wrapper time at batch 128 is gone.

Per-utterance CMVN stays outside (it needs global-time statistics; one
cheap fused elementwise pass).

Geometry fixed to the reference front-end (wav_util.py:22-31 semantics):
win 400, hop 160, nfft 512, fs 16k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_dfcnn_transformer_tpu.audio.fbank import (
    FbankConfig,
    _dft_bases_np,
    mel_filterbank,
)

HOP = 160
ROW = 256             # signal rows are padded 160 -> 256 lanes (DMA-aligned)
WIN = 400
MAX_TILE = 800        # frames per grid step (whole utterance if it fits)
_EPS = float(np.finfo(np.float64).eps)


def _kernel(lens_ref, sig_ref, cos_ref, sin_ref, mel_ref, out_ref, buf,
            sems, *, preemph: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)
    tile = out_ref.shape[1]
    n_rows = buf.shape[1]
    # double-buffered manual DMA: each grid step waits on the copy its
    # predecessor launched and prefetches the next tile, so HBM reads
    # overlap the matmuls.
    k = b * nt + i
    slot = jax.lax.rem(k, 2)

    def dma(bb, ii, s):
        return pltpu.make_async_copy(
            sig_ref.at[bb, pl.ds(ii * tile, tile + 8), :],
            buf.at[s], sems.at[s])

    @pl.when(k == 0)
    def _():
        dma(b, i, slot).start()

    nk = k + 1

    @pl.when(nk < nb * nt)
    def _():
        dma(nk // nt, jax.lax.rem(nk, nt), 1 - slot).start()

    dma(b, i, slot).wait()
    raw = buf[slot]
    # ---- fused pre-emphasis: pe[t] = x[t] - c*x[t-1] on the row view.
    # Buffer row j holds signal row (i*tile + j - 1) — the host prepends
    # one global zero row, so j=0 is every tile's previous row and pe[0]
    # of the utterance sees x[-1] = 0 (same as _preemphasis's kept first
    # sample). Per row, the previous sample is the lane-rolled row for
    # lanes >= 1 and the PREVIOUS row's lane HOP-1 for lane 0.
    lane = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
    prev_lane = pltpu.roll(raw, shift=1, axis=1)
    prev_row = pltpu.roll(raw, shift=1, axis=0)
    # previous row's lane HOP-1 rotated onto lane 0
    prev_row_last = pltpu.roll(prev_row, shift=raw.shape[1] - (HOP - 1),
                               axis=1)
    prev_samp = jnp.where(lane == 0, prev_row_last, prev_lane)
    pe = raw - preemph * prev_samp
    # ---- fused boundary/pad mask: zero lanes past the real HOP samples
    # and samples at/after the utterance length (parity with
    # batched_fbank's post-pre-emphasis mask — kills the -c*x[len-1]
    # spike just past the signal end).
    row_g = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 0) \
        + (i * tile - 1)                                # global signal row
    samp_idx = row_g * HOP + lane
    slen = lens_ref[b]                                  # [B] SMEM scalar
    pe = jnp.where((lane < HOP) & (samp_idx < slen) & (samp_idx >= 0),
                   pe, 0.0)

    # pltpu.roll wants non-negative circular shifts: rolling by L-k moves
    # row i+k to position i; frame f needs pe signal rows f/f+1/f+2 =
    # buffer rows f+1/f+2/f+3 (offset-0 slices of rolled arrays keep the
    # matmul operands sublane-aligned)
    a = pltpu.roll(pe, shift=n_rows - 1, axis=0)[0:tile]
    b_rows = pltpu.roll(pe, shift=n_rows - 2, axis=0)[0:tile]
    c_rows = pltpu.roll(pe, shift=n_rows - 3, axis=0)[0:tile]

    def dft(basis_ref):
        # rows are 160 real samples zero-padded to 256 lanes; contracting
        # the full 256 against 256-row basis blocks (zeros past 160) keeps
        # every matmul operand tile-aligned
        return (
            jnp.dot(a, basis_ref[0:ROW, :],
                    preferred_element_type=jnp.float32)
            + jnp.dot(b_rows, basis_ref[ROW:2 * ROW, :],
                      preferred_element_type=jnp.float32)
            + jnp.dot(c_rows, basis_ref[2 * ROW:3 * ROW, :],
                      preferred_element_type=jnp.float32))

    re = dft(cos_ref)
    im = dft(sin_ref)
    nfft = 2 * (cos_ref.shape[1] - 1)
    power = (re * re + im * im) * (1.0 / nfft)
    feat = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(feat, _EPS))


def _cmvn_kernel(valid_ref, feat_ref, out_ref):
    """Per-utterance CMVN entirely in VMEM: one HBM read + one write
    (audio.fbank.cmvn semantics bit for bit — masked stats, std==0 -> 1,
    sklearn's second centering, zeroed padding rows)."""
    x = feat_ref[0]                                     # [T, F]
    n = valid_ref[pl.program_id(0)]
    mask = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            < n).astype(x.dtype)
    cnt = jnp.maximum(n.astype(x.dtype), 1.0)
    xm = x * mask
    mean = jnp.sum(xm, axis=0, keepdims=True) / cnt
    var = jnp.sum(((x - mean) ** 2) * mask, axis=0, keepdims=True) / cnt
    std = jnp.sqrt(var)
    std = jnp.where(std == 0.0, 1.0, std)
    out = (x - mean) / std
    mean2 = jnp.sum(out * mask, axis=0, keepdims=True) / cnt
    out_ref[0] = (out - mean2) * mask


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_cmvn(feat: jnp.ndarray, valid: jnp.ndarray,
                interpret: bool | None = None) -> jnp.ndarray:
    """[B, T, F] features + [B] valid frame counts -> normalized [B, T, F].

    Replaces ``jax.vmap(cmvn)`` in the Pallas fbank path: XLA lowers the
    masked mean/var/normalize/re-center chain to multiple HBM passes over
    the [B, T, F] tensor; here the whole utterance (<=1600x200 f32 =
    1.25 MB) sits in VMEM for one read and one write.

    ``interpret=None`` auto-interprets off TPU, like every other kernel
    entry point in this package.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, f = feat.shape
    return pl.pallas_call(
        _cmvn_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # valid [B]
            pl.BlockSpec((1, t, f), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, f), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, f), feat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * t * f, bytes_accessed=2 * b * t * f * 4,
            transcendentals=0),
        interpret=interpret,
    )(valid.astype(jnp.int32), feat)


@functools.partial(jax.jit, static_argnames=("cfg", "out_frames", "interpret"))
def pallas_log_mel(signals: jnp.ndarray, lengths: jnp.ndarray,
                   out_frames: int,
                   cfg: FbankConfig = FbankConfig(),
                   interpret: bool | None = None) -> jnp.ndarray:
    """[B, S] RAW signals + [B] sample lengths -> [B, out_frames, nfilt]
    log-mel. Pre-emphasis and the boundary mask run inside the kernel.

    ``out_frames`` is rounded up to a multiple of 8 (and split into equal
    <=MAX_TILE-frame tiles) internally and the result sliced back.
    ``interpret=None`` auto-interprets off TPU, like every other kernel
    entry point in this package.
    """
    assert cfg.win_len == WIN and cfg.hop == HOP, "kernel fixed to 400/160"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s = signals.shape
    # Tile = up to MAX_TILE frames per grid step (the whole utterance when
    # it fits): M=800 matmuls keep the MXU fed and amortize per-step grid
    # overhead; larger tiles blow the 16MB scoped-VMEM stack (the shifted
    # row views + re/im/power temporaries are ~11KB/frame).
    t8 = -(-out_frames // 8) * 8
    t_tiles = -(-t8 // MAX_TILE)
    tile = -(-(-(-t8 // t_tiles)) // 8) * 8
    t_all = tile * t_tiles
    rows_total = t_all + 8   # +1 leading zero + 2 shifted rows, 8-aligned
    need = (rows_total - 1) * HOP
    if s < need:
        signals = jnp.pad(signals, ((0, 0), (0, need - s)))
    else:
        signals = signals[:, :need]
    sig_rows = signals.reshape(b, rows_total - 1, HOP)
    # one global leading zero row: buffer row j <-> signal row j-1, so
    # every tile's DMA window carries its previous row (the pre-emphasis
    # x[t-1] source) at an 8-aligned offset
    sig_rows = jnp.pad(sig_rows, ((0, 0), (1, 0), (0, 0)))
    # pad each 160-sample row to 256 lanes so HBM->VMEM DMA slices are
    # tile-aligned (Mosaic requires the minor dim % 128 == 0)
    sig_rows = jnp.pad(sig_rows, ((0, 0), (0, 0), (0, ROW - HOP)))

    cos_b, sin_b = _dft_bases_np(cfg.win_len, cfg.nfft)
    mel = mel_filterbank(cfg)
    nbins = cos_b.shape[1]

    def block_basis(basis):
        # [400, nbins] -> [3*ROW, nbins]: per-row-shift blocks, each the
        # basis rows that multiply that row's 160 real samples, zero-padded
        # to 256 so the in-kernel contraction is over aligned tiles
        blocks = []
        for blk in range(3):
            lo = blk * HOP
            hi = min(WIN, lo + HOP)
            part = basis[lo:hi]
            pad = np.zeros((ROW - part.shape[0], basis.shape[1]),
                           basis.dtype)
            blocks.append(np.concatenate([part, pad], axis=0))
        return np.concatenate(blocks, axis=0)

    cos_blocks = block_basis(cos_b)
    sin_blocks = block_basis(sin_b)

    out = pl.pallas_call(
        functools.partial(_kernel, preemph=float(cfg.preemph)),
        grid=(b, t_tiles),
        in_specs=[
            # per-utterance sample counts: scalars in SMEM, indexed by
            # program id (a (1, 8) VMEM block violates the 8-sublane rule)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # ANY-space inputs must be whole-array blocks; the kernel DMAs
            # the (batch, tile) slices itself via program_id
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * ROW, nbins), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * ROW, nbins), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbins, cfg.nfilt), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, cfg.nfilt),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_all, cfg.nfilt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 8, ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_all * WIN * nbins * 2
            + 2 * b * t_all * nbins * cfg.nfilt,
            bytes_accessed=b * need * 4 * 8 // 5
            + b * t_all * cfg.nfilt * 4,
            transcendentals=b * t_all * cfg.nfilt,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), sig_rows, jnp.asarray(cos_blocks),
      jnp.asarray(sin_blocks), jnp.asarray(mel))
    return out[:, :out_frames, :]
