"""On-hardware measurement for the pending ``auto`` crossovers.

Two round-4 features ship with an exactness-tested fast path that
``auto`` does NOT yet select, pending a real-TPU measurement (the
FbankConfig auto-crossover convention — never flip a default on an
estimate):

1. ``models/speech_transformer.py:Stride2Conv(layout="pack")`` — the
   e2e pre-net's C_in=1 3x3 stride-2 conv re-expressed as a 2x2x4
   stride-1 conv on space-to-depth-packed input (4x contraction depth).
2. ``ops/matfft.py:irfft_matmul(epilogue="pallas")`` — the iFFT's two
   XLA relayout passes fused into one read-z/write-x Pallas kernel
   (``ops/pallas/fft_epilogue.py``).

Run ``python tools/measure_autos.py`` on the TPU; it slope-times each
variant at the shapes the benchmarks actually use (bench.py's
methodology — see its module docstring for the three tunneled-backend
traps this defeats) and prints one JSON object per experiment. Flip the
``auto`` resolution at the two marked sites once the winner is measured,
and record the numbers in DESIGN.md §9.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench.py: _scan_time + constants)


def _ratio(num_dt: float, den_dt: float):
    """Speedup from RAW slope-timed seconds (never the rounded ms — a
    fast variant that rounds to 0.0 ms would ZeroDivisionError away the
    whole session); None when either slope is non-positive (noise-level
    work: the two-scan difference can legitimately come out <= 0)."""
    if num_dt <= 0 or den_dt <= 0:
        return None
    return round(num_dt / den_dt, 2)


def measure_stride2conv(batches=(8, 64), smoke=False):
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.models.speech_transformer import (
        Stride2Conv)

    t_frames, f_dim = (64, 16) if smoke else (bench.FRAMES, 80)
    out = {}
    for b in batches:
        x0 = jnp.asarray(
            0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                    (b, t_frames, f_dim, 1)), jnp.float32)
        dts = {}
        for layout in ("plain", "pack"):
            mod = Stride2Conv(64, layout=layout)
            params = mod.init(jax.random.PRNGKey(1), x0)

            def fwd(x, i):
                return mod.apply(params, x)

            def fwdbwd(x, i):
                # params-only grad: this is the FIRST layer, so a real
                # train step never computes dL/dx here — including it
                # (argnums=(0, 1)) would add a dgrad conv whose cost
                # differs between the two layouts and skew the crossover
                def loss(p):
                    y = mod.apply(p, x)
                    return jnp.sum(jnp.square(y.astype(jnp.float32)))
                return jax.grad(loss)(params)

            dt_f, _ = bench._scan_time(fwd, x0, iters=60)
            dt_g, _ = bench._scan_time(fwdbwd, x0, iters=60)
            dts[layout] = (dt_f, dt_g)
            out[f"b{b}_{layout}"] = {"fwd_ms": round(1e3 * dt_f, 3),
                                     "fwdbwd_ms": round(1e3 * dt_g, 3)}
        out[f"b{b}_speedup"] = {
            "fwd": _ratio(dts["plain"][0], dts["pack"][0]),
            "fwdbwd": _ratio(dts["plain"][1], dts["pack"][1])}
    return out


def measure_fft_epilogue(batch=128, smoke=False):
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.ops.matfft import irfft_matmul

    if smoke:
        batch = 2
    n = 1024 if smoke else 262144  # noise path: next pow2 >= N_SAMPLES
    nbins = n // 2 + 1
    spec = jnp.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                         (2, batch, nbins)), jnp.float32)
    out, dts = {}, {}
    for ep in ("xla", "pallas"):
        def body(s, i, ep=ep):
            return jax.vmap(lambda r, m: irfft_matmul(
                r, m, n, compute_dtype=jnp.bfloat16, epilogue=ep))(
                    s[0], s[1])

        dt, _ = bench._scan_time(body, spec, iters=30)
        dts[ep] = dt
        out[ep + "_ms"] = round(1e3 * dt, 3)
    out["speedup"] = _ratio(dts["xla"], dts["pallas"])
    return out


def measure_topk(batch=128, smoke=False):
    """XLA k-sweep vs single-load Pallas kernel (`topk_kernel.topk_wins`),
    isolated at the beam pre-prune shape AND model-level through the full
    beam decode (CLAUDE.md trap #4: lengths derived from the traced
    tensor, never closure constants)."""
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.ops import ctc_decode
    from asr_dfcnn_transformer_tpu.ops.pallas import topk_kernel

    b, t, v = (2, 16, 96) if smoke else (batch, 200, 1536)
    k = 8
    x0 = jnp.asarray(jax.random.normal(jax.random.PRNGKey(0), (b, t, v)),
                     jnp.float32)
    out, dts = {}, {}
    for name, fn in (("xla", lambda x, i: ctc_decode._topk_last_xla(x, k)),
                     ("pallas", lambda x, i: topk_kernel.topk_last(x, k))):
        dt, _ = bench._scan_time(fn, x0, iters=30)
        dts[name] = dt
        out[name + "_ms"] = round(1e3 * dt, 3)
    out["speedup"] = _ratio(dts["xla"], dts["pallas"])

    # model level: the whole beam decode (its own jit per variant — the
    # decode entry is jitted at module scope, so a monkeypatched
    # _topk_last would otherwise be invisible to its trace cache)
    import functools as ft
    raw = ctc_decode.ctc_beam_search_decode.__wrapped__
    orig = ctc_decode._topk_last
    for name, impl in (("xla", ctc_decode._topk_last_xla),
                       ("pallas",
                        lambda x, kk: topk_kernel.topk_last(x, kk))):
        ctc_decode._topk_last = impl
        try:
            jit_fn = jax.jit(ft.partial(raw, beam_width=8, topk=k,
                                        backend="pallas"))

            def body(x, i):
                lens = (jnp.sum(jnp.abs(x[:, :, 0]), axis=-1)
                        .astype(jnp.int32) % t + 1)
                ids, lengths, nlp = jit_fn(x, lens)
                return ids, lengths, nlp

            dt, _ = bench._scan_time(body, x0, iters=10)
            dts["beam_" + name] = dt
            out["beam_" + name + "_ms"] = round(1e3 * dt, 3)
        finally:
            ctc_decode._topk_last = orig
    out["beam_speedup"] = _ratio(dts["beam_xla"], dts["beam_pallas"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all",
                    choices=["all", "stride2conv", "fft_epilogue", "topk"])
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (harness smoke-test only)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (harness smoke-test only)")
    args = ap.parse_args()
    from tools._measure_common import setup_device
    setup_device(args.cpu)
    if args.which in ("all", "stride2conv"):
        print(json.dumps(
            {"stride2conv": measure_stride2conv(smoke=args.smoke)}))
    if args.which in ("all", "fft_epilogue"):
        print(json.dumps(
            {"fft_epilogue": measure_fft_epilogue(smoke=args.smoke)}))
    if args.which in ("all", "topk"):
        print(json.dumps({"topk": measure_topk(smoke=args.smoke)}))


if __name__ == "__main__":
    main()
