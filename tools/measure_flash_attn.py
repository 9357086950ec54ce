"""Measure masked_flash_attention vs the einsum path on the TPU.

MODEL-LEVEL A/B comparisons (slope-timed, bench._scan_time): the round-4
first cut of this tool compared standalone attention blocks with a
closure-constant ``k_valid`` — XLA constant-folded the einsum path's mask
to nothing, making those numbers unusable. Every comparison here runs a
REAL model forward (or forward+param-grad) with data-dependent lengths,
the same program shape the trainers and pipeline execute:

- full TransformerLM inference forward (the lm_only bench config)
- CTCAttention model forward (b32, 200 LFR frames)
- SpeechTransformer teacher-forced forward at b8 (reference cadence) and
  b64 (saturating), plus forward+param-grad at b64 with train=True
  (dropout active — the kernel's dropout-mask input vs flax Dropout)

Record results in DESIGN.md §9 and encode the crossover in
``ops/pallas/attn_kernel.py:flash_wins``.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def measure(smoke=False, only=None):
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.models.ctc_attention import CTCAttention
    from asr_dfcnn_transformer_tpu.models.speech_transformer import (
        SpeechTransformer)
    from asr_dfcnn_transformer_tpu.models.transformer_lm import TransformerLM

    out = {}
    key = jax.random.PRNGKey(0)

    def record(label, dt):
        out[label] = round(1e3 * dt, 4)
        print(json.dumps({label: out[label]}), flush=True)

    def want(label):
        return not only or only in label

    # ---- full LM forward (the lm_only bench config) ----
    if want("full_lm"):
        b, t = (2, 8) if smoke else (128, 64)
        ids = jax.random.randint(key, (b, t), 3, 40 if smoke else 1535,
                                 jnp.int32)
        # PAD tails make the mask data-dependent, like the pipeline feed
        ids = jnp.where(jnp.arange(t)[None, :]
                        < (t - jnp.arange(b)[:, None] % 4), ids, 0)
        for backend in ("einsum", "pallas"):
            lm = (TransformerLM(48, 64, d_model=16, num_heads=2,
                                num_blocks=2, dropout_rate=0.0,
                                fused_attention=backend) if smoke else
                  TransformerLM(1536, 6345, dropout_rate=0.0,
                                fused_attention=backend))
            params = lm.init(jax.random.PRNGKey(2), ids)

            def fwd(ids, i):
                return lm.apply(params, ids, train=False)

            dt, _ = bench._scan_time(fwd, ids, iters=4 if smoke else 30)
            record(f"full_lm_{backend}", dt)
    if smoke:
        return out

    # ---- CTCAttention forward (b32, 200 LFR frames x 320 feats) ----
    if want("atten"):
        x = jnp.asarray(0.1 * jax.random.normal(key, (32, 200, 320, 1)),
                        jnp.bfloat16)
        for backend in ("einsum", "pallas"):
            m = CTCAttention(1536, dropout_rate=0.0,
                             fused_attention=backend)
            params = m.init(jax.random.PRNGKey(3), x)

            def fwd(x, i):
                # lengths derived INSIDE the traced body — a closure
                # constant here lets XLA constant-fold the einsum path's
                # mask arithmetic away (CLAUDE.md benchmarking trap #4)
                vf = jnp.clip(
                    (jnp.abs(x[:, 0, 0, 0].astype(jnp.float32)) * 1e4)
                    .astype(jnp.int32) % 1600 + 1, 160, 1600)
                return m.apply(params, x, vf, train=False)

            dt, _ = bench._scan_time(fwd, x, iters=20)
            record(f"atten_fwd_b32_{backend}", dt)

    # ---- SpeechTransformer ----
    def e2e_inputs(b):
        feats = jnp.asarray(
            0.1 * jax.random.normal(key, (b, 400, 320, 1)), jnp.bfloat16)
        dec0 = jax.random.randint(jax.random.PRNGKey(4), (b, 64), 3, 6000,
                                  jnp.int32)
        return feats, dec0

    def e2e_traced_io(feats, dec0):
        # valid lengths and decoder PAD tails derived INSIDE the traced
        # body — closure constants here let XLA constant-fold the einsum
        # path's mask arithmetic away (CLAUDE.md benchmarking trap #4);
        # dec token values may stay constant, only the PAD geometry (the
        # mask source, dec != 0) must be data-dependent
        h = (jnp.abs(feats[:, 0, 0, 0].astype(jnp.float32)) * 1e4) \
            .astype(jnp.int32)
        fv = jnp.clip(h % 1600 + 1, 160, 1600)
        dec = jnp.where(jnp.arange(64)[None, :]
                        < (64 - h[:, None] % 7), dec0, 0)
        return fv, dec

    for b, iters in ((8, 20), (64, 8)):
        if not want(f"e2e_fwd_b{b}"):
            continue
        feats, dec0 = e2e_inputs(b)
        fv0 = jnp.full((1,), 1600, jnp.int32)
        for backend in ("einsum", "pallas"):
            m = SpeechTransformer(6347, dropout_rate=0.0,
                                  fused_attention=backend)
            params = m.init(jax.random.PRNGKey(5), feats[:1], fv0,
                            dec0[:1])

            def fwd(feats, i):
                fv, dec = e2e_traced_io(feats, dec0)
                return m.apply(params, feats, fv, dec, train=False)

            dt, _ = bench._scan_time(fwd, feats, iters=iters)
            record(f"e2e_fwd_b{b}_{backend}", dt)

    # forward + parameter gradients, train=True (attention dropout active:
    # flax Dropout on the einsum path vs the kernel's dropout-mask input)
    if want("e2e_grad_b64"):
        feats, dec0 = e2e_inputs(64)
        fv0 = jnp.full((1,), 1600, jnp.int32)
        for backend in ("einsum", "pallas"):
            m = SpeechTransformer(6347, dropout_rate=0.1,
                                  fused_attention=backend)
            variables = m.init(jax.random.PRNGKey(5), feats[:1], fv0,
                               dec0[:1])

            def fwd(feats, i):
                fv, dec = e2e_traced_io(feats, dec0)
                def loss(p):
                    lg, _ = m.apply(
                        {**variables, "params": p}, feats, fv, dec,
                        train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(6)})
                    return jnp.sum(lg.astype(jnp.float32) ** 2) * 1e-9
                return jax.grad(loss)(variables["params"])

            dt, _ = bench._scan_time(fwd, feats, iters=6)
            record(f"e2e_grad_b64_{backend}", dt)

    # ---- fused FFN kernel: block-level and model-level A/B ----
    if want("ffn"):
        from asr_dfcnn_transformer_tpu.models.layers import FeedForward
        for n_rows, seq in ((2048, 16), (8192, 64), (25600, 200)):
            x = jnp.asarray(
                0.1 * jax.random.normal(key, (n_rows // seq, seq, 512)),
                jnp.bfloat16)
            for backend in ("einsum", "pallas"):
                ffn = FeedForward(512, fused=backend)
                params = ffn.init(jax.random.PRNGKey(9), x)

                def fwd(x, i):
                    return ffn.apply(params, x)

                dt, _ = bench._scan_time(fwd, x, iters=40)
                record(f"ffn_n{n_rows}_{backend}", dt)
        # whole LM with the attention backend pinned to auto on both sides
        ids = jax.random.randint(key, (128, 64), 3, 1535, jnp.int32)
        ids = jnp.where(jnp.arange(64)[None, :]
                        < (64 - jnp.arange(128)[:, None] % 4), ids, 0)
        for backend in ("einsum", "pallas"):
            lm = TransformerLM(1536, 6345, dropout_rate=0.0,
                               fused_ffn=backend)
            params = lm.init(jax.random.PRNGKey(2), ids)

            def fwd(ids, i):
                return lm.apply(params, ids, train=False)

            dt, _ = bench._scan_time(fwd, ids, iters=30)
            record(f"full_lm_ffn_{backend}", dt)

    # LM forward + parameter gradients, train=True (dropout 0.5 — the
    # reference's rate, hparams.py:33)
    if want("lm_grad_b64"):
        ids = jax.random.randint(key, (64, 64), 3, 1535, jnp.int32)
        ids = jnp.where(jnp.arange(64)[None, :]
                        < (64 - jnp.arange(64)[:, None] % 4), ids, 0)
        for backend in ("einsum", "pallas"):
            lm = TransformerLM(1536, 6345, dropout_rate=0.5,
                               fused_attention=backend)
            params = lm.init(jax.random.PRNGKey(7), ids)

            def fwd(ids, i):
                def loss(p):
                    lg = lm.apply(p, ids, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(8)})
                    return jnp.sum(lg.astype(jnp.float32) ** 2) * 1e-9
                return jax.grad(loss)(params)

            dt, _ = bench._scan_time(fwd, ids, iters=10)
            record(f"lm_grad_b64_{backend}", dt)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--only", default=None,
                    help="substring filter on config labels")
    args = ap.parse_args()
    from tools._measure_common import setup_device
    setup_device(args.cpu)
    print(json.dumps({"flash_attn": measure(smoke=args.smoke,
                                            only=args.only)}))


if __name__ == "__main__":
    main()
