"""Per-stage slope-timed profile of the TransformerLM inference forward.

bench.py's `lm_only` config (b128, seq 64) measures 7.3 ms at 48% MFU —
low for a chain of [8192, 512] x [512, 512|2048] matmuls that should sit
near the MXU peak. This script isolates where the non-matmul half goes:
embedding, one attention block (whole / matmuls-only / softmax+mask
overhead), one FFN block, the 12-block stack, and the final f32 vocab
projection. Slope-timed (bench._scan_time) for the tunneled backend's
three measurement traps.

Prints one JSON object per experiment; record results in DESIGN.md §9.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def profile_stages(batch=128, seq=64, smoke=False):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.models.layers import (FeedForward,
                                                         MultiHeadAttention,
                                                         attention_mask)
    from asr_dfcnn_transformer_tpu.models.transformer_lm import TransformerLM

    if smoke:
        batch, seq, d, heads, blocks, vin, vout = 2, 8, 16, 2, 2, 32, 48
    else:
        d, heads, blocks, vin, vout = 512, 8, 12, 1536, 6345
    key = jax.random.PRNGKey(0)
    out = {}

    def slope(label, mod, x0, iters=60, apply_kw=None):
        params = mod.init(jax.random.PRNGKey(1), x0, **(apply_kw or {}))

        def fwd(x, i):
            return mod.apply(params, x, **(apply_kw or {}))

        dt, _ = bench._scan_time(fwd, x0, iters=iters)
        out[label] = round(1e3 * dt, 3)
        return dt

    ids0 = jax.random.randint(key, (batch, seq), 3, vin - 1, jnp.int32)
    x0 = jnp.asarray(0.1 * jax.random.normal(key, (batch, seq, d)),
                     jnp.bfloat16)

    # 1) the full model, for the stage cross-check
    lm = TransformerLM(vin, vout, d_model=d, num_heads=heads,
                       num_blocks=blocks, dropout_rate=0.0)
    slope("full_lm", lm, ids0, iters=30, apply_kw={"train": False})

    # 2) embedding front (token embed + pos embed)
    class Front(nn.Module):
        @nn.compact
        def __call__(self, ids, train=False):
            from asr_dfcnn_transformer_tpu.models.layers import (
                LearnedPositionEmbed, ScaledEmbed)
            x = ScaledEmbed(vin, d, dtype=jnp.bfloat16)(ids)
            return x + LearnedPositionEmbed(100, d, dtype=jnp.bfloat16)(
                ids.shape[1])

    slope("embed_front", Front(), ids0)

    # 3) one parity attention block, causal mask (the LM's configuration)
    valid = jnp.ones((batch, seq), jnp.bool_)
    mask = attention_mask(valid, valid, causal=True)

    class AttnBlock(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return MultiHeadAttention(d, heads, parity=True,
                                      dtype=jnp.bfloat16)(
                x, x, mask=mask, deterministic=True)

    slope("attn_block_causal", AttnBlock(), x0)

    # 3b) the same block without the mask (isolates the mask add)
    class AttnBlockNoMask(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return MultiHeadAttention(d, heads, parity=True,
                                      dtype=jnp.bfloat16)(
                x, x, deterministic=True)

    slope("attn_block_nomask", AttnBlockNoMask(), x0)

    # 3c) matmuls only: QKVO projections + the two einsums, no softmax /
    # mask / layernorm / residual — the MXU floor of one block
    class AttnMatmuls(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            b, t, _ = x.shape
            dh = d // heads
            q = nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(x)
            k = nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(x)
            v = nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(x)
            q = q.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
            k = k.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
            v = v.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            o = jnp.einsum("bhqk,bhkd->bhqd", s.astype(jnp.bfloat16), v)
            o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
            return nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(o)

    slope("attn_matmuls_only", AttnMatmuls(), x0)

    # 3d) transpose-free layout: einsum contracts directly from
    # [B, T, H, Dh] (batch dims (b, h) with h non-leading) and the output
    # collapses [B, Q, H, Dh] -> [B, Q, D] as a free contiguous reshape —
    # no materialized head transposes
    class AttnMatmulsNoTranspose(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            b, t, _ = x.shape
            dh = d // heads
            q = nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(x)
            k = nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(x)
            v = nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(x)
            q = q.reshape(b, t, heads, dh)
            k = k.reshape(b, t, heads, dh)
            v = v.reshape(b, t, heads, dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            o = jnp.einsum("bhqk,bkhd->bqhd", s.astype(jnp.bfloat16), v)
            o = o.reshape(b, t, d)
            return nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(o)

    slope("attn_matmuls_notranspose", AttnMatmulsNoTranspose(), x0)

    # 3e) the full block in the transpose-free layout (softmax + mask +
    # residual + LN + parity ReLUs kept)
    class AttnBlockNoTranspose(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            b, t, _ = x.shape
            dh = d // heads
            q = nn.relu(nn.Dense(d, use_bias=False,
                                 dtype=jnp.bfloat16)(x))
            k = nn.relu(nn.Dense(d, use_bias=False,
                                 dtype=jnp.bfloat16)(x))
            v = nn.relu(nn.Dense(d, use_bias=False,
                                 dtype=jnp.bfloat16)(x))
            q = q.reshape(b, t, heads, dh)
            k = k.reshape(b, t, heads, dh)
            v = v.reshape(b, t, heads, dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            s = s / jnp.sqrt(jnp.asarray(dh, jnp.float32)) + mask
            p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
            o = nn.relu(nn.Dense(d, use_bias=False, dtype=jnp.bfloat16)(o))
            return nn.LayerNorm(dtype=jnp.bfloat16)(o + x)

    slope("attn_block_notranspose", AttnBlockNoTranspose(), x0)

    # 4) one FFN block (Dense 4d + ReLU + Dense d + residual + LN)
    class FFN(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return FeedForward(d, dtype=jnp.bfloat16)(x,
                                                      deterministic=True)

    slope("ffn_block", FFN(), x0)

    # 4b) FFN matmuls only
    class FFNMatmuls(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            y = nn.Dense(4 * d, dtype=jnp.bfloat16)(x)
            return nn.Dense(d, dtype=jnp.bfloat16)(nn.relu(y))

    slope("ffn_matmuls_only", FFNMatmuls(), x0)

    # 5) the final f32 vocab projection
    class VocabProj(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(vout, dtype=jnp.float32)(x)

    slope("vocab_proj_f32", VocabProj(), x0)

    n = blocks
    block_sum = n * (out["attn_block_causal"] + out["ffn_block"])
    out["stages_sum_estimate"] = round(
        out["embed_front"] + block_sum + out["vocab_proj_f32"], 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=64)
    args = ap.parse_args()
    from tools._measure_common import setup_device
    setup_device(args.cpu)
    print(json.dumps({"lm_fwd_stages": profile_stages(
        batch=args.batch, seq=args.seq, smoke=args.smoke)}))


if __name__ == "__main__":
    main()
