"""Per-stage slope-timed profile of the SE-DFCNN inference forward.

DESIGN.md §9 bills the pipeline's 30 ms AM forward (b128, worst-case
1600-frame utterances) to "the HBM-bound stage 1", an attribution
inherited from the TRAIN-step analysis. This script measures where the
inference forward actually goes, stage by stage in isolation (bench.py's
slope timing — the only methodology that survives the tunneled backend's
three traps), plus the one suspected non-HBM cost: the final logits
Dense runs in f32 (`models/dfcnn.py` ``nn.Dense(vocab, dtype=f32)``),
which at [128*200, 6400] x [6400, 1536] is ~503 GFLOPs at the v5e's
~4x-slower f32 MXU rate.

Prints one JSON object per experiment; record results in DESIGN.md §9.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def profile_stages(batch=128, smoke=False):
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.models.dfcnn import SEDFCNN
    from asr_dfcnn_transformer_tpu.models.layers import (ConvBnCell,
                                                         SqueezeExcite)

    if smoke:
        batch, t, f = 2, 64, 16
    else:
        t, f = bench.FRAMES, 200
    vocab = 16 if smoke else 1536
    key = jax.random.PRNGKey(0)

    out = {}

    def slope(label, mod, shape, dtype=jnp.bfloat16, apply_kw=None):
        x0 = 0.1 * jax.random.normal(key, shape, jnp.float32)
        x0 = jnp.asarray(x0, dtype)
        params = mod.init(jax.random.PRNGKey(1), x0, **(apply_kw or {}))

        def fwd(x, i):
            return mod.apply(params, x, **(apply_kw or {}))

        dt, _ = bench._scan_time(fwd, x0, iters=30)
        out[label] = round(1e3 * dt, 3)
        return dt

    c1 = 32 if not smoke else 8
    c2, c3 = (64, 128) if not smoke else (8, 8)

    # stage 1 split: the pooled full-res cell vs the rest of the stage
    slope("cell1_pooled_fullres", ConvBnCell(c1, pool=True, pool_type="avg"),
          (batch, t, f, 1))

    import flax.linen as nn

    class Stage1Rest(nn.Module):
        feats: int

        @nn.compact
        def __call__(self, h, train=False):
            h2 = ConvBnCell(self.feats, pool=False, pool_type="avg")(h, train)
            return h + SqueezeExcite(self.feats, 1)(h2, train)

    class Stage(nn.Module):
        feats: int

        @nn.compact
        def __call__(self, x, train=False):
            h = ConvBnCell(self.feats, pool=True, pool_type="avg")(x, train)
            h2 = ConvBnCell(self.feats, pool=False, pool_type="avg")(h, train)
            return h + SqueezeExcite(self.feats, 2)(h2, train)

    class Tail(nn.Module):
        """Stages 4+5 (unpooled) + head cell.

        NOTE (round-4 correction): each SEDFCNN stage runs TWO ConvBnCells
        (the pool=False stages too — models/dfcnn.py stage body), so the
        earlier Tail that modeled one cell per stage undercounted ~378
        GFLOPs; its 4.0 ms reading was for half the stage convs, which is
        what the ledger had billed to "reshape/dropout glue"."""
        feats: int
        head: int

        @nn.compact
        def __call__(self, x, train=False):
            for _ in range(2):
                h = ConvBnCell(self.feats, pool=False,
                               pool_type="avg")(x, train)
                h2 = ConvBnCell(self.feats, pool=False,
                                pool_type="avg")(h, train)
                x = h + SqueezeExcite(self.feats, 2)(h2, train)
            return ConvBnCell(self.head)(x, train)

    from asr_dfcnn_transformer_tpu.models.dfcnn import _logits_dense

    class LogitsDense(nn.Module):
        vocab: int
        matmul: str = "f32"

        @nn.compact
        def __call__(self, x, train=False):
            return _logits_dense(self.vocab, self.matmul)(x)

    t2, f2 = t // 2, f // 2
    t4, f4 = t // 4, f // 4
    t8, f8 = t // 8, f // 8
    slope("stage1_rest", Stage1Rest(c1), (batch, t2, f2, c1))
    slope("stage2", Stage(c2), (batch, t2, f2, c1))
    slope("stage3", Stage(c3), (batch, t4, f4, c2))
    slope("stages45_head", Tail(c3, 256 if not smoke else 16),
          (batch, t8, f8, c3))
    head_c = 256 if not smoke else 16
    # the logits head is fed bf16 activations by the conv stack
    slope("logits_dense_f32", LogitsDense(vocab, "f32"),
          (batch, t8, f8 * head_c))
    slope("logits_dense_bf16acc32", LogitsDense(vocab, "bf16"),
          (batch, t8, f8 * head_c))

    # the whole model both ways, for the cross-check that stages sum to
    # ~total and the end-to-end win of the logits_matmul flag
    small = dict(stage_features=(8, 8, 8, 8, 8), head_features=16)
    for mm in ("f32", "bf16"):
        kw = dict(vocab_size=vocab, logits_matmul=mm)
        if smoke:
            kw.update(small)
        slope(f"full_sedfcnn_logits_{mm}", SEDFCNN(**kw), (batch, t, f, 1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    from tools._measure_common import setup_device
    setup_device(args.cpu)
    print(json.dumps({"am_fwd_stages": profile_stages(
        batch=args.batch if not args.smoke else 2, smoke=args.smoke)}))


if __name__ == "__main__":
    main()
