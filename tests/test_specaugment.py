"""SpecAugment: mask geometry, valid-length confinement, trainer wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.audio import SpecAugmentConfig, spec_augment


def _masked_cols(x, out):
    """Column (freq) indices fully masked to 0 across all frames."""
    return np.where(np.all(np.asarray(out) == 0.0, axis=0))[0]


class TestSpecAugment:
    def test_shapes_dtype_and_nhwc(self):
        key = jax.random.PRNGKey(0)
        x = jnp.ones((3, 50, 20), jnp.float32)
        out = spec_augment(key, x)
        assert out.shape == x.shape and out.dtype == x.dtype
        x4 = x[..., None]
        out4 = spec_augment(key, x4)
        assert out4.shape == x4.shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out4[..., 0]))

    def test_masks_are_bands_and_bounded(self):
        key = jax.random.PRNGKey(1)
        cfg = SpecAugmentConfig(num_freq_masks=2, max_freq_width=5,
                                num_time_masks=2, max_time_width=7,
                                max_time_frac=1.0)
        b, t, f = 8, 64, 32
        x = jnp.ones((b, t, f), jnp.float32)
        out = np.asarray(spec_augment(key, x, cfg=cfg))
        assert set(np.unique(out)) <= {0.0, 1.0}
        for bi in range(b):
            # freq bands: columns zero across ALL rows
            col = np.all(out[bi] == 0.0, axis=0)
            # time bands: rows zero across ALL cols
            row = np.all(out[bi] == 0.0, axis=1)
            assert col.sum() <= 2 * 5
            assert row.sum() <= 2 * 7
            # each is a union of <=2 contiguous bands -> at most 2 runs
            for m, k in ((col, 2), (row, 2)):
                runs = np.diff(np.concatenate([[0], m.astype(int), [0]]))
                assert (runs == 1).sum() <= k

    def test_unmasked_entries_untouched(self):
        key = jax.random.PRNGKey(2)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 40, 16),
                        jnp.float32)
        out = np.asarray(spec_augment(key, x))
        xin = np.asarray(x)
        changed = out != xin
        # every changed entry is exactly mask_value
        assert np.all(out[changed] == 0.0)
        # and something actually got masked with the default policy
        assert changed.any()

    def test_time_masks_confined_to_valid(self):
        key = jax.random.PRNGKey(3)
        cfg = SpecAugmentConfig(num_freq_masks=0, num_time_masks=3,
                                max_time_width=50, max_time_frac=0.5)
        b, t, f = 6, 100, 12
        x = jnp.ones((b, t, f), jnp.float32)
        valid = jnp.asarray([100, 80, 40, 10, 1, 0], jnp.int32)
        for trial in range(5):
            k = jax.random.fold_in(key, trial)
            out = np.asarray(spec_augment(k, x, valid, cfg))
            for bi, v in enumerate(np.asarray(valid)):
                # nothing masked at/after the valid length
                assert np.all(out[bi, v:] == 1.0)
                # per-mask width <= frac * valid
                row = np.all(out[bi] == 0.0, axis=1)
                assert row.sum() <= 3 * int(0.5 * v)

    def test_freq_only_and_time_only(self):
        key = jax.random.PRNGKey(4)
        x = jnp.ones((2, 30, 20), jnp.float32)
        fo = np.asarray(spec_augment(
            key, x, cfg=SpecAugmentConfig(num_time_masks=0,
                                          max_freq_width=4)))
        # freq-only: masked pattern identical on every frame
        assert np.all(fo == fo[:, :1, :])
        to = np.asarray(spec_augment(
            key, x, cfg=SpecAugmentConfig(num_freq_masks=0,
                                          max_time_width=4,
                                          max_time_frac=1.0)))
        assert np.all(to == to[:, :, :1])

    def test_mask_value_and_determinism(self):
        key = jax.random.PRNGKey(5)
        cfg = SpecAugmentConfig(mask_value=-7.0, max_freq_width=6)
        x = jnp.ones((2, 30, 20), jnp.float32)
        a = np.asarray(spec_augment(key, x, cfg=cfg))
        b = np.asarray(spec_augment(key, x, cfg=cfg))
        np.testing.assert_array_equal(a, b)
        if (a != 1.0).any():
            assert np.all(a[a != 1.0] == -7.0)

    def test_jit_and_per_utterance_independence(self):
        key = jax.random.PRNGKey(6)
        x = jnp.ones((8, 64, 32), jnp.float32)
        f = jax.jit(lambda k, x: spec_augment(k, x))
        out = np.asarray(f(key, x))
        assert out.shape == x.shape
        # masks differ across the batch (overwhelmingly likely)
        assert any(not np.array_equal(out[0], out[i]) for i in range(1, 8))


def _am_batch(b=8, bucket=128):
    from asr_dfcnn_transformer_tpu.data.loader import AMBatch
    s = (bucket - 1) * 160 + 400
    sig = np.random.default_rng(0).standard_normal((b, s)).astype(np.float32)
    tile = lambda row: np.tile(np.array([row + [0] * 61], np.int32), (b, 1))
    return AMBatch(signals=sig,
                   signal_lengths=np.full((b,), s, np.int32),
                   frame_lengths=np.full((b,), bucket, np.int32),
                   pinyin=tile([3, 4, 5]),
                   pinyin_lengths=np.full((b,), 3, np.int32),
                   hanzi=tile([6, 7, 8]),
                   hanzi_lengths=np.full((b,), 3, np.int32),
                   weights=np.ones((b,), np.float32),
                   bucket_frames=bucket)


class TestTrainerWiring:
    @pytest.mark.parametrize("flag", [True, SpecAugmentConfig(
        num_freq_masks=1, max_freq_width=3, num_time_masks=1,
        max_time_width=4, max_time_frac=0.2)])
    def test_am_train_step_runs(self, tmp_path, flag):
        from asr_dfcnn_transformer_tpu.models import SEDFCNN
        from asr_dfcnn_transformer_tpu.train import AMTrainer

        model = SEDFCNN(vocab_size=32, stage_features=(4, 8),
                        stage_pool=(True, True), se_ratio=(1, 2),
                        head_features=8, dropout_rate=0.0,
                        dtype=jnp.float32)
        tr = AMTrainer(model, str(tmp_path / "sa"), feature_dim=32,
                       augment_spec=flag)
        assert isinstance(tr.augment_spec, SpecAugmentConfig)
        batch = _am_batch()
        tr.restore_or_init(
            lambda: tr.init_state(jax.random.PRNGKey(0), batch))
        m1 = tr.train_step(batch, jax.random.PRNGKey(1))
        m2 = tr.train_step(batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m1["loss"]))
        assert np.isfinite(float(m2["loss"]))

    def test_off_by_default(self, tmp_path):
        from asr_dfcnn_transformer_tpu.models import SEDFCNN
        from asr_dfcnn_transformer_tpu.train import AMTrainer

        model = SEDFCNN(vocab_size=32, stage_features=(4,),
                        stage_pool=(True,), se_ratio=(1,), head_features=8)
        tr = AMTrainer(model, str(tmp_path / "off"), feature_dim=32)
        assert tr.augment_spec is None

    def test_e2e_train_step_runs(self, tmp_path):
        from asr_dfcnn_transformer_tpu.models import SpeechTransformer
        from asr_dfcnn_transformer_tpu.train import E2ETrainer

        model = SpeechTransformer(48, d_model=16, num_heads=2,
                                  num_enc_blocks=1, num_dec_blocks=1,
                                  prenet_channels=4, dropout_rate=0.0,
                                  dtype=jnp.float32)
        tr = E2ETrainer(model, str(tmp_path / "e2e"), feature_dim=32,
                        augment_spec=True)
        assert isinstance(tr.augment_spec, SpecAugmentConfig)
        batch = _am_batch()
        tr.restore_or_init(
            lambda: tr.init_state(jax.random.PRNGKey(0), batch))
        m = tr.train_step(batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        # eval path must NOT mask (spec_key only threads through train)
        ev = tr.eval_step(batch)
        assert np.isfinite(float(ev["loss"]))
