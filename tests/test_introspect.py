import jax
import jax.numpy as jnp
import numpy as np

from asr_dfcnn_transformer_tpu.models import TransformerLM
from asr_dfcnn_transformer_tpu.utils import attention_maps


def test_attention_maps_recovered():
    m = TransformerLM(input_vocab_size=20, output_vocab_size=30,
                      d_model=16, num_heads=2, num_blocks=2,
                      dropout_rate=0.0, dtype=jnp.float32)
    ids = np.array([[3, 4, 5, 0]], np.int32)
    variables = m.init(jax.random.PRNGKey(0), ids, train=False)
    maps = attention_maps(m, variables, ids, train=False)
    assert len(maps) == 2  # one per block
    for path, probs in maps.items():
        assert probs.shape == (1, 2, 4, 4)
        # rows are probability distributions
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)
        # causal: upper triangle (future) gets ~0 mass
        p = np.asarray(probs)[0, 0]
        assert p[0, 1] < 1e-6 and p[1, 3] < 1e-6
