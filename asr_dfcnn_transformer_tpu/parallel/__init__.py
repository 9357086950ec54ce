"""Parallelism: device mesh, sharding rules, pjit helpers."""

from asr_dfcnn_transformer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_batch,
)
