"""Device mesh + sharding rules.

The reference's entire parallelism story is an unused ``gpu_nums`` hparam
and a Keras ``multi_gpu_model`` call on an unexercised model
(``cnn_rnn_ctc.py:59-62``); every real path is single-device (SURVEY.md
§2.3). Here parallelism is first-class and TPU-shaped:

- a 2-D ``(data, model)`` :class:`jax.sharding.Mesh` over ICI;
- batches sharded on ``data`` (pure DP for the conv AMs — their weights are
  tiny relative to activations);
- the LM / end-to-end Transformer optionally tensor-parallel on ``model``:
  attention-head and FFN-inner dimensions sharded column-wise, second
  projections row-wise, so XLA inserts a single psum per block pair —
  the standard Megatron layout expressed as NamedSharding constraints;
- gradient reduction is whatever XLA derives from the output sharding of
  the jitted step (psum over ``data``), not hand-written collectives.

Multi-host would use ``jax.distributed.initialize`` + the same mesh over
all processes; nothing in this module assumes a single process.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_parallel: int = -1, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. data_parallel=-1 uses all remaining
    devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel == -1:
        assert n % model_parallel == 0
        data_parallel = n // model_parallel
    grid = np.asarray(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over data, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style tensor-parallel rules for transformer params, keyed by
# flattened parameter path. Column-parallel: QKV projections and FFN inner
# (shard output features); row-parallel: attention out / FFN second matmul
# (shard input features).
_COL_RE = re.compile(r"(attn.*/(q|k|v)/kernel|ffn/Dense_0/kernel)")
_ROW_RE = re.compile(r"(attn.*/out/kernel|ffn/Dense_1/kernel)")
_EMBED_RE = re.compile(r"(embed.*/embedding|output/kernel)")


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = False):
    """A pytree of NamedShardings for ``params``.

    With ``tensor_parallel`` off (default; right call at this model scale —
    d_model 512 fits one chip easily) everything is replicated. With it on,
    transformer matmuls follow the Megatron column/row split over the
    ``model`` axis and the output vocab projection is sharded over its
    vocab dimension.
    """
    model_size = mesh.shape["model"]

    def spec_for(path, leaf) -> P:
        if not tensor_parallel or model_size == 1 or leaf.ndim < 2:
            return P()
        name = "/".join(str(getattr(k, "key", k)) for k in path)

        def fits(dim):
            return leaf.shape[dim] % model_size == 0

        if _COL_RE.search(name) and fits(-1):
            return P(*([None] * (leaf.ndim - 1)), "model")
        if _ROW_RE.search(name) and fits(0):
            return P("model", *([None] * (leaf.ndim - 1)))
        if _EMBED_RE.search(name) and fits(-1):
            # embeddings: shard the feature dim; final vocab proj: vocab dim
            return P(*([None] * (leaf.ndim - 1)), "model")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def shard_batch(mesh: Mesh, batch):
    """Device-put every array in a batch pytree with the leading axis over
    the data mesh axis.

    Multi-process (``jax.distributed``): every process feeds the same
    full global batch (the loaders are deterministic given the seed); each
    process carves out its own addressable rows and the result is one
    global jax.Array — the multi-host analog of the single-process
    ``device_put``. Assumes the mesh data axis follows ``jax.devices()``
    process ordering (what :func:`make_mesh` builds).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        nproc, pid = jax.process_count(), jax.process_index()

        def put(x):
            x = np.asarray(x)
            if x.shape[0] % nproc:
                raise ValueError(
                    f"global batch {x.shape[0]} must divide process "
                    f"count {nproc}")
            per = x.shape[0] // nproc
            local = x[pid * per: (pid + 1) * per]
            return jax.make_array_from_process_local_data(sh, local, x.shape)

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
