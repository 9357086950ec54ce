"""2-process ``jax.distributed`` CPU smoke (the --distributed machinery).

Spawns two real processes that form a JAX distributed cluster over gloo
CPU collectives, build the shared (data, model) mesh across processes,
feed a global batch through the multi-process-aware ``shard_batch`` (each
process contributes its addressable rows), and run one real data-parallel
AM train step. Both processes must compute the same finite loss — the
cross-process gradient psum is exercised for real. Multi-HOST runs use
exactly this code path with a different coordinator address (SURVEY.md
§2.3; real pod hardware is not available here).
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1])
jax.distributed.initialize(sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from asr_dfcnn_transformer_tpu import models
from asr_dfcnn_transformer_tpu.data.loader import AMBatch
from asr_dfcnn_transformer_tpu.parallel import make_mesh, shard_batch
from asr_dfcnn_transformer_tpu.train import AMTrainer

mesh = make_mesh(len(jax.devices()), 1)

# cross-process collective sanity: sum of a globally sharded array
x = np.arange(8.0, dtype=np.float32).reshape(8, 1)
(xs,) = shard_batch(mesh, (x,))
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(xs)
assert float(total) == 28.0, float(total)

# one real DP train step across the 2-process mesh
am = models.SEDFCNN(vocab_size=64, stage_features=(4, 4, 8, 8, 8),
                    se_ratio=(1, 2, 2, 2, 2), head_features=8,
                    dropout_rate=0.0, dtype=jnp.float32)
tr = AMTrainer(am, sys.argv[3], mesh=mesh)
b, bucket = 2, 128
s = (bucket - 1) * 160 + 400
sig = np.random.default_rng(0).standard_normal((b, s)).astype(np.float32)
batch = AMBatch(signals=sig, signal_lengths=np.full((b,), s, np.int32),
                frame_lengths=np.full((b,), bucket, np.int32),
                pinyin=np.tile(np.array([[3, 4, 5] + [0] * 61], np.int32),
                               (b, 1)),
                pinyin_lengths=np.full((b,), 3, np.int32),
                hanzi=np.tile(np.array([[6, 7, 8] + [0] * 61], np.int32),
                              (b, 1)),
                hanzi_lengths=np.full((b,), 3, np.int32),
                weights=np.ones((b,), np.float32), bucket_frames=bucket)
tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), batch))
m = tr.train_step(batch, jax.random.PRNGKey(1))
loss = float(m["loss"])
assert np.isfinite(loss)
print(f"DIST_OK {pid} {loss:.6f}")
"""


_WORKER_TP = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1])
jax.distributed.initialize(sys.argv[2], num_processes=2, process_id=pid,
                           local_device_ids=[0, 1])
assert jax.process_count() == 2 and jax.device_count() == 4
import numpy as np, jax.numpy as jnp
from asr_dfcnn_transformer_tpu import models
from asr_dfcnn_transformer_tpu.data.loader import LMBatch
from asr_dfcnn_transformer_tpu.parallel import make_mesh, param_shardings
from asr_dfcnn_transformer_tpu.train import LMTrainer

# (data=2, model=2) over [p0d0, p0d1, p1d0, p1d1]: the model (TP) axis
# stays inside each process, the data (DP) axis crosses processes — the
# standard pod layout (TP over ICI, DP over DCN)
mesh = make_mesh(2, 2)
lm = models.TransformerLM(input_vocab_size=64, output_vocab_size=128,
                          d_model=64, num_heads=4, num_blocks=2,
                          dropout_rate=0.0, parity_attention=False,
                          dtype=jnp.float32)
lt = LMTrainer(lm, sys.argv[3], mesh=mesh)
b = 4
lb = LMBatch(pinyin=np.tile(np.array([[3, 4, 5, 6, 0, 0, 0, 0]], np.int32),
                            (b, 1)),
             hanzi=np.tile(np.array([[7, 8, 9, 10, 0, 0, 0, 0]], np.int32),
                           (b, 1)),
             lengths=np.full((b,), 4, np.int32),
             weights=np.ones((b,), np.float32))
lt.restore_or_init(lambda: lt.init_state(jax.random.PRNGKey(0), lb))
shardings = param_shardings(mesh, lt.state.params, tensor_parallel=True)
lt.state = lt.state.replace(
    params=jax.device_put(lt.state.params, shardings),
    opt_state=lt.tx.init(jax.device_put(lt.state.params, shardings)))
m = lt.train_step(lb, jax.random.PRNGKey(1))
loss = float(m["loss"])
assert np.isfinite(loss)
print(f"DIST_TP_OK {pid} {loss:.6f}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    addr = f"localhost:{_free_port()}"
    env = dict(os.environ, PYTHONPATH=REPO)
    # each process gets exactly one CPU device (no forced device count)
    env.pop("XLA_FLAGS", None)
    wd = str(tmp_path / "dist")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), addr, wd],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(tmp_path)) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    losses = []
    for pid, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith("DIST_OK")][0]
        tok = line.split()
        assert int(tok[1]) == pid
        losses.append(float(tok[2]))
    # both processes agree on the globally reduced loss
    assert losses[0] == losses[1]
    assert np.isfinite(losses[0])


def test_two_process_four_device_dp_tp_lm_step(tmp_path):
    """2 processes x 2 local CPU devices = a 4-device (data=2, model=2)
    mesh: Megatron tensor parallelism inside each process, data
    parallelism (gradient psum over gloo) across processes — the pod
    topology (TP over ICI, DP across hosts) in miniature."""
    addr = f"localhost:{_free_port()}"
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    wd = str(tmp_path / "dist_tp")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER_TP, str(pid), addr, wd],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(tmp_path)) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    losses = []
    for pid, out in enumerate(outs):
        line = [l for l in out.splitlines()
                if l.startswith("DIST_TP_OK")][0]
        tok = line.split()
        assert int(tok[1]) == pid
        losses.append(float(tok[2]))
    assert losses[0] == losses[1]
    assert np.isfinite(losses[0])
