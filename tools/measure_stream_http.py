"""End-to-end throughput of the HTTP streaming-session layer.

`streaming_pool16` (bench.py) measures the DEVICE cost of one StreamPool
round; this tool measures what a deployment actually gets: N concurrent
HTTP clients (real sockets, JSON, the dispatcher's coalescing soak, host
window assembly) each pushing 1.28 s float32 chunks into
``/v1/stream/<token>`` as fast as the server returns partials. Reports
aggregate chunk throughput, the realized coalescing ratio
(pushes/round — n_streams when the soak works), mean per-push client
latency, and the implied real-time stream capacity of one chip behind
this server.

Reference surface being measured: the live-audio loop the reference
serves one-at-a-time, blocking (`lm_and_am/read_wav.py:14-57`).

Usage: python tools/measure_stream_http.py [--cpu] [--streams 16]
       [--seconds 8] [--chunks 0] [--no-partial]
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from _measure_common import setup_device  # noqa: E402

CHUNK_SAMPLES = 16 * 8 * 160  # 16 logits * 8 frames * 160 hop = 1.28 s
CHUNK_SECONDS = CHUNK_SAMPLES / 16000.0


def _client(port: int, n_chunks: int, want_partial: bool, rng_seed: int,
            barrier: threading.Barrier, out: dict, idx: int) -> None:
    rs = np.random.default_rng(rng_seed)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)

    def req(method, path, body=b""):
        conn.request(method, path, body=body)
        r = conn.getresponse()
        return r.status, json.loads(r.read().decode())

    st, o = req("POST", "/v1/stream")
    assert st == 200, o
    token = o["stream"]
    suffix = "" if want_partial else "?partial=0"
    # one unmeasured warm push per client: compiles/caches every pool
    # program before the timed window
    chunk = (rs.standard_normal(CHUNK_SAMPLES) * 0.1).astype("<f4")
    st, o = req("POST", f"/v1/stream/{token}{suffix}", chunk.tobytes())
    assert st == 200, o
    barrier.wait()
    lat = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        chunk = (rs.standard_normal(CHUNK_SAMPLES) * 0.1).astype("<f4")
        t = time.perf_counter()
        st, o = req("POST", f"/v1/stream/{token}{suffix}", chunk.tobytes())
        assert st == 200, o
        lat.append(time.perf_counter() - t)
    wall = time.perf_counter() - t0
    st, o = req("POST", f"/v1/stream/{token}/finish")
    assert st == 200 and o["final"], o
    conn.close()
    out[idx] = {"wall": wall, "lat": lat}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU (harness smoke only, not a ledger "
                         "number)")
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=8.0,
                    help="target timed-window length; sets --chunks from "
                         "a quick rate probe unless --chunks is given")
    ap.add_argument("--chunks", type=int, default=0,
                    help="chunks per client in the timed window "
                         "(0 = derive from --seconds)")
    ap.add_argument("--no-partial", action="store_true",
                    help="push with ?partial=0 (skip the per-round "
                         "hypothesis refresh)")
    args = ap.parse_args(argv)
    setup_device(args.cpu)

    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu import models
    from asr_dfcnn_transformer_tpu.core import vocab
    from asr_dfcnn_transformer_tpu.infer import (HTTPRecognitionServer,
                                                 Pipeline)

    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()
    rng = jax.random.PRNGKey(0)
    small = args.cpu  # full-size models are the point on the TPU
    if small:
        am = models.SEDFCNN(vocab_size=av.size, stage_features=(4, 4, 8, 8, 8),
                            se_ratio=(1, 2, 2, 2, 2), head_features=8)
        lm = models.TransformerLM(av.size, lv.size, d_model=32, num_heads=4,
                                  num_blocks=1)
    else:
        am = models.SEDFCNN(vocab_size=av.size)
        lm = models.TransformerLM(av.size, lv.size)
    am_vars = am.init(rng, jnp.zeros((1, 128, 200, 1), jnp.float32),
                      train=False)
    lm_vars = lm.init(rng, jnp.zeros((1, 64), jnp.int32), train=False)
    pipe = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                    language_vocab=lv)

    want_partial = not args.no_partial
    with HTTPRecognitionServer(pipe, port=0, streams=args.streams) as srv:
        n_chunks = args.chunks
        if not n_chunks:
            # single-client rate probe (also warms every program)
            probe = {}
            b1 = threading.Barrier(1)
            _client(srv.port, 4, want_partial, 999, b1, probe, 0)
            per = probe[0]["wall"] / 4
            n_chunks = max(4, int(args.seconds / max(per, 1e-4)))
            print(json.dumps({"probe_chunk_s": round(per, 4),
                              "chunks_per_client": n_chunks}), flush=True)

        before = srv._streams.stats()
        results: dict = {}
        barrier = threading.Barrier(args.streams)
        threads = [threading.Thread(target=_client,
                                    args=(srv.port, n_chunks, want_partial,
                                          1000 + i, barrier, results, i))
                   for i in range(args.streams)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        after = srv._streams.stats()

    total_chunks = args.streams * n_chunks
    lats = np.concatenate([np.asarray(r["lat"]) for r in results.values()])
    pushes = after["pushes"] - before["pushes"]
    rounds = after["rounds"] - before["rounds"]
    audio_s = total_chunks * CHUNK_SECONDS
    out = {
        "streams": args.streams,
        "chunks_per_client": n_chunks,
        "want_partial": want_partial,
        "wall_s": round(wall, 3),
        "chunks_per_s": round(total_chunks / wall, 1),
        "audio_s_per_s": round(audio_s / wall, 1),
        "realtime_streams_per_chip": int(audio_s / wall),
        "mean_push_ms": round(1000 * float(lats.mean()), 2),
        "p99_push_ms": round(1000 * float(np.percentile(lats, 99)), 2),
        "coalescing_pushes_per_round": round(pushes / max(rounds, 1), 2),
    }
    print(json.dumps(out, allow_nan=False))


if __name__ == "__main__":
    main()
