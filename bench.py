"""Benchmark suite: the five BASELINE.json configs on one TPU chip.

Emits ONE JSON line. The headline metric/value is the BASELINE.json
north-star path — batched AM+LM inference, batch 128 — and ``extra.suite``
carries one entry per benchmark config (BASELINE.json "configs"):

  1. single_utt_greedy   — batch-1 fbank->DFCNN->CTC greedy latency
  2. am_batched_b32      — batched fbank + AM inference, batch 32
  3. lm_only             — pinyin->hanzi Transformer LM (test_lm.py path)
  4. beam_noise_pipeline — on-device noise aug + AM + CTC beam + LM
  5. train_step_standard / train_step_fast — full AM training step
                           (fbank+fwd+CTC+grads+Adam), batch 64;
     train_step_lm / train_step_e2e — LM (batch 64) and end-to-end
                           speech-Transformer (batch 8) training steps
  plus am_lm_fast_b128   — the space-to-depth AM pipeline variant,
  and e2e_{greedy,beam3}_b{8,32} — absolute KV-cached autoregressive
                           decode numbers for the speech Transformer.

Ledger semantics (round-4 postmortem): BENCH_FULL.json is never erased.
Every run seeds its record from the prior file with each entry stamped
{"stale": true} (original "run" kept); freshly-measured configs
overwrite their slot with a new "run" stamp, and the emitted line
reports {"fresh": N, "stale": M} coverage — so a run killed mid-suite
leaves a complete record (part fresh, part explicitly stale) instead of
destroying the previous round's numbers.

All utterances are WORST-CASE full 1600-frame (16 s) inputs at reference
geometry (200-dim fbank, acoustic vocab 1536, hanzi vocab 6345, LM
12x512); real corpora with ~5 s means and length bucketing run
proportionally faster.

Timing methodology (two failure modes of naive timing on the tunneled
TPU backend, both defeated):
1. Per-request RESULT caching: byte-identical repeated requests return
   ~5x too fast (observed round 1). Defense: every timed executable runs
   EXACTLY ONCE, and all inputs are salted per process so no request is
   ever repeated across runs either.
2. Fixed per-request latency: every executed request costs ~34 ms flat
   regardless of device work (measured round 2 — this inflated every
   round-2 per-op number by ~34/iters ms). Defense: SLOPE timing — build
   two scans of the same body with different trip counts (LO and
   LO+iters), run each once cold, and divide the wall-time difference by
   the trip-count difference. The fixed cost cancels exactly; the scan
   carry stays a data-dependent function of each iteration's output
   (sum(out) * 1e-30) so XLA cannot fold, hoist, or DCE the body.
   Calibration: an 8192^3 bf16 matmul slope-times at 95% of the chip's
   published peak, and a 78 MB elementwise op at HBM bandwidth.

    python bench.py              # full suite (one JSON line)
    python bench.py --only lm_only --batch 64
"""

import json
import math
import os
import subprocess
import sys
import threading
import time

import numpy as np

FRAMES = 1600
N_SAMPLES = (FRAMES - 1) * 160 + 400
ACOUSTIC_VOCAB, LANGUAGE_VOCAB = 1536, 6345
UTT_SECONDS = 16.0
_LO = 10                       # base trip count for slope timing
_SALT = time.time_ns() % (1 << 31)   # per-process input salt (see header)


_EMIT_LIMIT = 1800   # the driver records only the last ~2000 chars of
# output; round 3's final JSON line outgrew that and was never parsed
# (BENCH_r03.json "parsed": null). The stdout line must stay under this.


def _sanitize(obj):
    """Strict-JSON safety: numpy scalars -> Python, non-finite -> None.

    ``json.dumps`` happily emits ``NaN``/``Infinity`` which strict parsers
    reject — one bad roofline ratio must not cost the round's record."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        obj = obj.item()
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


def _compact_suite(suite):
    """Per-config summary small enough for the single stdout line; the
    full per-config detail lives in BENCH_FULL.json. Stale entries (see
    _load_prior_suite) keep their primary number plus the stale marker so
    a partial run's emit still states full-suite coverage honestly."""
    comp = {}
    for name, r in suite.items():
        if "error" in r:
            comp[name] = {"error": str(r["error"])[:60]}
            continue
        e = {}
        for k in ("utts_per_sec", "latency_ms", "chunk_ms", "mfu_pct",
                  "pct_of_roof"):
            if r.get(k) is not None:
                e[k] = r[k]
        if r.get("stale"):
            e["stale"] = True
        comp[name] = e
    return comp


def _current_run():
    """Round number for stamping fresh results: one past the highest
    driver-recorded ``BENCH_r{N}.json`` (the driver writes that file at
    the END of round N, so while round N runs only 1..N-1 exist)."""
    import glob
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    runs = [int(m.group(1)) for p in glob.glob(
        os.path.join(here, "BENCH_r*.json"))
        for m in [re.search(r"BENCH_r(\d+)\.json$", p)] if m]
    return (max(runs) + 1) if runs else 1


def _load_prior_suite(full_path):
    """Seed this run's record from the previous one, every prior entry
    stamped ``{"stale": true}`` (its original ``"run"`` stamp kept).

    Round-4 postmortem: a FULL run used to start the on-disk record
    fresh, so when the deadline watchdog killed the suite at 3/14
    configs the partial file *replaced* the complete round-3 record —
    most of round 4's perf wins survived only as prose. Now every run
    (full or --only) updates slots in place: fresh configs overwrite
    their stale seed, and the emitted line reports fresh-vs-stale
    coverage so a partial run can never masquerade as a full one."""
    try:
        with open(full_path) as f:
            rec = json.load(f)
        out = {}
        for name, e in rec.get("suite", {}).items():
            if isinstance(e, dict):
                e = dict(e)
                if "run" not in e and rec.get("run") is not None:
                    e["run"] = rec["run"]
                e["stale"] = True
                out[name] = e
        return out
    except Exception:  # noqa: BLE001 — no/invalid prior file is fine
        return {}


def _write_full_record(full_path, device, batch, suite, prior_suite=None,
                       run=None):
    """Write the full per-config record, freshly-run configs taking
    precedence over the stale-stamped prior entries."""
    rec = {"device": device, "batch": batch,
           "suite": {**(prior_suite or {}), **suite}}
    if run is not None:
        rec["run"] = run
    with open(full_path, "w") as f:
        json.dump(_sanitize(rec), f, indent=1, allow_nan=False)


def _coverage(merged):
    """(fresh, stale, error) config counts for the emit line."""
    fresh = sum(1 for e in merged.values()
                if not e.get("stale") and "error" not in e)
    stale = sum(1 for e in merged.values() if e.get("stale"))
    errs = sum(1 for e in merged.values()
               if "error" in e and not e.get("stale"))
    return fresh, stale, errs


def _strict_line(record):
    """Serialize the headline record to ONE parseable line, shrinking the
    suite summary if needed, and self-validate by strict re-parse."""
    record = _sanitize(record)
    line = json.dumps(record, separators=(",", ":"), allow_nan=False)
    if len(line) > _EMIT_LIMIT:   # degrade suite to bare primary numbers
        record["extra"]["suite"] = {
            n: (e.get("utts_per_sec") or e.get("latency_ms")
                or e.get("chunk_ms") or e.get("error"))
            for n, e in record["extra"]["suite"].items()}
        line = json.dumps(record, separators=(",", ":"), allow_nan=False)
    if len(line) > _EMIT_LIMIT:
        record["extra"].pop("suite", None)
        line = json.dumps(record, separators=(",", ":"), allow_nan=False)
    parsed = json.loads(line)     # strict round-trip: fail loudly here,
    # not silently in the driver
    if not (isinstance(parsed.get("value"), (int, float))
            and "\n" not in line and len(line) <= _EMIT_LIMIT):
        raise RuntimeError(f"bench emit self-check failed ({len(line)}B)")
    return line


class _EmitOnce:
    """Single-shot guard for the result-line emit, safe against signal
    handlers re-entering on the emitting thread.

    Python runs signal handlers on the main thread — which is also the
    thread that emits on the normal and unreachable-tunnel paths. A plain
    bool + Lock deadlocked when SIGTERM landed while the main thread was
    inside emit: the handler blocked forever on the non-reentrant lock,
    producing the exact no-stdout-line failure the handlers exist to
    prevent (round-4 incident). Mechanics:

    - per-thread ``active`` marker, set BEFORE taking the lock, so a
      handler interrupting its own thread's emit is detected without
      touching the lock (``run`` no-ops; the interrupted emit resumes and
      finishes the line when the handler returns);
    - the handler instead calls ``defer_exit(code)``: if this thread is
      mid-emit the exit code is honored in ``run``'s finally, right after
      the line lands;
    - cross-thread races (watchdog thread vs main) serialize on the lock
      as before; ``fn`` runs at most once process-wide.
    """

    def __init__(self, _exit=os._exit):
        self._emitted = False
        self._exit_after = None
        self._local = threading.local()
        self._lock = threading.Lock()
        self._exit = _exit          # injectable for unit tests

    def run(self, fn) -> bool:
        """Run ``fn`` at most once; returns whether THIS call ran it."""
        if getattr(self._local, "active", False):
            return False            # re-entered from a signal handler
        self._local.active = True
        ran = False
        try:
            with self._lock:
                if not self._emitted:
                    fn()
                    self._emitted = True
                    ran = True
        finally:
            self._local.active = False
            if self._exit_after is not None:
                self._exit(self._exit_after)
        return ran

    def defer_exit(self, code: int) -> bool:
        """If this thread is inside ``run``, schedule ``code`` to be
        exited with when it completes and return True; else False (the
        caller should emit + exit itself)."""
        if getattr(self._local, "active", False):
            self._exit_after = code
            return True
        return False


def _signals(batch, seed=None):
    import jax
    rs = np.random.default_rng(_SALT if seed is None else seed)
    sig = (0.1 * rs.standard_normal((batch, N_SAMPLES))).astype(np.float32)
    return (jax.device_put(sig),
            jax.device_put(np.full((batch,), N_SAMPLES, np.int32)))


# Published per-chip peaks for the MFU/roofline columns, keyed by
# device_kind substring: (dense bf16 TFLOP/s, HBM GB/s).
_PEAKS = {
    "v5 lite": (197.0, 819.0), "v5e": (197.0, 819.0),
    "v6 lite": (918.0, 1640.0), "v6e": (918.0, 1640.0),
    "v5p": (459.0, 2765.0), "v5": (459.0, 2765.0), "v4": (275.0, 1228.0),
}

# The HBM *roof* needs a bandwidth the hardware can never beat, and the
# published number is not that: --calibrate's pure-read stream measures
# 885 GB/s on v5e (run of 2026-08-17) vs the 819 GB/s spec, which pushed
# copy_pct_of_roof to 108%. Roof bandwidth = published x this margin;
# erring high only *understates* pct_of_roof, preserving <=100.
_BW_ROOF_MARGIN = 1.15


def _peaks():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for k, v in _PEAKS.items():
        if k in kind:
            return v
    return (None, None)


def _cost(compiled):
    """XLA cost analysis as a plain dict ({} when unavailable)."""
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0] if c else {}
        return dict(c) if c else {}
    except Exception:
        return {}


def _cost_delta(clo, chi, iters):
    """Per-iteration flops / bytes from XLA cost analysis.

    XLA counts a ``while`` body ONCE regardless of trip count, so for the
    scanned timing programs the lo/hi costs are ~equal and the body cost
    IS the per-iteration cost; if the loop got unrolled instead, the
    hi-lo slope divides it out (same trick as the timing)."""
    out = {}
    for key, name in (("flops", "flops"), ("bytes accessed", "bytes")):
        a, b = clo.get(key), chi.get(key)
        if a is None:
            continue
        if b is not None and (b - a) > 0.01 * max(a, 1.0):
            out[name] = (b - a) / iters          # unrolled: slope it out
        else:
            out[name] = a                        # while body counted once
    return out


def _tree_bytes(*trees):
    """Total array bytes across pytrees (device or numpy leaves)."""
    import jax
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for t in trees for x in jax.tree.leaves(t)
               if hasattr(x, "shape"))


def _roofline(dt, cost, min_bytes=0):
    """MFU / roofline verdict for one config (VERDICT r2 #3, fixed r4).

    Round-3 postmortem (VERDICT r3 #2): XLA's ``bytes accessed`` counter
    over-counts large fused programs — the LM train step was charged
    23 GB/step where physics allows at most ~12 GB in its measured
    14.15 ms (and XLA's own ``optimal_seconds`` goes negative) — which
    pushed ``pct_of_roof`` past 100%. Its ``flops`` counter, by contrast,
    was verified exact (matches the analytic 3x2xparamsxtokens count for
    the LM, and ``--calibrate`` pins a bare matmul at ~96% MFU).

    So the roof here uses only trustworthy inputs: ``t_compute`` from
    XLA's flop count vs the published bf16 peak, and ``t_hbm`` from
    ``min_bytes`` — the *mandatory* per-iteration HBM traffic (weights +
    inputs, 2x optimizer state for train steps), computed analytically by
    each config — against ``_BW_ROOF_MARGIN`` x the published bandwidth,
    because the real chip out-reads its spec (885 vs 819 GB/s measured
    by --calibrate on v5e). Both are then true lower bounds, so
    ``roof_ms <= dt`` and ``pct_of_roof <= 100`` by construction. XLA's
    raw byte count is kept as ``xla_bytes_gb`` for reference only."""
    out = {}
    fl, by = cost.get("flops"), cost.get("bytes")
    peak, bw = _peaks()
    if fl:
        out["gflops_per_iter"] = round(fl / 1e9, 2)
        out["achieved_tflops"] = round(fl / dt / 1e12, 2)
        if peak:
            out["mfu_pct"] = round(100.0 * fl / dt / 1e12 / peak, 1)
    if by:
        out["xla_bytes_gb"] = round(by / 1e9, 3)   # over-counts; see above
    if min_bytes and bw:
        out["hbm_gbps_lb"] = round(min_bytes / dt / 1e9, 1)
    if fl and peak and bw:
        t_compute = fl / (peak * 1e12)
        t_hbm = min_bytes / (bw * _BW_ROOF_MARGIN * 1e9)
        out["bound"] = "compute" if t_compute >= t_hbm else "hbm"
        out["roof_ms"] = round(1000.0 * max(t_compute, t_hbm), 3)
        out["pct_of_roof"] = round(100.0 * max(t_compute, t_hbm) / dt, 1)
        if out["pct_of_roof"] > 100.0:
            # by construction this can't happen (both roof inputs are
            # lower bounds) — if it does, the MEASUREMENT is suspect
            # (e.g. slope noise on a sub-100us program), so flag the
            # config instead of shipping an impossible number silently
            # (VERDICT r3 #2 / r4 weak-2: streaming_chunk once read
            # 181% of roof)
            out["roof_note"] = ("pct_of_roof > 100: timing below the "
                                "physical roof is impossible; treat this "
                                "config's dt as unreliable")
    return out


def _scan_time(body, x, iters=100, min_bytes=0):
    """(seconds/iteration, roofline dict) of ``body(x + carry, i)`` by
    slope timing: two jitted scans (_LO and _LO+iters trips); the
    difference cancels the backend's fixed per-request cost. Each
    executable is warmed up ONCE on a perturbed copy of the input
    (compilation on the tunneled backend is asynchronous — the first
    execution absorbs the compile wait), then timed ONCE on the real
    input: warmup and timed requests differ in argument bytes, so
    per-request result caching can never serve a timed call (see module
    docstring)."""
    import jax
    import jax.numpy as jnp

    def make(trips):
        def multi(x):
            def step(c, i):
                out = body(x + c.astype(x.dtype), i)
                # consume EVERY output leaf: carrying only the first one
                # let XLA dead-code-eliminate later pipeline stages (the
                # LM vanished from the "AM+LM" benches — caught round 2;
                # the per-leaf sums themselves are noise-level work)
                tot = sum(jnp.sum(leaf.astype(jnp.float32))
                          for leaf in jax.tree.leaves(out))
                return tot * 1e-30, 0
            return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                jnp.arange(trips))[0]
        return jax.jit(multi).lower(x).compile()

    flo, fhi = make(_LO), make(_LO + iters)
    x_warm = (x + jnp.asarray(1, x.dtype)).block_until_ready()
    float(flo(x_warm))   # scalar fetch = completion barrier
    float(fhi(x_warm))
    t0 = time.perf_counter()
    float(flo(x))
    t1 = time.perf_counter()
    float(fhi(x))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / iters
    return dt, _roofline(dt, _cost_delta(_cost(flo), _cost(fhi), iters),
                         min_bytes=min_bytes)


class _Models:
    def __init__(self):
        import jax
        import jax.numpy as jnp
        from asr_dfcnn_transformer_tpu import models
        rng = jax.random.PRNGKey(0)
        feats0 = jnp.zeros((1, FRAMES, 200, 1), jnp.float32)
        self.am = models.SEDFCNN(vocab_size=ACOUSTIC_VOCAB)
        self.am_vars = self.am.init(rng, feats0, train=False)
        self.lm = models.TransformerLM(ACOUSTIC_VOCAB, LANGUAGE_VOCAB)
        self.lm_vars = self.lm.init(rng, jnp.zeros((1, 64), jnp.int32),
                                    train=False)
        self.fast = models.SEDFCNN.fast(ACOUSTIC_VOCAB)
        self.fast_vars = self.fast.init(rng, feats0, train=False)
        self._keras = None

    @property
    def keras(self):
        """Keras cnn_ctc layout — the model a user migrating the
        reference's shipped .hdf5 weights actually serves (lazy init)."""
        if self._keras is None:
            import jax
            import jax.numpy as jnp
            from asr_dfcnn_transformer_tpu import models
            model = models.KerasDFCNN(vocab_size=ACOUSTIC_VOCAB)
            feats0 = jnp.zeros((1, FRAMES, 200, 1), jnp.float32)
            self._keras = (model, model.init(jax.random.PRNGKey(0), feats0,
                                             train=False))
        return self._keras


def _pipeline_fn(m, am, am_vars, decode="greedy", beam_width=8,
                 noise=False):
    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.audio import add_noise_batch, batched_fbank
    from asr_dfcnn_transformer_tpu.models.dfcnn import (
        frames_from_samples, logit_lengths)
    from asr_dfcnn_transformer_tpu.ops import (
        ctc_beam_search_decode, ctc_greedy_decode)

    def forward(signals, signal_lengths, key):
        if noise:
            signals = add_noise_batch(key, signals, signal_lengths)
        feats, _ = batched_fbank(signals, signal_lengths, out_frames=FRAMES)
        logits = am.apply(am_vars, feats[..., None], train=False)
        in_len = logit_lengths(frames_from_samples(signal_lengths),
                               logits.shape[1])
        if decode == "beam":
            pny_ids, pny_len, _ = ctc_beam_search_decode(
                logits, in_len, beam_width=beam_width, topk=beam_width,
                blank_id=-1, max_decode_len=64)
        else:
            pny_ids, pny_len = ctc_greedy_decode(logits, in_len, blank_id=-1,
                                                 max_output_len=64)
        lm_logits = m.lm.apply(m.lm_vars, pny_ids, train=False)
        return pny_ids, pny_len, jnp.argmax(lm_logits, axis=-1)

    return forward


def bench_am_lm(m, batch, am=None, am_vars=None, decode="greedy",
                noise=False, iters=100):
    import jax
    am_vars = am_vars or m.am_vars
    fwd = _pipeline_fn(m, am or m.am, am_vars, decode=decode, noise=noise)
    sig, lens = _signals(batch)
    key = jax.random.PRNGKey(_SALT)
    dt, roof = _scan_time(
        lambda z, i: fwd(z, lens, jax.random.fold_in(key, i)), sig,
        iters=iters,
        min_bytes=_tree_bytes(am_vars, m.lm_vars) + sig.nbytes)
    return {"ms_per_batch": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2),
            "rtfx": round(UTT_SECONDS * batch / dt, 1), **roof}


def bench_single_utt(m):
    """BASELINE config 1: single-utterance greedy decode latency."""
    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.audio import batched_fbank
    from asr_dfcnn_transformer_tpu.models.dfcnn import (
        frames_from_samples, logit_lengths)
    from asr_dfcnn_transformer_tpu.ops import ctc_greedy_decode

    def forward(signals, signal_lengths):
        feats, _ = batched_fbank(signals, signal_lengths, out_frames=FRAMES)
        logits = m.am.apply(m.am_vars, feats[..., None], train=False)
        in_len = logit_lengths(frames_from_samples(signal_lengths),
                               logits.shape[1])
        return ctc_greedy_decode(logits, in_len, blank_id=-1,
                                 max_output_len=64)

    sig, lens = _signals(1)
    dt, roof = _scan_time(lambda z, i: forward(z, lens), sig, iters=400,
                          min_bytes=_tree_bytes(m.am_vars) + sig.nbytes)
    return {"latency_ms": round(1000 * dt, 2),
            "rtfx": round(UTT_SECONDS / dt, 1), **roof}


def bench_lm_only(m, batch=128, seq_len=64):
    """BASELINE config 3: LM-only inference (test_lm.py path)."""
    import jax
    import jax.numpy as jnp

    def forward(ids):
        return jnp.argmax(m.lm.apply(m.lm_vars, ids, train=False), axis=-1)

    rs = np.random.default_rng(_SALT)
    ids = jax.device_put(
        rs.integers(3, ACOUSTIC_VOCAB - 1, (batch, seq_len)).astype(np.int32))
    dt, roof = _scan_time(lambda z, i: forward(z), ids, iters=400,
                          min_bytes=_tree_bytes(m.lm_vars) + ids.nbytes)
    return {"ms_per_batch": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2), **roof}


def bench_streaming_chunk(m, chunk_logits=16, halo=64):
    """Per-chunk cost of the incremental streaming path (VERDICT r2 #6):
    one fixed-shape AM window ([halo | 8*CL | halo] frames) + the fbank
    frame group feeding it. Flat in stream length by construction; the
    number here is the TPU work a 1.28 s audio chunk costs."""
    import jax
    import jax.numpy as jnp

    win = 2 * halo + 8 * chunk_logits

    def am_chunk(window):
        logits = m.am.apply(m.am_vars, window[:, :, :, None], train=False)
        q0 = halo // 8
        return jnp.argmax(logits[:, q0: q0 + chunk_logits], axis=-1)

    rs = np.random.default_rng(_SALT)
    wnd = jax.device_put(rs.standard_normal((1, win, 200))
                         .astype(np.float32))
    dt_am, roof = _scan_time(lambda z, i: am_chunk(z), wnd, iters=200,
                             min_bytes=_tree_bytes(m.am_vars) + wnd.nbytes)

    from asr_dfcnn_transformer_tpu.audio import fbank as fb
    group = 8 * chunk_logits
    cfg = fb.FbankConfig(preemph=0.0, backend="xla")
    pe = jax.device_put(rs.standard_normal(
        ((group - 1) * 160 + 400,)).astype(np.float32))
    dt_fb, _ = _scan_time(lambda z, i: fb.logfbank(z, cfg), pe, iters=200)

    chunk_audio_s = 8 * chunk_logits * 0.010
    total = dt_am + dt_fb
    return {"chunk_ms": round(1000 * total, 3),
            "am_window_ms": round(1000 * dt_am, 3),
            "fbank_group_ms": round(1000 * dt_fb, 3),
            "chunk_audio_s": chunk_audio_s,
            "rtfx": round(chunk_audio_s / total, 1), **roof}


def bench_streaming_pool(m, n_streams=16, chunk_logits=16, halo=64):
    """Device-side cost of one multi-stream pool round
    (infer/stream_pool.py:StreamPool): the batched [N, window, nfilt]
    AM forward plus the batched [N, samples] fbank group — the two
    programs one `pool.step()` round runs for N concurrent streams.
    Reports the per-stream chunk cost and the resulting real-time
    stream capacity per chip; compare `streaming_chunk` (N=1) for the
    batching win. Host-side bookkeeping (numpy window assembly, CTC
    collapse) is excluded here exactly as in `streaming_chunk`."""
    import jax
    import jax.numpy as jnp

    win = 2 * halo + 8 * chunk_logits

    def am_chunk(windows):
        logits = m.am.apply(m.am_vars, windows[:, :, :, None], train=False)
        q0 = halo // 8
        return jnp.argmax(logits[:, q0: q0 + chunk_logits], axis=-1)

    rs = np.random.default_rng(_SALT)
    wnd = jax.device_put(rs.standard_normal((n_streams, win, 200))
                         .astype(np.float32))
    dt_am, roof = _scan_time(lambda z, i: am_chunk(z), wnd, iters=200,
                             min_bytes=_tree_bytes(m.am_vars) + wnd.nbytes)

    from asr_dfcnn_transformer_tpu.audio import fbank as fb
    group = 8 * chunk_logits
    cfg = fb.FbankConfig(preemph=0.0, backend="xla")
    pe = jax.device_put(rs.standard_normal(
        (n_streams, (group - 1) * 160 + 400)).astype(np.float32))
    dt_fb, _ = _scan_time(
        lambda z, i: jax.vmap(lambda s: fb.logfbank(s, cfg))(z), pe,
        iters=200)

    chunk_audio_s = 8 * chunk_logits * 0.010
    total = dt_am + dt_fb
    per_stream = total / n_streams
    return {"round_ms": round(1000 * total, 3),
            "n_streams": n_streams,
            "per_stream_chunk_ms": round(1000 * per_stream, 4),
            "am_window_ms": round(1000 * dt_am, 3),
            "fbank_group_ms": round(1000 * dt_fb, 3),
            "chunk_audio_s": chunk_audio_s,
            "realtime_streams_per_chip": round(chunk_audio_s / per_stream),
            **roof}


def _train_scan_time(step_fn, state, steps, extra_bytes=0):
    """Slope timing for a training step: two AOT-compiled scans of the
    step (_LO and _LO+steps trips) from the same initial state, each run
    once cold (same defenses as _scan_time). Returns (dt, roofline).

    Mandatory per-step traffic for the roof: the optimizer must read and
    write every param + moment (2x the state tree) plus read the batch
    (``extra_bytes``)."""
    import jax
    import jax.numpy as jnp

    def make(trips):
        def multi(state, rng):
            def body(st, i):
                st, loss = step_fn(st, jax.random.fold_in(rng, i))
                return st, loss
            return jax.lax.scan(body, state, jnp.arange(trips))[1]
        key = jax.random.PRNGKey(_SALT + trips)
        return jax.jit(multi).lower(state, key).compile(), key

    (mlo, klo), (mhi, khi) = make(_LO), make(_LO + steps)
    kw = jax.random.PRNGKey(_SALT + 7)   # warmup: distinct request bytes
    jax.block_until_ready(np.asarray(mlo(state, kw)))
    jax.block_until_ready(np.asarray(mhi(state, kw)))
    t0 = time.perf_counter()
    np.asarray(mlo(state, klo))
    t1 = time.perf_counter()
    np.asarray(mhi(state, khi))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / steps
    return dt, _roofline(dt, _cost_delta(_cost(mlo), _cost(mhi), steps),
                         min_bytes=2 * _tree_bytes(state) + extra_bytes)


def bench_train(m, fast=False, batch=64, steps=40, model=None):
    """BASELINE config 5: full training step (pure device time, scanned).
    ``model`` overrides the AM (e.g. SEDFCNN(remat_stages=N) for the
    stage-remat experiments, DESIGN.md §9)."""
    import tempfile

    import jax
    from asr_dfcnn_transformer_tpu.data.loader import AMBatch
    from asr_dfcnn_transformer_tpu.train import AMTrainer

    rng = np.random.default_rng(_SALT)
    sig = (0.1 * rng.standard_normal((batch, N_SAMPLES))).astype(np.float32)
    lab = np.concatenate([rng.integers(3, ACOUSTIC_VOCAB - 64, (batch, 48)),
                          np.zeros((batch, 16))], 1).astype(np.int32)
    ab = AMBatch(signals=sig,
                 signal_lengths=np.full((batch,), N_SAMPLES, np.int32),
                 frame_lengths=np.full((batch,), FRAMES, np.int32),
                 pinyin=lab, pinyin_lengths=np.full((batch,), 48, np.int32),
                 hanzi=lab, hanzi_lengths=np.full((batch,), 48, np.int32),
                 weights=np.ones((batch,), np.float32),
                 bucket_frames=FRAMES)
    model = model or (m.fast if fast else m.am)
    tr = AMTrainer(model, tempfile.mkdtemp(prefix="bench_train_"))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), ab))
    dev = [jax.device_put(x) for x in (ab.signals, ab.signal_lengths,
                                       ab.pinyin, ab.pinyin_lengths,
                                       ab.weights)]

    def step_fn(st, key):
        st, metrics = tr._train_step(st, *dev, key, ab.bucket_frames)
        return st, metrics["loss"]

    dt, roof = _train_scan_time(step_fn, tr.state, steps,
                                extra_bytes=_tree_bytes(dev))
    return {"ms_per_step": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2),
            "audio_sec_per_sec": round(UTT_SECONDS * batch / dt, 1),
            **roof}


def bench_train_lm(m, batch=64, seq_len=64, steps=100):
    """LM training step (train_language_model cadence, train.py:100-165)."""
    import tempfile

    import jax
    from asr_dfcnn_transformer_tpu.data.loader import LMBatch
    from asr_dfcnn_transformer_tpu.train import LMTrainer

    rng = np.random.default_rng(_SALT)
    lb = LMBatch(
        pinyin=rng.integers(3, ACOUSTIC_VOCAB - 1,
                            (batch, seq_len)).astype(np.int32),
        hanzi=rng.integers(3, LANGUAGE_VOCAB - 1,
                           (batch, seq_len)).astype(np.int32),
        lengths=np.full((batch,), seq_len, np.int32),
        weights=np.ones((batch,), np.float32))
    tr = LMTrainer(m.lm, tempfile.mkdtemp(prefix="bench_lm_"))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), lb))
    dev = [jax.device_put(x) for x in (lb.pinyin, lb.hanzi, lb.weights)]

    def step_fn(st, key):
        st, metrics = tr._train_step(st, *dev, key)
        return st, metrics["loss"]

    dt, roof = _train_scan_time(step_fn, tr.state, steps,
                                extra_bytes=_tree_bytes(dev))
    return {"ms_per_step": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2), **roof}


def bench_train_e2e(m, batch=8, steps=60):
    """End-to-end speech-Transformer training step (reference cadence:
    batch 8, 80-dim features, end2end/model.py:15-54)."""
    import tempfile

    import jax
    from asr_dfcnn_transformer_tpu import models
    from asr_dfcnn_transformer_tpu.data.loader import AMBatch
    from asr_dfcnn_transformer_tpu.train import E2ETrainer

    rng = np.random.default_rng(_SALT)
    sig = (0.1 * rng.standard_normal((batch, N_SAMPLES))).astype(np.float32)
    lab = np.concatenate([rng.integers(3, 6000, (batch, 48)),
                          np.zeros((batch, 16))], 1).astype(np.int32)
    ab = AMBatch(signals=sig,
                 signal_lengths=np.full((batch,), N_SAMPLES, np.int32),
                 frame_lengths=np.full((batch,), FRAMES, np.int32),
                 pinyin=lab, pinyin_lengths=np.full((batch,), 48, np.int32),
                 hanzi=lab, hanzi_lengths=np.full((batch,), 48, np.int32),
                 weights=np.ones((batch,), np.float32),
                 bucket_frames=FRAMES)
    model = models.SpeechTransformer(vocab_size=6347)
    tr = E2ETrainer(model, tempfile.mkdtemp(prefix="bench_e2e_"),
                    feature_dim=80)
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), ab))
    dec_in, targets = tr.make_decoder_io(ab.hanzi, ab.hanzi_lengths)
    dev = [jax.device_put(x) for x in (ab.signals, ab.signal_lengths,
                                       dec_in, targets)]

    def step_fn(st, key):
        st, metrics = tr._train_step(st, *dev, key, ab.bucket_frames)
        return st, metrics["loss"]

    dt, roof = _train_scan_time(step_fn, tr.state, steps,
                                extra_bytes=_tree_bytes(dev))
    return {"ms_per_step": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2),
            "audio_sec_per_sec": round(UTT_SECONDS * batch / dt, 1),
            **roof}


def bench_e2e_decode(batch=8, mode="greedy", frames=FRAMES, max_len=64,
                     iters=20, microbatch=None):
    """Absolute end-to-end speech-Transformer decode numbers (VERDICT r4
    next-3 #4): encoder + KV-cached autoregressive decode to 64-token
    targets, utt/s and ms/utterance — the path that finishes the
    reference's stub (end2end/model.py:331-337). Previously recorded only
    relative to full recompute (3.2x greedy / 2.6x beam-3, DESIGN §9).

    Input is the e2e feature tensor ([B, 1600, 80] fbank at reference
    geometry, 16 s utterances); fbank extraction cost is benchmarked
    separately (streaming_chunk / am_lm configs) and is negligible next
    to 64 sequential decoder steps."""
    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu import models

    model = models.SpeechTransformer(vocab_size=6347)
    rs = np.random.default_rng(_SALT)
    feats = jax.device_put(
        (0.1 * rs.standard_normal((batch, frames, 80, 1))).astype(
            np.float32))
    lens = jnp.full((batch,), frames, jnp.int32)
    dec0 = jnp.ones((batch, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens, dec0,
                        train=False)

    if mode == "greedy":
        def body(z, i):
            return models.greedy_decode_cached(model, params, z, lens,
                                               max_len=max_len,
                                               microbatch=microbatch)
    else:
        def body(z, i):
            return models.beam_decode_cached(model, params, z, lens,
                                             beam_size=3, max_len=max_len,
                                             microbatch=microbatch)

    dt, roof = _scan_time(body, feats, iters=iters,
                          min_bytes=_tree_bytes(params) + feats.nbytes)
    return {"ms_per_batch": round(1000 * dt, 2), "batch": batch,
            "mode": mode, "max_len": max_len,
            "ms_per_utt": round(1000 * dt / batch, 3),
            "utts_per_sec": round(batch / dt, 2),
            "rtfx": round(UTT_SECONDS * batch / dt, 1), **roof}


def main():
    import jax

    import os
    try:  # persistent XLA compile cache: the suite is 13 configs, and the
        # beam-search config alone can cost minutes of compile time. Keep
        # the cache next to the repo so a pre-warmed cache survives for
        # later runs of the same code.
        cache_dir = os.environ.get(
            "ASR_TPU_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # ASR_TPU_BENCH_CPU=1 pins the whole run (every branch incl.
    # --calibrate, the probe subprocess, and the suite) to the CPU
    # backend — a harness smoke-test mode for when no TPU is reachable;
    # numbers it produces are NOT the ledger's.
    cpu_mode = bool(os.environ.get("ASR_TPU_BENCH_CPU"))
    if cpu_mode:
        jax.config.update("jax_platforms", "cpu")

    argv = sys.argv[1:]
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 128
    only = argv[argv.index("--only") + 1] if "--only" in argv else None

    # The suite, declared up front so a mistyped --only fails fast and
    # loudly (it used to fall through every want() check and exit 0 with
    # NO stdout line — the exact failure mode the one-line contract
    # exists to prevent). Thunks close over `models` (filled after the
    # tunnel probe: building them needs the backend).
    models = {}
    suite_configs = [
        ("am_lm_b128", lambda: bench_am_lm(models["m"], batch)),
        ("single_utt_greedy", lambda: bench_single_utt(models["m"])),
        ("am_batched_b32", lambda: bench_am_lm(models["m"], 32)),
        ("lm_only", lambda: bench_lm_only(models["m"])),
        ("beam_noise_pipeline", lambda: bench_am_lm(
            models["m"], batch, decode="beam", noise=True, iters=50)),
        ("streaming_chunk", lambda: bench_streaming_chunk(models["m"])),
        ("streaming_pool16", lambda: bench_streaming_pool(models["m"])),
        ("am_lm_fast_b128", lambda: bench_am_lm(
            models["m"], batch, am=models["m"].fast,
            am_vars=models["m"].fast_vars)),
        ("am_lm_keras_b128", lambda: bench_am_lm(
            models["m"], batch, am=models["m"].keras[0],
            am_vars=models["m"].keras[1])),
        ("train_step_standard", lambda: bench_train(models["m"],
                                                    fast=False)),
        ("train_step_fast", lambda: bench_train(models["m"], fast=True)),
        ("train_step_lm", lambda: bench_train_lm(models["m"])),
        ("train_step_e2e", lambda: bench_train_e2e(models["m"])),
        # saturating-batch counterpart: batch 8 is the reference's cadence
        # (end2end/model.py:30) but latency-starves a v5e; b64 shows what
        # the model can actually do (VERDICT r3 #4)
        ("train_step_e2e_b64", lambda: bench_train_e2e(models["m"],
                                                       batch=64, steps=20)),
        # absolute e2e AR-decode numbers (VERDICT r4 #4): reference
        # cadence batch 8 + saturating batch 32, greedy and beam-3
        ("e2e_greedy_b8", lambda: bench_e2e_decode(8, "greedy")),
        ("e2e_beam3_b8", lambda: bench_e2e_decode(8, "beam", iters=10)),
        ("e2e_greedy_b32", lambda: bench_e2e_decode(32, "greedy")),
        ("e2e_beam3_b32", lambda: bench_e2e_decode(32, "beam", iters=10)),
        # the shipped fix for the b32 cross-KV VMEM cliff (DESIGN 9 r5):
        # exact chunked decode, measured 2.0x over plain b32
        ("e2e_greedy_b32_mb8", lambda: bench_e2e_decode(
            32, "greedy", microbatch=8)),
    ]
    if only is not None and only not in {n for n, _ in suite_configs}:
        print(f"unknown --only {only!r}; valid names: "
              + ", ".join(n for n, _ in suite_configs), file=sys.stderr)
        sys.exit(2)

    if "--calibrate" in argv:
        # prove the slope harness against physics: a big matmul should
        # land near the chip's published peak, an elementwise op near HBM
        # bandwidth, and a no-op near zero.
        import jax.numpy as jnp
        a = jax.device_put(
            np.random.default_rng(_SALT).standard_normal(
                (8192, 8192)).astype(np.float32)).astype(jnp.bfloat16)
        t_mm, r_mm = _scan_time(lambda x, i: x @ x, a, iters=200,
                                min_bytes=a.nbytes)
        big = jax.device_put(np.ones((19_660_800,), np.float32))
        # the +1.0 output is consumed by the scan-carry reduce in the same
        # fusion, so the body's true traffic is ONE read of the input
        t_cp, r_cp = _scan_time(lambda x, i: x + 1.0, big, iters=200,
                                min_bytes=big.nbytes)
        t_nop, _ = _scan_time(lambda x, i: x, jnp.zeros((8, 128)), iters=400)
        print(json.dumps(_sanitize({
            "matmul_8k3_bf16_ms": round(1e3 * t_mm, 3),
            "matmul_tflops": round(2 * 8192**3 / t_mm / 1e12, 1),
            "matmul_mfu_pct": r_mm.get("mfu_pct"),
            "matmul_pct_of_roof": r_mm.get("pct_of_roof"),
            "copy_78MB_ms": round(1e3 * t_cp, 3),
            "copy_read_GBps": round(78.6e-3 / t_cp, 1),
            "copy_pct_of_roof": r_cp.get("pct_of_roof"),
            "noop_us": round(1e6 * t_nop, 2),
        }), allow_nan=False), flush=True)
        return

    # ---- resilience against a dead tunnel (VERDICT r3 #1's other half) ----
    # The tunneled backend goes down for multi-hour stretches (observed
    # twice in round 2, again in round 4); a hung device init or a scan
    # blocked on a dead tunnel would end the run with NO stdout line at
    # all — the same "parsed: null" failure as an unparseable one. So:
    # (a) probe the backend in a SUBPROCESS (in-process init hangs
    # indefinitely) and wait up to ASR_TPU_BENCH_PROBE_WAIT for it, and
    # (b) arm a global ASR_TPU_BENCH_DEADLINE watchdog that force-emits
    # whatever the suite holds and exits. One strict line, always.
    t0 = time.time()
    deadline = float(os.environ.get("ASR_TPU_BENCH_DEADLINE", "5400"))
    # keep probing for most of the window: a tunnel that comes back late
    # still yields real numbers (a partial suite beats a 0.0 line), while
    # the last ~25 min stay reserved for actually running it
    probe_wait = float(os.environ.get("ASR_TPU_BENCH_PROBE_WAIT",
                                      str(max(300.0, deadline - 1500.0))))
    dev_info = {"device": "unknown"}
    suite = {}
    guard = _EmitOnce()
    run_id = _current_run()
    # CPU mode is harness smoke-testing only (CLAUDE.md): its numbers
    # must never land in the TPU ledger file the judge/driver read
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_FULL_CPU.json" if cpu_mode else "BENCH_FULL.json")
    # loaded BEFORE the probe loop so even the unreachable-tunnel and
    # watchdog emits can state full-suite coverage (stale entries marked)
    prior_suite = _load_prior_suite(full_path)

    def emit(note=None):
        """Print THE result line — exactly one JSON line on stdout, compact
        enough for the driver's ~2000-char tail capture, strictly
        parseable (allow_nan=False + self re-parse in _strict_line).
        Single-shot and signal-safe: see _EmitOnce."""
        guard.run(lambda: _emit_line(note))

    def _emit_line(note):
        # headline value comes from FRESH measurements only: a stale
        # (prior-run) number must never be reported as this run's
        head = suite.get("am_lm_b128", {})
        if "utts_per_sec" not in head:  # headline errored: first good
            head = next((v for v in suite.values()
                         if "utts_per_sec" in v), {})
        utts = head.get("utts_per_sec", 0.0)
        merged = {**prior_suite, **suite}
        fresh, stale, errs = _coverage(merged)
        extra = {"device": dev_info["device"],
                 "fresh": fresh, "stale": stale,
                 "suite": _compact_suite(merged),
                 "full": ("BENCH_FULL_CPU.json" if cpu_mode
                          else "BENCH_FULL.json")}
        if errs:
            extra["errors"] = errs
        if note:
            extra["note"] = note
        print(_strict_line({
            "metric": "am_lm_inference_utts_per_sec_per_chip",
            "value": utts,
            "unit": "utterances/sec/chip (worst-case 16s utts, "
                    "batch %d)" % batch,
            "vs_baseline": round(utts / 1000.0, 3),
            "extra": extra,
        }), flush=True)

    def watchdog():
        time.sleep(max(0.0, deadline - (time.time() - t0)))
        try:
            print(f"# bench deadline ({int(deadline)}s) hit; emitting "
                  "partial suite", file=sys.stderr, flush=True)
            emit(note=f"deadline {int(deadline)}s hit; partial suite")
        finally:                   # a raising emit must not lose the exit
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    def on_term(signum, frame):    # an external cap usually TERMs first:
        if guard.defer_exit(4):
            # we interrupted this very thread's in-progress emit (Python
            # runs signal handlers on the main thread, which is also the
            # thread that calls emit() on the unreachable-tunnel and
            # normal paths): let it resume and finish the line, then die
            # with our code — _exit here would cut the line short
            return
        try:                       # get the partial line out before dying
            emit(note=f"terminated by signal {signum}; partial suite")
        finally:
            os._exit(4)

    try:
        # installed BEFORE the probe loop: a TERM while waiting out a
        # tunnel outage (up to probe_wait = ~65 min) must still emit the
        # line — that window is precisely when an external wall-clock cap
        # is most likely to fire
        import signal
        signal.signal(signal.SIGTERM, on_term)
        signal.signal(signal.SIGINT, on_term)
    except Exception:  # noqa: BLE001 — non-main-thread embedding
        pass

    def tunnel_probe(timeout=150):
        pin = ("jax.config.update('jax_platforms','cpu');" if cpu_mode
               else "")
        code = ("import jax;" + pin + "import jax.numpy as jnp;"
                "d = jax.devices()[0];"
                "v = float(jnp.sum(jnp.ones((128, 128))));"
                "print('PROBE', v, '|', d)")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout)
        except Exception:  # noqa: BLE001 — timeout or spawn failure
            return False
        for ln in (r.stdout or "").splitlines():
            if ln.startswith("PROBE 16384.0"):
                dev_info["device"] = ln.split("|", 1)[1].strip()
                return True
        return False

    while not tunnel_probe():
        waited = time.time() - t0
        if waited > probe_wait:
            print(f"# TPU backend unreachable after {int(waited)}s",
                  file=sys.stderr, flush=True)
            # the 0.0 line is honest (nothing was measured THIS run);
            # the stale-stamped prior suite rides along in extra.suite,
            # and the note cites its headline so an outage doesn't read
            # as a perf regression
            prior = ""
            for name in ["am_lm_b128"] + sorted(prior_suite):
                last = prior_suite.get(name)
                if isinstance(last, dict) and "utts_per_sec" in last:
                    prior = (f"; last recorded suite "
                             f"(BENCH_FULL.json {name}): "
                             f"{last['utts_per_sec']:.0f} utt/s")
                    break
            emit(note=f"TPU backend unreachable for {int(waited)}s; "
                      f"no measurements{prior}")
            sys.exit(1)
        print(f"# waiting for TPU tunnel ({int(waited)}s)...",
              file=sys.stderr, flush=True)
        time.sleep(45)

    models["m"] = _Models()

    def want(name):
        return only is None or only == name

    def write_full():
        """Full per-config detail, updated after every config so even a
        time-capped run leaves a complete record on disk (fresh slots
        overwrite their stale seed; the rest of the prior record rides
        along stale-stamped — it is never erased)."""
        try:
            _write_full_record(full_path, dev_info["device"], batch,
                               suite, prior_suite, run=run_id)
        except Exception as e:  # noqa: BLE001 — the stdout line still emits
            print(f"# BENCH_FULL.json write failed: {e}", file=sys.stderr)

    def run(name, fn, retries=1):
        """Run one suite config, surviving transient backend failures.

        The tunneled TPU's remote-compile helper occasionally returns
        HTTP 500 (observed round 2); one flaky config must not cost the
        whole suite artifact. Failures are retried once, then recorded
        as {"error": ...} so the final JSON line is always complete —
        and an errored config keeps its stale prior entry (an error
        plus last round's number beats an error alone)."""
        if not want(name):
            return
        for attempt in range(retries + 1):
            try:
                suite[name] = dict(fn(), run=run_id)
                print(f"# {name}: {json.dumps(_sanitize(suite[name]))}",
                      file=sys.stderr, flush=True)
                write_full()
                return
            except Exception as e:  # noqa: BLE001 — record and continue
                err = f"{type(e).__name__}: {e}"
                print(f"# {name} attempt {attempt + 1} failed: "
                      f"{err[:300]}", file=sys.stderr, flush=True)
        if name in prior_suite:
            prior_suite[name] = dict(prior_suite[name],
                                     last_error=err[:200], error_run=run_id)
        else:
            suite[name] = {"error": err[:500], "run": run_id}
        write_full()

    for name, fn in suite_configs:
        run(name, fn)
    emit()


if __name__ == "__main__":
    main()
