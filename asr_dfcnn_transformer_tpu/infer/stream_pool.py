"""StreamPool: N concurrent incremental streams, batched on device.

Production counterpart of :class:`infer.streaming.IncrementalRecognizer`
(reference capability: the live demo ``lm_and_am/read_wav.py`` — beyond
parity, like ``infer.serving.BatchingServer`` is for offline requests):
a speech server holds many concurrent audio streams, and running each
stream's chunk programs separately costs N small device calls per tick
(each ~35 ms of fixed dispatch latency through a tunneled backend) at
tiny MXU occupancy. The pool multiplexes up to ``n_slots`` streams
through ONE compiled program per stage:

- **features**: every slot's completed 128-frame group rides one
  ``[N, samples]`` vmapped log-mel call per round;
- **encoder**: every slot's ready AM window rides one
  ``[N, window, nfilt]`` forward per round (slots are windowed
  independently host-side, so per-slot head/tail edge alignment — the
  exactness story of streaming.py — is preserved bit for bit);
- **beam decode**: one batched prefix-beam state ``[N, W, Lcap]`` lives
  on device for ALL slots and advances in one
  :func:`ops.ctc_beam_search_stream_step` call per round, with
  ``frame_counts`` masking rows whose slot produced fewer (or zero) new
  frames that round — slots at different stream positions share every
  step call;
- **LM partials**: :meth:`partials` refreshes every active slot's
  hypothesis with one batched LM pass.

Per-slot host state (pre-emphasis carry, running CMVN, CTC collapse) is
plain numpy, shared by construction with the single-stream engine: each
slot IS an ``IncrementalRecognizer`` whose device programs are never
built — the pool drives the slot's ``_feat_take``/``_feat_put`` and
``_plan_chunk``/``_consume_ids`` hooks instead, so the two engines
cannot drift (and the tests pin them: a pool of N streams must match N
independent recognizers token for token, greedy and beam).

Static shapes throughout: programs are compiled once per (n_slots,
window-rows) and a round with fewer ready slots pads with zeros and
discards the dead rows host-side.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from asr_dfcnn_transformer_tpu.infer.pipeline import Pipeline
from asr_dfcnn_transformer_tpu.infer.streaming import IncrementalRecognizer


class _PoolSlot(IncrementalRecognizer):
    """Slot state: an IncrementalRecognizer that never compiles its own
    device programs (the pool owns batched ones)."""

    def _build_programs(self):  # pragma: no cover - trivially exercised
        self._feat_group_fn = None
        self._am_rows_fn = None
        self._am_rows_lp_fn = None
        self._lm_prefix_fn = None


class StreamPool:
    """Batched multi-stream incremental recognizer.

    Typical server loop::

        pool = StreamPool(pipeline, n_slots=16)
        a, b = pool.open(), pool.open()
        pool.push(a, chunk_a, step=False)
        pool.push(b, chunk_b, step=False)
        pool.step()                  # one batched pass for every stage
        hyps = pool.partials()       # {slot: (pinyin, hanzi)}, one LM call
        final_a = pool.finalize(a)   # flush + final hypothesis
        pool.close(a)                # slot is reusable
    """

    def __init__(self, pipeline: Pipeline, n_slots: int = 8, *,
                 chunk_logits: int = 16, halo_frames: int = 64,
                 frame_group: int = 128, cmvn: str = "running",
                 global_stats=None, max_logits: int = 200,
                 decode: Optional[str] = None,
                 beam_width: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        from asr_dfcnn_transformer_tpu.audio import fbank as fb

        if n_slots <= 0:
            raise ValueError("n_slots must be positive")
        self.pipeline = pipeline
        self.n_slots = n_slots
        self._slot_kw = dict(chunk_logits=chunk_logits,
                             halo_frames=halo_frames,
                             frame_group=frame_group, cmvn=cmvn,
                             global_stats=global_stats,
                             max_logits=max_logits, decode=decode,
                             beam_width=beam_width)
        self._slots: List[Optional[_PoolSlot]] = [None] * n_slots
        self._finalized: Dict[int, Tuple[List[str], str]] = {}

        # one template slot fixes decode mode / geometry for the pool
        template = _PoolSlot(pipeline, **self._slot_kw)
        self.decode = template.decode
        self.beam_width = template.beam_width
        self.chunk_logits = template.chunk_logits
        self._window_frames = template._window_frames
        self._lm_cap = template._lm_cap
        self.nfilt = template.nfilt
        cfg = template.cfg
        self._feat_need = ((template.frame_group - 1) * cfg.hop
                           + cfg.win_len)

        cfg_nopre = fb.FbankConfig(
            sample_rate=cfg.sample_rate, win_len=cfg.win_len, hop=cfg.hop,
            nfft=cfg.nfft, nfilt=cfg.nfilt, preemph=0.0,
            low_freq=cfg.low_freq, high_freq=cfg.high_freq, backend="xla")

        @jax.jit
        def feat_groups(pe):                     # [N, need] -> [N, G, nfilt]
            return jax.vmap(lambda s: fb.logfbank(s, cfg_nopre))(pe)

        def _am_apply(windows):                  # [N, R, nfilt]
            return pipeline.am_model.apply(
                pipeline.am_variables, windows[..., None], train=False)

        @jax.jit
        def am_rows(windows):                    # -> [N, R//8] argmax ids
            return jnp.argmax(_am_apply(windows), axis=-1).astype(jnp.int32)

        @jax.jit
        def am_rows_lp(windows):                 # -> [N, R//8, V] log-probs
            return jax.nn.log_softmax(
                _am_apply(windows).astype(jnp.float32), axis=-1)

        @jax.jit
        def lm_prefix(ids, lens):                # [N, cap], [N] -> [N, cap]
            lm_logits = pipeline.lm_model.apply(
                pipeline.lm_variables, ids, train=False)
            han = jnp.argmax(lm_logits, axis=-1).astype(jnp.int32)
            return jnp.where(
                jnp.arange(ids.shape[1])[None, :] < lens[:, None], han, 0)

        self._feat_groups_fn = feat_groups
        self._am_rows_fn = am_rows
        self._am_rows_lp_fn = am_rows_lp
        self._lm_prefix_fn = lm_prefix if pipeline.lm_model is not None \
            else None

        if self.decode == "beam":
            from asr_dfcnn_transformer_tpu.ops import (
                ctc_beam_search_stream_init)
            self._beam_state = ctc_beam_search_stream_init(
                n_slots, self.beam_width, self._lm_cap)

    # -- slot lifecycle --------------------------------------------------

    def open(self) -> int:
        """Claim a free slot; returns its id."""
        for i, s in enumerate(self._slots):
            if s is None and i not in self._finalized:
                self._slots[i] = _PoolSlot(self.pipeline, **self._slot_kw)
                if self.decode == "beam":
                    self._reset_beam_row(i)
                return i
        raise RuntimeError(f"all {self.n_slots} slots busy")

    def close(self, slot: int):
        """Release a slot (discarding any un-finalized audio)."""
        self._check(slot, allow_finalized=True)
        self._slots[slot] = None
        self._finalized.pop(slot, None)

    @property
    def active_slots(self) -> List[int]:
        return [i for i, s in enumerate(self._slots) if s is not None]

    def _check(self, slot: int, allow_finalized: bool = False):
        if not (0 <= slot < self.n_slots) or self._slots[slot] is None:
            raise KeyError(f"slot {slot} is not open")
        if not allow_finalized and slot in self._finalized:
            raise ValueError(f"slot {slot} is already finalized")

    def _reset_beam_row(self, slot: int):
        from asr_dfcnn_transformer_tpu.ops import (
            ctc_beam_search_stream_init)
        fresh = ctc_beam_search_stream_init(1, self.beam_width,
                                            self._lm_cap)
        state = [np.array(p) for p in self._beam_state]
        for arr, f in zip(state, fresh):
            arr[slot] = np.asarray(f)[0]
        self._beam_state = tuple(state)

    # -- streaming -------------------------------------------------------

    def push(self, slot: int, chunk: np.ndarray, *, step: bool = True):
        """Buffer audio for ``slot`` (host-side pre-emphasis only).
        With ``step=True`` (default) runs :meth:`step` afterwards; pass
        ``step=False`` when pushing several slots, then call
        :meth:`step` once so all of them share the batched passes."""
        self._check(slot)
        s = self._slots[slot]
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        if chunk.size == 0:
            return
        s._buffer_push(chunk)
        if step:
            self.step()

    def step(self, *, final_slots: frozenset = frozenset()):
        """Drain every slot's ready work with batched device calls."""
        self._feat_rounds(final_slots)
        self._decode_rounds(final_slots)

    def _feat_rounds(self, final_slots):
        n, need = self.n_slots, self._feat_need
        while True:
            segs = {}
            for i in self.active_slots:
                if i in self._finalized:
                    continue
                s = self._slots[i]
                seg = s._feat_take()
                if seg is None and i in final_slots:
                    tf = s._feat_take_final()
                    if tf is not None:
                        segs[i] = (tf[0], tf[1], True)
                        continue
                if seg is not None:
                    segs[i] = (seg, None, False)
            if not segs:
                break
            batch = np.zeros((n, need), np.float32)
            for i, (seg, _, _) in segs.items():
                batch[i] = seg
            feats = np.asarray(self._feat_groups_fn(batch))
            for i, (_, rem, is_final) in segs.items():
                rows = feats[i] if rem is None else feats[i][:rem]
                self._slots[i]._feat_put(rows, final=is_final)
        # flush the sub-group CMVN remainder of finalizing slots
        for i in final_slots:
            if i in self.active_slots and i not in self._finalized:
                self._slots[i]._feat_put(
                    np.zeros((0, self.nfilt), np.float32), final=True)

    def _decode_rounds(self, final_slots):
        n, wf, cl = self.n_slots, self._window_frames, self.chunk_logits
        while True:
            plans = {}
            for i in self.active_slots:
                if i in self._finalized:
                    continue
                p = self._slots[i]._plan_chunk(final=i in final_slots)
                if p is not None:
                    plans[i] = p
            if not plans:
                break
            # group by window size: all interior/head windows are wf rows;
            # only a short-bucket finalize uses fewer (rare) — each size
            # is its own compiled program
            sizes = sorted({p[1] for p in plans.values()})
            for size in sizes:
                sel = {i: p for i, p in plans.items() if p[1] == size}
                windows = np.zeros((n, size, self.nfilt), np.float32)
                for i, (start, win_rows, _, _) in sel.items():
                    windows[i] = self._slots[i]._window(start, win_rows)
                if self.decode == "beam":
                    lp = np.asarray(self._am_rows_lp_fn(windows))
                    chunk_lp = np.full((n, cl, lp.shape[-1]), 0.0,
                                       np.float32)
                    counts = np.zeros((n,), np.int32)
                    for i, (_, _, r0, n_new) in sel.items():
                        chunk_lp[i, :n_new] = lp[i, r0: r0 + n_new]
                        counts[i] = n_new
                    from asr_dfcnn_transformer_tpu.ops import (
                        ctc_beam_search_stream_step)
                    self._beam_state = ctc_beam_search_stream_step(
                        self._beam_state, chunk_lp,
                        beam_width=self.beam_width, topk=self.beam_width,
                        blank_id=-1, frame_counts=counts)
                    for i, (_, _, _, n_new) in sel.items():
                        self._slots[i]._advance(n_new)
                else:
                    ids = np.asarray(self._am_rows_fn(windows))
                    for i, (_, _, r0, n_new) in sel.items():
                        self._slots[i]._consume_ids(
                            ids[i, r0: r0 + n_new])

    # -- results ---------------------------------------------------------

    def _beam_ids_all(self):
        from asr_dfcnn_transformer_tpu.ops import (
            ctc_beam_search_stream_best)
        ids, lens, _ = ctc_beam_search_stream_best(self._beam_state)
        return np.asarray(ids), np.asarray(lens)

    def pinyin_ids(self, slot: int) -> List[int]:
        self._check(slot, allow_finalized=True)
        if self.decode == "beam":
            ids, lens = self._beam_ids_all()
            return [int(x) for x in ids[slot][: int(lens[slot])]]
        return list(self._slots[slot]._ids)

    def partials(self) -> Dict[int, Tuple[List[str], str]]:
        """Current hypothesis for every active slot; ONE batched LM
        pass refreshes all of them."""
        act = self.active_slots
        if not act:
            return {}
        if self.decode == "beam":
            bids, blens = self._beam_ids_all()
            cur = {i: [int(x) for x in bids[i][: int(blens[i])]]
                   for i in act}
        else:
            cur = {i: list(self._slots[i]._ids) for i in act}
        out: Dict[int, Tuple[List[str], str]] = {}
        av, lv = self.pipeline.av, self.pipeline.lv
        if self._lm_prefix_fn is None or lv is None:
            return {i: (av.decode(cur[i]), "") for i in act}
        cap = self._lm_cap
        ids = np.zeros((self.n_slots, cap), np.int32)
        lens = np.zeros((self.n_slots,), np.int32)
        for i in act:
            n = min(len(cur[i]), cap)
            ids[i, :n] = cur[i][:n]
            lens[i] = n
        han = np.asarray(self._lm_prefix_fn(ids, lens))
        for i in act:
            hz = "".join(lv.decode(list(han[i][: lens[i]]))) \
                if lens[i] else ""
            out[i] = (av.decode(cur[i]), hz)
        return out

    def partial(self, slot: int) -> Tuple[List[str], str]:
        self._check(slot, allow_finalized=True)
        if slot in self._finalized:
            return self._finalized[slot]
        return self.partials()[slot]

    def finalize(self, slot: int) -> Tuple[List[str], str]:
        """Flush ``slot``'s tail frames/logits; returns and caches the
        final hypothesis (the slot stays open until :meth:`close`)."""
        self._check(slot)
        self.step(final_slots=frozenset({slot}))
        result = self.partials()[slot]
        self._finalized[slot] = result
        return result
