"""Serving runtime: dynamic request batching + streaming session slots.

The reference family stops at an eval script; production serving needs the
device kept busy with *batched* work while callers see single-utterance
latency. Two engines, both keeping shapes static so everything compiles
once:

  * `BatchingEngine` — offline recognition. Requests queue on the host; a
    worker drains up to `max_batch` of them inside a `window_ms` batching
    window, pads to a fixed (max_batch, bucket_frames) shape, and runs one
    jitted greedy/beam decode for the whole group. One compile per frame
    bucket.

  * `StreamingEngine` — continuous batching over fixed session slots. The
    stream state for ALL slots lives on device as one (S, ...) pytree;
    each tick feeds whichever sessions have a chunk pending (idle slots
    run masked — their state is reselected, so they are untouched). This
    is the static-shape, XLA-friendly version of serving's
    continuous-batching pattern: admission = taking a free slot, not a
    recompile.

Transport is pluggable; `http_server` (serve.py CLI) exposes both engines
over stdlib HTTP with JSON bodies.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid

import numpy as np


class EngineStats:
    LAT_WINDOW = 1024  # bounded latency history (p50 over recent batches)

    def __init__(self):
        import collections

        self.lock = threading.Lock()
        self.requests = 0
        self.batches = 0
        self.max_batch = 0
        self.latency_s = collections.deque(maxlen=self.LAT_WINDOW)

    def record(self, batch_size: int, latency: float):
        with self.lock:
            self.requests += batch_size
            self.batches += 1
            self.max_batch = max(self.max_batch, batch_size)
            self.latency_s.append(latency)

    def summary(self) -> dict:
        with self.lock:
            lat = sorted(self.latency_s)
            return {
                "requests": self.requests,
                "batches": self.batches,
                "mean_batch": (self.requests / self.batches
                               if self.batches else 0.0),
                "max_batch": self.max_batch,
                "p50_batch_latency_ms": (
                    round(lat[len(lat) // 2] * 1e3, 3) if lat else None),
            }


class BatchingEngine:
    """Dynamic batching for offline recognition.

    submit() blocks the calling thread until its utterance's result is
    ready; concurrent callers landing within the batching window share one
    device decode.
    """

    def __init__(self, params, cfg, *, mode: str = "greedy", beam: int = 8,
                 expansions: int = 3, max_symbols: int = 100,
                 frame_buckets=(200, 400, 800), max_batch: int = 8,
                 window_ms: float = 5.0, lm=None, context=None,
                 ngram=None):
        import jax

        from rnn_transducer_tpu.decode.beam import recognize_beam
        from rnn_transducer_tpu.decode.greedy import recognize_greedy

        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self.frame_buckets = tuple(sorted(frame_buckets))
        self.stats = EngineStats()
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        # Guards the closed-check + enqueue against close(): an item is
        # either queued BEFORE the shutdown sentinel (the worker drains it
        # with an "engine closed" error) or the submit raises — a waiter
        # can never be stranded (ADVICE r2).
        self._submit_lock = threading.Lock()

        self.mode = mode
        if mode == "greedy":
            if context is not None or ngram is not None:
                raise ValueError("contextual biasing / n-gram fusion "
                                 "require mode='beam'")
            self._decode = jax.jit(lambda p, f, l: recognize_greedy(
                p, cfg, f, l, max_symbols=max_symbols,
                with_confidence=True, with_timestamps=True))
        elif mode == "beam":
            def _beam(p, lmp, cb, ng, f, l):
                return recognize_beam(
                    p, cfg, f, l, beam=beam, max_symbols=max_symbols,
                    expansions=expansions, with_confidence=True,
                    with_timestamps=True, context=cb, ngram=ng,
                    lm=None if lmp is None else (lmp, *lm[1:]))
            jitted = jax.jit(_beam)
            lm_params = lm[0] if lm else None
            # context/n-gram tables ride as traced args (not captures)
            self._decode = lambda p, f, l: jitted(p, lm_params, context,
                                                  ngram, f, l)
        else:
            raise ValueError(f"unknown mode {mode!r}")

        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def warmup(self):
        """Compile every bucket shape before serving traffic."""
        D = self.cfg.input_dim
        for tb in self.frame_buckets:
            f = np.zeros((self.max_batch, tb, D), np.float32)
            l = np.full((self.max_batch,), tb, np.int32)
            out = self._decode(self.params, f, l)
            np.asarray(out[0])

    def submit(self, feats: np.ndarray) -> list[int]:
        """feats: (T, input_dim) float32 -> token id list. Blocking."""
        return self.submit_full(feats)["tokens"]

    def submit_full(self, feats: np.ndarray) -> dict:
        """feats -> {"tokens", "confidence", "frames", and for beam
        engines "score" + "nbest": [{"tokens", "score"}, ...]}. Blocking.

        "frames" holds each token's emission timestamp as an INPUT
        feature-frame index (encoder frame x cfg.time_reduction);
        multiply by the feature hop (10 ms default) for audio seconds.

        Validation happens HERE, in the caller's thread, so a malformed
        request fails alone instead of poisoning its co-batched group.
        """
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self.cfg.input_dim:
            raise ValueError(
                f"feats must be (T, {self.cfg.input_dim}); got "
                f"{feats.shape}")
        T = feats.shape[0]
        if T < 1:
            raise ValueError("empty utterance")
        if T > self.frame_buckets[-1]:
            raise ValueError(
                f"utterance of {T} frames exceeds the largest serving "
                f"bucket {self.frame_buckets[-1]}")
        done = threading.Event()
        item = {"feats": feats, "done": done, "result": None, "error": None}
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("engine closed")
            self._q.put(item)
        done.wait()
        if item["error"]:
            raise RuntimeError(item["error"])
        return item["result"]

    def close(self):
        with self._submit_lock:
            self._closed = True
            self._q.put(None)

    def _drain_closed(self, extra=()):
        """Fail every still-queued waiter on shutdown (never strand)."""
        items = list(extra)
        while True:
            try:
                it = self._q.get_nowait()
            except queue.Empty:
                break
            if it is not None:
                items.append(it)
        for it in items:
            it["error"] = "engine closed"
            it["done"].set()

    # -- worker ------------------------------------------------------------

    def _bucket_for(self, T: int) -> int:
        for tb in self.frame_buckets:
            if T <= tb:
                return tb
        return self.frame_buckets[-1]

    def _run(self):
        while True:
            item = self._q.get()
            if item is None or self._closed:
                self._drain_closed([item] if item is not None else [])
                return
            batch = [item]
            deadline = time.perf_counter() + self.window_s
            while len(batch) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)  # re-arm the sentinel for the top
                    break
                batch.append(nxt)
            try:
                self._process(batch)
            except Exception as e:  # deliver the failure to every waiter
                for it in batch:
                    it["error"] = repr(e)
                    it["done"].set()

    NEG_INF_HALF = -5.0e29  # beams below this are dead (decode/beam.py)

    def _process(self, batch):
        D = self.cfg.input_dim
        tb = max(self._bucket_for(it["feats"].shape[0]) for it in batch)
        feats = np.zeros((self.max_batch, tb, D), np.float32)
        lens = np.zeros((self.max_batch,), np.int32)
        for i, it in enumerate(batch):
            f = it["feats"]
            feats[i, : f.shape[0]] = f
            lens[i] = f.shape[0]
        t0 = time.perf_counter()
        out = self._decode(self.params, feats, lens)
        # One overlapped fetch for ALL output arrays: a per-array
        # np.asarray() is a synchronous relay round-trip (~35 ms EACH
        # through axon), and the full payload surface (confidence +
        # timestamps + n-best) grew the output count to 4-5 arrays —
        # measured as ~2x serving latency before this fix (A/B numbers in
        # docs/SERVING.md; RNNT_SERVE_SYNC_FETCH=1 restores the old path
        # for measurement). device_get issues every copy_to_host async
        # first, then gathers.
        import os

        import jax
        if os.environ.get("RNNT_SERVE_SYNC_FETCH"):
            out = tuple(np.asarray(a) for a in out)
        else:
            out = tuple(jax.device_get(out))
        self.stats.record(len(batch), time.perf_counter() - t0)
        tr = self.cfg.time_reduction
        if self.mode == "greedy":
            toks, tlens, confs, frames = out
            for i, it in enumerate(batch):
                n = tlens[i]
                it["result"] = {
                    "tokens": toks[i, :n].tolist(),
                    "confidence": np.round(confs[i, :n], 4).tolist(),
                    "frames": (frames[i, :n] * tr).tolist(),
                }
                it["done"].set()
        else:  # beam: n-best + scores + top-beam confidence/timestamps
            toks, tlens, scores, confs, frames = out
            for i, it in enumerate(batch):
                n0 = tlens[i, 0]
                nbest = [
                    {"tokens": toks[i, k, : tlens[i, k]].tolist(),
                     "score": round(float(scores[i, k]), 4)}
                    for k in range(toks.shape[1])
                    if scores[i, k] > self.NEG_INF_HALF
                ]
                it["result"] = {
                    "tokens": toks[i, 0, :n0].tolist(),
                    "score": round(float(scores[i, 0]), 4),
                    "confidence": np.round(confs[i, 0, :n0], 4).tolist(),
                    "frames": (frames[i, 0, :n0] * tr).tolist(),
                    "nbest": nbest,
                }
                it["done"].set()


def make_masked_chunk_step(cfg, *, slots: int, max_symbols: int = 200,
                           mode: str = "greedy", beam: int = 8,
                           expansions: int = 3, lm_cfg=None,
                           lm_weight: float = 0.3,
                           ilm_weight: float = 0.0, context=None,
                           ngram=None):
    """Build the StreamingEngine's device step as a standalone function.

    Returns (init_state_fn, gstep) where
      init_state_fn(params) -> all-slots stream state, and
      gstep(params, lm_params, state, chunks (S,C,D), lens (S,), active
      (S,) bool) -> (new_state, out) with out a dict:
        greedy: {"tokens" (S,U), "lens" (S,), "confidence" (S,U),
                 "frames" (S,U) — global encoder-frame emit indices}
        beam:   {"tokens" (S,K,U), "lens" (S,K), "scores" (S,K),
                 "confidence" (S,K,U), "frames" (S,K,U)} — beams sorted
                 best-first.
    Inactive slots' state is re-selected, so they pass through unchanged.
    Factored out of StreamingEngine so tools/export_model.py can export
    the exact serving graph (VERDICT r2: serving cold start).

    `context` / `ngram` (beam mode): ContextBias / (NgramLM, weight) of
    CONCRETE arrays for phrase boosting / n-gram fusion. Unlike
    params/LM weights they are captured in the closure and inlined into
    the compiled program (the gstep signature is shared with exported
    artifacts) — fine up to a few MB of tables; exported streaming
    artifacts don't support them.
    """
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.decode.streaming import (
        init_stream,
        init_stream_beam,
        stream_chunk,
        stream_chunk_beam,
    )

    S = slots
    if mode == "greedy":
        if context is not None or ngram is not None:
            raise ValueError("contextual biasing / n-gram fusion require "
                             "mode='beam'")

        def init_state_fn(params):
            return init_stream(params, cfg, S, max_symbols)

        def chunk_step(p, lmp, state, chunks, lens):
            st, toks, tok_lens = stream_chunk(p, cfg, state, chunks, lens,
                                              max_symbols=max_symbols)
            return st, {"tokens": toks, "lens": tok_lens,
                        "confidence": st.decode_state[2],
                        "frames": st.decode_state[3]}
    elif mode == "beam":
        from rnn_transducer_tpu.decode.beam import (sorted_confidence,
                                                    sorted_frames)

        def init_state_fn(params, lm_params=None):
            lm_t = (None if lm_cfg is None
                    else (lm_params, lm_cfg, lm_weight, ilm_weight))
            return init_stream_beam(params, cfg, S, beam=beam,
                                    max_symbols=max_symbols, lm=lm_t,
                                    context=context, ngram=ngram)

        def chunk_step(p, lmp, state, chunks, lens):
            st, toks, tok_lens, scores = stream_chunk_beam(
                p, cfg, state, chunks, lens, beam=beam,
                max_symbols=max_symbols, expansions=expansions,
                context=context, ngram=ngram,
                lm=None if lmp is None
                else (lmp, lm_cfg, lm_weight, ilm_weight))
            return st, {"tokens": toks, "lens": tok_lens, "scores": scores,
                        "confidence": sorted_confidence(st.decode_state,
                                                        context),
                        "frames": sorted_frames(st.decode_state, context)}
    else:
        raise ValueError(f"unknown mode {mode!r}")

    def gstep(p, lmp, state, chunks, lens, active):
        new_state, out = chunk_step(p, lmp, state, chunks, lens)
        sel = lambda n, o: jnp.where(
            active.reshape((S,) + (1,) * (n.ndim - 1)), n, o)
        return jax.tree.map(sel, new_state, state), out

    return init_state_fn, gstep


class StreamingEngine:
    """Continuous batching over fixed streaming-session slots.

    All S slots' stream state is one device-resident pytree; a tick runs
    the jitted chunk step for every slot with a per-slot active mask, so
    idle slots' state is carried through unchanged.

    Chunk contract: every chunk must be exactly `chunk_frames` long
    except the LAST one (`feed(..., last=True)` or a short chunk, which
    implies last) — the streaming encoder's LSTM carry past a partial
    chunk is undefined, so a short mid-stream chunk would silently
    corrupt the session (decode/streaming.py). After the last chunk the
    session only accepts close_session().

    Sessions that go quiet for `session_ttl_s` are reaped when a new
    open_session() needs their slot — abandoned clients cannot leak slots
    forever.
    """

    def __init__(self, params, cfg, *, slots: int = 8,
                 chunk_frames: int = 32, max_symbols: int = 200,
                 window_ms: float = 5.0, session_ttl_s: float = 600.0,
                 mode: str = "greedy", beam: int = 8, expansions: int = 3,
                 lm=None, context=None, ngram=None, exported_step=None,
                 endpoint_frames=None):
        """exported_step: optional prebuilt chunk step with the
        make_masked_chunk_step gstep signature (e.g. deserialized from
        tools/export_model.py --mode streaming_*); used instead of
        jitting the live graph, killing the serving cold-start.

        endpoint_frames: optional end-of-utterance detector — when set,
        every feed_full result carries "trailing_frames" (input feature
        frames since the decoder's last emission, from the carried
        timestamp stream) and "endpoint": trailing >= endpoint_frames.
        The blank-dominated tail of an utterance is the RNN-T endpointer
        signal; the caller decides whether to finalize the session."""
        import jax

        self.params = params
        self.cfg = cfg
        self.mode = mode
        self.slots = slots
        self.chunk_frames = chunk_frames
        self.max_symbols = max_symbols
        self.window_s = window_ms / 1e3
        self.session_ttl_s = session_ttl_s
        self.endpoint_frames = endpoint_frames
        self.stats = EngineStats()
        self._lock = threading.Lock()
        self._free = set(range(slots))
        self._live: dict[str, int] = {}  # sid -> slot
        self._last: dict[str, list[int]] = {}  # sid -> tokens so far
        self._fed: dict[str, int] = {}  # sid -> input frames fed so far
        self._finished: set[str] = set()  # saw their last (short) chunk
        self._seen: dict[str, float] = {}  # sid -> last activity time
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()  # see BatchingEngine
        self._lm_params = lm[0] if lm else None

        S = slots
        if (context is not None or ngram is not None) \
                and exported_step is not None:
            raise ValueError("exported streaming artifacts are no-bias/"
                             "no-ngram graphs; drop them or the artifact")
        init_state_fn, gstep = make_masked_chunk_step(
            cfg, slots=slots, max_symbols=max_symbols, mode=mode,
            beam=beam, expansions=expansions, context=context, ngram=ngram,
            lm_cfg=None if lm is None else lm[1],
            lm_weight=0.3 if lm is None else lm[2],
            ilm_weight=lm[3] if lm is not None and len(lm) > 3 else 0.0)
        if mode == "beam":
            self._init_state = init_state_fn(params, self._lm_params)
        else:
            self._init_state = init_state_fn(params)
        self.state = self._init_state
        self._state_lock = threading.Lock()  # ticks vs slot resets

        def greset(state, fresh, mask):
            import jax.numpy as jnp
            sel = lambda f, o: jnp.where(
                mask.reshape((S,) + (1,) * (f.ndim - 1)), f, o)
            return jax.tree.map(sel, fresh, state)

        jit_gstep = exported_step if exported_step is not None \
            else jax.jit(gstep)
        self._gstep = lambda p, st, c, l, a: jit_gstep(
            p, self._lm_params, st, c, l, a)
        self._greset = jax.jit(greset)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def warmup(self):
        D = self.cfg.input_dim
        chunks = np.zeros((self.slots, self.chunk_frames, D), np.float32)
        lens = np.zeros((self.slots,), np.int32)
        active = np.zeros((self.slots,), bool)
        st, out = self._gstep(self.params, self.state, chunks, lens,
                              active)
        np.asarray(out["tokens"])  # force; state unchanged (inactive mask)

    def open_session(self) -> str:
        if self._closed:
            raise RuntimeError("engine closed")
        with self._lock:
            if not self._free:
                self._reap_expired_locked()
            if not self._free:
                raise RuntimeError(f"all {self.slots} streaming slots busy")
            slot = self._free.pop()
            sid = uuid.uuid4().hex[:12]
            self._live[sid] = slot
            self._last[sid] = []
            self._fed[sid] = 0
            self._seen[sid] = time.monotonic()
        return sid

    def _reap_expired_locked(self):
        now = time.monotonic()
        stale = [sid for sid, t in self._seen.items()
                 if sid in self._live and now - t > self.session_ttl_s]
        for sid in stale:
            self._release_locked(sid)

    def _release_locked(self, sid: str):
        slot = self._live.pop(sid)
        final = self._last.pop(sid, [])
        self._seen.pop(sid, None)
        self._fed.pop(sid, None)
        self._finished.discard(sid)
        mask = np.zeros((self.slots,), bool)
        mask[slot] = True
        with self._state_lock:
            self.state = self._greset(self.state, self._init_state, mask)
        self._free.add(slot)
        return final

    def feed(self, sid: str, chunk: np.ndarray, last: bool = False):
        """chunk: (C, input_dim); C == chunk_frames unless this is the
        session's last chunk. Blocks for the tick; returns the cumulative
        token ids for this session."""
        return self.feed_full(sid, chunk, last)["tokens"]

    def feed_full(self, sid: str, chunk: np.ndarray, last: bool = False):
        """Like feed() but returns the full partial-result dict:
        {"tokens", "confidence", "frames", "stable_len", and in beam mode
        "score" + "nbest"}. stable_len = length of the prefix all live
        beams agree on — tokens[:stable_len] will never be retracted by a
        later chunk (greedy output is final, so stable_len == len(tokens)
        there). "frames" are cumulative input-feature-frame emission
        indices (see submit_full)."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim != 2 or chunk.shape[1] != self.cfg.input_dim:
            raise ValueError(
                f"chunk must be (C, {self.cfg.input_dim}); got "
                f"{chunk.shape}")
        C = chunk.shape[0]
        if C < 1 or C > self.chunk_frames:
            raise ValueError(
                f"chunk of {C} frames outside [1, {self.chunk_frames}]")
        last = last or C < self.chunk_frames
        with self._lock:
            if sid not in self._live:
                raise KeyError(f"unknown session {sid!r}")
            if sid in self._finished:
                raise ValueError(
                    f"session {sid!r} already received its last chunk "
                    "(a short chunk ends the stream); close it")
            if last:
                self._finished.add(sid)
            self._seen[sid] = time.monotonic()
            slot = self._live[sid]
        done = threading.Event()
        item = {"sid": sid, "slot": slot, "chunk": chunk, "done": done,
                "result": None, "error": None}
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("engine closed")
            self._q.put(item)
        done.wait()
        if item["error"]:
            raise RuntimeError(item["error"])
        with self._lock:
            if self._live.get(sid) == slot:  # still the owner
                self._last[sid] = item["result"]["tokens"]
                self._seen[sid] = time.monotonic()
                self._fed[sid] = self._fed.get(sid, 0) + C
            fed = self._fed.get(sid, 0)
        if self.endpoint_frames is not None:
            # trailing silence from the timestamp stream: input frames
            # past the last emission's span (tr input frames per token)
            frames = item["result"]["frames"]
            tr = self.cfg.time_reduction
            trailing = fed - (frames[-1] + tr) if frames else fed
            item["result"]["trailing_frames"] = trailing
            item["result"]["endpoint"] = trailing >= self.endpoint_frames
        return item["result"]

    def close_session(self, sid: str) -> list[int]:
        with self._lock:
            if sid not in self._live:
                raise KeyError(f"unknown session {sid!r}")
            return self._release_locked(sid)

    def close(self):
        with self._submit_lock:
            self._closed = True
            self._q.put(None)

    def _drain_closed(self, extra=()):
        items = list(extra)
        while True:
            try:
                it = self._q.get_nowait()
            except queue.Empty:
                break
            if it is not None:
                items.append(it)
        for it in items:
            it["error"] = "engine closed"
            it["done"].set()

    # -- worker ------------------------------------------------------------

    def _run(self):
        while True:
            item = self._q.get()
            if item is None or self._closed:
                self._drain_closed([item] if item is not None else [])
                return
            batch = {item["slot"]: item}
            deferred = []
            deadline = time.perf_counter() + self.window_s
            while len(batch) < self.slots:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)  # re-arm the sentinel for the top
                    break
                if nxt["slot"] in batch:  # same session: must serialize
                    deferred.append(nxt)
                else:
                    batch[nxt["slot"]] = nxt
            try:
                self._tick(batch)
            except Exception as e:
                for it in batch.values():
                    it["error"] = repr(e)
                    it["done"].set()
            for it in deferred:  # re-queue same-session chunks
                self._q.put(it)

    def _tick(self, batch: dict):
        # Ownership check and the device step are atomic under _lock
        # (lock order _lock -> _state_lock, same as _release_locked): a
        # chunk whose session closed (or whose slot was reassigned)
        # between feed() and this tick must NOT advance the slot's state.
        with self._lock:
            stale = [slot for slot, it in batch.items()
                     if self._live.get(it["sid"]) != slot]
            for slot in stale:
                it = batch.pop(slot)
                it["error"] = f"session {it['sid']!r} closed"
                it["done"].set()
            if not batch:
                return
            D = self.cfg.input_dim
            chunks = np.zeros((self.slots, self.chunk_frames, D),
                              np.float32)
            lens = np.zeros((self.slots,), np.int32)
            active = np.zeros((self.slots,), bool)
            for slot, it in batch.items():
                c = it["chunk"]
                chunks[slot, : c.shape[0]] = c
                lens[slot] = c.shape[0]
                active[slot] = True
            t0 = time.perf_counter()
            with self._state_lock:
                self.state, out = self._gstep(
                    self.params, self.state, chunks, lens, active)
            # overlapped fetch of all tick outputs (see BatchingEngine)
            import jax
            out = jax.device_get(out)
        self.stats.record(len(batch), time.perf_counter() - t0)
        for slot, it in batch.items():
            it["result"] = self._slot_result(out, slot)
            it["done"].set()

    NEG_INF_HALF = -5.0e29  # beams below this are dead (decode/beam.py)

    def _slot_result(self, out, slot: int) -> dict:
        """Per-slot partial-result dict from the tick's output arrays."""
        tr = self.cfg.time_reduction
        if self.mode == "greedy":
            n = out["lens"][slot]
            toks = out["tokens"][slot, :n].tolist()
            return {"tokens": toks,
                    "confidence": np.round(
                        out["confidence"][slot, :n], 4).tolist(),
                    "frames": (out["frames"][slot, :n] * tr).tolist(),
                    "stable_len": len(toks)}  # greedy output is final
        toks, lens = out["tokens"][slot], out["lens"][slot]
        scores, confs = out["scores"][slot], out["confidence"][slot]
        alive = [k for k in range(toks.shape[0])
                 if scores[k] > self.NEG_INF_HALF]
        top = toks[0, : lens[0]].tolist()
        # stable prefix: the longest prefix ALL live beams agree on — a
        # later chunk can only extend live beams, never rewrite it.
        stable = len(top)
        for k in alive[1:]:
            n = min(stable, lens[k])
            agree = int(np.argmin(np.concatenate(
                [toks[0, :n] == toks[k, :n], [False]])))
            stable = min(stable, agree)
        return {"tokens": top,
                "score": round(float(scores[0]), 4),
                "confidence": np.round(confs[0, : lens[0]], 4).tolist(),
                "frames": (out["frames"][slot][0, : lens[0]] * tr).tolist(),
                "nbest": [{"tokens": toks[k, : lens[k]].tolist(),
                           "score": round(float(scores[k]), 4)}
                          for k in alive],
                "stable_len": stable}


# --------------------------------------------------------------------------
# HTTP transport (stdlib)
# --------------------------------------------------------------------------

def _feats_from_body(body: dict, cfg, cmvn=None) -> np.ndarray:
    """Request body -> (T, input_dim) features.

    Accepts precomputed {"feats": [[...]]} or raw 16 kHz PCM
    {"audio": [...]} run through the host FBANK frontend (native C++
    when built, numpy oracle otherwise). `cmvn`: global stats from the
    checkpoint meta (data/cmvn.py) — applied to BOTH input forms, so a
    client sending raw audio needs no knowledge of the training-time
    normalization."""
    if "feats" in body:
        feats = np.asarray(body["feats"], np.float32)
    else:
        if "audio" not in body:
            raise ValueError("body needs 'feats' or 'audio'")
        audio = np.asarray(body["audio"], np.float32)
        if audio.ndim != 1:
            raise ValueError(f"audio must be 1-D PCM; got {audio.shape}")
        from rnn_transducer_tpu.utils import hostio
        if hostio.available():
            feats = hostio.fbank(audio, n_mels=cfg.input_dim)
        else:
            from rnn_transducer_tpu.ops.logmel import log_mel_oracle
            f, _ = log_mel_oracle(audio[None], np.array([len(audio)]),
                                  n_mels=cfg.input_dim)
            feats = f[0].astype(np.float32)
    if cmvn is not None:
        from rnn_transducer_tpu.data.cmvn import apply_cmvn
        feats = apply_cmvn(feats, cmvn)
    return feats


def http_server(host: str, port: int, offline: BatchingEngine,
                streaming: StreamingEngine | None = None, tok=None,
                max_body_bytes: int = 32 << 20, cmvn=None,
                frame_hop_s: float = 0.01):
    """Build (not start) a ThreadingHTTPServer exposing the engines.

    POST /recognize        {"feats": [[...]]} or {"audio": [...16 kHz PCM]}
                                                     -> tokens (+ text)
    POST /session                                    -> {"sid": ...}
    POST /session/<sid>    {"feats"|"audio", "last"?} -> cumulative tokens
    DELETE /session/<sid>                            -> final tokens
    GET  /stats | /healthz

    Bodies above `max_body_bytes` are rejected with 413 before being read
    (ADVICE r2: an unbounded read + json.loads lets one hostile request
    exhaust host memory). The 32 MB default comfortably covers the largest
    legitimate payload — an 800-frame feats matrix or its 8 s of raw PCM
    is ~1.5 MB of JSON text.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from rnn_transducer_tpu.data.pcm_stream import PcmFeaturizer
    from rnn_transducer_tpu.data.tokenizer import decode_to_text
    from rnn_transducer_tpu.decode.words import attach_words

    class _TooLarge(Exception):
        pass

    # -- raw-PCM streaming sessions ---------------------------------------
    #
    # A session POSTing {"audio": [...]} gets a per-session incremental
    # featurizer (data/pcm_stream.py: EXACT vs offline featurization — the
    # engine-level contract "every chunk is exactly chunk_frames of
    # features, a short chunk ends the stream" would otherwise force PCM
    # clients to align samples to feature chunks AND lose every frame
    # straddling a POST boundary) plus a feature buffer: complete
    # chunk_frames slices feed the engine, the remainder waits for more
    # audio. A POST that completes no full slice returns the session's
    # last result with "pending_frames" so the client still gets a
    # well-formed partial. {"last": true} flushes the tail (short final
    # slice). Feature-body sessions keep the original exact-chunk contract.
    pcm_lock = threading.Lock()
    pcm_sess: dict[str, dict] = {}

    def _pcm_state(sid: str) -> dict:
        with pcm_lock:
            st = pcm_sess.get(sid)
            if st is None:
                d = streaming.cfg.input_dim
                st = pcm_sess[sid] = {
                    "fe": PcmFeaturizer(d),
                    "buf": np.zeros((0, d), np.float32),
                    "res": {"tokens": [], "confidence": [], "frames": [],
                            "stable_len": 0},
                    "lock": threading.Lock(),
                }
            return st

    def _pcm_drop(sid: str):
        with pcm_lock:
            pcm_sess.pop(sid, None)
            # engine sessions can also die by TTL reaping without a
            # DELETE; purge adapters for sids the engine no longer knows
            with streaming._lock:
                live = set(streaming._live)
            for stale in [s for s in pcm_sess if s not in live]:
                del pcm_sess[stale]

    def _pcm_feed(sid: str, audio: np.ndarray, last: bool) -> dict:
        st = _pcm_state(sid)
        with st["lock"]:
            new = st["fe"].feed(audio)
            if cmvn is not None and new.shape[0]:
                from rnn_transducer_tpu.data.cmvn import apply_cmvn
                new = apply_cmvn(new, cmvn)
            buf = np.concatenate([st["buf"], new], axis=0)
            C = streaming.chunk_frames
            slices = []
            while buf.shape[0] >= C:
                slices.append(buf[:C])
                buf = buf[C:]
            if last and buf.shape[0]:
                slices.append(buf)  # short final slice ends the stream
                buf = buf[:0]
            st["buf"] = buf
            res = None
            try:
                for i, s in enumerate(slices):
                    res = streaming.feed_full(
                        sid, s, last=last and i == len(slices) - 1)
            except KeyError:
                _pcm_drop(sid)
                raise
            if res is not None:
                st["res"] = res
            else:
                res = dict(st["res"])
                res["pending_frames"] = int(st["buf"].shape[0])
            return res

    def result(r):
        """r: token id list (close_session) or a full result dict
        (submit_full / feed_full) -> JSON payload, with text added
        whenever a tokenizer is known, plus word-level segments
        (decode/words.py) whenever timestamps are in the payload."""
        out = dict(r) if isinstance(r, dict) else {"tokens": r}
        if tok is not None:
            out["text"] = decode_to_text(tok, out["tokens"])
            for h in out.get("nbest", []):
                h["text"] = decode_to_text(tok, h["tokens"])
            attach_words(out, tok, hop_s=frame_hop_s)
        return out

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            if n > max_body_bytes:
                # Discard the body in bounded chunks (so the client can
                # finish writing and read the 413 instead of a broken
                # pipe), but never hold more than 64 KB of it, and give
                # up draining past 4x the cap.
                left = min(n, 4 * max_body_bytes)
                while left > 0:
                    chunk = self.rfile.read(min(left, 1 << 16))
                    if not chunk:
                        break
                    left -= len(chunk)
                raise _TooLarge(
                    f"body of {n} bytes exceeds cap {max_body_bytes}")
            return json.loads(self.rfile.read(n)) if n else {}

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                out = {"offline": offline.stats.summary()}
                if streaming is not None:
                    out["streaming"] = streaming.stats.summary()
                self._json(200, out)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                if self.path == "/recognize":
                    feats = _feats_from_body(self._body(), offline.cfg,
                                             cmvn)
                    self._json(200, result(offline.submit_full(feats)))
                elif self.path == "/session" and streaming is not None:
                    self._json(200, {"sid": streaming.open_session()})
                elif (self.path.startswith("/session/")
                      and streaming is not None):
                    sid = self.path.split("/")[2]
                    body = self._body()
                    last = bool(body.get("last", False))
                    if "audio" in body and "feats" not in body:
                        audio = np.asarray(body["audio"], np.float32)
                        if audio.ndim != 1:
                            raise ValueError(
                                f"audio must be 1-D PCM; got {audio.shape}")
                        self._json(200, result(_pcm_feed(sid, audio, last)))
                    else:
                        feats = _feats_from_body(body, streaming.cfg, cmvn)
                        self._json(200, result(streaming.feed_full(
                            sid, feats, last=last)))
                else:
                    self._json(404, {"error": "not found"})
            except _TooLarge as e:
                # body was never read: answer 413 and drop the connection
                self.close_connection = True
                self._json(413, {"error": str(e)})
            except Exception as e:
                self._json(400, {"error": repr(e)})

        def do_DELETE(self):
            try:
                if self.path.startswith("/session/") and streaming is not None:
                    sid = self.path.split("/")[2]
                    out = result(streaming.close_session(sid))
                    _pcm_drop(sid)
                    self._json(200, out)
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:
                self._json(400, {"error": repr(e)})

    return ThreadingHTTPServer((host, port), Handler)
