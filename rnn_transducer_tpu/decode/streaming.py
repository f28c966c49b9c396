"""Streaming chunked inference (BASELINE.json configs[4]).

The utterance arrives in fixed-size chunks of frames; encoder LSTM state,
prediction-network state and the emitted-token buffer are carried across
chunks, so the transcript is available incrementally with chunk-level
latency. Each chunk runs the same jitted encoder step + greedy while_loop
used for offline decoding — one compile, reused for every chunk.

Requires a unidirectional encoder (the 960h streaming config); chunk size
must be a multiple of the encoder's time_reduction.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.decode.greedy import greedy_decode
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("enc_state", "decode_state"),
    meta_fields=(),
)
@dataclasses.dataclass
class StreamState:
    enc_state: Any  # encoder per-layer (h, c)
    decode_state: Any  # (u, tokens, confs, frames, frame_off,
    #                      pred_out, pred_states)


def init_stream(params, cfg: TransducerConfig, batch: int,
                max_symbols: int = 200) -> StreamState:
    enc_state = m.init_enc_state(cfg, batch)
    pred0, states0 = m.predict_step(
        params, cfg, jnp.full((batch,), cfg.blank, jnp.int32),
        m.init_pred_state(cfg, batch))
    decode_state = (
        jnp.zeros((batch,), jnp.int32),
        jnp.full((batch, max_symbols), cfg.blank, jnp.int32),
        jnp.zeros((batch, max_symbols), jnp.float32),  # confidences
        jnp.zeros((batch, max_symbols), jnp.int32),  # emit-frame indices
        jnp.zeros((batch,), jnp.int32),  # global frame offset
        pred0,
        states0,
        jnp.zeros((batch,), jnp.int32),  # multi-blank jump overshoot
    )
    return StreamState(enc_state=enc_state, decode_state=decode_state)


def stream_chunk(params, cfg: TransducerConfig, state: StreamState,
                 feats_chunk, chunk_lens, max_symbols: int = 200):
    """Feed one chunk; returns (state', tokens (B, max_symbols), lens (B,)).

    tokens/lens reflect the FULL transcript so far (cumulative).
    """
    enc_out, enc_lens, enc_state = m.encode_chunk(
        params, cfg, feats_chunk, chunk_lens, state.enc_state)
    tokens, lens, decode_state = greedy_decode(
        params, cfg, enc_out, enc_lens, max_symbols=max_symbols,
        decode_state=state.decode_state)
    return StreamState(enc_state=enc_state, decode_state=decode_state), \
        tokens, lens


def init_stream_beam(params, cfg: TransducerConfig, batch: int, *,
                     beam: int = 8, max_symbols: int = 200,
                     lm=None, context=None, ngram=None) -> StreamState:
    from rnn_transducer_tpu.decode.beam import init_beam_state
    return StreamState(
        enc_state=m.init_enc_state(cfg, batch),
        decode_state=init_beam_state(params, cfg, batch, beam=beam,
                                     max_symbols=max_symbols, lm=lm,
                                     context=context, ngram=ngram))


def stream_chunk_beam(params, cfg: TransducerConfig, state: StreamState,
                      feats_chunk, chunk_lens, *, beam: int = 8,
                      max_symbols: int = 200, expansions: int = 3, lm=None,
                      context=None, ngram=None):
    """Streaming beam search: beams (with prefix merging) carry across
    chunks; `context` phrase boosting (decode/context.py) carries its
    trie node in the beam state, so partial matches span chunk
    boundaries. Returns (state', tokens (B,K,U), lens (B,K),
    scores (B,K))."""
    from rnn_transducer_tpu.decode.beam import beam_search
    enc_out, enc_lens, enc_state = m.encode_chunk(
        params, cfg, feats_chunk, chunk_lens, state.enc_state)
    tokens, lens, scores, beam_state = beam_search(
        params, cfg, enc_out, enc_lens, beam=beam,
        max_symbols=max_symbols, expansions=expansions,
        beam_state=state.decode_state, lm=lm, context=context,
        ngram=ngram)
    return (StreamState(enc_state=enc_state, decode_state=beam_state),
            tokens, lens, scores)


def stream_transcribe_beam(params, cfg: TransducerConfig, feats, feat_lens,
                           chunk_frames: int, *, beam: int = 8,
                           max_symbols: int = 200, expansions: int = 3,
                           lm=None, context=None, ngram=None,
                           with_timestamps: bool = False):
    """Whole padded batch through the streaming beam path (cf.
    stream_transcribe). Returns (tokens (B,K,U), lens, scores) plus,
    with_timestamps=True, per-token (B,K,U) emission frame indices."""
    B, T, F = feats.shape
    n_chunks = -(-T // chunk_frames)
    pad = n_chunks * chunk_frames - T
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    state = init_stream_beam(params, cfg, B, beam=beam,
                             max_symbols=max_symbols, lm=lm,
                             context=context, ngram=ngram)
    # LM params / context / n-gram tables must be traced jit arguments,
    # not closure captures (captured arrays get inlined into the program).
    if lm is None:
        step = jax.jit(lambda p, lmp, cb, ng, s, x, l: stream_chunk_beam(
            p, cfg, s, x, l, beam=beam, max_symbols=max_symbols,
            expansions=expansions, lm=None, context=cb, ngram=ng))
        lm_params = None
    else:
        lm_params, lm_cfg, lm_w, *ilm = lm
        step = jax.jit(lambda p, lmp, cb, ng, s, x, l: stream_chunk_beam(
            p, cfg, s, x, l, beam=beam, max_symbols=max_symbols,
            expansions=expansions, lm=(lmp, lm_cfg, lm_w, *ilm),
            context=cb, ngram=ng))
    tokens = lens = scores = None
    for i in range(n_chunks):
        sl = feats[:, i * chunk_frames: (i + 1) * chunk_frames]
        cl = jnp.clip(feat_lens.astype(jnp.int32) - i * chunk_frames, 0,
                      chunk_frames)
        state, tokens, lens, scores = step(params, lm_params, context,
                                           ngram, state, sl, cl)
    if with_timestamps:
        from rnn_transducer_tpu.decode.beam import sorted_frames
        return tokens, lens, scores, sorted_frames(state.decode_state,
                                                   context)
    return tokens, lens, scores


def stream_transcribe(params, cfg: TransducerConfig, feats, feat_lens,
                      chunk_frames: int, max_symbols: int = 200,
                      with_timestamps: bool = False):
    """Convenience: run a whole padded batch through the streaming path.

    Pads T to a multiple of chunk_frames and feeds chunks sequentially.
    Returns (tokens, lens) identical in layout to recognize_greedy, plus
    per-token emission frame indices when with_timestamps=True.
    """
    B, T, F = feats.shape
    n_chunks = -(-T // chunk_frames)
    pad = n_chunks * chunk_frames - T
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    state = init_stream(params, cfg, B, max_symbols)
    tokens = None
    lens = None
    # params must be a traced argument (not a closure constant): captured
    # arrays are inlined into the HLO, which at 6x1024 scale makes the
    # program itself hundreds of MB.
    step = jax.jit(lambda p, s, x, l: stream_chunk(
        p, cfg, s, x, l, max_symbols=max_symbols))
    for i in range(n_chunks):
        sl = feats[:, i * chunk_frames: (i + 1) * chunk_frames]
        cl = jnp.clip(feat_lens.astype(jnp.int32) - i * chunk_frames, 0,
                      chunk_frames)
        state, tokens, lens = step(params, state, sl, cl)
    if with_timestamps:
        return tokens, lens, state.decode_state[3]
    return tokens, lens
