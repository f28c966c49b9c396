"""Batched greedy RNN-T decoding as a single on-device `lax.while_loop`.

The reference decodes with a host-side Python loop per utterance
(SURVEY.md §3 — the loop this rebuild moves on-device). Here the whole
batch advances in lock-step inside one jitted `lax.while_loop`: each
utterance keeps its own lattice cursor (t, u), prediction-network state and
done flag; finished utterances are masked, not branched on, so shapes stay
static and the loop compiles once per (B, T, U_max) bucket.

Per iteration: gather each utterance's current encoder frame, run one
joint evaluation, emit argmax or advance time. Worst-case iteration count
is T + U_max (each step advances t or u for every live utterance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig


def greedy_decode(params, cfg: TransducerConfig, enc_out, enc_lens,
                  max_symbols: int = 200, decode_state=None):
    """Greedy decode a batch of encoded utterances.

    Args:
      enc_out: (B, T, De) encoder outputs. enc_lens: (B,) valid frames.
      max_symbols: static cap on emitted labels per utterance.
      decode_state: optional carried decoder state from a previous chunk
        (streaming): (u0, tokens0, pred_out, pred_states) as returned in
        the third output. None = fresh utterance.

    Returns:
      tokens: (B, max_symbols) int32, blank-padded.
      lengths: (B,) number of emitted labels.
      decode_state: carry for the next chunk — (u, tokens, confs, frames,
        frame_off, pred_out, pred_states, t_over); confs[b, i] is the
        emitted token's log-probability (per-token confidence) and
        frames[b, i] the GLOBAL encoder-frame index it was emitted at
        (timestamps; frame_off accumulates frames consumed by earlier
        chunks), both 0 past the length. t_over carries a multi-blank
        duration jump past the chunk end into the next chunk (always 0
        for standard models).
    """
    B, T, _ = enc_out.shape
    enc_lens = enc_lens.astype(jnp.int32)
    V = cfg.vocab_size
    multiblank = bool(cfg.big_blank_durations)
    tdt = bool(cfg.tdt_durations)
    if multiblank:
        from rnn_transducer_tpu.ops.rnnt_multiblank import duration_table
        durs = duration_table(V, cfg.big_blank_durations, cfg.n_classes)
    if tdt:
        dvals = jnp.asarray(cfg.tdt_durations, jnp.int32)

    if decode_state is None:
        pred0, states0 = _pred_step(params, cfg,
                                    jnp.full((B,), cfg.blank, jnp.int32),
                                    m.init_pred_state(cfg, B))
        u_init = jnp.zeros((B,), jnp.int32)
        tokens_init = jnp.full((B, max_symbols), cfg.blank, jnp.int32)
        confs_init = jnp.zeros((B, max_symbols), jnp.float32)
        frames_init = jnp.zeros((B, max_symbols), jnp.int32)
        foff_init = jnp.zeros((B,), jnp.int32)
        t_over_init = jnp.zeros((B,), jnp.int32)
    else:
        (u_init, tokens_init, confs_init, frames_init, foff_init,
         pred0, states0, t_over_init) = decode_state
        assert tokens_init.shape == (B, max_symbols)

    def cond(carry):
        t, u, done, *_ = carry
        return jnp.any(~done)

    def body(carry):
        t, u, done, tokens, confs, frames, pred_out, states = carry
        # Current encoder frame per utterance (clamped gather keeps it safe).
        t_safe = jnp.minimum(t, enc_lens - 1)
        enc_t = jnp.take_along_axis(enc_out, t_safe[:, None, None], axis=1)[:, 0]
        if tdt:
            logits, dur_logits = m.joint_step_tdt(params, cfg, enc_t,
                                                  pred_out)
        else:
            logits = m.joint_step(params, cfg, enc_t, pred_out)  # (B, V)
        k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        is_blank = (k == cfg.blank) | (k >= V)  # big blanks are blanks
        advance_t = is_blank | done
        emit = ~advance_t
        # Emit: write token + its log-prob at position u, bump u, step
        # the predictor.
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        k_lp = jnp.take_along_axis(logits, k[:, None], axis=-1)[:, 0] - lse
        tokens = _masked_scatter(tokens, u, k, emit)
        confs = _masked_scatter(confs, u, k_lp, emit)
        frames = _masked_scatter(frames, u, foff_init + t, emit)
        new_pred, new_states = _pred_step(params, cfg,
                                          jnp.where(emit, k, cfg.blank),
                                          states)
        pred_out = jnp.where(emit[:, None], new_pred, pred_out)
        states = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((B,) + (1,) * (new.ndim - 1)), new, old),
            new_states, states)
        u = u + emit.astype(jnp.int32)
        # done rows freeze t so the carried overshoot (t_over) stays exact
        if tdt:
            # TDT: EVERY emission (token or blank) advances t by its
            # predicted duration; a duration-0 blank would self-loop, so
            # it is forced to 1 (the loss masks that arc out anyway)
            d = dvals[jnp.argmax(dur_logits, axis=-1)]
            d = jnp.where(is_blank & (d == 0), 1, d)
            t = t + jnp.where(done, 0, d)
        else:
            # a winning (big) blank skips its whole duration in one step
            adv = durs[k] if multiblank else jnp.int32(1)
            t = t + jnp.where(done, 0, jnp.where(is_blank, adv, 0))
        done = (t >= enc_lens) | (u >= max_symbols)
        return (t, u, done, tokens, confs, frames, pred_out, states)

    t0 = t_over_init  # frames already consumed by a jump past the last chunk
    done0 = (t0 >= enc_lens) | (u_init >= max_symbols)
    carry = jax.lax.while_loop(
        cond, body,
        (t0, u_init, done0, tokens_init, confs_init, frames_init,
         pred0, states0))
    t, u, _, tokens, confs, frames, pred_out, states = carry
    t_over = jnp.maximum(t - enc_lens, 0)
    return tokens, u, (u, tokens, confs, frames, foff_init + enc_lens,
                       pred_out, states, t_over)


def _pred_step(params, cfg, label, states):
    return m.predict_step(params, cfg, label, states)


def _masked_scatter(tokens, u, k, emit):
    """tokens[b, u[b]] = k[b] where emit[b]."""
    B, U = tokens.shape
    one_hot = jax.nn.one_hot(u, U, dtype=jnp.bool_)  # (B, U)
    write = one_hot & emit[:, None]
    return jnp.where(write, k[:, None], tokens)


def recognize_greedy(params, cfg: TransducerConfig, feats, feat_lens,
                     max_symbols: int = 200, with_confidence: bool = False,
                     with_timestamps: bool = False):
    """Features -> label sequences (mirrors the reference `recognize` API).

    with_confidence=True appends (B, max_symbols) per-token emission
    log-probabilities; with_timestamps=True appends (B, max_symbols)
    int32 encoder-frame indices each token was emitted at (multiply by
    cfg.time_reduction and the feature hop to get audio time). Both are
    0 past each utterance's length.
    """
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, state = greedy_decode(params, cfg, enc_out, enc_lens,
                                        max_symbols)
    out = (tokens, lens)
    if with_confidence:
        out = out + (state[2],)
    if with_timestamps:
        out = out + (state[3],)
    return out
