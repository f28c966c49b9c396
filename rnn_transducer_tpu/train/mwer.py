"""Minimum word error rate (MWER) sequence training — Prabhavalkar et
al. 2018, the production discriminative fine-tune of the RNN-T family.

After NLL training, a few thousand MWER steps optimize the metric of
record directly: decode an N-best with the CURRENT params (beam search,
gradient-free), renormalize the model's sequence log-probs over the
list, and minimize the expected edit-count

    L = sum_i  p_hat(y_i | x) * W(y_i, y_ref),
    p_hat = softmax_i  log P(y_i | x)

Autodiff of L yields exactly the variance-reduced MWER gradient
sum_i p_hat_i (W_i - W_bar) d logP_i — the explicit baseline
subtraction falls out of the softmax derivative, so no custom gradient
is needed. log P(y_i | x) = -rnnt_loss (the framework's differentiable
lattice marginal), so everything runs in ONE jitted step: batched beam
search (stop-gradient), a vectorized on-device edit-distance DP, K
lattice losses on the tiled encoder output, and the risk reduction.

TPU notes: the edit-distance row recurrence has the classic insertion
closure row[j] = min_{k<=j} cand[k] + (j-k); it is solved in parallel
as j + cummin(cand - j) instead of a serial inner loop. The hypothesis
scoring uses the xla lattice path ((B*K, T, U+1, V) logits materialize)
— MWER is a small-batch fine-tune phase, not the throughput path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss

NEG_INF = -1.0e30


def edit_distance_device(ref, ref_len, hyp, hyp_len):
    """Levenshtein distance of valid prefixes, fully on device.

    ref: (Ur,), hyp: (Uh,) int32 padded; returns a scalar int32 =
    distance(ref[:ref_len], hyp[:hyp_len]). The DP table cell (i, j)
    depends only on the prefixes, so one padded table serves any valid
    lengths via a terminal gather.
    """
    Uh = hyp.shape[0]
    j_ids = jnp.arange(Uh + 1, dtype=jnp.int32)
    row0 = j_ids

    def step(prev, xs):
        tok, i = xs
        sub = prev[:-1] + (tok != hyp).astype(jnp.int32)
        dele = prev[1:] + 1
        cand = jnp.concatenate([i[None], jnp.minimum(sub, dele)])
        # insertion closure: row[j] = min_{k<=j} cand[k] + (j - k)
        row = j_ids + jax.lax.cummin(cand - j_ids)
        return row, row

    _, rows = jax.lax.scan(
        step, row0,
        (ref.astype(jnp.int32),
         jnp.arange(1, ref.shape[0] + 1, dtype=jnp.int32)))
    table = jnp.concatenate([row0[None], rows], axis=0)  # (Ur+1, Uh+1)
    return table[ref_len.astype(jnp.int32), hyp_len.astype(jnp.int32)]


def mwer_loss_from_hyps(params, cfg, enc_out, enc_lens, hyps, hyp_lens,
                        valid, labels, label_lens, nll_weight: float = 0.0):
    """Expected-edit-count risk over a FIXED hypothesis list.

    enc_out: (B, T, De) (differentiable); hyps: (B, K, U) int32 with
    hyp_lens (B, K) and a (B, K) validity mask (dead beams excluded).
    Returns (loss, per_utterance_expected_edits).
    """
    B, K, U = hyps.shape
    flat = lambda x: x.reshape((B * K,) + x.shape[2:])
    enc_rep = jnp.repeat(enc_out, K, axis=0)
    enc_lens_rep = jnp.repeat(enc_lens, K, axis=0)
    pred_out, _ = m.predict(params, cfg, flat(hyps))
    logp = -_seq_nll(params, cfg, enc_rep, pred_out, flat(hyps),
                     enc_lens_rep, flat(hyp_lens)).reshape(B, K)
    logp = jnp.where(valid, logp, NEG_INF)
    p_hat = jax.nn.softmax(logp, axis=-1)  # renormalized over the N-best

    wers = jax.vmap(jax.vmap(
        lambda h, hl, r, rl: edit_distance_device(r, rl, h, hl),
        in_axes=(0, 0, None, None)))(
        hyps, hyp_lens, labels, label_lens).astype(jnp.float32)
    per_utt = jnp.sum(p_hat * wers, axis=-1)  # expected edit count
    loss = jnp.mean(per_utt)
    if nll_weight:
        nll = _seq_nll(params, cfg, enc_out,
                       m.predict(params, cfg, labels)[0], labels,
                       enc_lens, label_lens)
        loss = loss + nll_weight * jnp.mean(nll)
    return loss, per_utt


def _seq_nll(params, cfg, enc_out, pred_out, labels, enc_lens, label_lens):
    """Differentiable per-utterance NLL of a label sequence under the
    model — the standard lattice marginal, or the consumed-frames-grid
    marginal for multi-blank / TDT models (ops/rnnt_multiblank.py,
    ops/rnnt_tdt.py), so MWER covers all three transducer families."""
    if cfg.tdt_durations:
        from rnn_transducer_tpu.ops.rnnt_tdt import rnnt_loss_tdt
        logits, dur_logits = m.joint_tdt(params, cfg, enc_out, pred_out)
        return rnnt_loss_tdt(logits, dur_logits, labels, enc_lens,
                             label_lens, cfg.tdt_durations, cfg.blank)
    logits = m.joint(params, cfg, enc_out, pred_out)
    if cfg.big_blank_durations:
        from rnn_transducer_tpu.ops.rnnt_multiblank import (
            rnnt_loss_multiblank)
        return rnnt_loss_multiblank(logits, labels, enc_lens, label_lens,
                                    cfg.big_blank_durations, cfg.blank)
    return rnnt_loss(logits, labels, enc_lens, label_lens, cfg.blank)


def mwer_loss_fn(params, cfg, feats, feat_lens, labels, label_lens, *,
                 beam: int = 4, expansions: int = 2,
                 max_symbols: int = 64, nll_weight: float = 0.0,
                 **_unused):
    """Drop-in batch loss for train/loop.make_train_step (loss_kind
    'mwer'): decode the N-best with the current params (no gradient),
    then differentiate the expected-WER risk through the lattice
    losses. Multi-blank / TDT models work end-to-end: the wake-time
    beam search (decode/beam.py) produces their N-best and _seq_nll
    scores it on the consumed-frames grid. The extra kwargs absorb
    loss_fn-style options."""
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    from rnn_transducer_tpu.decode.beam import beam_search
    sg = jax.lax.stop_gradient
    hyps, hyp_lens, scores, _ = beam_search(
        sg(params), cfg, sg(enc_out), enc_lens, beam=beam,
        max_symbols=max_symbols, expansions=expansions)
    hyps, hyp_lens, scores = sg(hyps), sg(hyp_lens), sg(scores)
    valid = scores > NEG_INF / 2
    return mwer_loss_from_hyps(params, cfg, enc_out, enc_lens, hyps,
                               hyp_lens, valid, labels, label_lens,
                               nll_weight=nll_weight)
