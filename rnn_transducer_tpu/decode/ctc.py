"""CTC decoding: batched greedy collapse + prefix beam search, on-device.

The reference family ships a CTC head next to the transducer (encoder
pretraining, SURVEY.md §B); this module makes that head a complete model
family of its own — train with `--ctc-pretrain-steps` (or a pure-CTC
schedule) and decode without the prediction network at all.

Both decoders are TPU-first:

* `ctc_greedy_decode` is one fused XLA graph — per-frame argmax, repeat
  collapse, and a cumsum-compaction scatter (`mode="drop"` swallows the
  non-kept lanes), so the whole batch decodes with zero host round-trips
  and no per-frame loop at all (CTC's conditional independence means
  there is no decode-side recurrence to serialize).

* `ctc_prefix_beam_search` is the Hannun et al. 2014 prefix search
  redesigned batch-synchronously with static shapes (the same candidate
  pool + rolling-hash prefix merge idiom as decode/beam.py): every
  prefix carries (p_blank, p_nonblank) mass, each frame builds a fixed
  K*(1+C) candidate pool (stay + top-C vocab extensions), logsumexp-
  merges equal prefixes per lane, and keeps the top K. With C >= V-1 and
  K at least the number of reachable prefixes this is EXACT CTC decoding
  (verified against a brute-force path-enumeration oracle in tests);
  production C (default 8) prunes the per-frame extension fan-out the
  way the reference family's host implementations prune with a min
  cutoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.decode.beam import HASH_MULT, _hash_append

NEG_INF = -1.0e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m <= NEG_INF * 0.5, NEG_INF, out)


def ctc_greedy_decode(logits, frame_lens, *, blank: int = 0,
                      max_symbols: int = 200):
    """Best-path CTC decode: argmax per frame, collapse repeats, drop blanks.

    Args:
      logits: (B, T, V) CTC-head logits (or log-probs — argmax/log-softmax
        commute, confidences use log-softmax internally).
      frame_lens: (B,) valid frames.
      max_symbols: static width of the token output.

    Returns:
      tokens: (B, max_symbols) int32, blank-padded.
      lengths: (B,) int32 emitted-token counts (collapse can only shorten,
        so lengths <= T; tokens past max_symbols are dropped).
      confs: (B, max_symbols) f32 per-token confidence — the emitting
        frame's log-probability of the token (0 past the length).
      frames: (B, max_symbols) int32 emitting-frame index of each token
        (first frame of the repeat run; 0 past the length).
    """
    B, T, V = logits.shape
    frame_lens = frame_lens.astype(jnp.int32)
    k = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    k_lp = jnp.take_along_axis(lp, k[..., None], axis=-1)[..., 0]  # (B, T)
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :]
    prev = jnp.concatenate([jnp.full((B, 1), blank, jnp.int32), k[:, :-1]],
                           axis=1)
    keep = (k != blank) & (k != prev) & (t_ids < frame_lens[:, None])
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # (B, T)
    # scatter kept tokens to their compacted positions; non-kept lanes
    # aim past the buffer and are dropped by the scatter mode
    dst = jnp.where(keep & (pos < max_symbols), pos, max_symbols)
    tokens = jnp.full((B, max_symbols), blank, jnp.int32)
    confs = jnp.zeros((B, max_symbols), jnp.float32)
    frames = jnp.zeros((B, max_symbols), jnp.int32)
    b_ids = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, T))
    tokens = tokens.at[b_ids, dst].set(k, mode="drop")
    confs = confs.at[b_ids, dst].set(k_lp, mode="drop")
    frames = frames.at[b_ids, dst].set(t_ids, mode="drop")
    lengths = jnp.minimum(jnp.sum(keep, axis=1), max_symbols)
    return tokens, lengths.astype(jnp.int32), confs, frames


def ctc_prefix_beam_search(log_probs, frame_lens, *, beam: int = 8,
                           cand: int = 8, blank: int = 0,
                           max_symbols: int = 200, lm=None, ngram=None,
                           length_bonus: float = 0.0):
    """Prefix beam search over CTC posteriors (Hannun et al. 2014).

    Args:
      log_probs: (B, T, V) log-softmax CTC outputs.
      frame_lens: (B,) valid frames.
      beam: beam width K (prefixes kept per frame).
      cand: top-C non-blank extension tokens considered per frame.
      max_symbols: static cap on decoded-sequence length.
      lm: optional shallow fusion — (lm_params, LMConfig-or-
        TransformerLMConfig, weight): every prefix EXTENSION adds
        weight * log P_lm(c | prefix) (Hannun's LM-weighted CTC beam).
        The LM's per-prefix next-token log-probs + state ride the beam
        carry, gathered/advanced on the selected prefixes only; the LM
        state is a function of the prefix alone, so prefix merging stays
        exact.
      ngram: optional (models/ngram.py NgramLM, weight) fusion, same
        semantics (composable with lm).
      length_bonus: additive bonus per emitted token (the CTC-LM word
        insertion term; counteracts the LM's length penalty).

    Returns:
      tokens: (B, K, max_symbols) int32 blank-padded, best prefix first.
      lengths: (B, K) int32.
      scores: (B, K) f32 log P(prefix) = logaddexp(p_blank, p_nonblank),
        summed over ALL alignments collapsing to the prefix (within the
        beam/cand pruning horizon); with fusion, the fused score.
    """
    B, T, V = log_probs.shape
    K, U = beam, max_symbols
    C = min(cand, V - 1)
    P = K * (1 + C)  # candidate pool: stay + C extensions per prefix
    frame_lens = frame_lens.astype(jnp.int32)
    log_probs = log_probs.astype(jnp.float32)

    tokens0 = jnp.full((B, K, U), blank, jnp.int32)
    lens0 = jnp.zeros((B, K), jnp.int32)
    # beam 0 = empty prefix with all mass on "ends in blank" (no symbols
    # consumed yet); the rest of the beam starts dead.
    pb0 = jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    pnb0 = jnp.full((B, K), NEG_INF, jnp.float32)
    hash0 = jnp.zeros((B, K, 2), jnp.uint32)
    outs0 = {}
    if lm is not None:
        from rnn_transducer_tpu.models.lm import (BOS_ID, init_lm_state,
                                                  lm_step)
        from rnn_transducer_tpu.decode.beam import _cap_lm_cache
        # prefixes are capped at max_symbols labels, so the transformer
        # KV caches need only max_symbols+1 positions (see beam.py)
        lm = _cap_lm_cache(lm, max_symbols)
        lm_params, lm_cfg, lm_w = lm[0], lm[1], lm[2]
        lp0, st0 = lm_step(lm_params, lm_cfg,
                           jnp.full((B * K,), BOS_ID, jnp.int32),
                           init_lm_state(lm_cfg, B * K))
        unflat = lambda x: x.reshape((B, K) + x.shape[1:])
        outs0["lm_lp"] = unflat(lp0)
        outs0["lm_st"] = jax.tree.map(unflat, st0)
    if ngram is not None:
        outs0["ng_state"] = jnp.full((B, K), ngram[0].start, jnp.int32)

    def frame_step(t, carry):
        tokens, lens, pb, pnb, hashes, outs = carry
        lp = log_probs[:, t]  # (B, V)
        lp_blank = lp[:, blank]  # (B,)
        lp_ext = lp.at[:, blank].set(NEG_INF)
        c_lp, c_ids = jax.lax.top_k(lp_ext, C)  # (B, C)
        c_ids = c_ids.astype(jnp.int32)

        # last token of each prefix (blank sentinel when empty)
        last = jnp.take_along_axis(
            tokens, jnp.maximum(lens - 1, 0)[:, :, None], axis=2)[:, :, 0]
        last = jnp.where(lens > 0, last, -1)  # (B, K)
        lp_last = jnp.take_along_axis(
            lp, jnp.maximum(last, 0), axis=1)  # (B, K)
        total = _logaddexp(pb, pnb)  # (B, K)

        # --- stay candidates (pool slots [0, K)) -------------------------
        # same prefix: blank after anything, or repeat of the last symbol
        # without a separating blank (extends the same collapsed run).
        stay_pb = total + lp_blank[:, None]
        stay_pnb = jnp.where(lens > 0, pnb + lp_last, NEG_INF)

        # --- extension candidates (slots [K, K + K*C)) --------------------
        # prefix + c: a repeat of the last symbol needs the path to end in
        # blank (pb only); any other symbol extends from all mass.
        is_rep = c_ids[:, None, :] == last[:, :, None]  # (B, K, C)
        src_mass = jnp.where(is_rep, pb[:, :, None], total[:, :, None])
        ext_pnb = src_mass + c_lp[:, None, :]  # (B, K, C)
        if lm is not None:  # fused extension score (selection AND lanes)
            ext_pnb = ext_pnb + lm_w * jnp.take_along_axis(
                outs["lm_lp"], c_ids[:, None, :], axis=-1)
        if ngram is not None:
            ext_pnb = ext_pnb + ngram[1] * jnp.take_along_axis(
                ngram[0].lp[outs["ng_state"]], c_ids[:, None, :], axis=-1)
        if length_bonus:
            ext_pnb = ext_pnb + length_bonus
        ext_pnb = jnp.where((lens >= U)[:, :, None], NEG_INF, ext_pnb)
        # dead prefixes must not spawn candidates
        ext_pnb = jnp.where((total <= NEG_INF * 0.5)[:, :, None], NEG_INF,
                            ext_pnb)

        # assemble the pool
        app = jax.nn.one_hot(jnp.minimum(lens, U - 1), U,
                             dtype=jnp.bool_)  # (B, K, U) append position
        ext_tok = jnp.where(
            app[:, :, None, :],
            jnp.broadcast_to(c_ids[:, None, :, None], (B, K, C, U)),
            tokens[:, :, None, :])  # (B, K, C, U)
        ext_hash = _hash_append(
            jnp.broadcast_to(hashes[:, :, None, :], (B, K, C, 2)),
            jnp.broadcast_to(c_ids[:, None, :], (B, K, C)))

        pool_tok = jnp.concatenate(
            [tokens, ext_tok.reshape(B, K * C, U)], axis=1)
        pool_len = jnp.concatenate(
            [lens, jnp.broadcast_to(jnp.minimum(lens + 1, U)[:, :, None],
                                    (B, K, C)).reshape(B, K * C)], axis=1)
        pool_pb = jnp.concatenate(
            [stay_pb, jnp.full((B, K * C), NEG_INF)], axis=1)
        pool_pnb = jnp.concatenate(
            [stay_pnb, ext_pnb.reshape(B, K * C)], axis=1)
        pool_hash = jnp.concatenate(
            [hashes, ext_hash.reshape(B, K * C, 2)], axis=1)

        # --- prefix merge (rolling hash, as decode/beam.py) ---------------
        # Distinct parents can produce the same prefix (q + c == p, or p's
        # stay vs q's extension); their (pb, pnb) lanes merge by logsumexp.
        eq = ((pool_len[:, :, None] == pool_len[:, None, :])
              & jnp.all(pool_hash[:, :, None, :] == pool_hash[:, None, :, :],
                        axis=-1))  # (B, P, P)

        def merge_lane(x):
            xb = jnp.where(eq, x[:, None, :], NEG_INF)  # (B, P, P)
            mx = jnp.max(xb, axis=-1)
            out = mx + jnp.log(jnp.sum(jnp.exp(xb - mx[:, :, None]), axis=-1))
            return jnp.where(mx <= NEG_INF * 0.5, NEG_INF, out)

        m_pb = merge_lane(pool_pb)
        m_pnb = merge_lane(pool_pnb)
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, P, P), 2)
        first = jnp.min(jnp.where(eq, idx, P), axis=-1)
        me = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
        is_canon = first == me
        m_total = jnp.where(is_canon, _logaddexp(m_pb, m_pnb), NEG_INF)

        top_sc, top_i = jax.lax.top_k(m_total, K)
        n_tok = jnp.take_along_axis(pool_tok, top_i[:, :, None], axis=1)
        n_len = jnp.take_along_axis(pool_len, top_i, axis=1)
        n_pb = jnp.take_along_axis(m_pb, top_i, axis=1)
        n_pnb = jnp.take_along_axis(m_pnb, top_i, axis=1)
        n_hash = jnp.take_along_axis(pool_hash, top_i[:, :, None], axis=1)
        n_pb = jnp.where(top_sc <= NEG_INF * 0.5, NEG_INF, n_pb)
        n_pnb = jnp.where(top_sc <= NEG_INF * 0.5, NEG_INF, n_pnb)

        # --- advance per-prefix fusion state on the selected entries ----
        # pool index < K = stay (same prefix, state unchanged); >= K = an
        # extension of prefix (i-K)//C with label c_ids[(i-K)%C]
        n_outs = outs
        if lm is not None or ngram is not None:
            is_ext = top_i >= K
            src = jnp.where(is_ext, (top_i - K) // C, top_i)  # (B, K)
            lab = jnp.take_along_axis(
                c_ids, jnp.where(is_ext, (top_i - K) % C, 0), axis=1)
            gather_src = lambda a: jnp.take_along_axis(
                a, src.reshape(src.shape + (1,) * (a.ndim - 2)), axis=1)
            n_outs = {}
            if lm is not None:
                from rnn_transducer_tpu.models.lm import lm_step
                g_lp = gather_src(outs["lm_lp"])
                g_st = jax.tree.map(gather_src, outs["lm_st"])
                flat = lambda x: x.reshape((B * K,) + x.shape[2:])
                unflat = lambda x: x.reshape((B, K) + x.shape[1:])
                new_lp, new_st = lm_step(lm_params, lm_cfg, flat(lab),
                                         jax.tree.map(flat, g_st))
                sel = lambda new, old: jnp.where(
                    is_ext.reshape((B, K) + (1,) * (new.ndim - 2)), new,
                    old)
                n_outs["lm_lp"] = sel(unflat(new_lp), g_lp)
                n_outs["lm_st"] = jax.tree.map(
                    lambda a, b: sel(unflat(a), b), new_st, g_st)
            if ngram is not None:
                g_ng = gather_src(outs["ng_state"])
                n_outs["ng_state"] = jnp.where(
                    is_ext, ngram[0].next_state[g_ng, lab], g_ng)

        # frames past enc_len leave the carry untouched
        active = t < frame_lens
        pick = lambda new, old: jnp.where(
            active.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
        return (pick(n_tok, tokens), pick(n_len, lens), pick(n_pb, pb),
                pick(n_pnb, pnb), pick(n_hash, hashes),
                jax.tree.map(pick, n_outs, outs))

    tokens, lens, pb, pnb, _, _ = jax.lax.fori_loop(
        0, T, frame_step, (tokens0, lens0, pb0, pnb0, hash0, outs0))
    scores = _logaddexp(pb, pnb)
    order = jnp.argsort(-scores, axis=-1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return tokens, lens, scores


def recognize_ctc(params, cfg, feats, feat_lens, *, mode: str = "greedy",
                  beam: int = 8, cand: int = 8, max_symbols: int = 200,
                  with_confidence: bool = False,
                  with_timestamps: bool = False, lm=None, ngram=None,
                  length_bonus: float = 0.0):
    """Features -> label sequences through the CTC head (no predictor).

    mode="greedy": returns (tokens (B, U), lengths (B,)) [+ confs]
    [+ frames]. mode="beam": returns (tokens (B, K, U), lengths (B, K),
    scores (B, K)) — confidence/timestamps are a best-path notion and only
    apply to greedy.

    Requires cfg.ctc_head=True params (train.py --ctc-pretrain-steps or
    any checkpoint carrying the head).
    """
    from rnn_transducer_tpu.models import transducer as m
    if "ctc_head" not in params:
        raise ValueError("params have no 'ctc_head' (train with "
                         "cfg.ctc_head=True / --ctc-pretrain-steps)")
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    logits = m.ctc_logits(params, cfg, enc_out)
    if mode == "greedy":
        tokens, lengths, confs, frames = ctc_greedy_decode(
            logits, enc_lens, blank=cfg.blank, max_symbols=max_symbols)
        out = (tokens, lengths)
        if with_confidence:
            out = out + (confs,)
        if with_timestamps:
            out = out + (frames,)
        return out
    if mode == "beam":
        lp = jax.nn.log_softmax(logits, axis=-1)
        return ctc_prefix_beam_search(lp, enc_lens, beam=beam, cand=cand,
                                      blank=cfg.blank,
                                      max_symbols=max_symbols, lm=lm,
                                      ngram=ngram,
                                      length_bonus=length_bonus)
    raise ValueError(f"unknown CTC decode mode: {mode!r}")
