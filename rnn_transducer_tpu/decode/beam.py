"""Batched RNN-T beam search with prefix merging, fully on-device.

The reference family implements Graves-2012-style beam search as a
host-side Python loop over hypotheses (SURVEY.md §3) — inherently serial
and per-utterance. This is a ground-up batched redesign (cf. the
token-wise/batch-synchronous formulations in PAPERS.md): all B utterances
and K beams advance frame-synchronously with static shapes, so the whole
search jits into one `lax.fori_loop`.

Per frame t, up to `expansions` label-emission rounds:
  * every live hypothesis deposits its blank-transition ("move to frame
    t+1") into a fixed-size candidate pool;
  * label extensions are scored for all (beam, vocab) pairs at once and
    pruned with one batched top-k over K*V;
after the rounds, remaining live hypotheses are force-blanked into the
pool (latency-controlled search, PAPERS.md: Improved Beam Search). The
pool is then *prefix-merged*: candidates with identical label sequences —
distinct alignment paths to the same prefix — have their scores
logaddexp-combined (the prediction-network state is a function of the
prefix alone, so merging states is exact). Prefix equality is decided by
an incrementally-maintained rolling hash (two independent 32-bit lanes +
length), so the merge is O(P^2) per frame instead of the O(P^2 * U)
all-pairs token compare. Top-K merged candidates become the next frame's
beams.

With `expansions` >= the true max symbols per frame this matches the
sequential merged beam search exactly (verified against a literal host
implementation in tests); small caps trade a tiny amount of search
accuracy for a fixed iteration count, as in latency-controlled RNN-T.

Multi-blank and TDT models (duration jumps) are supported via a per-beam
WAKE TIME carried in the beam state: a hypothesis that consumes d > 1
frames in one transition (a big blank, or a TDT emission with predicted
duration d) sets wake = t + d and then SLEEPS — at frames t < wake it
deposits itself into the candidate pool unchanged (no blank cost, no
label extensions) and competes with the hypotheses that are catching up
frame by frame. The search stays frame-synchronous, so pruning compares
hypotheses that have consumed the same prefix of the utterance, and the
streaming chunk-carry stays EXACT (wake is re-based at chunk boundaries
exactly like the frame offset). Prefix merging requires equal wake in
addition to equal labels: two paths to the same prefix at different
lattice positions have different futures and must not be combined. For
standard models every live hypothesis has wake == t, so the machinery
reduces bit-for-bit to the plain frame-synchronous search.

TDT label extensions marginalize nothing: each of the top-K (beam,
label) candidates forks into one pool candidate per nonzero duration
(score + duration log-prob, wake = t + d) plus, when duration 0 is in
the set, a live continuation that may emit again at the same frame
(bounded by `expansions`, exactly like standard multi-label frames).
The top-K label selection is taken over acoustic+fusion scores before
the duration fork — the duration log-probs are shared per (beam, frame),
so per-beam label ranking is unaffected (the host-reference tests
implement the identical decomposition).

Optional external-LM shallow fusion (`lm=(params, LMConfig, weight)`,
models/lm.py): label emissions add weight * log P_lm(label | prefix); the
LM's next-token log-probs and LSTM state ride in the beam carry exactly
like the prediction network's, so fusion is exact under prefix merging
(the LM state is a function of the prefix alone) and carries across
streaming chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig

NEG_INF = -1.0e30

# Rolling-hash multipliers (odd -> bijective mod 2^32) for the two
# independent prefix-hash lanes; collisions require both lanes AND the
# length to collide simultaneously (~2^-64 per candidate pair).
HASH_MULT = (1000003, 2654435761)


def _hash_append(h, lab):
    """h: (..., 2) uint32 rolling prefix hash; lab: (...) int32 label."""
    mult = jnp.asarray(HASH_MULT, jnp.uint32)
    return h * mult + (lab.astype(jnp.uint32) + 1)[..., None]


def _pad_cols(x, n):
    """Zero-pad the last dim of (B, K, V) to n columns (multi-blank: the
    fusion LM / biasing tables score true labels only; the padded
    big-blank columns are masked to NEG_INF before the top-k anyway)."""
    if x.shape[-1] >= n:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, n - x.shape[-1])))


def _mask_nonlabels(x, cfg, vocab, val):
    """Set the blank column — and, for multi-blank models, the big-blank
    columns (>= vocab) — of (B, K, C) to val."""
    x = x.at[:, :, cfg.blank].set(val)
    if x.shape[-1] > vocab:
        x = x.at[:, :, vocab:].set(val)
    return x


def _cap_lm_cache(lm, max_symbols: int):
    """Cap a transformer fusion LM's KV-cache length at max_symbols + 1.

    The decode emits at most max_symbols labels, so the LM consumes at
    most BOS + max_symbols positions — capping is EXACT. Without the cap
    the per-beam (B*K, max_len, H, Dh) caches ride the beam carry at the
    checkpoint's full max_len (512 by default): at production shapes
    (B=8, K=8, d_model=256, 4 layers) that is a ~1 GB while_loop carry
    whose per-frame reindex copies crashed the TPU worker outright
    (round-4 diagnosis: max_len=128 runs at 484 MB temp, max_len=512
    kills the worker)."""
    if lm is None:
        return lm
    from rnn_transducer_tpu.models.lm_transformer import TransformerLMConfig
    if isinstance(lm[1], TransformerLMConfig) and \
            lm[1].max_len > max_symbols + 1:
        import dataclasses
        return (lm[0], dataclasses.replace(lm[1],
                                           max_len=max_symbols + 1)) + \
            tuple(lm[2:])
    return lm


def init_beam_state(params, cfg: TransducerConfig, batch: int, *,
                    beam: int = 8, max_symbols: int = 200, lm=None,
                    context=None, ngram=None):
    """Initial beam carry: beam 0 = empty prefix, others dead. The same
    structure is threaded across frames — and across chunks for streaming
    beam decoding (decode/streaming.py). `lm` (see beam_search) adds the
    fusion LM's per-beam next-token log-probs + LSTM state to the carry;
    `context` (decode/context.py ContextBias) adds the per-beam trie node
    id for phrase boosting."""
    lm = _cap_lm_cache(lm, max_symbols)
    B, K, U = batch, beam, max_symbols
    tokens0 = jnp.full((B, K, U), cfg.blank, jnp.int32)
    lens0 = jnp.zeros((B, K), jnp.int32)
    scores0 = jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    hash0 = jnp.zeros((B, K, 2), jnp.uint32)
    pred0, states0 = m.predict_step(
        params, cfg, jnp.full((B * K,), cfg.blank, jnp.int32),
        m.init_pred_state(cfg, B * K))
    unflat = lambda x: x.reshape((B, K) + x.shape[1:])
    # "conf": per-token ACOUSTIC emission log-probs of each beam (the
    # beam-search counterpart of greedy's confidence stream); rides in
    # `outs` so the pool/merge/gather machinery carries it for free.
    # "frame": the GLOBAL encoder-frame index each token was emitted at
    # (timestamps); "foff" accumulates frames consumed by earlier chunks
    # (uniform across beams, so merging representatives is exact).
    # "wake": the chunk-local frame index at which this beam next
    # consumes a frame (> t while sleeping through a multi-blank/TDT
    # duration jump; always == t for standard models).
    outs = {"pred": unflat(pred0),
            "conf": jnp.zeros((B, K, U), jnp.float32),
            "frame": jnp.zeros((B, K, U), jnp.int32),
            "foff": jnp.zeros((B, K), jnp.int32),
            "wake": jnp.zeros((B, K), jnp.int32)}
    states = {"pred": jax.tree.map(unflat, states0)}
    if lm is not None:
        from rnn_transducer_tpu.models.lm import (BOS_ID, init_lm_state,
                                                  lm_step)
        lm_params, lm_cfg = lm[0], lm[1]
        lm_lp0, lm_st0 = lm_step(lm_params, lm_cfg,
                                 jnp.full((B * K,), BOS_ID, jnp.int32),
                                 init_lm_state(lm_cfg, B * K))
        outs["lm_lp"] = unflat(lm_lp0)
        states["lm"] = jax.tree.map(unflat, lm_st0)
    if context is not None:
        # trie state for contextual biasing: all beams start at the root;
        # a (B, K) leaf, so the pool/merge/gather machinery carries it
        outs["cb_node"] = jnp.zeros((B, K), jnp.int32)
    if ngram is not None:  # (models/ngram.py NgramLM, weight)
        outs["ng_state"] = jnp.full((B, K), ngram[0].start, jnp.int32)
    return (tokens0, lens0, scores0, hash0, outs, states)


def beam_search(params, cfg: TransducerConfig, enc_out, enc_lens, *,
                beam: int = 8, max_symbols: int = 200, expansions: int = 3,
                beam_state=None, lm=None, context=None, ngram=None):
    """Beam-search decode a batch of encoded utterances.

    Args:
      enc_out: (B, T, De); enc_lens: (B,).
      beam: beam width K. max_symbols: static cap on emitted labels.
      expansions: max label emissions per frame before a forced blank.
      beam_state: carried beams from a previous chunk (streaming); None
        starts fresh utterances.
      lm: optional shallow fusion — (lm_params, LMConfig, weight) or
        (lm_params, LMConfig, weight, ilm_weight). Each label emission
        adds weight * log P_lm(label | prefix) to the beam score; blank
        transitions are acoustic-only. The LM's per-beam next-token
        log-probs + LSTM state ride in the beam carry, so fusion also
        works across streaming chunks. A nonzero ilm_weight additionally
        SUBTRACTS ilm_weight * log P_ilm(label | prefix) — the model's
        internal LM estimated by zeroing the encoder output at the joint
        (Meng et al. 2021), renormalized over non-blank labels: the
        density-ratio correction for out-of-domain external LMs. The ILM
        score depends on the prefix alone, so subtraction stays exact
        under prefix merging and across streaming chunks.
      context: optional contextual biasing — a decode/context.py
        ContextBias (compiled phrase trie). Label emissions add
        context.delta[node, label] and advance the per-beam trie node;
        RETURNED scores (and their sort order) subtract any dangling
        partial-match boost, while the carried state keeps the raw
        score so a later streaming chunk can still complete the phrase.
        The node is a function of the prefix alone — exact under prefix
        merging. Pass the tables as traced jit arguments.
      ngram: optional backoff n-gram shallow fusion — (models/ngram.py
        NgramLM, weight). Label emissions add weight * lp[state, label]
        (backoff pre-resolved into the dense table) and advance the
        per-beam context state; exact under prefix merging and across
        streaming chunks, composable with `lm` and `context`. Pass the
        tables as traced jit arguments.

    Returns:
      tokens: (B, K, max_symbols) int32 blank-padded, best beam first.
      lengths: (B, K) int32.
      scores: (B, K) f32 merged (fused) log-probabilities.
      beam_state: carry for the next chunk (unsorted).
    """
    B, T, De = enc_out.shape
    K, U = beam, max_symbols
    enc_lens = enc_lens.astype(jnp.int32)
    if lm is not None:
        from rnn_transducer_tpu.models.lm import lm_step
        # same cap as init_beam_state: the carried KV caches and the step
        # cfg must agree on max_len (exact — see _cap_lm_cache)
        lm = _cap_lm_cache(lm, max_symbols)
        lm_params, lm_cfg, lm_w, *_rest = lm
        ilm_w = _rest[0] if _rest else 0.0
    V = cfg.vocab_size
    multiblank = bool(cfg.big_blank_durations)
    tdt = bool(cfg.tdt_durations)
    if multiblank:
        # (joint column, frame advance) per blank class: the standard
        # blank plus one big blank per configured duration
        blank_arcs = [(cfg.blank, 1)] + [
            (V + k, int(d)) for k, d in enumerate(cfg.big_blank_durations)]
    if tdt:
        dvals = tuple(int(d) for d in cfg.tdt_durations)

    def flat(x):  # (B, K, ...) -> (B*K, ...)
        return x.reshape((B * K,) + x.shape[2:])

    def unflat(x):
        return x.reshape((B, K) + x.shape[1:])

    if beam_state is None:
        beam_state = init_beam_state(params, cfg, B, beam=K, max_symbols=U,
                                     lm=lm, context=context, ngram=ngram)
    tokens0, lens0, scores0, hash0, outs0, states0 = beam_state

    def frame_step(t, carry):
        tokens, lens, scores, hashes, outs, states = carry
        enc_t = jnp.take_along_axis(
            enc_out, jnp.minimum(t, enc_lens - 1)[:, None, None], axis=1
        )[:, 0]  # (B, De)
        enc_tk = jnp.repeat(enc_t, K, axis=0)  # (B*K, De) beam-broadcast

        # Candidate pool: a list of (B, K, ...) blocks, concatenated after
        # the expansion rounds. Block 0 is the SELF-DEPOSIT of sleeping
        # beams (mid duration-jump: wake > t): they persist unchanged and
        # pay nothing at this frame. For standard models every live beam
        # has wake == t, so this block is all-NEG_INF and the pool reduces
        # to the plain per-round blank deposits.
        asleep = outs["wake"] > t  # (B, K)
        cand = [(tokens, lens, jnp.where(asleep, scores, NEG_INF), hashes,
                 outs, states)]

        def with_wake(outs_d, lens_like, d):
            """outs with wake = t + d (this candidate sleeps d frames)."""
            o = dict(outs_d)
            o["wake"] = jnp.full_like(lens_like, d) + t
            return o

        live = (tokens, lens, jnp.where(asleep, NEG_INF, scores), hashes,
                outs, states)

        for e in range(expansions + 1):
            tokens, lens, scores, hashes, outs, states = live
            if tdt:
                logits, dur_logits = m.joint_step_tdt(
                    params, cfg, enc_tk, flat(outs["pred"]))
                dlp = unflat(jax.nn.log_softmax(dur_logits, axis=-1))
            else:
                logits = m.joint_step(params, cfg, enc_tk,
                                      flat(outs["pred"]))  # (B*K, C)
            lp = unflat(jax.nn.log_softmax(logits, axis=-1))  # (B, K, C)
            C = lp.shape[-1]  # vocab + big-blank classes
            # --- blank transitions: consume d frames, sleep until t+d ----
            if tdt:
                for i, d in enumerate(dvals):
                    if d == 0:
                        continue  # a duration-0 blank would self-loop
                    sc = scores + lp[:, :, cfg.blank] + dlp[:, :, i]
                    cand.append((tokens, lens, sc, hashes,
                                 with_wake(outs, lens, d), states))
            elif multiblank:
                for col, d in blank_arcs:
                    sc = scores + lp[:, :, col]
                    cand.append((tokens, lens, sc, hashes,
                                 with_wake(outs, lens, d), states))
            else:
                sc = scores + lp[:, :, cfg.blank]
                cand.append((tokens, lens, sc, hashes,
                             with_wake(outs, lens, 1), states))
            if e == expansions:
                break  # final round: forced blank only
            # --- label extensions, one top-k over K*C per utterance -------
            ext = scores[:, :, None] + lp  # (B, K, C)
            if lm is not None:  # shallow fusion on label emissions
                ext = ext + lm_w * _pad_cols(outs["lm_lp"], C)
                if ilm_w:
                    # internal-LM estimate: the joint with the encoder
                    # output zeroed (enc_proj bias kept), renormalized
                    # over non-blank LABELS; depends on the prefix only.
                    ilm_logits = m.joint_step(
                        params, cfg, jnp.zeros_like(enc_tk),
                        flat(outs["pred"]))
                    masked = _mask_nonlabels(unflat(ilm_logits), cfg, V,
                                             NEG_INF)
                    ilm_lp = jax.nn.log_softmax(masked, axis=-1)
                    # blank/big-blank columns zeroed: they are masked to
                    # NEG_INF below anyway, and -inf would poison the
                    # subtraction
                    ext = ext - ilm_w * _mask_nonlabels(ilm_lp, cfg, V, 0.0)
            if context is not None:  # phrase boosting on label emissions
                ext = ext + _pad_cols(context.delta[outs["cb_node"]], C)
            if ngram is not None:  # n-gram shallow fusion
                ext = ext + ngram[1] * _pad_cols(
                    ngram[0].lp[outs["ng_state"]], C)
            ext = _mask_nonlabels(ext, cfg, V, NEG_INF)
            ext = jnp.where((lens >= U)[:, :, None], NEG_INF, ext)
            top_sc, top_idx = jax.lax.top_k(ext.reshape(B, K * C), K)
            src = top_idx // C  # (B, K) source beam
            lab = (top_idx % C).astype(jnp.int32)
            g_tok = jnp.take_along_axis(tokens, src[:, :, None], axis=1)
            g_len = jnp.take_along_axis(lens, src, axis=1)
            g_hash = jnp.take_along_axis(hashes, src[:, :, None], axis=1)
            # append label at position g_len
            write = jax.nn.one_hot(g_len, U, dtype=jnp.bool_)  # (B, K, U)
            g_tok = jnp.where(write, lab[:, :, None], g_tok)
            g_hash = _hash_append(g_hash, lab)
            gather_src = lambda s: jnp.take_along_axis(
                s, src.reshape(src.shape + (1,) * (s.ndim - 2)), axis=1)
            g_states = jax.tree.map(gather_src, states)
            # per-token confidence: the emission's acoustic log-prob
            # lp[b, src, lab], written at the append position
            conf_val = jnp.take_along_axis(lp.reshape(B, K * C), top_idx,
                                           axis=1)  # (B, K)
            g_conf = jnp.where(write, conf_val[:, :, None],
                               gather_src(outs["conf"]))
            # emission timestamp: this round's label is emitted at the
            # current (global) frame foff + t
            g_foff = jnp.take_along_axis(outs["foff"], src, axis=1)
            g_frame = jnp.where(write, (g_foff + t)[:, :, None],
                                gather_src(outs["frame"]))
            new_pred, new_pred_states = m.predict_step(
                params, cfg, flat(lab), jax.tree.map(flat, g_states["pred"]))
            new_outs = {"pred": unflat(new_pred), "conf": g_conf,
                        "frame": g_frame, "foff": g_foff,
                        "wake": jnp.take_along_axis(outs["wake"], src,
                                                    axis=1)}
            if context is not None:  # consume the label in the boost trie
                g_node = jnp.take_along_axis(outs["cb_node"], src, axis=1)
                new_outs["cb_node"] = context.next_node[g_node, lab]
            if ngram is not None:  # advance the n-gram context state
                g_ng = jnp.take_along_axis(outs["ng_state"], src, axis=1)
                new_outs["ng_state"] = ngram[0].next_state[g_ng, lab]
            new_states = {"pred": jax.tree.map(unflat, new_pred_states)}
            if lm is not None:
                new_lm_lp, new_lm_st = lm_step(
                    lm_params, lm_cfg, flat(lab),
                    jax.tree.map(flat, g_states["lm"]))
                new_outs["lm_lp"] = unflat(new_lm_lp)
                new_states["lm"] = jax.tree.map(unflat, new_lm_st)
            g_len1 = jnp.minimum(g_len + 1, U)
            if tdt:
                # every TDT emission consumes its predicted duration: fork
                # the top-K candidates over the duration set — d > 0 goes
                # to the pool (sleeps until t+d), d == 0 continues live
                # and may emit again at this frame (expansions-capped)
                dsel = jnp.take_along_axis(dlp, src[:, :, None], axis=1)
                for i, d in enumerate(dvals):
                    if d == 0:
                        continue
                    cand.append((g_tok, g_len1, top_sc + dsel[:, :, i],
                                 g_hash, with_wake(new_outs, g_len1, d),
                                 new_states))
                if 0 in dvals:
                    live_sc = top_sc + dsel[:, :, dvals.index(0)]
                else:
                    live_sc = jnp.full_like(top_sc, NEG_INF)
                live = (g_tok, g_len1, live_sc, g_hash, new_outs,
                        new_states)
            else:
                live = (g_tok, g_len1, top_sc, g_hash, new_outs,
                        new_states)

        # --- prefix merge over the pool --------------------------------
        # Equality via the carried rolling hash: O(P^2) compares instead of
        # the O(P^2 * U) all-pairs token-tensor compare; exact up to a
        # ~2^-64 two-lane hash collision. Equal wake is also required:
        # same prefix at a different lattice position is a different
        # hypothesis (only relevant for multi-blank/TDT duration jumps —
        # for standard models every finite candidate has wake == t+1).
        p_tok = jnp.concatenate([c[0] for c in cand], axis=1)
        p_len = jnp.concatenate([c[1] for c in cand], axis=1)
        p_sc = jnp.concatenate([c[2] for c in cand], axis=1)
        p_h = jnp.concatenate([c[3] for c in cand], axis=1)
        p_pr = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1),
                            *[c[4] for c in cand])
        p_st = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1),
                            *[c[5] for c in cand])
        P = p_sc.shape[1]
        same_len = p_len[:, :, None] == p_len[:, None, :]
        same_hash = jnp.all(p_h[:, :, None, :] == p_h[:, None, :, :],
                            axis=-1)  # (B, P, P) — hash lanes, not tokens
        same_wake = p_pr["wake"][:, :, None] == p_pr["wake"][:, None, :]
        eq = same_len & same_hash & same_wake  # (B, P, P)
        # logsumexp of scores over each equivalence class
        sc_b = jnp.where(eq, p_sc[:, None, :], NEG_INF)  # (B, P, P)
        mx = jnp.max(sc_b, axis=-1)
        merged = mx + jnp.log(
            jnp.sum(jnp.exp(sc_b - mx[:, :, None]), axis=-1))
        merged = jnp.where(mx <= NEG_INF * 0.5, NEG_INF, merged)
        # keep one canonical representative per class (the lowest index)
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, P, P), 2)
        first = jnp.min(jnp.where(eq, idx, P), axis=-1)
        me = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
        merged = jnp.where(first == me, merged, NEG_INF)

        top_sc, top_i = jax.lax.top_k(merged, K)  # (B, K)
        n_tok = jnp.take_along_axis(p_tok, top_i[:, :, None], axis=1)
        n_len = jnp.take_along_axis(p_len, top_i, axis=1)
        n_h = jnp.take_along_axis(p_h, top_i[:, :, None], axis=1)
        gather_top = lambda s: jnp.take_along_axis(
            s, top_i.reshape(top_i.shape + (1,) * (s.ndim - 2)), axis=1)
        n_pr = jax.tree.map(gather_top, p_pr)
        n_st = jax.tree.map(gather_top, p_st)

        # frames past enc_len leave the carry untouched
        active = (t < enc_lens).reshape((B,) + (1,) * 1)
        pick = lambda new, old: jnp.where(
            active.reshape((B,) + (1,) * (new.ndim - 1)), new, old)
        (tokens, lens, scores, hashes, outs, states) = carry
        return (pick(n_tok, tokens), pick(n_len, lens), pick(top_sc, scores),
                pick(n_h, hashes), jax.tree.map(pick, n_pr, outs),
                jax.tree.map(pick, n_st, states))

    carry = (tokens0, lens0, scores0, hash0, outs0, states0)
    carry = jax.lax.fori_loop(0, T, frame_step, carry)
    # advance the global frame offset past this chunk's consumed frames
    # (streaming: the next chunk's emissions stamp later timestamps)
    outs_f = dict(carry[4])
    outs_f["foff"] = outs_f["foff"] + enc_lens[:, None]
    # re-base wake to the next chunk's frame numbering: a beam mid
    # duration-jump at the chunk boundary sleeps through the first
    # (wake - enc_len) frames of the next chunk (0 for standard models;
    # the clamp only touches dead beams)
    outs_f["wake"] = jnp.maximum(outs_f["wake"] - enc_lens[:, None], 0)
    carry = carry[:4] + (outs_f,) + carry[5:]
    tokens, lens, scores = carry[0], carry[1], carry[2]
    # sort beams by REPORTED score descending (with biasing: raw carried
    # score minus any dangling partial-phrase boost)
    scores = _reported_scores(carry, context)
    order = jnp.argsort(-scores, axis=-1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return tokens, lens, scores, carry


def _reported_scores(beam_state, context=None):
    """Carried scores adjusted for reporting: with contextual biasing,
    subtract the unlocked (dangling partial-match) boost so hypotheses
    stuck mid-phrase don't outrank by bonus they haven't earned. The
    carry keeps the RAW score (a later streaming chunk may complete the
    phrase)."""
    scores, outs = beam_state[2], beam_state[4]
    if context is not None:
        scores = scores - context.accum[outs["cb_node"]]
    return scores


def sorted_confidence(beam_state, context=None):
    """Per-token acoustic emission log-probs of each beam, sorted in the
    same best-first order as beam_search's returned tokens (argsort of
    the reported scores is stable, so the order matches exactly). Pass
    the same `context` given to beam_search."""
    outs = beam_state[4]
    order = jnp.argsort(-_reported_scores(beam_state, context), axis=-1)
    return jnp.take_along_axis(outs["conf"], order[:, :, None], axis=1)


def sorted_frames(beam_state, context=None):
    """Per-token global encoder-frame emission indices of each beam
    (timestamps), in the same best-first order as the returned tokens.
    Pass the same `context` given to beam_search."""
    outs = beam_state[4]
    order = jnp.argsort(-_reported_scores(beam_state, context), axis=-1)
    return jnp.take_along_axis(outs["frame"], order[:, :, None], axis=1)


def recognize_beam(params, cfg: TransducerConfig, feats, feat_lens, *,
                   beam: int = 8, max_symbols: int = 200,
                   expansions: int = 3, lm=None, context=None, ngram=None,
                   with_confidence: bool = False,
                   with_timestamps: bool = False):
    """Features -> N-best label sequences (reference `beam_search` API).

    with_confidence=True appends (B, K, max_symbols) per-token acoustic
    emission log-probs (beam counterpart of greedy's);
    with_timestamps=True appends (B, K, max_symbols) int32 encoder-frame
    emission indices."""
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, scores, carry = beam_search(
        params, cfg, enc_out, enc_lens, beam=beam,
        max_symbols=max_symbols, expansions=expansions, lm=lm,
        context=context, ngram=ngram)
    out = (tokens, lens, scores)
    if with_confidence:
        out = out + (sorted_confidence(carry, context),)
    if with_timestamps:
        out = out + (sorted_frames(carry, context),)
    return out
