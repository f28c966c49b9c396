"""Pruned RNN-T training (k2/icefall-style two-pass loss), TPU-native.

The full RNN-T joint computes a (B, T, U+1, V) lattice of softmaxes —
O(T·U·V·J) FLOPs. The pruned recipe (Kuang et al., "Pruned RNN-T for
fast, memory-efficient ASR training") replaces it with:

  1. a *simple* (trivial-joiner) first pass: per-frame and per-label
     projections to V combine ADDITIVELY, so the full-lattice loss costs
     O(T·U·V) with no J factor — two fused XLA reductions compute the
     per-cell normalizer without materializing (B,T,U1,V);
  2. pruning bounds from the simple lattice's arc posteriors: a
     monotone, jump-limited window start s_begin (B, T) chosen in closed
     form (associative scans — no sequential host logic);
  3. the expensive joint evaluated ONLY on the (T, S) band
     (S = pruned_range « U+1), with the banded lattice recursion reusing
     the log-semiring associative row solver of ops/rnnt_loss.py in
     window coordinates u = s_begin[t] + s.

Everything is static-shape; the band gathers are take_along_axis on the
label axis (XLA dynamic-gather, TPU-lowered). The banded loss is a
custom-VJP occupancy gradient like the full loss; the joint matmul, tanh
and softmax around it are plain autodiff.

Semantics: the pruned loss is the NLL restricted to alignment paths
inside the band — an upper bound on the full NLL that is tight when the
band covers the posterior mass. Training objective (as in k2):
`pruned + simple_loss_scale * simple`.

Capability counterpart of the reference family's warp-rnnt loss
(SURVEY.md §2 row 5) at reduced compute; the full-lattice paths remain
the default (`loss_impl=auto|fused|pallas|xla`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.ops.rnnt_loss import (
    NEG_INF,
    _logaddexp,
    _solve_row,
)


# ------------------------- simple (trivial) joiner ------------------------

def simple_lp(am, lm, labels, blank):
    """Blank/label log-probs of the additive joiner, (B, T, U1) each.

    am: (B, T, V) per-frame logits; lm: (B, U1, V) per-label-position
    logits. Cell (t, u) scores log_softmax_v(am[t] + lm[u]); the
    normalizer lse[t, u] = LSE_v(am[t, v] + lm[u, v]) is computed with
    two broadcast-fused reductions — the (B, T, U1, V) sum is never
    materialized in HBM.
    """
    B, T, V = am.shape
    U1 = lm.shape[1]
    # LSE_v(am[t] + lm[u]) as an MXU matmul:
    #   exp(am - am_max) @ exp(lm - lm_max)^T, log, add the maxes back.
    # One (B, T, V) x (B, U1, V)^T batched matmul instead of (B,T,U1,V)
    # broadcast reductions on the VPU. The summands are <= 1 and the term
    # at (argmax am, argmax lm)'s shared support keeps the sum well above
    # fp32 underflow for any realistically-scaled logits; clamp anyway.
    am_max = jnp.max(am, axis=-1, keepdims=True)
    lm_max = jnp.max(lm, axis=-1, keepdims=True)
    M = jnp.einsum("btv,buv->btu", jnp.exp(am - am_max),
                   jnp.exp(lm - lm_max),
                   preferred_element_type=jnp.float32)
    lse = (jnp.log(jnp.maximum(M, jnp.finfo(jnp.float32).tiny))
           + am_max + jnp.swapaxes(lm_max, 1, 2))
    lp_blank = am[:, :, blank][:, :, None] + lm[:, None, :, blank] - lse
    # label at position u (u < U): am[t, y_u] + lm[u, y_u] - lse.
    # A take_along_axis over the (lane) vocab axis lowers to a ~10x-
    # slower dynamic gather on TPU; pick values exactly with an fp32
    # one-hot MXU matmul (am) and a fused iota-compare reduce (lm).
    lab = labels.astype(jnp.int32)  # (B, U)
    U = lab.shape[1]
    onehot = jax.nn.one_hot(lab, V, dtype=jnp.float32)  # (B, U, V)
    am_y = jnp.einsum("btv,buv->btu", am, onehot,
                      preferred_element_type=jnp.float32)
    v_ids = jax.lax.broadcasted_iota(jnp.int32, (B, U, V), 2)
    lm_y = jnp.sum(jnp.where(v_ids == lab[..., None], lm[:, :-1, :], 0.0),
                   axis=-1)
    lp_y = am_y + lm_y[:, None, :] - lse[:, :, :-1]
    pad = jnp.full((B, T, 1), NEG_INF, lp_y.dtype)
    return lp_blank, jnp.concatenate([lp_y, pad], axis=-1)


# ---------------------------- pruning bounds ------------------------------

def prune_bounds(occ, pruned_range, frame_lens, label_lens, quantize=1):
    """Window starts s_begin (B, T) int32 from per-cell arc posteriors.

    occ: (B, T, U1) total arc posterior (g_blank + g_y) of the first
    pass. The band [s_begin, s_begin + S) per frame satisfies, by
    construction (all closed-form / associative — no sequential logic):

      * s_begin[0] = 0 (the lattice starts at u = 0);
      * monotone non-decreasing;
      * jump limit  s_begin[t+1] - s_begin[t] <= S - 1  (adjacent bands
        overlap, so blank transitions never leave the band);
      * the terminal cell (t_len-1, u_len) is inside the band;
      * 0 <= s_begin <= U1 - S.

    quantize > 1 rounds starts DOWN to a multiple (kernel-friendly
    sublane alignment); the jump limit is relaxed to the largest
    quantized multiple <= S - 1.
    """
    center = jnp.argmax(occ, axis=-1).astype(jnp.int32)  # (B, T)
    return bounds_from_centers(center, occ.shape[2], pruned_range,
                               frame_lens, label_lens, quantize,
                               offset=pruned_range // 2)


def bounds_from_centers(center, U1, pruned_range, frame_lens, label_lens,
                        quantize=1, offset=None):
    """Feasible window starts from per-frame band centers (B, T) int32.

    The feasibility machinery shared by posterior pruning (prune_bounds)
    and alignment-restricted bands (alignment_bounds): clip, quantize,
    monotone running max, jump cap, terminal raise. `offset` shifts the
    window start below the center (default: centered)."""
    B, T = center.shape
    S = min(pruned_range, U1)
    if offset is None:
        offset = S // 2
    step = S - 1 if quantize == 1 else max(1, ((S - 1) // quantize)) * quantize
    # with quantization the start cap rounds UP (the window may overhang
    # the top of the lattice; overhanging cells are masked NEG_INF by the
    # banded DP) so a q-aligned start covering the terminal always exists
    hi = U1 - S if quantize == 1 else -(-(U1 - S) // quantize) * quantize
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :]
    t_len = frame_lens.astype(jnp.int32)[:, None]
    u_len = label_lens.astype(jnp.int32)[:, None]

    raw = jnp.clip(center - offset, 0, hi)
    if quantize > 1:
        raw = (raw // quantize) * quantize
    raw = raw.at[:, 0].set(0)
    # beyond t_len the center is garbage; freeze at the terminal target so
    # the running max is not polluted
    final_lo = jnp.clip(u_len - S + 1, 0, hi)
    if quantize > 1:
        final_lo = -(-final_lo // quantize) * quantize  # round UP: keeps u_len >= sb
        final_lo = jnp.clip(final_lo, 0, hi)
    raw = jnp.where(t_ids < t_len, raw, final_lo)

    # monotone: running max
    m = jax.lax.associative_scan(jnp.maximum, raw, axis=1)
    # jump cap: c[t] = min_{j<=t} (m[j] + (t-j)*step) = t*step + runmin(m[j]-j*step)
    shifted = m - t_ids * step
    c = t_ids * step + jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
    # terminal feasibility raise: s_begin[t] >= final_lo - (t_len-1-t)*step
    lo = final_lo - jnp.maximum(t_len - 1 - t_ids, 0) * step
    sb = jnp.maximum(c, jnp.maximum(lo, 0))
    return jnp.clip(sb, 0, hi)


def alignment_bounds(emit_frames, T, pruned_range, frame_lens, label_lens,
                     U1, quantize=1, left_labels=None):
    """Window starts from a per-label alignment (AR-RNNT band).

    Alignment-restricted RNN-T (Mahadeokar et al. 2021, "Alignment
    Restricted Streaming RNN-T") confines training-time alignment paths
    to a band around a trusted reference alignment instead of the simple
    joiner's posteriors: emission timing becomes a CONSTRAINT (bounding
    the model's emission delay — the paper's motivation) rather than a
    by-product, and no simple-pass heads are needed.

    emit_frames: (B, U) int32 — encoder frame at which label u is
    emitted on the reference alignment (ops/rnnt_align: a teacher model,
    the live model under stop_gradient, or external forced alignments;
    positions >= label_len are ignored). The band center at frame t is
    the aligned path's label column after frame t,

        center[b, t] = #{u < label_len : emit_frames[b, u] <= t},

    so the S-wide band covers `left_labels` positions behind the path
    (late emissions) and S - 1 - left_labels ahead (early emissions),
    then the shared feasibility machinery (bounds_from_centers) makes it
    monotone, jump-capped, and terminal-covering. Same contract as
    prune_bounds: consumable by rnnt_loss_pruned / the band kernels.
    """
    B, U = emit_frames.shape
    S = min(pruned_range, U1)
    if left_labels is None:
        left_labels = S // 2
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]  # (1, T, 1)
    u_ids = jnp.arange(U, dtype=jnp.int32)[None, None, :]  # (1, 1, U)
    valid_u = u_ids < label_lens.astype(jnp.int32)[:, None, None]
    emitted = (emit_frames[:, None, :] <= t_ids) & valid_u  # (B, T, U)
    center = jnp.sum(emitted.astype(jnp.int32), axis=2)  # (B, T)
    return bounds_from_centers(center, U1, pruned_range, frame_lens,
                               label_lens, quantize, offset=left_labels)


# --------------------------- banded lattice DP ----------------------------

def _band_masks(sb, S, frame_lens, label_lens, U1):
    """emit/blank/terminal masks + u-grid in window coordinates (B,T,S)."""
    B, T = sb.shape
    u = sb[:, :, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    t_len = frame_lens.astype(jnp.int32)[:, None, None]
    u_len = label_lens.astype(jnp.int32)[:, None, None]
    in_lattice = u < U1
    emit_ok = (u < u_len) & (t_ids < t_len) & in_lattice
    blank_ok = (t_ids + 1 < t_len) & (u <= u_len) & in_lattice
    terminal = (t_ids == t_len - 1) & (u == u_len)
    return u, emit_ok, blank_ok, terminal


def _shift_gather(row, ds, fill):
    """out[b, s] = row[b, s + ds[b]] (NEG_INF-filled outside [0, S))."""
    B, S = row.shape
    idx = jnp.arange(S, dtype=jnp.int32)[None, :] + ds[:, None]
    ok = (idx >= 0) & (idx < S)
    return jnp.where(ok, jnp.take_along_axis(row, jnp.clip(idx, 0, S - 1),
                                             axis=1), fill)


def _alpha_band(lpb_m, lpy_m, sb):
    """A[t, s] = alpha[t, sb[t] + s]: (B, T, S) via scan over T."""
    B, T, S = lpb_m.shape
    row0 = jnp.concatenate(
        [jnp.zeros((B, 1), lpy_m.dtype),
         jnp.cumsum(lpy_m[:, 0, :-1], axis=-1)], axis=-1)
    row0 = jnp.maximum(row0, NEG_INF)

    ds = sb[:, 1:] - sb[:, :-1]  # (B, T-1) >= 0

    def step(prev_row, xs):
        lpb_prev, lpy_t, ds_t = xs
        # blank arrivals: A[t-1, s+ds] + lpb[t-1, s+ds]
        b_vec = _shift_gather(prev_row + lpb_prev, ds_t, NEG_INF)
        b_vec = jnp.maximum(b_vec, NEG_INF)
        c_vec = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, lpy_t.dtype), lpy_t[:, :-1]], axis=-1)
        row = _solve_row(b_vec, c_vec)
        return row, row

    xs = (jnp.moveaxis(lpb_m[:, :-1], 1, 0),
          jnp.moveaxis(lpy_m[:, 1:], 1, 0),
          jnp.moveaxis(ds, 1, 0))
    _, rows = jax.lax.scan(step, row0, xs, unroll=8)
    alpha = jnp.concatenate([row0[None], rows], axis=0)
    return jnp.moveaxis(alpha, 0, 1)


def _beta_band(lpb_m, lpy_m, accept, sb):
    """Bt[t, s] = beta[t, sb[t] + s] (B, T, S), reverse scan."""
    B, T, S = lpb_m.shape
    ds = sb[:, 1:] - sb[:, :-1]

    def solve_row_rev(d_vec, c_vec):
        d_f = jnp.flip(d_vec, axis=-1)
        c_f = jnp.flip(c_vec, axis=-1)
        c_f = c_f.at[:, 0].set(NEG_INF)
        return jnp.flip(_solve_row(d_f, c_f), axis=-1)

    def step(next_row, xs):
        lpb_t, lpy_t, acc_t, ds_t = xs
        # blank departures: beta[t+1, same u] = next_row[s - ds]
        down = _shift_gather(next_row, -ds_t, NEG_INF)
        d_vec = _logaddexp(acc_t, lpb_t + jnp.maximum(down, NEG_INF))
        d_vec = jnp.maximum(d_vec, NEG_INF)
        return (solve_row_rev(d_vec, lpy_t),) * 2

    last = jnp.full((B, S), NEG_INF, lpb_m.dtype)
    # frame T-1 has no t+1: run it with ds = 0 against a NEG_INF next row
    ds_x = jnp.concatenate([ds, jnp.zeros((B, 1), ds.dtype)], axis=1)
    xs = (jnp.moveaxis(lpb_m, 1, 0), jnp.moveaxis(lpy_m, 1, 0),
          jnp.moveaxis(accept, 1, 0), jnp.moveaxis(ds_x, 1, 0))
    _, rows = jax.lax.scan(step, last, xs, reverse=True, unroll=8)
    return jnp.moveaxis(rows, 0, 1)


def _band_forward(lpb, lpy, sb, frame_lens, label_lens, U1):
    B, T, S = lpb.shape
    u, emit_ok, blank_ok, terminal = _band_masks(sb, S, frame_lens,
                                                 label_lens, U1)
    lpb_m = jnp.where(blank_ok, lpb, NEG_INF)
    lpy_m = jnp.where(emit_ok, lpy, NEG_INF)
    accept = jnp.where(terminal, lpb, NEG_INF)
    alpha = _alpha_band(lpb_m, lpy_m, sb)
    b_idx = jnp.arange(B)
    valid = frame_lens.astype(jnp.int32) >= 1
    t_last = jnp.maximum(frame_lens.astype(jnp.int32), 1) - 1
    s_last = label_lens.astype(jnp.int32) - sb[b_idx, t_last]
    s_ok = (s_last >= 0) & (s_last < S)
    s_last_c = jnp.clip(s_last, 0, S - 1)
    log_z = (alpha[b_idx, t_last, s_last_c]
             + lpb[b_idx, t_last, s_last_c])
    log_z = jnp.where(s_ok, log_z, NEG_INF)
    loss = jnp.where(valid, -log_z, 0.0)
    return loss, (alpha, lpb_m, lpy_m, accept)


def _band_occupancies(lpb, lpy, sb, frame_lens, label_lens, U1,
                      saved=None):
    B, T, S = lpb.shape
    if saved is None:
        _, saved = _band_forward(lpb, lpy, sb, frame_lens, label_lens, U1)
    alpha, lpb_m, lpy_m, accept = saved
    beta = _beta_band(lpb_m, lpy_m, accept, sb)
    log_z = beta[:, 0, 0]
    ds = sb[:, 1:] - sb[:, :-1]
    # beta_down[t, s] = beta[t+1, u]  (u = sb[t] + s -> index s - ds[t])
    down = jax.vmap(_shift_gather, in_axes=(1, 1, None), out_axes=1)(
        beta[:, 1:], -ds, NEG_INF)
    down = jnp.concatenate(
        [down, jnp.full((B, 1, S), NEG_INF, beta.dtype)], axis=1)
    arc_blank = _logaddexp(lpb_m + down, accept)
    valid = (frame_lens.astype(jnp.int32) >= 1)[:, None, None]
    g_blank = jnp.where(
        valid, jnp.exp(alpha + arc_blank - log_z[:, None, None]), 0.0)
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((B, T, 1), NEG_INF, beta.dtype)], axis=2)
    g_y = jnp.where(
        valid, jnp.exp(alpha + lpy_m + beta_right - log_z[:, None, None]),
        0.0)
    return g_blank, g_y


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rnnt_loss_banded(lp_blank_w, lp_y_w, s_begin, frame_lens, label_lens,
                     U1, fastemit_lambda=0.0):
    """Per-utterance RNN-T NLL restricted to the band u in
    [s_begin[t], s_begin[t] + S).

    lp_blank_w / lp_y_w: (B, T, S) blank/label log-probs in window
    coordinates. Returns an upper bound on the full NLL (paths outside
    the band are pruned); exact when the band covers the posterior mass.
    The backward is the banded occupancy gradient (custom VJP, no
    differentiation through the scans). U1 (static) is the full label
    axis size; fastemit_lambda scales the emit-arc gradient (FastEmit).
    """
    loss, _ = _band_forward(lp_blank_w, lp_y_w, s_begin, frame_lens,
                            label_lens, U1)
    return loss


def _banded_fwd(lp_blank_w, lp_y_w, s_begin, frame_lens, label_lens, U1,
                fastemit_lambda):
    loss, saved = _band_forward(lp_blank_w, lp_y_w, s_begin, frame_lens,
                                label_lens, U1)
    return loss, (lp_blank_w, lp_y_w, s_begin, frame_lens, label_lens,
                  saved)


def _banded_bwd(U1, fastemit_lambda, res, g):
    lp_blank_w, lp_y_w, s_begin, frame_lens, label_lens, saved = res
    g_blank, g_y = _band_occupancies(lp_blank_w, lp_y_w, s_begin,
                                     frame_lens, label_lens, U1,
                                     saved=saved)
    if fastemit_lambda:
        g_y = g_y * (1.0 + fastemit_lambda)
    scale = g[:, None, None]
    return -g_blank * scale, -g_y * scale, None, None, None


rnnt_loss_banded.defvjp(_banded_fwd, _banded_bwd)


# --------------------------- pruned joint + loss --------------------------

def _pruned_lp_chunk(f_c, u_c, lab_w, g, w, b, blank, compute_dtype):
    """One time-chunk of the band joint: (B, Tc, ...) -> lp pair.

    No take_along_axis anywhere: the predictor-row pick is an fp32
    one-hot MXU matmul (whose transpose — dg — is another matmul instead
    of a pathological scatter-add), and the label-score pick is a fused
    iota-compare reduce over the already-resident lp tile.
    """
    B, Tc, S = u_c.shape
    U1 = g.shape[1]
    onehot_u = (u_c[..., None]
                == jax.lax.broadcasted_iota(jnp.int32, (B, Tc, S, U1), 3)
                ).astype(jnp.float32)
    g_w = jnp.einsum("btsu,buj->btsj", onehot_u, g,
                     preferred_element_type=jnp.float32)
    z = jnp.tanh(f_c[:, :, None, :] + g_w)  # (B, Tc, S, J)
    cd = compute_dtype
    logits = (jnp.einsum("btsj,jv->btsv", z.astype(cd), w.astype(cd),
                         preferred_element_type=jnp.float32)
              + b.astype(jnp.float32))
    lp = jax.nn.log_softmax(logits, axis=-1)
    lpb_w = lp[..., blank]
    v_ids = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 3)
    lpy_w = jnp.sum(jnp.where(v_ids == lab_w[..., None], lp, 0.0), axis=-1)
    return lpb_w, lpy_w


# keep ~this much live fp32 band-logit memory per chunk; the T axis is
# chunked and rematerialized in the backward so large-vocab configs never
# hold (B, T, S, V) in HBM at once
_CHUNK_BYTES = 128 * 1024 * 1024


def _use_band_kernel() -> bool:
    """Fused Pallas band kernels (ops/rnnt_band_fused.py): default on
    TPU; RNNT_TPU_BAND_KERNEL=0/1 forces off/on (1 uses interpret mode
    off-TPU — the cross-impl equality tests use this)."""
    import os
    v = os.environ.get("RNNT_TPU_BAND_KERNEL", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() == "tpu"


def _pruned_lp(f, g, w, b, labels, s_begin, S, blank, compute_dtype):
    """Joint evaluated on the band only -> (lp_blank_w, lp_y_w) (B,T,S).

    f: (B, T, J) encoder-side joint activation; g: (B, U1, J)
    predictor-side. The predictor rows are gathered per frame
    (take_along_axis over the label axis), so the joint matmul is
    (B·T·S, J) x (J, V) — a U1/S FLOP and HBM reduction vs the full
    lattice. Plain autodiff (gather grads scatter-add back to g).

    The T axis is processed in rematerialized chunks (lax.map over a
    jax.checkpoint'd body): only the tiny (B, T, S) lp outputs persist,
    the (B, Tc, S, V) chunk logits are recomputed in the backward —
    live memory stays bounded at any vocab size.
    """
    B, T, J = f.shape
    U1 = g.shape[1]
    V = w.shape[1]
    u = s_begin[:, :, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    u_c = jnp.clip(u, 0, U1 - 1)  # (B, T, S)
    # label id at lattice position u (u < U valid)
    U = labels.shape[1]
    lab_pad = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1)
    lab_w = jnp.take_along_axis(lab_pad[:, None].repeat(T, 1), u_c, axis=2)

    # TPU path: fused Pallas band kernels (band logits never in HBM);
    # the XLA chunked path remains the fallback / non-TPU reference.
    from rnn_transducer_tpu.ops.rnnt_band_fused import (band_fused_supported,
                                                        band_lp_fused)
    Sp = -(-S // 8) * 8
    if (_use_band_kernel()
            and band_fused_supported(Sp, J, V, compute_dtype)):
        if Sp != S:
            u_p = jnp.concatenate(  # overhang rows: clipped, masked later
                [u_c, jnp.broadcast_to(u_c[:, :, -1:], (B, T, Sp - S))],
                axis=2)
        else:
            u_p = u_c
        onehot_u = (u_p[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (B, T, Sp, U1), 3)).astype(jnp.float32)
        g_w = jnp.einsum("btsu,buj->btsj", onehot_u, g,
                         preferred_element_type=jnp.float32)
        lab_p = jnp.take_along_axis(lab_pad[:, None].repeat(T, 1),
                                    jnp.clip(u_p, 0, U1 - 1), axis=2)
        lpb_w, lpy_w = band_lp_fused(f, g_w, w, b, lab_p, blank,
                                     compute_dtype)
        lpb_w, lpy_w = lpb_w[:, :, :S], lpy_w[:, :, :S]
        lpy_w = jnp.where(u_c < U, lpy_w, NEG_INF)
        return lpb_w, lpy_w

    tc = max(1, min(T, _CHUNK_BYTES // max(1, B * S * V * 4)))
    body = jax.checkpoint(functools.partial(
        _pruned_lp_chunk, g=g, w=w, b=b, blank=blank,
        compute_dtype=compute_dtype))
    if tc >= T:
        lpb_w, lpy_w = body(f, u_c, lab_w)
    else:
        nc = -(-T // tc)
        pad = nc * tc - T

        def padc(x):
            x = jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2))
            return jnp.moveaxis(
                x.reshape((B, nc, tc) + x.shape[2:]), 1, 0)

        lpb_w, lpy_w = jax.lax.map(
            lambda args: body(*args), (padc(f), padc(u_c), padc(lab_w)))
        lpb_w = jnp.moveaxis(lpb_w, 0, 1).reshape(B, nc * tc, S)[:, :T]
        lpy_w = jnp.moveaxis(lpy_w, 0, 1).reshape(B, nc * tc, S)[:, :T]
    lpy_w = jnp.where(u_c < U, lpy_w, NEG_INF)
    return lpb_w, lpy_w


def rnnt_loss_pruned(f, g, w, b, labels, frame_lens, label_lens, s_begin,
                     pruned_range, blank=0, compute_dtype=jnp.bfloat16,
                     fastemit_lambda=0.0):
    """Per-utterance pruned RNN-T loss (second pass).

    s_begin: (B, T) int32 window starts from `prune_bounds`. The joint
    runs only on the S-wide band; loss/grad flow through the banded
    custom VJP and plain autodiff around it.
    """
    U1 = g.shape[1]
    S = min(pruned_range, U1)
    sb = jax.lax.stop_gradient(s_begin)
    lpb_w, lpy_w = _pruned_lp(f, g, w, b, labels, sb, S, blank,
                              compute_dtype)
    return rnnt_loss_banded(lpb_w, lpy_w, sb, frame_lens, label_lens, U1,
                            fastemit_lambda)


def pruned_two_pass_loss(params_simple, f, g, w, b, am_in, lm_in, labels,
                         frame_lens, label_lens, pruned_range, blank=0,
                         compute_dtype=jnp.bfloat16, fastemit_lambda=0.0):
    """The full k2-style objective: simple first pass + pruned second.

    params_simple: {"am": {w, b}, "lm": {w, b}} trivial-joiner heads.
    am_in: (B, T, De) encoder outputs; lm_in: (B, U1, Dp) predictor
    outputs. Returns (simple_per_utt, pruned_per_utt, s_begin).
    """
    from rnn_transducer_tpu.ops.rnnt_loss import (occupancies_from_lp,
                                                  rnnt_loss_from_lp)
    cd = compute_dtype
    am = (jnp.einsum("btd,dv->btv", am_in.astype(cd),
                     params_simple["am"]["w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + params_simple["am"]["b"].astype(jnp.float32))
    lm = (jnp.einsum("bud,dv->buv", lm_in.astype(cd),
                     params_simple["lm"]["w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + params_simple["lm"]["b"].astype(jnp.float32))
    lpb_s, lpy_s = simple_lp(am, lm, labels, blank)
    simple_per_utt = rnnt_loss_from_lp(lpb_s, lpy_s, frame_lens,
                                       label_lens, fastemit_lambda)
    gb, gy = occupancies_from_lp(jax.lax.stop_gradient(lpb_s),
                                 jax.lax.stop_gradient(lpy_s),
                                 frame_lens, label_lens)
    sb = prune_bounds(gb + gy, pruned_range, frame_lens, label_lens)
    pruned_per_utt = rnnt_loss_pruned(
        f, g, w, b, labels, frame_lens, label_lens, sb, pruned_range,
        blank, compute_dtype, fastemit_lambda)
    return simple_per_utt, pruned_per_utt, sb
