"""SpecAugment (Park et al. 2019): time/frequency masking on log-mel.

Standard augmentation for this model family. Fully jittable: masks are
sampled with jax.random and applied as multiplicative zero-masks, so the
augmentation runs on-device inside the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _time_warp(key, feats, feat_lens, W: int):
    """Park et al.'s time warping: a random anchor w0 in [W, len-W) is
    displaced by d ~ U[-W, W] and the valid frames are piecewise-linearly
    rewarped around it (frame 0 and frame len-1 stay fixed). Linear
    interpolation along time, static shapes; padding frames untouched."""
    B, T, F = feats.shape
    lens = feat_lens.astype(jnp.float32)
    L1 = lens - 1.0  # right fixed point of the warp
    k1, k2 = jax.random.split(key)
    lo = jnp.full((B,), float(W))
    hi = jnp.maximum(lens - W, lo + 1.0)
    w0 = lo + jax.random.uniform(k1, (B,)) * (hi - lo)
    d = jax.random.uniform(k2, (B,), minval=-float(W), maxval=float(W))
    w1 = jnp.clip(w0 + d, 1.0, jnp.maximum(L1 - 1.0, 1.0))
    t = jnp.arange(T, dtype=jnp.float32)[None, :]
    left = t * (w0 / w1)[:, None]
    right = (w0[:, None] + (t - w1[:, None])
             * ((L1 - w0) / jnp.maximum(L1 - w1, 1e-6))[:, None])
    src = jnp.where(t <= w1[:, None], left, right)
    src = jnp.clip(src, 0.0, jnp.maximum(L1[:, None], 0.0))
    # the paper samples w0 from [W, len-W): utterances with len <= 2W are
    # too short to warp — leave them untouched
    src = jnp.where((lens > 2.0 * W)[:, None], src, t)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)
    frac = (src - i0)[:, :, None]
    f0 = jnp.take_along_axis(feats, i0[:, :, None], axis=1)
    f1 = jnp.take_along_axis(feats, i1[:, :, None], axis=1)
    out = f0 * (1.0 - frac) + f1 * frac
    valid = (t < lens[:, None])[:, :, None]
    return jnp.where(valid, out, feats)


def spec_augment(key, feats, feat_lens, *, n_time_masks: int = 2,
                 time_mask_frames: int = 20, n_freq_masks: int = 2,
                 freq_mask_bins: int = 15, time_warp_frames: int = 0):
    """feats: (B, T, F) -> masked copy. Masks never exceed valid frames.

    time_warp_frames > 0 additionally applies Park et al.'s time warping
    (displacement window W = time_warp_frames) before the masks — the
    paper's third transform, off by default (the masks carry most of the
    regularization; warping costs two gathers)."""
    B, T, F = feats.shape
    keys = jax.random.split(key, 5)
    if time_warp_frames > 0:
        feats = _time_warp(keys[4], feats, feat_lens, time_warp_frames)
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, None, :]  # (1, 1, T)
    f_ids = jnp.arange(F, dtype=jnp.int32)[None, None, :]  # (1, 1, F)

    # time masks: starts in [0, len - w], widths in [0, time_mask_frames]
    tw = jax.random.randint(keys[0], (B, n_time_masks), 0,
                            time_mask_frames + 1)
    max_start = jnp.maximum(
        feat_lens.astype(jnp.int32)[:, None] - tw, 1)
    # Uniform over the per-row variable range [0, max_start): scale a
    # uniform float (a `randint(0, T) % max_start` would over-represent
    # small start indices — Park et al. sample uniformly).
    u = jax.random.uniform(keys[1], (B, n_time_masks))
    ts = jnp.minimum((u * max_start).astype(jnp.int32), max_start - 1)
    t_masked = jnp.any(
        (t_ids >= ts[:, :, None]) & (t_ids < (ts + tw)[:, :, None]), axis=1)

    fw = jax.random.randint(keys[2], (B, n_freq_masks), 0,
                            freq_mask_bins + 1)
    fs = jax.random.randint(keys[3], (B, n_freq_masks), 0,
                            jnp.maximum(F - freq_mask_bins, 1))
    f_masked = jnp.any(
        (f_ids >= fs[:, :, None]) & (f_ids < (fs + fw)[:, :, None]), axis=1)

    keep = (~t_masked)[:, :, None] & (~f_masked)[:, None, :]  # (B, T, F)
    return jnp.where(keep, feats, 0.0)


def speed_perturb(key, feats, feat_lens, factors=(0.9, 1.0, 1.1)):
    """Per-example speed perturbation in the FEATURE domain (the kaldi
    3-way speed-perturb staple, applied as frame-rate resampling so no
    audio re-extraction is needed). Each example draws one factor f from
    `factors`; output frame i reads input position i*f by linear
    interpolation, so f > 1 compresses (faster speech, fewer frames) and
    f < 1 stretches. Fully jittable with static shapes: the output
    keeps (B, T, F) and the new valid length ceil(len/f) is clipped to
    T (stretched tails beyond the buffer are dropped, as with any
    padded-bucket pipeline). f = 1.0 is an exact identity.

    Returns (feats', feat_lens')."""
    B, T, F = feats.shape
    fac = jnp.asarray(factors, jnp.float32)
    f = fac[jax.random.randint(key, (B,), 0, len(factors))]  # (B,)
    lens = feat_lens.astype(jnp.int32)
    pos = jnp.arange(T, dtype=jnp.float32)[None, :] * f[:, None]  # (B, T)
    last = jnp.maximum(lens - 1, 0).astype(jnp.float32)[:, None]
    pos = jnp.minimum(pos, last)
    lo = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - lo)[:, :, None]
    hi = jnp.minimum(lo + 1, jnp.maximum(lens - 1, 0)[:, None])
    take = lambda idx: jnp.take_along_axis(feats, idx[:, :, None], axis=1)
    out = (1.0 - frac) * take(lo) + frac * take(hi)
    new_lens = jnp.clip(jnp.ceil(lens.astype(jnp.float32) / f - 1e-6)
                        .astype(jnp.int32), 0, T)
    new_lens = jnp.where(lens == 0, 0, jnp.maximum(new_lens, 1))
    valid = jnp.arange(T, dtype=jnp.int32)[None, :] < new_lens[:, None]
    return jnp.where(valid[:, :, None], out, 0.0), new_lens
