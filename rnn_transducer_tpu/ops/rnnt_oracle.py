"""Hand-written numpy RNN-T loss oracle (Graves 2012 eqns, float64).

This is the ground-truth the framework's fast implementations are tested
against (SURVEY.md §4: the reference family has no test suite, so parity is
self-grounded in the standard formulation). Deliberately slow and literal:
explicit double loop over the (T, U) lattice, float64, plus an exponential
brute-force path-sum used to validate the oracle itself on tiny problems.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -np.inf


def log_softmax(x, axis=-1):
    x = np.asarray(x, dtype=np.float64)
    m = np.max(x, axis=axis, keepdims=True)
    s = x - m
    return s - np.log(np.sum(np.exp(s), axis=axis, keepdims=True))


def rnnt_loss_oracle(logits, labels, frame_lens, label_lens, blank=0):
    """Per-utterance loss, alpha recursion, float64. Returns (B,) array."""
    logits = np.asarray(logits, dtype=np.float64)
    B = logits.shape[0]
    out = np.zeros((B,), dtype=np.float64)
    for b in range(B):
        out[b] = _single_loss(
            logits[b], labels[b], int(frame_lens[b]), int(label_lens[b]), blank
        )
    return out


def _single_loss(logits, labels, T, U, blank):
    lp = log_softmax(logits[:T, : U + 1, :])  # (T, U+1, V)
    alpha = np.full((T, U + 1), NEG_INF)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + lp[T - 1, U, blank])


def rnnt_grad_oracle(logits, labels, frame_lens, label_lens, blank=0):
    """Analytic d(loss_b)/d(logits_b) via alpha/beta occupancies, float64."""
    logits = np.asarray(logits, dtype=np.float64)
    grad = np.zeros_like(logits)
    for b in range(B := logits.shape[0]):
        grad[b] = _single_grad(
            logits[b], labels[b], int(frame_lens[b]), int(label_lens[b]), blank
        )
    return grad


def _single_grad(logits, labels, T, U, blank):
    Tfull, U1full, V = logits.shape
    lp = log_softmax(logits[:T, : U + 1, :])
    alpha = np.full((T, U + 1), NEG_INF)
    beta = np.full((T, U + 1), NEG_INF)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands)
    beta[T - 1, U] = lp[T - 1, U, blank]
    for t in range(T - 1, -1, -1):
        for u in range(U, -1, -1):
            if t == T - 1 and u == U:
                continue
            cands = []
            if t + 1 < T:
                cands.append(lp[t, u, blank] + beta[t + 1, u])
            if u < U:
                cands.append(lp[t, u, labels[u]] + beta[t, u + 1])
            beta[t, u] = np.logaddexp.reduce(cands) if cands else NEG_INF
    log_z = beta[0, 0]

    grad = np.zeros((Tfull, U1full, V), dtype=np.float64)
    probs = np.exp(lp)
    for t in range(T):
        for u in range(U + 1):
            # blank arc occupancy (interior move or acceptance)
            if t + 1 < T:
                gb = np.exp(alpha[t, u] + lp[t, u, blank] + beta[t + 1, u] - log_z)
            elif u == U:
                gb = np.exp(alpha[t, u] + lp[t, u, blank] - log_z)
            else:
                gb = 0.0
            gy = 0.0
            if u < U:
                gy = np.exp(alpha[t, u] + lp[t, u, labels[u]] + beta[t, u + 1] - log_z)
            occ = gb + gy
            grad[t, u, :] = probs[t, u, :] * occ
            grad[t, u, blank] -= gb
            if u < U:
                grad[t, u, labels[u]] -= gy
    return grad


def rnnt_loss_bruteforce(logits, labels, T, U, blank=0):
    """Exponential path enumeration — validates the oracle on tiny (T, U).

    A valid alignment is a sequence of T blanks and U labels (labels in
    order), ending in a blank at the last frame: equivalently a monotone
    lattice path (0,0) → (T-1, U) followed by the final blank.
    """
    lp = log_softmax(np.asarray(logits, dtype=np.float64)[:T, : U + 1, :])
    total = NEG_INF

    def walk(t, u, score):
        nonlocal total
        if t == T - 1 and u == U:
            total = np.logaddexp(total, score + lp[t, u, blank])
            return
        if t + 1 < T:
            walk(t + 1, u, score + lp[t, u, blank])
        if u < U:
            walk(t, u + 1, score + lp[t, u, labels[u]])

    walk(0, 0, 0.0)
    return -total
