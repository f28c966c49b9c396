import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
print(jax.devices())

from rnn_transducer_tpu.ops.rnnt_pruned import (
    rnnt_loss_pruned, prune_bounds, occupancies_from_lp)
from rnn_transducer_tpu.ops.rnnt_oracle import rnnt_loss_oracle

rng = np.random.default_rng(0)
B, T, U, V, J, S = 4, 24, 8, 512, 16, 4
U1 = U + 1
labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
fl = np.array([24, 20, 17, 24], np.int32)
ll = np.array([8, 6, 0, 8], np.int32)
f = rng.normal(size=(B, T, J)).astype(np.float32)
g = rng.normal(size=(B, U1, J)).astype(np.float32)
w = (rng.normal(size=(J, V)) * 0.4).astype(np.float32)
b = (rng.normal(size=(V,)) * 0.1).astype(np.float32)

# full-width band == exact loss; compare against float64 oracle
lp = np.log(np.zeros((B, T, U1, V)) + 1e-30)
z = np.tanh(f[:, :, None, :] + g[:, None, :, :])
logits = z @ w + b
lp = logits - np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)), -1, keepdims=True)) - logits.max(-1, keepdims=True)
oracle = np.array([rnnt_loss_oracle(lp[i], labels[i], int(fl[i]), int(ll[i]), 0)
                   for i in range(B)])

jf, jg, jw, jb = map(jnp.asarray, (f, g, w, b))
jl = jnp.asarray(labels); jfl = jnp.asarray(fl); jll = jnp.asarray(ll)
Sfull = U1
sb_full = jnp.zeros((B, T), jnp.int32)

import os
for mode in ("0", "1"):
    os.environ["RNNT_TPU_BAND_KERNEL"] = mode
    def loss_fn(f_, g_, w_, b_):
        return rnnt_loss_pruned(f_, g_, w_, b_, jl, jfl, jll, sb_full,
                                Sfull, 0, jnp.float32)
    t0 = time.time()
    vals = jax.jit(loss_fn)(jf, jg, jw, jb)
    vals.block_until_ready()
    print(f"mode={mode} compile+run {time.time()-t0:.1f}s loss:", np.asarray(vals))
    np.testing.assert_allclose(np.asarray(vals), oracle, rtol=1e-4, atol=1e-4)
    # grads finite + masked-utterance (ll=0) grad wrt g rows > 1 is zero
    gr = jax.jit(jax.grad(lambda *a: jnp.sum(loss_fn(*a)), argnums=(0,1,2,3)))(jf, jg, jw, jb)
    for x in gr: assert np.all(np.isfinite(np.asarray(x)))
    print(f"mode={mode} full-width band matches float64 oracle; grads finite")

# narrow band (S=4): kernel vs XLA path must agree on-chip
gb, gy = occupancies_from_lp(jnp.asarray(lp[..., 0]*0), jnp.asarray(lp[..., 0]*0), jfl, jll) if False else (None, None)
from rnn_transducer_tpu.ops.rnnt_pruned import simple_lp
