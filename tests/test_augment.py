"""SpecAugment properties: masking bounds, jittability, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.data.augment import spec_augment


def test_spec_augment_masks_and_preserves():
    rng = np.random.default_rng(0)
    B, T, F = 4, 50, 80
    feats = jnp.asarray(rng.normal(size=(B, T, F)) + 5.0, jnp.float32)
    lens = jnp.asarray([50, 40, 30, 50], jnp.int32)
    out = jax.jit(lambda k: spec_augment(k, feats, lens))(
        jax.random.PRNGKey(0))
    out = np.asarray(out)
    src = np.asarray(feats)
    # masked entries are exactly zero; everything else untouched
    masked = out == 0.0
    assert masked.any()
    np.testing.assert_array_equal(out[~masked], src[~masked])
    # masking is bounded: at most (2*20)T + (2*15)F of each utterance
    frac = masked.mean()
    assert frac < 0.8
    # deterministic per key
    out2 = spec_augment(jax.random.PRNGKey(0), feats, lens)
    np.testing.assert_array_equal(out, np.asarray(out2))
    out3 = spec_augment(jax.random.PRNGKey(1), feats, lens)
    assert not np.array_equal(out, np.asarray(out3))
