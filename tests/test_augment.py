"""SpecAugment properties: masking bounds, jittability, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_speed_perturb_identity_at_one():
    from rnn_transducer_tpu.data.augment import speed_perturb
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(3, 12, 5)), jnp.float32)
    lens = jnp.asarray([12, 8, 1], jnp.int32)
    out, new_lens = speed_perturb(jax.random.PRNGKey(0), feats, lens,
                                  factors=(1.0,))
    np.testing.assert_array_equal(np.asarray(new_lens), np.asarray(lens))
    valid = np.arange(12)[None, :, None] < np.asarray(lens)[:, None, None]
    np.testing.assert_allclose(np.asarray(out) * valid,
                               np.asarray(feats) * valid, rtol=1e-6)


def test_speed_perturb_lengths_and_interp():
    from rnn_transducer_tpu.data.augment import speed_perturb
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 16, 4)), jnp.float32)
    lens = jnp.asarray([12, 16], jnp.int32)
    # single factor so the draw is deterministic
    for f, want0 in ((2.0, 6), (0.5, 16)):  # ceil(12/2)=6; 24 clipped->16
        out, new_lens = speed_perturb(jax.random.PRNGKey(1), feats, lens,
                                      factors=(f,))
        assert int(new_lens[0]) == want0, (f, new_lens)
        out = np.asarray(out)
        x = np.asarray(feats)
        # spot-check linear interpolation at output frame 1 of example 0
        pos = 1 * f
        lo, fr = int(np.floor(pos)), pos - np.floor(pos)
        want = (1 - fr) * x[0, lo] + fr * x[0, min(lo + 1, 11)]
        np.testing.assert_allclose(out[0, 1], want, rtol=1e-5)
        # frames past the new length are zeroed
        assert np.all(out[0, int(new_lens[0]):] == 0.0)


@pytest.mark.slow
def test_speed_perturb_train_cli(capsys):
    import json as _json

    import train
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "2",
                "--max-frames", "40", "--max-labels", "5",
                "--log-every", "1", "--speed-perturb", "0.9,1.0,1.1",
                "--data-parallel", "1"])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] == 2 and np.isfinite(res["final_loss"])
