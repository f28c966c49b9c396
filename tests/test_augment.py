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
                "--spec-augment", "--spec-augment-warp", "8",
                "--data-parallel", "1"])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] == 2 and np.isfinite(res["final_loss"])


def test_time_warp_properties():
    """Park et al. time warping: endpoints fixed, padding untouched, masks
    unchanged by enabling the warp (the mask subkeys are independent),
    warp=0 is off, per-key deterministic."""
    from rnn_transducer_tpu.data.augment import _time_warp
    rng = np.random.default_rng(2)
    B, T, F = 3, 60, 8
    feats = jnp.asarray(rng.normal(size=(B, T, F)) + 5.0, jnp.float32)
    lens = jnp.asarray([60, 45, 20], jnp.int32)
    out = np.asarray(jax.jit(
        lambda k: _time_warp(k, feats, lens, 10))(jax.random.PRNGKey(3)))
    src = np.asarray(feats)
    for b, L in enumerate([60, 45, 20]):
        # frame 0 and frame len-1 map to themselves
        np.testing.assert_allclose(out[b, 0], src[b, 0], rtol=1e-5)
        np.testing.assert_allclose(out[b, L - 1], src[b, L - 1], rtol=1e-5)
        # padding frames untouched
        np.testing.assert_array_equal(out[b, L:], src[b, L:])
        # warped interior actually moved for a real-size utterance
        if L >= 40:
            assert not np.allclose(out[b, 1:L - 1], src[b, 1:L - 1])
    # interpolation stays within the source value envelope per feature bin
    assert out.min() >= src.min() - 1e-5 and out.max() <= src.max() + 1e-5

    # enabling the warp does not change WHICH cells the masks zero
    k = jax.random.PRNGKey(4)
    plain = np.asarray(spec_augment(k, feats, lens))
    warped = np.asarray(spec_augment(k, feats, lens, time_warp_frames=10))
    np.testing.assert_array_equal(plain == 0.0, warped == 0.0)
    # warp=0 is exactly the mask-only transform
    off = np.asarray(spec_augment(k, feats, lens, time_warp_frames=0))
    np.testing.assert_array_equal(off, plain)
    # deterministic per key
    again = np.asarray(spec_augment(k, feats, lens, time_warp_frames=10))
    np.testing.assert_array_equal(warped, again)


def test_time_warp_degenerate_lengths():
    """len=1 and len=2 utterances survive (no NaN, endpoints fixed)."""
    from rnn_transducer_tpu.data.augment import _time_warp
    feats = jnp.asarray(np.arange(2 * 6 * 3, dtype=np.float32)
                        .reshape(2, 6, 3))
    lens = jnp.asarray([1, 2], jnp.int32)
    out = np.asarray(_time_warp(jax.random.PRNGKey(0), feats, lens, 4))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0, 0], np.asarray(feats)[0, 0])
    np.testing.assert_array_equal(out[:, 2:], np.asarray(feats)[:, 2:])
