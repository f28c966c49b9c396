"""Evidence that LM shallow fusion improves accuracy, not just that the
fused search is exact: an acoustically-ambiguous task the AM cannot
disambiguate (tokens 1 and 2 paint the SAME feature channel; AM training
data carries no context correlation) but a grammar LM can (context 3 -> 1,
context 4 -> 2 in the eval distribution). Fusion must strictly cut WER."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rnn_transducer_tpu.decode.beam import recognize_beam
from rnn_transducer_tpu.decode.metrics import error_rate, tokens_to_lists
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.models.lm import LMConfig, init_lm_params, lm_loss
from rnn_transducer_tpu.train.loop import init_train_state, make_train_step

V = 6          # blank + tokens 1..5; 1 and 2 are acoustically identical
D = 8
FPL = 4        # frames per label
PAIRS = 2      # (context, ambiguous) pairs per utterance
CFG = TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                       pred_hidden=32, embed_dim=16, joint_dim=32,
                       vocab_size=V, input_dim=D, compute_dtype="float32")


def _paint(labels, rng):
    """Labels -> features; tokens 1 and 2 both paint channel 1."""
    B, L = labels.shape
    T = L * FPL
    feats = rng.normal(size=(B, T, D)).astype(np.float32) * 0.1
    for b in range(B):
        for i, lab in enumerate(labels[b]):
            ch = 1 if lab in (1, 2) else int(lab)
            feats[b, i * FPL: (i + 1) * FPL, ch] += 3.0
    return feats


def _am_batch(rng, B):
    """AM training data: context and ambiguous token INDEPENDENT."""
    ctx = rng.choice([3, 4], size=(B, PAIRS))
    amb = rng.choice([1, 2], size=(B, PAIRS))
    labels = np.stack([ctx, amb], axis=-1).reshape(B, 2 * PAIRS)
    labels = labels.astype(np.int32)
    feats = _paint(labels, rng)
    return (feats, np.full((B,), labels.shape[1] * FPL, np.int32),
            labels, np.full((B,), labels.shape[1], np.int32))


def _grammar_labels(rng, B):
    """Eval/LM distribution: 3 is always followed by 1, 4 by 2."""
    ctx = rng.choice([3, 4], size=(B, PAIRS))
    amb = np.where(ctx == 3, 1, 2)
    return np.stack([ctx, amb], axis=-1).reshape(B, 2 * PAIRS).astype(
        np.int32)


def test_lm_fusion_strictly_improves_wer():
    rng = np.random.default_rng(0)
    # --- train the AM on the context-free distribution ------------------
    tcfg = TrainConfig(batch_size=16, warmup_steps=20, total_steps=400,
                       learning_rate=3e-3, loss_impl="xla")
    state = init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    step = make_train_step(CFG, tcfg)
    for _ in range(350):
        f, fl, lab, ll = _am_batch(rng, 16)
        state, info = step(state, jnp.asarray(f), jnp.asarray(fl),
                           jnp.asarray(lab), jnp.asarray(ll))
    assert float(info["loss"]) < 3.0, "AM failed to train"

    # --- train the LM on grammar-following sequences --------------------
    lmc = LMConfig(vocab_size=V, embed_dim=16, hidden=32, layers=1,
                   compute_dtype="float32")
    lmp = init_lm_params(jax.random.PRNGKey(1), lmc)
    opt = optax.adam(5e-3)
    ost = opt.init(lmp)

    @jax.jit
    def lm_step_fn(p, s, labels):
        lens = jnp.full((labels.shape[0],), labels.shape[1], jnp.int32)
        l, g = jax.value_and_grad(lambda q: lm_loss(q, lmc, labels,
                                                    lens))(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    for _ in range(300):
        lmp, ost, lml = lm_step_fn(lmp, ost,
                                   jnp.asarray(_grammar_labels(rng, 32)))
    assert float(lml) < 1.0, "LM failed to learn the grammar"

    # --- eval on grammar data: beam vs beam + fusion --------------------
    labels = _grammar_labels(np.random.default_rng(42), 32)
    feats = _paint(labels, np.random.default_rng(43))
    f = jnp.asarray(feats)
    fl = jnp.full((32,), labels.shape[1] * FPL, jnp.int32)
    refs = [r.tolist() for r in labels]

    def wer(lm):
        toks, lens, _ = recognize_beam(state.params, CFG, f, fl, beam=4,
                                       max_symbols=8, expansions=2, lm=lm)
        hyps = tokens_to_lists(np.asarray(toks[:, 0]),
                               np.asarray(lens[:, 0]))
        return error_rate(refs, hyps)

    wer_plain = wer(None)
    wer_fused = wer((lmp, lmc, 1.0))
    # the AM flips a coin on every ambiguous token (~25% overall WER);
    # the grammar LM resolves it
    assert wer_plain > 0.08, f"task not ambiguous enough ({wer_plain})"
    assert wer_fused < wer_plain * 0.5, (wer_plain, wer_fused)
