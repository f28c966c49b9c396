"""FULL-MODEL parity vs a PyTorch implementation of the same architecture.

Operationalizes BASELINE.json's parity clause ("logits and per-utterance
loss matching the PyTorch implementation to fp32 tolerance", "RNN-T loss
within 1e-4") as far as this environment allows (the reference mount is
empty — SURVEY.md §0): identical weights are loaded into a torch model
mirroring the reference family's architecture and into the JAX model, then
end-to-end logits, per-utterance losses (variable lengths), and parameter
gradients are compared — for uni- and bidirectional encoders.

The torch RNN-T loss here is the explicit O(T·U) lattice loop the
reference family uses (Graves 2012 eq. 16-18) — deliberately naive, as an
unambiguous oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss
from rnn_transducer_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas
from rnn_transducer_tpu.train.loop import loss_fn


# ------------------------- torch reference model -------------------------

class TorchTransducerRef(torch.nn.Module):
    """Same architecture as models/transducer.py, in torch modules."""

    def __init__(self, cfg: TransducerConfig):
        super().__init__()
        self.cfg = cfg
        self.enc_layers = torch.nn.ModuleList()
        in_dim = cfg.input_dim
        for i in range(cfg.enc_layers):
            self.enc_layers.append(torch.nn.LSTM(
                in_dim, cfg.enc_hidden, batch_first=True,
                bidirectional=cfg.bidirectional))
            in_dim = cfg.enc_out_dim
            if i == 0 and cfg.time_reduction > 1:
                in_dim *= cfg.time_reduction
        self.embed = torch.nn.Embedding(cfg.vocab_size, cfg.embed_dim)
        self.pred_layers = torch.nn.ModuleList()
        pin = cfg.embed_dim
        for _ in range(cfg.pred_layers):
            self.pred_layers.append(
                torch.nn.LSTM(pin, cfg.pred_hidden, batch_first=True))
            pin = cfg.pred_hidden
        self.enc_proj = torch.nn.Linear(cfg.enc_out_dim, cfg.joint_dim)
        self.pred_proj = torch.nn.Linear(cfg.pred_hidden, cfg.joint_dim)
        self.out = torch.nn.Linear(cfg.joint_dim, cfg.vocab_size)

    def _mask(self, x, lens):
        t = torch.arange(x.shape[1])[None, :, None]
        return torch.where(t < lens[:, None, None], x, torch.zeros(()))

    def encode(self, feats, lens):
        cfg = self.cfg
        x = self._mask(feats, lens)
        for i, layer in enumerate(self.enc_layers):
            if cfg.bidirectional:
                packed = torch.nn.utils.rnn.pack_padded_sequence(
                    x, lens.long(), batch_first=True, enforce_sorted=False)
                y, _ = layer(packed)
                x, _ = torch.nn.utils.rnn.pad_packed_sequence(
                    y, batch_first=True, total_length=x.shape[1])
            else:
                x, _ = layer(x)
            x = self._mask(x, lens)
            if i == 0 and cfg.time_reduction > 1:
                B, T, F = x.shape
                k = cfg.time_reduction
                x = x[:, : (T // k) * k].reshape(B, T // k, F * k)
                lens = torch.clamp((lens + k - 1) // k, max=T // k)
        return x, lens

    def forward(self, feats, feat_lens, labels):
        enc, enc_lens = self.encode(feats, feat_lens)
        B = labels.shape[0]
        bos = torch.full((B, 1), self.cfg.blank, dtype=labels.dtype)
        x = self.embed(torch.cat([bos, labels], dim=1))
        for layer in self.pred_layers:
            x, _ = layer(x)
        z = torch.tanh(self.enc_proj(enc)[:, :, None, :]
                       + self.pred_proj(x)[:, None, :, :])
        return self.out(z), enc_lens  # (B, T', U+1, V)


def torch_rnnt_loss_loop(logits, labels, frame_lens, label_lens, blank=0):
    """Explicit per-utterance alpha lattice loop (the reference-family way)."""
    lp = torch.log_softmax(logits.float(), dim=-1)
    losses = []
    for b in range(logits.shape[0]):
        Tb, Ub = int(frame_lens[b]), int(label_lens[b])
        alpha = [[None] * (Ub + 1) for _ in range(Tb)]
        for t in range(Tb):
            for u in range(Ub + 1):
                if t == 0 and u == 0:
                    alpha[0][0] = lp.new_zeros(())
                    continue
                terms = []
                if t > 0:
                    terms.append(alpha[t - 1][u] + lp[b, t - 1, u, blank])
                if u > 0:
                    terms.append(alpha[t][u - 1]
                                 + lp[b, t, u - 1, labels[b, u - 1]])
                alpha[t][u] = torch.logsumexp(torch.stack(terms), 0)
        losses.append(-(alpha[Tb - 1][Ub] + lp[b, Tb - 1, Ub, blank]))
    return torch.stack(losses)


# --------------------------- weight conversion ----------------------------

def _conv_lstm(layer, suffix=""):
    return {
        "w_ih": jnp.asarray(
            getattr(layer, f"weight_ih_l0{suffix}").detach().numpy().T),
        "w_hh": jnp.asarray(
            getattr(layer, f"weight_hh_l0{suffix}").detach().numpy().T),
        "b": jnp.asarray((getattr(layer, f"bias_ih_l0{suffix}")
                          + getattr(layer, f"bias_hh_l0{suffix}")
                          ).detach().numpy()),
    }


def _conv_linear(lin):
    return {"w": jnp.asarray(lin.weight.detach().numpy().T),
            "b": jnp.asarray(lin.bias.detach().numpy())}


def torch_to_jax_params(tm: TorchTransducerRef, cfg: TransducerConfig):
    enc = []
    for layer in tm.enc_layers:
        if cfg.bidirectional:
            enc.append({"fwd": _conv_lstm(layer),
                        "bwd": _conv_lstm(layer, "_reverse")})
        else:
            enc.append(_conv_lstm(layer))
    return {
        "encoder": enc,
        "embed": jnp.asarray(tm.embed.weight.detach().numpy()),
        "predictor": [_conv_lstm(l) for l in tm.pred_layers],
        "joint": {"enc_proj": _conv_linear(tm.enc_proj),
                  "pred_proj": _conv_linear(tm.pred_proj),
                  "out": _conv_linear(tm.out)},
    }


# -------------------------------- fixtures --------------------------------

UNI = TransducerConfig(input_dim=8, enc_layers=2, enc_hidden=16,
                       pred_layers=1, pred_hidden=12, embed_dim=10,
                       joint_dim=14, vocab_size=11, time_reduction=2,
                       compute_dtype="float32")
BI = dataclasses.replace(UNI, bidirectional=True, time_reduction=1)


def _batch(cfg, seed=0, B=3, T=20, U=5):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, T, cfg.input_dim)).astype(np.float32)
    frame_lens = np.array([T, T - 5, T - 9], np.int32)[:B]
    labels = rng.integers(1, cfg.vocab_size, size=(B, U)).astype(np.int32)
    label_lens = np.array([U, U - 1, U - 3], np.int32)[:B]
    t = np.arange(T)[None, :, None]
    feats = np.where(t < frame_lens[:, None, None], feats, 0.0)
    u = np.arange(U)[None, :]
    labels = np.where(u < label_lens[:, None], labels, 0)
    return feats, frame_lens, labels, label_lens


def _models(cfg, seed):
    torch.manual_seed(seed)
    tm = TorchTransducerRef(cfg)
    params = torch_to_jax_params(tm, cfg)
    return tm, params


@pytest.mark.parametrize("cfg", [UNI, BI], ids=["uni_tr2", "bi"])
def test_full_model_logits_parity(cfg):
    tm, params = _models(cfg, 0)
    feats, frame_lens, labels, label_lens = _batch(cfg)
    with torch.no_grad():
        want, want_lens = tm(torch.tensor(feats), torch.tensor(frame_lens),
                             torch.tensor(labels.astype(np.int64)))
    got, got_lens = m.forward(params, cfg, jnp.asarray(feats),
                              jnp.asarray(frame_lens), jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())
    # compare the valid lattice region per utterance (fp32 tolerance)
    for b in range(feats.shape[0]):
        Tb = int(got_lens[b])
        np.testing.assert_allclose(np.asarray(got)[b, :Tb],
                                   want.numpy()[b, :Tb],
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("cfg", [UNI, BI], ids=["uni_tr2", "bi"])
@pytest.mark.parametrize("impl", [rnnt_loss, rnnt_loss_pallas],
                         ids=["xla", "pallas"])
def test_full_model_loss_parity(cfg, impl):
    tm, params = _models(cfg, 1)
    feats, frame_lens, labels, label_lens = _batch(cfg)
    with torch.no_grad():
        logits_t, enc_lens_t = tm(torch.tensor(feats),
                                  torch.tensor(frame_lens),
                                  torch.tensor(labels.astype(np.int64)))
        want = torch_rnnt_loss_loop(logits_t, labels, enc_lens_t.numpy(),
                                    label_lens)
    logits, enc_lens = m.forward(params, cfg, jnp.asarray(feats),
                                 jnp.asarray(frame_lens), jnp.asarray(labels))
    got = impl(logits, jnp.asarray(labels), enc_lens,
               jnp.asarray(label_lens), cfg.blank)
    # BASELINE.json: "RNN-T loss within 1e-4 of reference"
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4,
                               rtol=1e-6)


def _flat_jax_grads(grads, cfg):
    """Flatten the JAX grad pytree into {torch-param-name: array}."""
    out = {}
    for i, g in enumerate(grads["encoder"]):
        if cfg.bidirectional:
            for side, suffix in (("fwd", ""), ("bwd", "_reverse")):
                out[f"enc_layers.{i}.weight_ih_l0{suffix}"] = g[side]["w_ih"].T
                out[f"enc_layers.{i}.weight_hh_l0{suffix}"] = g[side]["w_hh"].T
                out[f"enc_layers.{i}.bias_ih_l0{suffix}"] = g[side]["b"]
                out[f"enc_layers.{i}.bias_hh_l0{suffix}"] = g[side]["b"]
        else:
            out[f"enc_layers.{i}.weight_ih_l0"] = g["w_ih"].T
            out[f"enc_layers.{i}.weight_hh_l0"] = g["w_hh"].T
            out[f"enc_layers.{i}.bias_ih_l0"] = g["b"]
            out[f"enc_layers.{i}.bias_hh_l0"] = g["b"]
    out["embed.weight"] = grads["embed"]
    for i, g in enumerate(grads["predictor"]):
        out[f"pred_layers.{i}.weight_ih_l0"] = g["w_ih"].T
        out[f"pred_layers.{i}.weight_hh_l0"] = g["w_hh"].T
        out[f"pred_layers.{i}.bias_ih_l0"] = g["b"]
        out[f"pred_layers.{i}.bias_hh_l0"] = g["b"]
    for name, key in (("enc_proj", "enc_proj"), ("pred_proj", "pred_proj"),
                      ("out", "out")):
        out[f"{name}.weight"] = grads["joint"][key]["w"].T
        out[f"{name}.bias"] = grads["joint"][key]["b"]
    return out


@pytest.mark.parametrize("cfg", [UNI, BI], ids=["uni_tr2", "bi"])
def test_full_model_grad_parity(cfg):
    tm, params = _models(cfg, 2)
    feats, frame_lens, labels, label_lens = _batch(cfg)

    logits_t, enc_lens_t = tm(torch.tensor(feats), torch.tensor(frame_lens),
                              torch.tensor(labels.astype(np.int64)))
    loss_t = torch_rnnt_loss_loop(logits_t, labels, enc_lens_t.numpy(),
                                  label_lens).mean()
    loss_t.backward()
    torch_grads = {n: p.grad.numpy() for n, p in tm.named_parameters()}

    def batch_mean(p):
        loss, _ = loss_fn(p, cfg, jnp.asarray(feats), jnp.asarray(frame_lens),
                          jnp.asarray(labels), jnp.asarray(label_lens),
                          loss_impl="xla")
        return loss

    loss_j, grads = jax.value_and_grad(batch_mean)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               atol=1e-5, rtol=1e-6)
    jax_grads = _flat_jax_grads(grads, cfg)
    assert set(jax_grads) == set(torch_grads)
    for name, want in torch_grads.items():
        got = np.asarray(jax_grads[name], np.float32)
        # our single bias b = b_ih + b_hh: its grad equals either torch bias
        scale = max(np.abs(want).max(), 1e-8)
        np.testing.assert_allclose(got, want, atol=5e-5 * scale + 1e-7,
                                   rtol=2e-4, err_msg=name)
        cos = np.dot(got.ravel(), want.ravel()) / (
            np.linalg.norm(got) * np.linalg.norm(want) + 1e-30)
        assert cos > 0.99999, f"{name}: cosine {cos}"


def test_full_model_grad_parity_fused_impl():
    """The fused joint+loss Pallas path must produce the same grads too."""
    cfg = UNI
    tm, params = _models(cfg, 3)
    feats, frame_lens, labels, label_lens = _batch(cfg)

    def mean_loss(p, impl):
        loss, _ = loss_fn(p, cfg, jnp.asarray(feats), jnp.asarray(frame_lens),
                          jnp.asarray(labels), jnp.asarray(label_lens),
                          loss_impl=impl)
        return loss

    l_x, g_x = jax.value_and_grad(lambda p: mean_loss(p, "xla"))(params)
    l_f, g_f = jax.value_and_grad(lambda p: mean_loss(p, "fused"))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), atol=1e-5, rtol=1e-6)
    flat_x = _flat_jax_grads(g_x, cfg)
    flat_f = _flat_jax_grads(g_f, cfg)
    for name in flat_x:
        np.testing.assert_allclose(np.asarray(flat_f[name]),
                                   np.asarray(flat_x[name]),
                                   atol=2e-5, rtol=2e-4, err_msg=name)
