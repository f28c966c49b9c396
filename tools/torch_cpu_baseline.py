"""Reference-CPU training-throughput baseline (PyTorch, CPU).

The reference repo is a PyTorch RNN-T stack trained on CPU/single-GPU
(BASELINE.json north_star: ">=10x reference-CPU training throughput").
The actual reference was unreadable (empty mount — SURVEY.md §0), so this
script measures a *best-case stand-in*: the same 4x512 LSTM-encoder
workload implemented with torch.nn.LSTM (fast fused C++ kernels) and a
vectorized torch RNN-T loss (logcumsumexp row recurrence — far faster than
the reference family's pure-Python lattice loop). Beating this by 10x is
therefore a conservative reading of the target.

Writes the measured utterances/sec to tools/cpu_baseline.json; bench.py
reads it as the vs_baseline denominator.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import torch


class TorchTransducer(torch.nn.Module):
    def __init__(self, input_dim=80, enc_hidden=512, enc_layers=4,
                 pred_hidden=512, embed=512, joint=512, vocab=1024,
                 time_reduction=2):
        super().__init__()
        self.time_reduction = time_reduction
        self.encoder = torch.nn.LSTM(input_dim * time_reduction, enc_hidden,
                                     num_layers=enc_layers, batch_first=True)
        self.embed = torch.nn.Embedding(vocab, embed)
        self.pred = torch.nn.LSTM(embed, pred_hidden, batch_first=True)
        self.enc_proj = torch.nn.Linear(enc_hidden, joint)
        self.pred_proj = torch.nn.Linear(pred_hidden, joint)
        self.out = torch.nn.Linear(joint, vocab)

    def forward(self, feats, labels):
        B, T, F = feats.shape
        k = self.time_reduction
        feats = feats[:, : (T // k) * k].reshape(B, T // k, F * k)
        enc, _ = self.encoder(feats)
        bos = torch.zeros(B, 1, dtype=labels.dtype)
        pred_in = self.embed(torch.cat([bos, labels], dim=1))
        pred, _ = self.pred(pred_in)
        z = torch.tanh(self.enc_proj(enc)[:, :, None, :]
                       + self.pred_proj(pred)[:, None, :, :])
        return self.out(z)  # (B, T', U+1, V)


def torch_rnnt_loss(logits, labels, blank=0):
    """Vectorized alpha recursion (full lengths). loss: (B,)."""
    B, T, U1, V = logits.shape
    lp = torch.log_softmax(logits.float(), dim=-1)
    lp_blank = lp[..., blank]  # (B, T, U1)
    idx = labels[:, None, :, None].expand(B, T, U1 - 1, 1)
    lp_y = torch.gather(lp[:, :, : U1 - 1, :], -1, idx).squeeze(-1)  # (B,T,U)
    neg = torch.tensor(-1e30)
    alpha = torch.cat([torch.zeros(B, 1),
                       torch.cumsum(lp_y[:, 0, :], dim=-1)], dim=-1)
    for t in range(1, T):
        b_vec = alpha + lp_blank[:, t - 1, :]
        c = torch.cat([neg.expand(B, 1), lp_y[:, t, :]], dim=-1)
        C = torch.cumsum(c, dim=-1)
        alpha = torch.logcumsumexp(b_vec - C, dim=-1) + C
    return -(alpha[:, -1] + lp_blank[:, -1, -1])


def measure(batch=32, T=400, U=40, vocab=1024, steps=5, out_path=None):
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchTransducer(vocab=vocab)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    rng = np.random.default_rng(0)
    feats = torch.tensor(rng.normal(size=(batch, T, 80)), dtype=torch.float32)
    labels = torch.tensor(rng.integers(1, vocab, size=(batch, U)),
                          dtype=torch.long)
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        logits = model(feats, labels)
        loss = torch_rnnt_loss(logits, labels).mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"step {i}: {dt:.1f}s loss={float(loss):.2f}", flush=True)
    utt_per_sec = batch / min(times)
    result = {
        "utterances_per_sec": utt_per_sec,
        "batch": batch, "frames": T, "labels": U, "vocab": vocab,
        "threads": torch.get_num_threads(),
        "note": "torch.nn.LSTM 4x512 + vectorized torch RNN-T loss, CPU "
                "(best-case stand-in for the unreadable reference; see "
                "SURVEY.md §0)",
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    print(measure(out_path=os.path.join(here, "cpu_baseline.json")))
