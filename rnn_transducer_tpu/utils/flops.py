"""Analytic FLOP counting for MFU reporting.

Counts matmul FLOPs (2*M*N*K) of the model forward pass; the training step
is the standard 3x forward (backward costs ~2x forward in matmuls).
Elementwise/transcendental work (gates, softmax, lattice recursions) is
excluded, as is the optimizer — this matches the usual MFU convention, so
the numbers are comparable with published model-FLOPs-utilization figures.

MFU = step_flops / step_time / peak_flops. Peak for TPU v5e (v5 lite):
197 TFLOP/s bf16.
"""

from __future__ import annotations

from rnn_transducer_tpu.models.config import TransducerConfig

V5E_BF16_PEAK = 197e12


def _lstm_layer_flops(batch: int, steps: int, in_dim: int, hidden: int) -> float:
    """One unidirectional LSTM layer: input projection + recurrent matmul."""
    return 2.0 * batch * steps * (in_dim * 4 * hidden + hidden * 4 * hidden)


def _conformer_block_flops(batch: int, t: int, d: int, ff_mult: int,
                           conv_kernel: int) -> float:
    """One conformer block (ops/conformer.py): two half-FFNs, MHSA
    (QKVO projections + the two (T, T) attention matmuls), conv module
    (pointwise-GLU + depthwise + pointwise)."""
    ffn = 2 * (2.0 * batch * t * d * ff_mult * d * 2)  # in+out, two FFNs
    qkvo = 4 * 2.0 * batch * t * d * d
    att = 2 * 2.0 * batch * t * t * d  # logits + weighted values
    conv = (2.0 * batch * t * d * 2 * d  # pw1 (GLU)
            + 2.0 * batch * t * conv_kernel * d  # depthwise
            + 2.0 * batch * t * d * d)  # pw2
    return ffn + qkvo + att + conv


def encoder_flops(cfg: TransducerConfig, batch: int, frames: int) -> float:
    total = 0.0
    in_dim = cfg.input_dim
    t = frames
    if cfg.enc_type == "conformer":
        if cfg.time_reduction > 1:
            t //= cfg.time_reduction
            in_dim *= cfg.time_reduction
        total = 2.0 * batch * t * in_dim * cfg.enc_hidden  # in_proj
        total += cfg.enc_layers * _conformer_block_flops(
            batch, t, cfg.enc_hidden, cfg.enc_ff_mult, cfg.enc_conv_kernel)
        return total
    for i in range(cfg.enc_layers):
        layer = _lstm_layer_flops(batch, t, in_dim, cfg.enc_hidden)
        total += layer * (2 if cfg.bidirectional else 1)
        in_dim = cfg.enc_out_dim
        if i == 0 and cfg.time_reduction > 1:
            t //= cfg.time_reduction
            in_dim *= cfg.time_reduction
    return total


def predictor_flops(cfg: TransducerConfig, batch: int, labels: int) -> float:
    total = 0.0
    in_dim = cfg.embed_dim
    for _ in range(cfg.pred_layers):
        total += _lstm_layer_flops(batch, labels + 1, in_dim, cfg.pred_hidden)
        in_dim = cfg.pred_hidden
    return total


def joint_flops(cfg: TransducerConfig, batch: int, frames: int,
                labels: int) -> float:
    t = frames // cfg.time_reduction if cfg.time_reduction > 1 else frames
    u1 = labels + 1
    f = 2.0 * batch * t * cfg.enc_out_dim * cfg.joint_dim
    g = 2.0 * batch * u1 * cfg.pred_hidden * cfg.joint_dim
    out = 2.0 * batch * t * u1 * cfg.joint_dim * cfg.vocab_size
    return f + g + out


def forward_flops(cfg: TransducerConfig, batch: int, frames: int,
                  labels: int) -> float:
    """Matmul FLOPs of one full forward (encoder + predictor + joint)."""
    return (encoder_flops(cfg, batch, frames)
            + predictor_flops(cfg, batch, labels)
            + joint_flops(cfg, batch, frames, labels))


def train_step_flops(cfg: TransducerConfig, batch: int, frames: int,
                     labels: int) -> float:
    """Forward + backward matmul FLOPs (backward = 2x forward)."""
    return 3.0 * forward_flops(cfg, batch, frames, labels)


def mfu(cfg: TransducerConfig, batch: int, frames: int, labels: int,
        step_seconds: float, peak: float = V5E_BF16_PEAK) -> float:
    return train_step_flops(cfg, batch, frames, labels) / step_seconds / peak
