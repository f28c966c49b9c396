"""Model / training configuration dataclasses.

The five named configs mirror the driver's benchmark workloads
(BASELINE.json `configs`, lines 7-13), which bound the capability set of the
unreadable reference (SURVEY.md §A).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    """Architecture of encoder + prediction network + joint."""

    # frontend / input
    input_dim: int = 80  # log-mel bins
    # encoder
    # "lstm" (reference staple) or "conformer" (ops/conformer.py —
    # matmul-dense second family; enc_hidden = d_model, enc_layers =
    # blocks; inherently bidirectional, offline decode only)
    enc_type: str = "lstm"
    enc_layers: int = 2
    enc_hidden: int = 256
    bidirectional: bool = False
    time_reduction: int = 1  # frame-stacking factor applied after layer 0
    # conformer-only knobs
    enc_heads: int = 8
    enc_ff_mult: int = 4
    enc_conv_kernel: int = 15
    # > 0 selects the CAUSAL/streamable conformer: every block attends
    # only to [t - enc_att_left, t] (encoded frames) and the conv module
    # pads left-only — encode_chunk then carries per-block caches and is
    # bit-equal to the offline encode, so streaming/serving work exactly
    # as with the unidirectional LSTM. 0 = full (offline) attention.
    enc_att_left: int = 0
    # > 0 selects CHUNKED attention (WeNet/Emformer-style lookahead):
    # queries attend their whole S-frame chunk — INCLUDING in-chunk
    # future frames — plus enc_att_left left-context frames; the conv
    # module stays causal. Streaming latency = S encoded frames; the
    # chunked encode is bit-equal to offline when the streaming chunk
    # (post time_reduction) is a multiple of S. Composes with
    # enc_att_left (the left extent is measured from the chunk start).
    enc_chunk_att: int = 0
    # prediction network
    pred_layers: int = 1
    pred_hidden: int = 256
    embed_dim: int = 256
    # "lstm" (reference staple) or "stateless" (k2/icefall-style bounded-
    # context decoder: the output at position u is a projection of the
    # embeddings of the last pred_context consumed labels — no recurrent
    # state, decode state is just (pred_context - 1) label ids)
    pred_type: str = "lstm"
    pred_context: int = 2
    # joint
    joint_dim: int = 256
    vocab_size: int = 64  # including blank
    blank: int = 0
    # Multi-blank transducer (NeMo-family variant): extra blank symbols
    # that consume this many frames each (e.g. (2, 4, 8)) occupy the last
    # len(...) joint output columns (ids vocab_size + k). Greedy decoding
    # SKIPS duration frames when a big blank wins — 2-4x fewer decode
    # steps on blank-dominated audio; the loss marginalizes over the
    # extra transitions (ops/rnnt_multiblank.py). Trains at the xla loss
    # tier; beam search handles the skips via per-beam wake times
    # (decode/beam.py, tests/test_beam_duration.py).
    big_blank_durations: tuple = ()
    # Token-and-duration transducer (TDT, Xu et al. 2023): a second joint
    # head predicts how many frames each emission (token OR blank)
    # consumes, from this duration set (e.g. (0, 1, 2, 3, 4); blank may
    # not take duration 0). The loss marginalizes tokens x durations
    # (ops/rnnt_tdt.py); greedy decode advances by the argmax duration —
    # it never stalls on a frame, the variant's decode-speed point.
    # Trains at the xla tier; beam search forks candidates over the
    # duration set with per-beam wake times (decode/beam.py). Mutually
    # exclusive with big_blank_durations.
    tdt_durations: tuple = ()
    # numerics
    compute_dtype: str = "bfloat16"  # matmul dtype; params/cell state fp32
    # rematerialize encoder layers in the backward pass (trade FLOPs for
    # HBM when training long utterances / big batches)
    remat_encoder: bool = False
    # auxiliary CTC head on the encoder output (family staple: encoder
    # pretraining with CTC before switching to the RNN-T loss)
    ctc_head: bool = False
    # Pruned two-pass RNN-T training (ops/rnnt_pruned.py, k2-style):
    # > 0 adds trivial-joiner "simple" heads to the params and enables
    # loss_impl="pruned" — the expensive joint runs only on a band of
    # this width around the first pass's alignment. 0 = full lattice.
    pruned_range: int = 0
    # Mixture-of-Experts joint (ops/moe.py): > 0 inserts a residual top-1
    # routed expert FFN on the joint activation. The expert axis is the
    # framework's expert-parallelism dimension (parallel "ep" mode).
    # EXPERIMENTAL — capacity research axis, not a production path: the
    # fused joint+loss kernel does not support routed experts, so MoE
    # training materializes the full lattice logits in HBM and measures
    # ~10x the dense joint's step time at libri100 shapes (141 vs ~13.5
    # ms/step, docs/PERFORMANCE.md). Use for EP-scaling studies only.
    joint_experts: int = 0
    joint_expert_hidden: int = 0  # 0 -> 2 * joint_dim
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01  # load-balance loss coefficient

    @property
    def moe_hidden(self) -> int:
        return self.joint_expert_hidden or 2 * self.joint_dim

    @property
    def streamable(self) -> bool:
        """Whether encode_chunk supports this encoder (serve.py gates its
        streaming engine on this): unidirectional LSTMs, causal
        conformers (enc_att_left > 0), or chunked-attention conformers
        (enc_chunk_att > 0)."""
        if self.enc_type == "conformer":
            return self.enc_att_left > 0 or self.enc_chunk_att > 0
        return not self.bidirectional

    @property
    def n_classes(self) -> int:
        """Joint output columns: vocab plus one per big-blank duration."""
        return self.vocab_size + len(self.big_blank_durations)

    @property
    def enc_out_dim(self) -> int:
        if self.enc_type == "conformer":
            return self.enc_hidden
        return self.enc_hidden * (2 if self.bidirectional else 1)

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    grad_clip_norm: float = 5.0
    warmup_steps: int = 500
    total_steps: int = 100_000
    # "warmup_cosine" | "noam" (inverse-sqrt after warmup, transducer
    # staple) | "step_decay" (xN decay every decay_every steps, newbob
    # style) | "constant" (after linear warmup)
    lr_schedule: str = "warmup_cosine"
    decay_rate: float = 0.5
    decay_every: int = 10_000
    seed: int = 0
    # Graves-style weight noise (std of gaussian added to the weights for
    # the gradient computation only — the classic RNN-T regularizer for
    # small-corpus training, e.g. TIMIT)
    weight_noise_std: float = 0.0
    # Inter-layer dropout (the reference family's nn.LSTM(dropout=...)
    # staple): applied to each LSTM layer's output except the last, in the
    # encoder and the prediction network, training only.
    dropout: float = 0.0
    # Dropout on the prediction net's label embeddings (training only).
    embed_dropout: float = 0.0
    # Joint CTC+RNN-T multitask: adds ctc_weight * CTC (auxiliary
    # encoder head, requires TransducerConfig.ctc_head) to the RNN-T
    # objective EVERY step, sharing the encoder pass — the icefall/
    # ESPnet hybrid recipe (vs. --ctc-pretrain-steps' two-phase warmup).
    # Typical 0.1-0.3. 0.0 = off.
    ctc_weight: float = 0.0
    # FastEmit (Yu et al. 2021) low-latency streaming regularization:
    # scales the emit-arc posterior gradient of the RNN-T loss by
    # (1 + lambda), pushing emissions earlier. 0.0 = exact NLL gradient.
    fastemit_lambda: float = 0.0
    # Exponential moving average of the params (Polyak averaging): > 0
    # keeps ema_t = decay * ema_{t-1} + (1-decay) * params_t alongside the
    # train state (typical 0.999/0.9999); decode/export with --use-ema.
    # 0.0 = off (TrainState.ema stays None; checkpoint layout unchanged).
    ema_decay: float = 0.0
    # accumulate gradients over k microbatches before each optimizer update
    grad_accum: int = 1
    # RNN-T loss kernel: "auto" (fused/Pallas on TPU, XLA elsewhere),
    # "fused", "pallas", "xla", or "pruned" (two-pass pruned training;
    # requires TransducerConfig.pruned_range > 0)
    loss_impl: str = "auto"
    # weight of the trivial-joiner first-pass loss in the pruned
    # objective: pruned + simple_loss_scale * simple (k2 default 0.5)
    simple_loss_scale: float = 0.5
    # MWER discriminative fine-tuning (train/mwer.py; train.py
    # --mwer-steps runs this loss for the LAST N steps): N-best beam
    # width, per-frame expansions, hypothesis length cap, and an
    # optional interpolated NLL stabilizer.
    mwer_beam: int = 4
    mwer_expansions: int = 2
    mwer_max_symbols: int = 64
    mwer_nll_weight: float = 0.0
    # Knowledge distillation (teacher-student over the full RNN-T
    # lattice): adds distill_weight * KL(teacher || student) of the
    # temperature-softened joint posteriors, averaged over valid lattice
    # cells (Hinton tau^2 scaling). The teacher is any checkpoint with
    # the same vocab/blank/time_reduction (e.g. a big offline BiLSTM or
    # conformer teaching a small streaming student). 0.0 = off.
    distill_weight: float = 0.0
    distill_temp: float = 1.0
    # Alignment-restricted RNN-T (Mahadeokar et al. 2021): ar_range > 0
    # trains with loss_impl="ar" — the banded loss (ops/rnnt_pruned.py)
    # on an ar_range-wide band around a reference Viterbi alignment,
    # computed in-step from --ar-align-from's checkpoint (same lattice
    # grid) or from the live model under stop_gradient. Emission timing
    # becomes a constraint: paths may run at most ar_left labels behind
    # the alignment (late) and ar_range-1-ar_left ahead (early) —
    # bounding training-time emission delay for streaming models.
    ar_range: int = 0
    ar_left: int = -1  # band positions behind the aligned path (-1 = half)
    # data-parallel mesh axis size (1 = single chip)
    data_parallel: int = 1
    # bucketing: (max_frames, max_labels) per bucket
    buckets: tuple[tuple[int, int], ...] = ((400, 50), (800, 100), (1600, 200))


# --- The five driver benchmark configs (BASELINE.json configs[0..4]) ------

def config_greedy_smoke() -> TransducerConfig:
    """configs[0]: 2x256 LSTM encoder + 1x256 prediction net, 80-dim log-mel."""
    return TransducerConfig(enc_layers=2, enc_hidden=256, pred_layers=1,
                            pred_hidden=256, embed_dim=256, joint_dim=256,
                            vocab_size=64)


def config_timit() -> TransducerConfig:
    """configs[1]: TIMIT phonemes — 3x320 BiLSTM encoder. 62 phones + blank."""
    return TransducerConfig(enc_layers=3, enc_hidden=320, bidirectional=True,
                            pred_layers=1, pred_hidden=320, embed_dim=320,
                            joint_dim=320, vocab_size=63)


def config_libri100() -> TransducerConfig:
    """configs[2]: LibriSpeech train-clean-100 — 4x512 LSTM encoder."""
    return TransducerConfig(enc_layers=4, enc_hidden=512, pred_layers=1,
                            pred_hidden=512, embed_dim=512, joint_dim=512,
                            vocab_size=1024, time_reduction=2)


def config_libri960() -> TransducerConfig:
    """configs[4]: LibriSpeech 960h — 6x1024 encoder, char vocab (~30)."""
    return TransducerConfig(enc_layers=6, enc_hidden=1024, pred_layers=2,
                            pred_hidden=1024, embed_dim=512, joint_dim=1024,
                            vocab_size=32, time_reduction=2)


def config_libri100_conformer() -> TransducerConfig:
    """Conformer-encoder twin of configs[2]: 8 blocks x d=512 (~ the
    4x512 LSTM's parameter count), 4x input frame stacking."""
    return TransducerConfig(enc_type="conformer", enc_layers=8,
                            enc_hidden=512, enc_heads=8, enc_ff_mult=4,
                            enc_conv_kernel=15, pred_layers=1,
                            pred_hidden=512, embed_dim=512, joint_dim=512,
                            vocab_size=1024, time_reduction=4)


def config_conformer_smoke() -> TransducerConfig:
    """Smoke-scale conformer (2 blocks x d=128): exercises the full
    conformer CLI/config path (enc_type routing, frame stacking,
    relative-position attention, conv module) at ~1/100 the FLOPs of
    libri100_conformer — used by the CLI tests so the suite doesn't
    train an 8x512 encoder on one CPU core just to smoke argument
    plumbing (422 s -> ~30 s, VERDICT r3 item 5)."""
    return TransducerConfig(enc_type="conformer", enc_layers=2,
                            enc_hidden=128, enc_heads=4, enc_ff_mult=2,
                            enc_conv_kernel=7, pred_layers=1,
                            pred_hidden=128, embed_dim=128, joint_dim=128,
                            vocab_size=64, time_reduction=4)


def config_libri100_conformer_stream() -> TransducerConfig:
    """Causal/streamable conformer twin: 64-frame left attention window
    per block (~2.5 s of audio at 4x stacking), causal conv."""
    return dataclasses.replace(config_libri100_conformer(), enc_att_left=64)


def config_libri100_conformer_chunked() -> TransducerConfig:
    """Chunked-attention (lookahead) streamable twin: 32-frame attention
    chunks + 64 frames of left context — queries see in-chunk future
    (latency = 32 encoded frames) for accuracy between the strict-causal
    and offline forms."""
    return dataclasses.replace(config_libri100_conformer(), enc_chunk_att=32,
                               enc_att_left=64)


NAMED_CONFIGS = {
    "greedy_smoke": config_greedy_smoke,
    "timit": config_timit,
    "libri100": config_libri100,
    "libri960": config_libri960,
    "libri100_conformer": config_libri100_conformer,
    "conformer_smoke": config_conformer_smoke,
    "libri100_conformer_stream": config_libri100_conformer_stream,
    "libri100_conformer_chunked": config_libri100_conformer_chunked,
}
