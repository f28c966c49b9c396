"""rnn_transducer_tpu — a TPU-native RNN-Transducer (ASR) framework.

Ground-up JAX/XLA/Pallas reimplementation of the capabilities of the
PyTorch reference `chmenet/rnn-transducer` (see SURVEY.md): log-mel
frontend, stacked uni/bi LSTM encoder, LSTM prediction network, joint
network, RNN-T loss, greedy/beam/streaming decoding, training,
checkpointing, and data-parallel scale-out over a TPU mesh.

Public API (mirrors the reference's model-forward / transducer-loss /
decode surface):

    from rnn_transducer_tpu import (
        TransducerConfig, TrainConfig, init_params, forward,
        rnnt_loss, ctc_loss_from_logits, log_mel,
        recognize_greedy, recognize_beam, stream_transcribe,
    )
"""

from rnn_transducer_tpu.data.tokenizer import (
    BpeTokenizer,
    CharTokenizer,
    PhonemeTokenizer,
)
from rnn_transducer_tpu.decode.beam import beam_search, recognize_beam
from rnn_transducer_tpu.decode.context import ContextBias, build_context_bias
from rnn_transducer_tpu.models.ngram import NgramLM, train_ngram
from rnn_transducer_tpu.decode.greedy import greedy_decode, recognize_greedy
from rnn_transducer_tpu.decode.metrics import error_rate
from rnn_transducer_tpu.decode.streaming import (
    stream_transcribe,
    stream_transcribe_beam,
)
from rnn_transducer_tpu.models.config import (
    NAMED_CONFIGS,
    TrainConfig,
    TransducerConfig,
)
from rnn_transducer_tpu.models.transducer import (
    encode,
    forward,
    init_params,
    joint,
    predict,
)
from rnn_transducer_tpu.models.lm import (
    LMConfig,
    init_lm_params,
    lm_loss,
    lm_step,
    load_lm,
)
from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits
from rnn_transducer_tpu.ops.quant import (QTensor, dequantize_tensor,
                                          quantize_params, quantize_tensor)
from rnn_transducer_tpu.ops.logmel import log_mel
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_mean
from rnn_transducer_tpu.ops.rnnt_pruned import rnnt_loss_pruned

__version__ = "0.2.0"

__all__ = [
    "NAMED_CONFIGS", "TrainConfig", "TransducerConfig",
    "init_params", "forward", "encode", "predict", "joint",
    "rnnt_loss", "rnnt_loss_mean", "rnnt_loss_pruned",
    "ctc_loss_from_logits", "log_mel",
    "greedy_decode", "recognize_greedy", "beam_search", "recognize_beam",
    "ContextBias", "build_context_bias",
    "QTensor", "quantize_tensor", "dequantize_tensor", "quantize_params",
    "NgramLM", "train_ngram",
    "stream_transcribe", "stream_transcribe_beam", "error_rate",
    "CharTokenizer", "PhonemeTokenizer", "BpeTokenizer",
    "LMConfig", "init_lm_params", "lm_step", "lm_loss", "load_lm",
]
