"""rnn_transducer_tpu — a TPU-native RNN-Transducer (ASR) framework.

Ground-up JAX/XLA/Pallas reimplementation of the capabilities of the
PyTorch reference `chmenet/rnn-transducer` (see SURVEY.md): log-mel
frontend, stacked uni/bi LSTM encoder, LSTM prediction network, joint
network, RNN-T loss, greedy/beam decoding, training, checkpointing, and
data-parallel scale-out over a TPU mesh.
"""

from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_mean

__version__ = "0.1.0"
