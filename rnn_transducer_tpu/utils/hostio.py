"""ctypes bindings for the native host-side pipeline (cpp/hostio.cpp).

Builds the shared library on first use (g++ via cpp/Makefile) and caches
it; all entry points degrade gracefully to numpy when the toolchain is
unavailable (`available()` -> False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CPP = os.path.join(_REPO, "cpp")
_SO = os.path.join(_CPP, "build", "libhostio.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        srcs = (os.path.join(_CPP, "hostio.cpp"),
                os.path.join(_CPP, "loader.cpp"))
        if not os.path.exists(_SO) or any(
                os.path.getmtime(_SO) < os.path.getmtime(s) for s in srcs):
            subprocess.run(["make", "-C", _CPP], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.hostio_num_frames.restype = ctypes.c_int
    lib.hostio_num_frames.argtypes = [ctypes.c_int] * 3
    lib.hostio_fbank.restype = ctypes.c_int
    lib.hostio_fbank.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_float, ctypes.c_float, f32p, f32p]
    lib.hostio_edit_distance.restype = ctypes.c_int
    lib.hostio_edit_distance.argtypes = [i32p, ctypes.c_int, i32p,
                                         ctypes.c_int]
    lib.hostio_corpus_edits.restype = ctypes.c_int64
    lib.hostio_corpus_edits.argtypes = [i32p, i32p, i32p, i32p, ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def fbank(audio: np.ndarray, *, sample_rate=16000, n_fft=512, hop=160,
          win=400, n_mels=80, preemph=0.97, log_floor=1e-10) -> np.ndarray:
    """Native log-mel FBANK for one utterance: (n,) f32 -> (T, n_mels) f32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("hostio library unavailable (no toolchain)")
    from rnn_transducer_tpu.ops.logmel import mel_filterbank
    audio = np.ascontiguousarray(audio, np.float32)
    fb = np.ascontiguousarray(
        mel_filterbank(n_mels, n_fft, sample_rate), np.float32)
    T = lib.hostio_num_frames(len(audio), win, hop)
    out = np.empty((max(T, 0), n_mels), np.float32)
    if T > 0:
        r = lib.hostio_fbank(_f32p(audio), len(audio), n_fft, hop, win,
                             n_mels, preemph, log_floor, _f32p(fb),
                             _f32p(out))
        assert r == T, f"hostio_fbank failed: {r}"
    return out


def edit_distance(ref, hyp) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("hostio library unavailable")
    r = np.ascontiguousarray(ref, np.int32)
    h = np.ascontiguousarray(hyp, np.int32)
    return lib.hostio_edit_distance(_i32p(r), len(r), _i32p(h), len(h))


def corpus_error_rate(refs, hyps) -> float:
    """Corpus WER/PER over lists of token sequences, in one native call."""
    lib = _load()
    if lib is None:
        raise RuntimeError("hostio library unavailable")
    ref_lens = np.asarray([len(r) for r in refs], np.int32)
    hyp_lens = np.asarray([len(h) for h in hyps], np.int32)
    rcat = np.ascontiguousarray(
        np.concatenate([np.asarray(r, np.int32) for r in refs])
        if refs else np.empty(0, np.int32))
    hcat = np.ascontiguousarray(
        np.concatenate([np.asarray(h, np.int32) for h in hyps])
        if hyps else np.empty(0, np.int32))
    total = ctypes.c_int64(0)
    edits = lib.hostio_corpus_edits(_i32p(rcat), _i32p(ref_lens),
                                    _i32p(hcat), _i32p(hyp_lens),
                                    len(refs), ctypes.byref(total))
    return edits / max(total.value, 1)
