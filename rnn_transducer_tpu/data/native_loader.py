"""Native multi-threaded prefetching data loader (cpp/loader.cpp).

C++ worker threads read manifest entries (precomputed .npy features, or
raw-PCM audio run through the native FBANK), length-bucket them, and
publish padded fixed-shape batches into a bounded queue — file IO,
decode, feature extraction and padding overlap device compute instead of
serializing with it on the training host thread. The reference family
does this with torch DataLoader worker processes; here it is native
threads behind a C ABI (ctypes — no pybind11 in this image).

Semantics match data/bucketing.bucket_stream: same bucket selection
(first (max_t, max_u) that fits), same cyclic padding of trailing
partial batches with a true n_valid count. With seed=None the manifest
order is preserved and a single worker reproduces the Python loader's
batches exactly (tested); with an int seed, examples are reshuffled each
epoch.
"""

from __future__ import annotations

import ctypes
import json
import os

import numpy as np

from rnn_transducer_tpu.utils import hostio


class _LoaderAPI:
    """Lazily-initialized ctypes signatures for the loader entry points."""

    _bound = None

    @classmethod
    def lib(cls):
        lib = hostio._load()
        if lib is None:
            return None
        if cls._bound is not lib:
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.loader_create.restype = ctypes.c_void_p
            lib.loader_create.argtypes = [
                ctypes.c_char_p, u8p, ctypes.c_int, i32p, i32p, i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, f32p,
            ]
            lib.loader_next.restype = ctypes.c_int
            lib.loader_next.argtypes = [ctypes.c_void_p, f32p, i32p, i32p,
                                        i32p, i32p]
            lib.loader_dropped.restype = ctypes.c_int64
            lib.loader_dropped.argtypes = [ctypes.c_void_p]
            lib.loader_destroy.restype = None
            lib.loader_destroy.argtypes = [ctypes.c_void_p]
            cls._bound = lib
        return lib


def available() -> bool:
    return _LoaderAPI.lib() is not None


class NativeLoader:
    """Iterate padded batches produced by the native prefetch pipeline.

    Yields (feats, feat_lens, labels, label_lens, n_valid) with feats
    shaped (B, bucket_max_t, F). Use as a context manager (or rely on
    __del__) so the worker threads are joined.
    """

    def __init__(self, manifest_path: str, cfg, buckets, batch_size: int,
                 *, loop: bool = False, seed: int | None = None,
                 n_threads: int = 2, queue_cap: int = 4,
                 skip_first: int = 0, fbank_kwargs: dict | None = None):
        lib = _LoaderAPI.lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (no toolchain)")
        paths, is_audio, labels = [], [], []
        with open(manifest_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if "feats" in rec:
                    paths.append(rec["feats"])
                    is_audio.append(0)
                elif "audio" in rec:
                    paths.append(rec["audio"])
                    is_audio.append(1)
                else:
                    raise ValueError(f"bad manifest record: {rec}")
                labels.append(np.asarray(rec["labels"], np.int32))
        paths = paths[skip_first:]
        is_audio = is_audio[skip_first:]
        labels = labels[skip_first:]
        if not paths:
            raise ValueError(f"empty manifest {manifest_path}")

        fbk = dict(n_fft=512, hop=160, win=400, n_mels=cfg.input_dim,
                   preemph=0.97, log_floor=1e-10, sample_rate=16000)
        fbk.update(fbank_kwargs or {})
        from rnn_transducer_tpu.ops.logmel import mel_filterbank
        mel_fb = np.ascontiguousarray(
            mel_filterbank(fbk["n_mels"], fbk["n_fft"], fbk["sample_rate"]),
            np.float32)

        self._B = batch_size
        self._F = cfg.input_dim
        # ascending, matching BucketBatcher's smallest-fitting-bucket rule
        self._buckets = sorted(tuple(b) for b in buckets)
        self._max_t = max(b[0] for b in self._buckets)
        self._max_u = max(b[1] for b in self._buckets)
        self._lib = lib

        joined = "\n".join(paths).encode()
        is_audio_arr = np.asarray(is_audio, np.uint8)
        label_lens = np.asarray([len(l) for l in labels], np.int32)
        labels_cat = np.ascontiguousarray(
            np.concatenate(labels) if labels else np.empty(0, np.int32),
            np.int32)
        buckets_tu = np.asarray(self._buckets, np.int32).reshape(-1)
        self._h = lib.loader_create(
            joined,
            is_audio_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(paths),
            labels_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            label_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            buckets_tu.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self._buckets), batch_size, cfg.input_dim, cfg.blank,
            1 if loop else 0, -1 if seed is None else int(seed),
            int(n_threads), int(queue_cap), fbk["n_fft"], fbk["hop"],
            fbk["win"], fbk["n_mels"], fbk["preemph"], fbk["log_floor"],
            mel_fb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if not self._h:
            raise RuntimeError("loader_create failed")

    def __iter__(self):
        B, F = self._B, self._F
        feats = np.empty((B, self._max_t, F), np.float32)
        feat_lens = np.empty((B,), np.int32)
        labels = np.empty((B, self._max_u), np.int32)
        label_lens = np.empty((B,), np.int32)
        shape = np.empty((3,), np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        while True:
            b = self._lib.loader_next(
                self._h,
                feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                feat_lens.ctypes.data_as(i32p),
                labels.ctypes.data_as(i32p),
                label_lens.ctypes.data_as(i32p),
                shape.ctypes.data_as(i32p))
            if b < 0:
                return
            t, u, n_valid = int(shape[0]), int(shape[1]), int(shape[2])
            yield (feats.reshape(-1)[: B * t * F].reshape(B, t, F).copy(),
                   feat_lens.copy(),
                   labels.reshape(-1)[: B * u].reshape(B, u).copy(),
                   label_lens.copy(), n_valid)

    @property
    def dropped(self) -> int:
        """Examples that fit no bucket (mirrors bucket_stream accounting)."""
        return int(self._lib.loader_dropped(self._h))

    def close(self):
        if getattr(self, "_h", None):
            self._lib.loader_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
