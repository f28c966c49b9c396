"""JSONL-manifest dataset loader (TIMIT / LibriSpeech style).

No corpora ship in this environment, so datasets are consumed through a
manifest abstraction: one JSON object per line with either
  {"feats": <npy path>,  "labels": [int, ...]}           (precomputed) or
  {"audio": <raw f32 pcm path or .npy>, "labels": [...]} (frontend applied)
Token ids follow the model config (blank = cfg.blank excluded from labels).

`manifest_batches` streams examples through the length-bucketed batcher
(fixed shapes, one XLA compile per bucket — data/bucketing.py).
"""

from __future__ import annotations

import itertools
import json

import numpy as np

from rnn_transducer_tpu.data.bucketing import bucket_stream


def read_manifest(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def load_example(rec, input_dim: int, cmvn=None):
    """Manifest record -> (feats (T, F) fp32, labels (U,) int32).

    cmvn: optional global-CMVN stats dict (data/cmvn.py) applied to the
    features after extraction (before any padding)."""
    labels = np.asarray(rec["labels"], np.int32)
    if "feats" in rec:
        feats = np.load(rec["feats"]).astype(np.float32)
    elif "audio" in rec:
        path = rec["audio"]
        audio = (np.load(path) if path.endswith(".npy")
                 else np.fromfile(path, np.float32))
        from rnn_transducer_tpu.utils import hostio
        if hostio.available():  # native C++ frontend (cpp/hostio.cpp)
            feats = hostio.fbank(audio, n_mels=input_dim)
        else:
            import jax.numpy as jnp

            from rnn_transducer_tpu.ops.logmel import log_mel
            f, fl = log_mel(jnp.asarray(audio[None]),
                            jnp.asarray([len(audio)], np.int32),
                            n_mels=input_dim)
            feats = np.asarray(f[0, : int(fl[0])])
    else:
        raise ValueError(f"manifest record needs 'feats' or 'audio': {rec}")
    if feats.shape[1] != input_dim:
        raise ValueError(
            f"feature dim {feats.shape[1]} != config input_dim {input_dim}")
    if cmvn is not None:
        from rnn_transducer_tpu.data.cmvn import apply_cmvn
        feats = apply_cmvn(feats, cmvn)
    return feats, labels


def manifest_examples(path, cfg, order=None, cmvn=None):
    recs = read_manifest(path)
    if order is not None:
        recs = list(recs)
        recs = [recs[i] for i in order]
    for rec in recs:
        yield load_example(rec, cfg.input_dim, cmvn=cmvn)


def example_length(rec) -> int:
    """Frame count of a manifest record without loading its payload.

    .npy lengths come from the header via mmap; raw-f32 audio from the
    file size (FBANK frame count at the default 10 ms hop).
    """
    if "feats" in rec:
        return int(np.load(rec["feats"], mmap_mode="r").shape[0])
    path = rec["audio"]
    if path.endswith(".npy"):
        n = int(np.load(path, mmap_mode="r").shape[0])
    else:
        import os
        n = os.path.getsize(path) // 4
    from rnn_transducer_tpu.utils import hostio
    if hostio.available():
        return hostio._load().hostio_num_frames(n, 400, 160)
    return max(0, 1 + (n - 400) // 160)


def _epoch_order(path, epoch: int, skip_first: int, sortagrad: bool,
                 shuffle_seed: int | None, n: int | None = None,
                 lens=None):
    """Manifest-index order of one epoch, or None for raw manifest order
    (with skip_first applied by the caller). `n`/`lens` let a caller
    that already scanned the manifest skip the re-scan."""
    if sortagrad and epoch == 0:
        if lens is None:
            lens = [example_length(r) for r in read_manifest(path)]
        lens = lens[skip_first:]
        return [skip_first + i for i in
                sorted(range(len(lens)), key=lens.__getitem__)]
    if shuffle_seed is not None:
        if n is None:
            n = sum(1 for _ in read_manifest(path))
        rng = np.random.default_rng(shuffle_seed + epoch)
        return [skip_first + int(i)
                for i in rng.permutation(max(0, n - skip_first))]
    return None


def fast_forward_state(path, tcfg, n_batches: int, skip_first: int = 0,
                       sortagrad: bool = False,
                       shuffle_seed: int | None = None):
    """Metadata-only replay of manifest_batches' first `n_batches`.

    Replays the epoch orders and the BucketBatcher add/emit/flush
    decisions using only (n_frames, n_labels) per record — no feature
    payload is ever loaded (example_length reads npy headers / file
    sizes). Returns (epoch, pos, pending, in_flush):

      epoch     epoch of the next batch to be produced
      pos       index into that epoch's order of the next example to add
                (ignored when in_flush)
      pending   manifest indices of the examples sitting in
                partially-filled buckets at the cut, in ADD order —
                re-adding them in this order reconstructs the batcher's
                per-bucket lists AND its dict (flush) order exactly
      in_flush  the cut landed inside the end-of-epoch flush: `pending`
                holds only the not-yet-flushed buckets' examples, and the
                resumed epoch consists of flushing them (no new adds)
    """
    from rnn_transducer_tpu.data.bucketing import BucketBatcher

    recs = list(read_manifest(path))
    n = len(recs)
    lens = [example_length(r) for r in recs]
    llen = [len(r["labels"]) for r in recs]
    sizer = BucketBatcher(tcfg.buckets, tcfg.batch_size)
    remaining = int(n_batches)
    epoch = 0
    if remaining <= 0:
        return 0, 0, [], False
    while True:
        order = _epoch_order(path, epoch, skip_first, sortagrad,
                             shuffle_seed, n=n, lens=lens)
        if order is None:
            order = list(range(skip_first, n))
        pending: dict = {}  # bucket -> [(addseq, manifest idx), ...]
        addseq = 0
        for pos, idx in enumerate(order):
            b = sizer._bucket_for(lens[idx], llen[idx])
            if b is None:
                continue  # dropped (fits no bucket), like add()
            pending.setdefault(b, []).append((addseq, idx))
            addseq += 1
            if len(pending[b]) == tcfg.batch_size:
                del pending[b]  # mirrors _pending.pop on emit
                remaining -= 1
                if remaining == 0:
                    flat = sorted(
                        it for lst in pending.values() for it in lst)
                    return epoch, pos + 1, [i for _, i in flat], False
        # end-of-epoch flush: one padded batch per non-empty bucket, in
        # dict insertion order (= first-pending-add order)
        flush_order = [b for b in pending if pending[b]]
        for k, b in enumerate(flush_order):
            remaining -= 1
            if remaining == 0:
                flat = sorted(it for b2 in flush_order[k + 1:]
                              for it in pending[b2])
                return epoch, len(order), [i for _, i in flat], True
        epoch += 1


def manifest_batches(path, cfg, tcfg, loop: bool = True, skip_first: int = 0,
                     sortagrad: bool = False,
                     shuffle_seed: int | None = None,
                     resume_batches: int = 0, cmvn=None):
    """Infinite (by default) stream of bucketed, padded training batches.

    skip_first: exclude the first N manifest examples from every epoch
    (used to hold them out as a dev batch — see `manifest_dev_batch`).
    sortagrad: process the FIRST epoch shortest-utterance-first (warmup
    on easy alignments, the DeepSpeech/ASR-recipe curriculum); later
    epochs follow shuffle_seed (or manifest order).
    shuffle_seed: reshuffle the (non-held-out) examples every epoch with
    rng(seed + epoch) — same contract as the native C++ loader
    (cpp/loader.cpp); None keeps manifest order (deterministic tests).
    resume_batches: fast-forward past the first N batches so a resumed
    run sees exactly the batches an uninterrupted run would (train.py
    --resume: N = the restored step count). The skip replays bucketing
    decisions on manifest METADATA only — no features are loaded for
    skipped batches; the examples still sitting in partially-filled
    buckets at the cut are re-featurized (at most buckets x batch_size
    of them).
    """
    epoch = 0
    if resume_batches:
        epoch, pos, pending_idx, in_flush = fast_forward_state(
            path, tcfg, resume_batches, skip_first=skip_first,
            sortagrad=sortagrad, shuffle_seed=shuffle_seed)
        order = _epoch_order(path, epoch, skip_first, sortagrad,
                             shuffle_seed)
        if order is None:
            n = sum(1 for _ in read_manifest(path))
            order = list(range(skip_first, n))
        # re-adding the in-flight examples in their original ADD order
        # reconstructs the batcher state exactly; then the epoch
        # continues from `pos` (or goes straight to the flush)
        seq = pending_idx + ([] if in_flush else order[pos:])
        ex = manifest_examples(path, cfg, order=seq, cmvn=cmvn)
        for batch in bucket_stream(ex, tcfg.buckets, tcfg.batch_size,
                                   blank=cfg.blank):
            yield batch
        epoch += 1
        if not loop:
            return
    while True:
        order = _epoch_order(path, epoch, skip_first, sortagrad,
                             shuffle_seed)
        if order is not None:
            ex = manifest_examples(path, cfg, order=order, cmvn=cmvn)
        else:
            ex = manifest_examples(path, cfg, cmvn=cmvn)
            if skip_first:
                ex = itertools.islice(ex, skip_first, None)
        yielded = False
        for batch in bucket_stream(ex, tcfg.buckets, tcfg.batch_size,
                                   blank=cfg.blank):
            yielded = True
            yield batch
        if not yielded:
            # Otherwise an infinite `loop` would silently spin re-reading
            # the manifest forever (e.g. skip_first consumed every example,
            # or nothing fits the buckets).
            raise ValueError(
                f"manifest {path!r} produced no training batches "
                f"(skip_first={skip_first}, buckets={tcfg.buckets}) — "
                "every example was held out, dropped, or the file is empty")
        epoch += 1
        if not loop:
            return


def manifest_dev_batch(path, cfg, tcfg, n: int | None = None, cmvn=None):
    """The first `n` (default batch_size) examples as one fixed padded batch.

    Returns (feats, feat_lens, labels, label_lens, n_valid) or None if the
    manifest is empty / nothing fits the buckets.
    """
    n = n or tcfg.batch_size
    ex = itertools.islice(manifest_examples(path, cfg, cmvn=cmvn), n)
    for batch in bucket_stream(ex, tcfg.buckets, tcfg.batch_size,
                               blank=cfg.blank, with_valid=True):
        return batch
    return None
