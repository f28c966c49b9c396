"""SortaGrad: first-epoch shortest-first ordering on manifest data."""

import json

import numpy as np

from rnn_transducer_tpu.data.manifest import (example_length,
                                              manifest_batches)
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig

CFG = TransducerConfig(input_dim=8, vocab_size=16)


def _manifest(tmp_path, lengths):
    recs = []
    rng = np.random.default_rng(0)
    for i, t in enumerate(lengths):
        feats = rng.normal(size=(t, CFG.input_dim)).astype(np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, feats)
        recs.append({"feats": str(p),
                     "labels": rng.integers(1, 16, size=2).tolist()})
    m = tmp_path / "m.jsonl"
    m.write_text("\n".join(json.dumps(r) for r in recs))
    return str(m)


def test_example_length_without_loading(tmp_path):
    m = _manifest(tmp_path, [7, 3, 11])
    from rnn_transducer_tpu.data.manifest import read_manifest
    assert [example_length(r) for r in read_manifest(m)] == [7, 3, 11]


def test_first_epoch_is_shortest_first(tmp_path):
    lengths = [9, 3, 12, 6, 10, 4, 8, 5]
    m = _manifest(tmp_path, lengths)
    tcfg = TrainConfig(batch_size=2, buckets=((16, 4),))
    batches = list(manifest_batches(m, CFG, tcfg, loop=False,
                                    sortagrad=True))
    seen = [int(l) for _, fl, _, _ in batches for l in fl]
    assert seen == sorted(lengths)
    # second epoch (loop): manifest order again
    it = manifest_batches(m, CFG, tcfg, loop=True, sortagrad=True)
    n_batches = len(lengths) // 2
    epoch1 = [it.__next__() for _ in range(n_batches)]
    epoch2 = [it.__next__() for _ in range(n_batches)]
    seen1 = [int(l) for _, fl, _, _ in epoch1 for l in fl]
    seen2 = [int(l) for _, fl, _, _ in epoch2 for l in fl]
    assert seen1 == sorted(lengths)
    assert seen2 == lengths


def test_epoch_shuffle(tmp_path):
    """shuffle_seed: each epoch is a fresh permutation covering every
    example exactly once (same contract as the native C++ loader)."""
    lengths = [9, 3, 12, 6, 10, 4, 8, 5]
    m = _manifest(tmp_path, lengths)
    tcfg = TrainConfig(batch_size=2, buckets=((16, 4),))
    it = manifest_batches(m, CFG, tcfg, loop=True, shuffle_seed=0)
    n_batches = len(lengths) // 2
    seen1 = [int(l) for b in (next(it) for _ in range(n_batches))
             for l in b[1]]
    seen2 = [int(l) for b in (next(it) for _ in range(n_batches))
             for l in b[1]]
    assert sorted(seen1) == sorted(lengths)  # full coverage per epoch
    assert sorted(seen2) == sorted(lengths)
    assert seen1 != seen2 or seen1 != lengths  # actually permuted
    # SortaGrad composes: epoch 0 sorted, later epochs shuffled
    it = manifest_batches(m, CFG, tcfg, loop=True, sortagrad=True,
                          shuffle_seed=0)
    seen1 = [int(l) for b in (next(it) for _ in range(n_batches))
             for l in b[1]]
    seen2 = [int(l) for b in (next(it) for _ in range(n_batches))
             for l in b[1]]
    assert seen1 == sorted(lengths)
    assert sorted(seen2) == sorted(lengths) and seen2 != lengths
