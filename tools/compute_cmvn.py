"""Compute global CMVN statistics over a training manifest.

Usage:
  python tools/compute_cmvn.py --manifest train.jsonl --out cmvn.json \
      [--input-dim 80]

Writes {"mean": [F], "std": [F], "frames": N} — pass the file to
train.py --cmvn; the stats are recorded in the checkpoint's meta.json
and applied automatically by recognize.py / serve.py / align.py.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--input-dim", type=int, default=80)
    args = p.parse_args(argv)

    from rnn_transducer_tpu.data.cmvn import compute_cmvn, save_cmvn
    stats = compute_cmvn(args.manifest, args.input_dim)
    save_cmvn(stats, args.out)
    import numpy as np
    m = np.asarray(stats["mean"])
    s = np.asarray(stats["std"])
    print(f"{stats['frames']} frames; mean in [{m.min():.3f}, {m.max():.3f}],"
          f" std in [{s.min():.3f}, {s.max():.3f}] -> {args.out}")


if __name__ == "__main__":
    main()
