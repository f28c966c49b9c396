"""Scripted accuracy evidence (VERDICT r2 item 8).

Real LibriSpeech/TIMIT audio does not exist in this environment (no
network — SURVEY.md §0), so this script builds the strongest achievable
substitute: a GENERATED spoken-character corpus whose audio is genuinely
learnable from the waveform (each character is a fixed-frequency tone
burst, so the FBANK frontend sees a distinct mel signature per token),
then runs the full real pipeline end to end for the TIMIT-shaped and
libri100-shaped configs:

  corpus WAVs -> tools/prepare_manifest (FBANK + char tokenizer)
  -> train.py (checkpointing, --dev-manifest held-out eval, dev_per
     curve via MetricsLogger --log-file)
  -> recognize.py greedy + beam-8 corpus WER from --ckpt-dir alone

and renders the markdown table + dev-error curves for
docs/PERFORMANCE.md. Reproduce with:

  python tools/accuracy_evidence.py --out-dir /tmp/acc
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import math
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
CHAR_MS = 80  # tone burst per character
GAP_MS = 20
WORDS = ["the", "cat", "dog", "runs", "fast", "slow", "over", "hill",
         "blue", "sky", "red", "fox", "jumps", "high", "low", "river"]


def _char_freq(c: str) -> float:
    # distinct tone per character, EQUALLY SPACED ON THE MEL SCALE from
    # 300 Hz to 3.8 kHz (~65 mel apart = ~2 FBANK bins at n_mels=80, so
    # every pair is separable; geometric Hz spacing left the low chars
    # only half a bin apart)
    i = (ord(c) - ord("a")) if c != " " else 26
    mel_lo = 2595.0 * math.log10(1.0 + 300.0 / 700.0)
    mel_hi = 2595.0 * math.log10(1.0 + 3800.0 / 700.0)
    mel = mel_lo + (mel_hi - mel_lo) * i / 27.0
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def synth_utterance(text: str, rng) -> np.ndarray:
    """Text -> PCM: one tone burst per character (spaces = near-silence)."""
    n_char = int(SR * CHAR_MS / 1000)
    n_gap = int(SR * GAP_MS / 1000)
    t = np.arange(n_char) / SR
    out = []
    for c in text:
        if c == " ":
            seg = np.zeros(n_char)
        else:
            seg = 0.3 * np.sin(2 * math.pi * _char_freq(c) * t)
        out.append(seg)
        out.append(np.zeros(n_gap))
    pcm = np.concatenate(out) + rng.normal(scale=0.01,
                                           size=sum(map(len, out)))
    return (pcm * 20000).clip(-32767, 32767).astype(np.int16)


def gen_corpus(corpus_dir: str, n_utts: int, seed: int):
    rng = np.random.default_rng(seed)
    os.makedirs(corpus_dir, exist_ok=True)
    for i in range(n_utts):
        n_words = rng.integers(2, 5)
        text = " ".join(rng.choice(WORDS) for _ in range(n_words))
        pcm = synth_utterance(text, rng)
        with wave.open(os.path.join(corpus_dir, f"utt{i:04d}.wav"),
                       "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(pcm.tobytes())
        with open(os.path.join(corpus_dir, f"utt{i:04d}.txt"), "w") as f:
            f.write(text)


def _run_capture(fn, argv) -> dict:
    """Run a CLI main() capturing its final stdout JSON line."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(argv)
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def split_manifest(manifest: str, out_dir: str, n_dev: int):
    with open(manifest) as f:
        lines = f.read().splitlines()
    dev, train = lines[:n_dev], lines[n_dev:]
    tr_path = os.path.join(out_dir, "train.jsonl")
    dv_path = os.path.join(out_dir, "dev.jsonl")
    with open(tr_path, "w") as f:
        f.write("\n".join(train) + "\n")
    with open(dv_path, "w") as f:
        f.write("\n".join(dev) + "\n")
    return tr_path, dv_path


def run_config(name: str, cfg_name: str, out_dir: str, steps: int,
               n_utts: int, batch_size: int, seed: int) -> dict:
    import prepare_manifest
    import recognize
    import train

    work = os.path.join(out_dir, name)
    corpus = os.path.join(work, "corpus")
    feats = os.path.join(work, "feats")
    ck = os.path.join(work, "ck")
    log_file = os.path.join(work, "train_log.jsonl")
    gen_corpus(corpus, n_utts, seed)
    _run_capture(prepare_manifest.main,
                 ["--in-dir", corpus, "--out-dir", feats,
                  "--tokenizer", "char"])
    man = os.path.join(feats, "manifest.jsonl")
    tr, dv = split_manifest(man, work, n_dev=batch_size)

    train.main(["--config", cfg_name, "--steps", str(steps),
                "--batch-size", str(batch_size),
                "--data", f"manifest:{tr}", "--dev-manifest", dv,
                "--ckpt-dir", ck, "--tokenizer", "char",
                "--eval-every", "200", "--log-every", "100",
                "--log-file", log_file, "--ckpt-every", str(steps),
                "--lr", "3e-4", "--warmup-steps", "200",
                "--dropout", "0.1",
                "--max-frames", "600", "--max-labels", "40",
                "--data-parallel", "1", "--seed", str(seed)])

    res = {"config": cfg_name, "steps": steps, "utts": n_utts}
    for mode, extra in (("greedy", []), ("beam", ["--beam", "8"])):
        out = _run_capture(
            recognize.main,
            ["--mode", mode, "--ckpt-dir", ck, "--data", f"manifest:{dv}",
             "--batch-size", str(batch_size), "--max-symbols", "40"]
            + extra)
        res[f"{mode}_wer"] = out["wer"]
        if "word_wer" in out:
            res[f"{mode}_word_wer"] = out["word_wer"]
    # dev_per curve from the MetricsLogger JSONL
    curve = []
    with open(log_file) as f:
        for ln in f:
            rec = json.loads(ln)
            if "dev_per" in rec:
                curve.append((rec["step"], rec["dev_per"]))
    res["dev_per_curve"] = curve
    return res


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", required=True)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--utts", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--configs", nargs="+",
                   default=["timit", "libri100"],
                   help="named model configs to train (shapes only; the "
                        "corpus is the generated spoken-character task)")
    args = p.parse_args(argv)

    results = []
    for cfg_name in args.configs:
        print(f"=== {cfg_name} ===", file=sys.stderr)
        results.append(run_config(cfg_name, cfg_name, args.out_dir,
                                  args.steps, args.utts, args.batch_size,
                                  args.seed))

    # markdown table for docs/PERFORMANCE.md
    print("| config | steps | dev char-WER (greedy) | dev char-WER "
          "(beam 8) | dev word-WER (beam 8) |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['config']} | {r['steps']} | {r['greedy_wer']} | "
              f"{r['beam_wer']} | {r.get('beam_word_wer', '—')} |")
    for r in results:
        pts = ", ".join(f"{s}:{p}" for s, p in r["dev_per_curve"])
        print(f"curve {r['config']}: {pts}")
    with open(os.path.join(args.out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
