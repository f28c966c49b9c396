"""sclite-style WER error analysis over a recognize.py --hyps-file.

Aligns every (ref, hyp) pair and prints the corpus breakdown — WER
split into substitution/insertion/deletion rates, sentence error rate,
the top confusion pairs, the most-dropped and most-hallucinated tokens,
and the worst utterances (with their text, for triage):

  python recognize.py ... --hyps-file hyps.jsonl
  python tools/wer_report.py --hyps hyps.jsonl [--top 20] [--json out.json]

Text records are compared as whitespace words; id records as token ids.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rnn_transducer_tpu.decode.metrics import error_report  # noqa: E402


def load_pairs(path):
    refs, hyps, raw = [], [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            r, h = rec["ref"], rec["hyp"]
            if isinstance(r, str):
                refs.append(r.split())
                hyps.append(h.split())
            else:
                refs.append(list(r))
                hyps.append(list(h))
            raw.append((r, h))
    return refs, hyps, raw


def main(argv=None):
    p = argparse.ArgumentParser(description="WER error breakdown")
    p.add_argument("--hyps", required=True,
                   help="JSONL of {ref, hyp} from recognize.py --hyps-file")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--json", default=None,
                   help="also write the full report as JSON here")
    args = p.parse_args(argv)

    refs, hyps, raw = load_pairs(args.hyps)
    rep = error_report(refs, hyps, top=args.top)

    pct = lambda x: f"{100 * x:6.2f}%"
    print(f"utterances: {rep['n_utts']}   ref tokens: {rep['n_ref']}")
    print(f"WER {pct(rep['wer'])}  (sub {pct(rep['sub_rate'])}  "
          f"ins {pct(rep['ins_rate'])}  del {pct(rep['del_rate'])})   "
          f"SER {pct(rep['sentence_error_rate'])}")
    if rep["confusions"]:
        print("\ntop confusions (ref -> hyp):")
        for (r, h), n in rep["confusions"]:
            print(f"  {n:5d}  {r!r} -> {h!r}")
    if rep["deletions"]:
        print("\ntop deletions:")
        for t, n in rep["deletions"]:
            print(f"  {n:5d}  {t!r}")
    if rep["insertions"]:
        print("\ntop insertions:")
        for t, n in rep["insertions"]:
            print(f"  {n:5d}  {t!r}")
    bad = [x for x in rep["worst_utterances"] if x[1] > 0]
    if bad:
        print("\nworst utterances:")
        for idx, u_wer in bad:
            r, h = raw[idx]
            print(f"  #{idx} wer={u_wer:.2f}")
            print(f"    ref: {r}")
            print(f"    hyp: {h}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=1, default=str)
        print(f"\nfull report -> {args.json}")


if __name__ == "__main__":
    main()
