"""Compare the perf-mode parity A/B results (VERDICT r3 item 6).

Reads celeba-k{k}-{seed}.json vs celeba-k{k}-{seed}-perf.json (written by
`celeba_downstream --perf_mode`) and the queue wall-clock lines, and prints
the side-by-side accuracy/mAP/mAUC table for BASELINE.md. perf_mode changes
the param tree (fused heads) and rounding (bf16), so cells are expected to
be equivalent-in-distribution, not identical.
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="./expr_output/celeba/classification")
    p.add_argument("--prefix", default="celeba",
                   help="result-file prefix ({prefix}-k{k}-{seed}.json)")
    p.add_argument("--seed", type=int, default=900)
    p.add_argument("--k_max", type=int, default=3)
    args = p.parse_args()

    print("| k | model | default acc / mAP / mAUC | perf acc / mAP / mAUC |")
    print("|---|---|---|---|")
    for k in range(1, args.k_max + 1):
        base_p = os.path.join(args.dir, f"{args.prefix}-k{k}-{args.seed}.json")
        perf_p = os.path.join(args.dir, f"{args.prefix}-k{k}-{args.seed}-perf.json")
        if not (os.path.exists(base_p) and os.path.exists(perf_p)):
            print(f"| {k} | (missing: "
                  f"{[q for q in (base_p, perf_p) if not os.path.exists(q)]})"
                  " | | |")
            continue
        base = json.load(open(base_p))
        perf = json.load(open(perf_p))
        for model in base:
            if model not in perf:
                continue
            b, q = base[model], perf[model]

            def fmt(r):
                return (f"{r['acc']:.3f} / {r['pr']['overall']:.3f} / "
                        f"{r['roc']['overall']:.3f}")

            print(f"| {k} | {model} | {fmt(b)} | {fmt(q)} |")


if __name__ == "__main__":
    main()
