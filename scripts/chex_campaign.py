"""Multi-seed CheXpert campaign driver in ONE process.

The axon tunnel developed a ~12-15 min dead period at process start
(round-5 observation: fresh TPU clients sit futex-blocked before the first
program runs; earlier in the round it was seconds). Running each seed as
its own process (scripts/round5_queue.sh) pays that stall per seed; this
driver calls chexpert_downstream.main() repeatedly inside one TPU client,
paying it once. Results/resume behavior identical — each seed still writes
its own chexpert-k{k}-{seed}.json (skip-if-finished).

Usage: python scripts/chex_campaign.py 3 7 11 13 17 [--perf_mode] ...
(flags after the seed list are forwarded verbatim to every seed's run).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    seeds = []
    while args and args[0].isdigit():
        seeds.append(args.pop(0))
    if not seeds:
        raise SystemExit("usage: chex_campaign.py SEED [SEED...] [flags...]")

    from clearvae_tpu.experiments import chexpert_downstream as CD

    for seed in seeds:
        t0 = time.time()
        print(f"=== campaign seed {seed} start {time.strftime('%H:%M:%S')}",
              flush=True)
        CD.main(["--epochs", "41", "--n_synthetic", "4096", "--k_max", "3",
                 "--seed", seed, "--vae_lr", "1e-4",
                 "--epochs_per_scan", "4", *args])
        print(f"=== campaign seed {seed} done in {time.time() - t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
