"""Standalone loader rate on the 13-corpus pretraining mixture — no TPU.

Separates the mixture loader's own capability from the tunneled-H2D CPU
theft that inflates `load avg` in tools/mixture_epoch.py runs on this
1-vCPU host (the axon client serializes ~12.6 MB/step at ~35 MB/s in
background threads, starving the inline loader; see BASELINE.md §Ingest).

Walks the same DataLoader config cli/train builds (inline + slot ring,
bf16 x wire) over the mixture corpus for N epochs and prints samples/s.
Best-of-N protocol per the r4 host-measurement trap note (steal bursts).

Usage: python tools/mixture_loader_rate.py [--root /tmp/dpot_mixture]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dpot_mixture")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ["DPOT_DATA_ROOT"] = args.root
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from tools.mixture_epoch import MIXTURE
    from dpot_tpu.data.grid_dataset import MixedTemporalDataset
    from dpot_tpu.data.loader import DataLoader

    names = [m[0] for m in MIXTURE]
    ntrain = [m[1] for m in MIXTURE]
    weights = [
        2 if n in ("swe_pdb", "dr_pdb", "ns2d_cond_pda",
                   "ns2d_pdb_M1_eta1e-8_zeta1e-8_rand_512") else 1
        for n in names
    ]
    ds = MixedTemporalDataset(
        names, ntrain, res=128, t_in=10, t_ar=1, train=True,
        data_weights=weights,
    )
    dl = DataLoader(ds, args.batch_size, shuffle=True, num_workers=1,
                    seed=0, prefetch=0, slot_ring=2)
    dl.x_dtype = np.dtype("bfloat16")  # the bf16_x wire config

    # warm the page cache + CPU governor
    t0 = time.perf_counter()
    n = 0
    for x, y, msk, cls in dl:
        n += x.shape[0]
    warm = n / (time.perf_counter() - t0)
    print(f"warmup epoch: {n} samples, {warm:.0f} samples/s")

    rates = []
    for t in range(args.trials):
        t0 = time.perf_counter()
        n = 0
        for x, y, msk, cls in dl:
            n += x.shape[0]
        rates.append(n / (time.perf_counter() - t0))
        print(f"trial {t}: {rates[-1]:.0f} samples/s")
    best, med = max(rates), sorted(rates)[len(rates) // 2]
    print(f"mixture loader standalone: best {best:.0f} median {med:.0f} samples/s")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"samples_per_s_best": round(best, 1),
                       "samples_per_s_median": round(med, 1),
                       "trials": [round(r, 1) for r in rates],
                       "epoch_samples": n,
                       "batch_size": args.batch_size}, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
