"""Real-workload proof: the reference's 12-dataset pretraining mixture,
end-to-end from disk through cli/train on the chip (VERDICT r4 item 3).

The reference's actual pretrain workload (train_temporal.py:106-110 +
configs/dpot_evaluate.yaml:24-41) is a weighted mixture of 12 datasets
with heterogeneous channels (1-4), resolutions (64^2/128^2), trajectory
lengths (14-101) and storage formats (single-file + scatter), plus cls
labels 0-11. This driver synthesizes corpora at those EXACT registry
names/paths/shapes (counts scaled down; content is smoothed noise — the
proof is mechanics + rate, not physics), adds one 512^2 member to
exercise the read-time 512->128 bilinear downscale, then runs cli/train
for several epochs with eval rollouts and --viz_dir on the real chip and
records per-epoch train/load/test times to MIXTURE_EPOCH_r05.json.

Usage:  python tools/mixture_epoch.py [--root /tmp/dpot_mixture]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (name, n_train, n_test) — shapes come from the registry spec itself.
# Counts are scaled so one epoch is ~1.2k samples (~2-3 s of DPOT-M chip
# time) and the corpus fits comfortably on disk (~4 GB).
MIXTURE = [
    ("ns2d_fno_1e-5", 64, 4),
    ("ns2d_fno_1e-4", 64, 4),
    ("ns2d_fno_1e-3", 64, 4),
    ("ns2d_pdb_M1_eta1e-1_zeta1e-1", 96, 4),
    ("ns2d_pdb_M1_eta1e-2_zeta1e-2", 96, 4),
    ("ns2d_pdb_M1e-1_eta1e-1_zeta1e-1", 96, 4),
    ("ns2d_pdb_M1e-1_eta1e-2_zeta1e-2", 96, 4),
    ("swe_pdb", 24, 4),
    ("dr_pdb", 24, 4),
    ("ns2d_pda", 64, 4),
    ("ns2d_cond_pda", 24, 4),
    ("cfdbench", 64, 4),
    # beyond the reference list: native 512^2 storage downscaled to 128
    # at read time (the reference can only downscale, griddataset.py:96)
    ("ns2d_pdb_M1_eta1e-8_zeta1e-8_rand_512", 6, 2),
]


def _smooth_traj(rng, shape):
    """Cheap smooth field: low-res noise upsampled (keeps generation fast
    at 512^2 while giving the resize/normalize paths non-trivial data)."""
    sp = shape[:-2]
    t, c = shape[-2], shape[-1]
    lo = rng.standard_normal(
        tuple(max(s // 8, 4) for s in sp) + (t, c)
    ).astype(np.float32)
    out = lo
    for ax, s in enumerate(sp):
        out = np.repeat(out, max(s // out.shape[ax], 1), axis=ax)
        out = out[tuple(
            slice(None, s) if a == ax else slice(None)
            for a in range(out.ndim)
        )]
    return np.ascontiguousarray(out, np.float32)


def build_corpora(root: str) -> None:
    from dpot_tpu.data.generation import write_scatter, write_single
    from dpot_tpu.data.registry import get_spec

    for name, n_train, n_test in MIXTURE:
        spec = get_spec(name)
        sp = tuple(spec.in_size)
        t_total, ch = spec.t_total, spec.n_channels
        shape = (*sp, t_total, ch)
        rng = np.random.default_rng(abs(hash(name)) % (2**32))
        if spec.scatter_storage:
            train_dir = os.path.join(root, spec.train_path)
            marker = os.path.join(train_dir, f"data_{n_train - 1}.hdf5")
            if not os.path.exists(marker):
                write_scatter(
                    os.path.dirname(train_dir),
                    (_smooth_traj(rng, shape) for _ in range(n_train)),
                    os.path.basename(train_dir),
                )
                test_dir = os.path.join(root, spec.test_path)
                write_scatter(
                    os.path.dirname(test_dir),
                    (_smooth_traj(rng, shape) for _ in range(n_test)),
                    os.path.basename(test_dir),
                )
        else:
            train_path = os.path.join(root, spec.train_path)
            if not os.path.exists(train_path):
                # single-file: (N, sp..., T[, C]) — channel-less when the
                # spec has 1 channel (the FNO sets' stored layout)
                def block(n):
                    arr = np.stack([_smooth_traj(rng, shape) for _ in range(n)])
                    return arr[..., 0] if ch == 1 else arr

                write_single(train_path, block(n_train))
                write_single(os.path.join(root, spec.test_path), block(n_test))
        print(f"corpus ready: {name} ({n_train} train / {n_test} test)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dpot_mixture")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "MIXTURE_EPOCH_r05.json"))
    ap.add_argument("--smoke", action="store_true",
                    help="tiny trunk on CPU (pipeline check, no TPU)")
    args = ap.parse_args()
    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.environ["DPOT_DATA_ROOT"] = args.root
    build_corpora(args.root)

    names = [m[0] for m in MIXTURE]
    ntrain = [str(m[1]) for m in MIXTURE]
    ntest = [str(m[2]) for m in MIXTURE]
    log_dir = os.path.join(args.root, "logs")
    viz_dir = os.path.join(args.root, "viz")
    # derived outputs only — wipe so the harvest below never mixes a
    # stale/killed run's logs into the artifact
    import shutil

    for d in (log_dir, viz_dir):
        shutil.rmtree(d, ignore_errors=True)

    from dpot_tpu.cli import train as cli_train

    argv = [
        "--model", "DPOT",
        "--train_paths", *names,
        "--test_paths", *names,
        "--ntrain_list", *ntrain,
        "--ntest_list", *ntest,
        # reference mixture weighting: upweight the small sets like
        # dpot_evaluate.yaml's data_weights scheme (here: uniform 1 for
        # the big sets, 2 for swe/dr/cond_pda/512 so they appear ~2x)
        "--data_weights", *[
            "2" if n in ("swe_pdb", "dr_pdb", "ns2d_cond_pda",
                         "ns2d_pdb_M1_eta1e-8_zeta1e-8_rand_512") else "1"
            for n in names
        ],
        "--epochs", str(args.epochs),
        "--batch_size", str(args.batch_size),
        "--res", "128", "--T_in", "10", "--T_ar", "1",
        # DPOT-M trunk (models/registry.py MODEL_PRESETS['M']: embed 1024,
        # depth 12, mlp_ratio 4, n_blocks 8 -> 122M; the CLI spells it out)
        "--width", "64" if args.smoke else "1024",
        "--n_layers", "2" if args.smoke else "12",
        "--n_blocks", "4" if args.smoke else "8",
        "--modes", "8" if args.smoke else "32",
        "--mlp_ratio", "1" if args.smoke else "4",
        "--patch_size", "8",
        "--dtype", "bfloat16", "--opt", "lamb", "--lr", "1e-3",
        "--noise_scale", "5e-4",
        "--num_workers", "1",
        "--log_path", log_dir,
        "--viz_dir", viz_dir,
        "--use_writer", "1",
    ]
    t0 = time.time()
    cli_train.main(argv)
    wall = time.time() - t0

    # harvest the epoch log into the checked-in artifact
    epochs = []
    log_file = None
    for dirpath, _, files in os.walk(log_dir):
        for fn in files:
            if fn.endswith(".jsonl") or fn == "logs.txt":
                log_file = os.path.join(dirpath, fn)
    pat = re.compile(
        r"epoch (\d+), time ([\d.]+).*train l2 step ([\d.eE+-]+).*"
        r"time train avg ([\d.]+) load avg ([\d.]+) test ([\d.]+)"
    )
    full_pat = re.compile(r"test l2 full ([\d.eE+-]+(?:, [\d.eE+-]+)*)")
    last_test_full = None
    for dirpath, _, files in os.walk(log_dir):
        for fn in files:
            if fn != "logs.txt":
                continue
            for line in open(os.path.join(dirpath, fn)):
                m = pat.search(line)
                if m:
                    epochs.append({
                        "epoch": int(m.group(1)),
                        "time_s": float(m.group(2)),
                        "train_l2_step": float(m.group(3)),
                        "train_avg_s": float(m.group(4)),
                        "load_avg_s": float(m.group(5)),
                        "test_s": float(m.group(6)),
                    })
                    fm = full_pat.search(line)
                    if fm:
                        last_test_full = [
                            float(v) for v in fm.group(1).split(", ")
                        ]
    n_samples = sum(int(x) * (2 if n in (
        "swe_pdb", "dr_pdb", "ns2d_cond_pda",
        "ns2d_pdb_M1_eta1e-8_zeta1e-8_rand_512") else 1)
        for n, x in zip(names, [int(v) for v in ntrain]))
    viz_files = []
    for dirpath, _, files in os.walk(viz_dir):
        viz_files += [os.path.join(os.path.relpath(dirpath, viz_dir), f)
                      for f in files]
    out = {
        "mixture": [
            {"name": n, "ntrain": int(a), "ntest": int(b)}
            for (n, a, b) in MIXTURE
        ],
        "epoch_samples_weighted": n_samples,
        "batch_size": args.batch_size,
        "epochs": epochs,
        "final_test_l2_full": (
            dict(zip(names, last_test_full)) if last_test_full else None
        ),
        "wall_s": round(wall, 1),
        "viz_files": sorted(viz_files)[:20],
        "n_viz_files": len(viz_files),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    for e in epochs:
        print(e)


if __name__ == "__main__":
    main()
