"""Real-TPU training epochs fed from an ON-DISK HDF5 corpus — the proof
that the input pipeline sustains the chip's consumption rate (SURVEY §7
hard part (d); VERDICT r2 item 1).

Generates (once) a scatter corpus at the pretraining item shape
(128^2 x 21 x 4 f32, one trajectory per file — time-major layout by
default), then runs `dpot_tpu.cli.train` on it. The epoch log's
`time load avg` vs `time train avg` is the verdict: load << train means
the loader+prefetch feeds the chip without stalling it.

Usage (real TPU):
    python tools/epoch_from_disk.py [--preset M] [--n 512] [--epochs 3]
                                    [--std-layout]
Reference analogue: utils/griddataset.py:88-117 reads feeding
train_temporal.py:108-109's DataLoader(num_workers=8).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {  # per models/registry.py MODEL_PRESETS
    "Ti": dict(width=512, n_layers=4, n_blocks=4, mlp_ratio=1),
    "S": dict(width=1024, n_layers=6, n_blocks=8, mlp_ratio=1),
    "M": dict(width=1024, n_layers=12, n_blocks=8, mlp_ratio=4),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="M", choices=sorted(PRESETS))
    ap.add_argument("--n", type=int, default=512, help="corpus trajectories")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--std-layout", action="store_true",
                    help="use the standard (X,Y,T,C) layout instead of "
                         "time-major")
    args = ap.parse_args()

    from dpot_tpu.data.generation import generate_synthetic_corpus
    from dpot_tpu.data.registry import DatasetSpec, register_dataset

    tm = not args.std_layout
    name = f"epoch_corpus_{'tm' if tm else 'std'}"
    root = os.path.join("/tmp", "dpot_epoch_corpus")
    marker = os.path.join(root, name, "train", f"data_{args.n - 1}.hdf5")
    if not os.path.exists(marker):
        print(f"generating {args.n}-trajectory corpus at {root}/{name} ...",
              flush=True)
        generate_synthetic_corpus(
            root, name=name, n_train=args.n, n_test=8,
            in_size=(128, 128), t_total=21, n_channels=4, time_major=tm,
        )
    else:  # files cached from a previous run: just register the spec
        register_dataset(DatasetSpec(
            name=name, train_path=f"{name}/train", test_path=f"{name}/test",
            train_size=args.n, test_size=8, scatter_storage=True,
            t_test=10, t_in=10, t_total=21, in_size=(128, 128),
            n_channels=4, downsample=(1, 1),
        ))
    os.environ["DPOT_DATA_ROOT"] = root

    p = PRESETS[args.preset]
    from dpot_tpu.cli.train import main as train_main

    train_main([
        "--model", "DPOT",
        "--width", str(p["width"]), "--n_layers", str(p["n_layers"]),
        "--n_blocks", str(p["n_blocks"]), "--mlp_ratio", str(p["mlp_ratio"]),
        "--modes", "32", "--patch_size", "8",
        "--train_paths", name, "--test_paths", name,
        "--res", "128", "--T_in", "10", "--T_ar", "1", "--T_bundle", "1",
        "--n_channels", "4", "--batch_size", str(args.batch),
        "--epochs", str(args.epochs), "--dtype", "bfloat16",
        "--noise_scale", "0.0005",
        "--log_path", "/tmp/epoch_from_disk_log", "--comment", "_ingest",
        "--save_every", "1000000",
    ])


if __name__ == "__main__":
    main()
