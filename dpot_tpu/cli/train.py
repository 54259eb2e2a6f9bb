"""Pretraining CLI — reference train_temporal.py equivalent.

    python -m dpot_tpu.cli.train --model DPOT --train_paths ns2d_fno_1e-5 \
        --width 512 --n_layers 4 --epochs 500 --use_writer true

Accepts the reference's flag names plus --config_file YAML
(flags override YAML, as the reference's sweep runner does).
"""

import sys


def main(argv=None):
    sys.path.insert(0, ".")
    from dpot_tpu.parallel.multihost import maybe_initialize
    from dpot_tpu.utils.config import load_config
    from dpot_tpu.train.loop import train

    # multi-host launch (the reference's `accelerate launch`,
    # parallel_trainer.py:66): a no-op unless the env declares a
    # coordinator/process topology
    maybe_initialize()
    from dpot_tpu.utils.profiling import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    cfg = load_config(argv)
    print("config", vars(cfg))
    return train(cfg)


if __name__ == "__main__":
    main()
