"""Multi-host training: two jax.distributed CPU processes (gloo
collectives), each loading only its half of every global batch, must
reproduce the single-process run exactly.

This is the round-2 wiring of parallel/multihost.py (VERDICT.md missing
#5): cli/train.py calls maybe_initialize(), the DataLoader shards per
host, and train/loop.py assembles global batches with
jax.make_array_from_process_local_data.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import os, sys, json
mode = sys.argv[1]
os.environ["JAX_PLATFORMS"] = "cpu"
ndev = 4 if mode == "single" else 2
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)

if mode != "single":
    from dpot_tpu.parallel.multihost import maybe_initialize
    assert maybe_initialize(), "distributed env not picked up"
    assert jax.process_count() == 2
    assert jax.device_count() == 4

from dpot_tpu.data.registry import make_synthetic_spec
from dpot_tpu.train.loop import train
from dpot_tpu.utils.config import TrainConfig

make_synthetic_spec("mh_corpus", train_size=16, test_size=8, t_total=12,
                    t_test=2, in_size=(32, 32), n_channels=2)
cfg = TrainConfig(
    model="DPOT", width=32, n_layers=1, modes=4, patch_size=4, n_blocks=4,
    train_paths=["mh_corpus"], res=32, T_in=4, T_ar=1, noise_scale=0.0,
    opt="adam", lr=1e-3, lr_method="step", batch_size=8, epochs=2,
    seed=0, num_workers=2, use_writer=False,
    shard_params="fsdp" if mode == "dist_fsdp" else "replicate",
)
log_dir = os.environ.get("MH_LOG_DIR")
if mode == "dist_fsdp":
    cfg.use_writer = True
out = train(cfg, log_dir=(os.path.join(log_dir, f"p{jax.process_index()}")
                          if (log_dir and mode == "dist_fsdp") else None))
result = {
    "train_l2_step": out["train_l2_step"],
    "test_l2_fulls": out["test_l2_fulls"],
}
if mode == "dist_fsdp":
    # the checkpoint written from the cross-process-sharded state must
    # restore to the live values (collective host fetch on save)
    import numpy as np
    from jax.experimental import multihost_utils
    # process 1 must not read before process 0's write lands
    multihost_utils.sync_global_devices("ckpt_written")
    from dpot_tpu.train.checkpoint import restore_checkpoint
    from dpot_tpu.utils.profiling import host_fetch
    ck = os.path.join(log_dir, "p0", "model")
    assert os.path.exists(ck), "process 0 wrote no checkpoint"
    restored = restore_checkpoint(ck, out["state"])
    live = host_fetch(out["state"].params)
    back = jax.device_get(restored.params)
    for a, b in zip(jax.tree.leaves(live), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    result["restored_step"] = int(np.asarray(restored.step))
print("RESULT", json.dumps(result), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(mode: str, extra_env: dict) -> dict:
    import json

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.update(extra_env)
    proc = subprocess.Popen(
        [sys.executable, "-c", DRIVER, mode],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    return proc


def _result(proc) -> dict:
    import json

    out, err = proc.communicate(timeout=900)
    assert proc.returncode == 0, f"stdout={out}\nstderr={err}"
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in: {out}\n{err}")


def test_two_process_training_matches_single_process():
    port = _free_port()
    dist_env = {
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
    }
    p0 = _run("dist", {**dist_env, "JAX_PROCESS_ID": "0"})
    p1 = _run("dist", {**dist_env, "JAX_PROCESS_ID": "1"})
    single = _run("single", {})

    r0 = _result(p0)
    r1 = _result(p1)
    rs = _result(single)

    # both processes observed the same global losses
    np.testing.assert_allclose(r0["train_l2_step"], r1["train_l2_step"],
                               rtol=1e-6)
    np.testing.assert_allclose(r0["test_l2_fulls"], r1["test_l2_fulls"],
                               rtol=1e-6)
    # and they match the single-process run on the same data/seed
    np.testing.assert_allclose(r0["train_l2_step"], rs["train_l2_step"],
                               rtol=1e-4)
    np.testing.assert_allclose(r0["test_l2_fulls"], rs["test_l2_fulls"],
                               rtol=1e-4)


def test_two_process_fsdp_matches_single_and_checkpoints(tmp_path):
    """Multihost FSDP: params+moments sharded ACROSS processes must (a)
    train to the same losses as the single-process replicated run, and
    (b) checkpoint via the collective host fetch (sharded leaves
    all-gather; process 0 writes) and restore to the live values — the
    in-driver restore check plus restored_step pins it."""
    port = _free_port()
    dist_env = {
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "MH_LOG_DIR": str(tmp_path),
    }
    p0 = _run("dist_fsdp", {**dist_env, "JAX_PROCESS_ID": "0"})
    p1 = _run("dist_fsdp", {**dist_env, "JAX_PROCESS_ID": "1"})
    single = _run("single", {})

    r0 = _result(p0)
    r1 = _result(p1)
    rs = _result(single)

    np.testing.assert_allclose(r0["train_l2_step"], r1["train_l2_step"],
                               rtol=1e-6)
    np.testing.assert_allclose(r0["train_l2_step"], rs["train_l2_step"],
                               rtol=1e-4)
    np.testing.assert_allclose(r0["test_l2_fulls"], rs["test_l2_fulls"],
                               rtol=1e-4)
    assert r0["restored_step"] == r1["restored_step"] == 4  # 2 ep x 2 steps


def test_loader_shards_partition_global_batches():
    """Host shards concatenate (in shard order) to the unsharded batches,
    with identical per-item rng streams."""
    from dpot_tpu.data.loader import DataLoader
    from dpot_tpu.data.registry import make_synthetic_spec
    from dpot_tpu.data.grid_dataset import MixedTemporalDataset

    make_synthetic_spec("mh_loader", train_size=12, test_size=4, t_total=12,
                        t_test=2, in_size=(16, 16), n_channels=1)
    ds = MixedTemporalDataset(["mh_loader"], res=16, t_in=4, t_ar=1,
                              train=True)

    full = list(DataLoader(ds, 4, shuffle=True, seed=7, num_workers=2))
    shards = [
        list(DataLoader(ds, 4, shuffle=True, seed=7, num_workers=2,
                        num_shards=2, shard_index=i))
        for i in range(2)
    ]
    assert len(shards[0]) == len(full)
    for bi, batch in enumerate(full):
        for col in range(len(batch)):
            merged = np.concatenate(
                [shards[0][bi][col], shards[1][bi][col]], axis=0
            )
            np.testing.assert_array_equal(merged, batch[col])
