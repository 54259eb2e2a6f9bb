"""Direct coverage for the two modules everything else only exercises
indirectly: the torch-matching weight initializers (distribution tests vs
actual torch inits) and the metrics writer (scalar names + JSONL format the
reference's TensorBoard workflow is replaced by)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from dpot_tpu.ops.initializers import (
    gamma_geometric,
    scaled_normal,
    scaled_uniform,
    torch_bias,
    torch_linear_weight,
    trunc_normal,
)


def _moments(a):
    a = np.asarray(a, np.float64).ravel()
    return a.mean(), a.std(), a.min(), a.max()


def test_torch_linear_weight_matches_torch_default():
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == torch kaiming_uniform(a=sqrt5)
    Linear default: compare moments + support against an actual torch
    Linear init."""
    import torch

    torch.manual_seed(0)
    lin = torch.nn.Linear(256, 128)
    t_m, t_s, t_lo, t_hi = _moments(lin.weight.detach().numpy())

    w = torch_linear_weight()(jax.random.key(0), (256, 128))
    j_m, j_s, j_lo, j_hi = _moments(w)
    bound = 1.0 / np.sqrt(256)
    assert -bound <= j_lo and j_hi <= bound
    assert abs(j_m - t_m) < 0.002
    assert abs(j_s - t_s) < 0.002

    # conv layout: fan_in = kh*kw*in
    conv = torch.nn.Conv2d(16, 32, 3)
    t_m, t_s, t_lo, t_hi = _moments(conv.weight.detach().numpy())
    k = torch_linear_weight()(jax.random.key(1), (3, 3, 16, 32))
    j_m, j_s, j_lo, j_hi = _moments(k)
    b = 1.0 / np.sqrt(3 * 3 * 16)
    assert -b <= j_lo and j_hi <= b
    assert abs(j_s - t_s) < 0.002

    # bias: same bound
    bias = torch_bias(256)(jax.random.key(2), (128,))
    assert np.abs(np.asarray(bias)).max() <= 1.0 / np.sqrt(256)


def test_afno_and_misc_initializers():
    s = scaled_uniform(0.01)(jax.random.key(0), (2, 4, 64, 64))
    a = np.asarray(s)
    assert a.min() >= 0.0 and a.max() <= 0.01  # scale * U[0,1)

    n = np.asarray(scaled_normal(0.5)(jax.random.key(1), (4096,)))
    assert abs(n.std() - 0.5) < 0.02

    t = np.asarray(trunc_normal(0.02)(jax.random.key(2), (4096,)))
    assert np.abs(t).max() <= 0.04 + 1e-6  # clipped at 2 std
    assert abs(t.std() - 0.02) < 0.004

    g = np.asarray(gamma_geometric()(jax.random.key(3), (1, 8)))
    np.testing.assert_allclose(g[0], 2.0 ** np.linspace(-10, 10, 8), rtol=1e-6)


def test_metric_writer_jsonl_and_scalar_names(tmp_path):
    """MetricWriter must persist the reference's scalar names
    (train_loss_step/full, train_temporal.py:161-168) as JSONL + text log."""
    from dpot_tpu.utils.metrics_logging import MetricWriter

    d = str(tmp_path / "run")
    w = MetricWriter(d)
    w.scalar("train_loss_step", 0.5, 1)
    w.scalar("train_loss_full", 0.25, 1)
    w.text("epoch 0 done")
    w.close()

    jsonl = os.path.join(d, "metrics.jsonl")
    assert os.path.exists(jsonl)
    rows = [json.loads(l) for l in open(jsonl)]
    tags = {r["tag"]: r["value"] for r in rows if "tag" in r}
    assert tags.get("train_loss_step") == 0.5
    assert tags.get("train_loss_full") == 0.25
    log = open(os.path.join(d, "logs.txt")).read()
    assert "epoch 0 done" in log
