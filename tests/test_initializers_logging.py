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

    # torch.nn.init.trunc_normal_ semantics: a/b are ABSOLUTE cutoffs
    # (+-2 = +-100 sigma at std=0.02 — effectively untruncated, exact std
    # 0.02). The old +-2-SIGMA clipping shrank the std ~12% (0.88*std).
    t = np.asarray(trunc_normal(0.02)(jax.random.key(2), (65536,)))
    assert np.abs(t).max() <= 2.0
    assert np.abs(t).max() > 0.04  # NOT clipped at 2 sigma
    import torch

    ref = torch.empty(65536)
    torch.nn.init.trunc_normal_(ref, std=0.02)
    assert abs(t.std() - ref.numpy().std()) < 5e-4
    assert abs(t.std() - 0.02) < 5e-4

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


def test_unpatch_conv_init_matches_torch_convtranspose():
    """From-scratch UnpatchConv init must use torch ConvTranspose2d's
    fan_in = OUT_channels*k*k (weight.size(1)*k*k — not in_channels like
    Conv2d): with D=256 >> O=8, the old in-channel fan_in drew weights
    ~5.7x too small."""
    import torch

    from dpot_tpu.models.dpot import UnpatchConv

    D, O, p = 256, 8, 4
    m = UnpatchConv(features=O, patch_size=p)
    params = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, D)))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])

    ref = torch.nn.ConvTranspose2d(D, O, p, stride=p)
    bound = 1.0 / np.sqrt(O * p * p)
    # torch kaiming_uniform(a=sqrt(5)) on ConvTranspose2d gives exactly
    # U(-1/sqrt(O*k*k), +1/sqrt(O*k*k)) — check ours against both the
    # analytic bound and the real torch draw
    assert abs(ref.weight.detach().numpy().max() - bound) / bound < 0.05
    assert abs(k.max() - bound) / bound < 0.05
    assert k.min() < -0.9 * bound
    assert abs(b).max() <= bound + 1e-7
    # and NOT the old in-channel fan_in (whose bound is 5.7x smaller)
    assert k.max() > 2.0 / np.sqrt(D * p * p)
