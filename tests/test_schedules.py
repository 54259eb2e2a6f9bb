"""LR schedule goldens vs torch's schedulers (the reference steps these
per iteration, train_temporal.py:138-156,230)."""

import numpy as np
import torch
import jax.numpy as jnp

from dpot_tpu.train.schedules import (
    build_schedule,
    cosine_restarts,
    cyclic_triangular2,
    linear_decay,
    onecycle,
    step_decay,
    warmup_inv_sqrt,
)


def torch_lrs(sched_factory, steps):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = sched_factory(opt)
    out = []
    for _ in range(steps):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(out)


def jax_lrs(schedule, steps):
    return np.array([float(schedule(jnp.asarray(i))) for i in range(steps)])


def test_onecycle_matches_torch():
    total, max_lr = 50, 1e-3
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.OneCycleLR(
            o, max_lr=max_lr, div_factor=1e4, final_div_factor=1e4,
            pct_start=0.2, total_steps=total,
        ),
        total,
    )
    got = jax_lrs(onecycle(max_lr, total, warmup_epochs=2, epochs=10), total)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-10)


def test_onecycle_momentum_matches_torch():
    """OneCycleLR's cycle_momentum=True beta1 trajectory — the reference's
    effective beta1 under lr_method='cycle' (torch writes group['betas']
    each step; reference Adam/Lamb read it, utils/optimizer.py:120,287)."""
    from dpot_tpu.train.schedules import onecycle_momentum

    total = 50
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1.0, betas=(0.9, 0.999))
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-3, div_factor=1e4, final_div_factor=1e4,
        pct_start=0.2, total_steps=total,
    )
    want = []
    for _ in range(total):
        want.append(opt.param_groups[0]["betas"][0])
        opt.step()
        sched.step()
    got = jax_lrs(
        onecycle_momentum(total, warmup_epochs=2, epochs=10), total
    )
    np.testing.assert_allclose(got, np.array(want), rtol=2e-6, atol=1e-9)


def test_step_decay_matches_torch():
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=10, gamma=0.5),
        35,
    )
    got = jax_lrs(step_decay(1.0, 10, 0.5), 35)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_warmup_inv_sqrt_matches_lambda():
    warm = 10
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.LambdaLR(
            o, lambda s: min((s + 1) / warm, (warm / (s + 1)) ** 0.5)
        ),
        30,
    )
    got = jax_lrs(warmup_inv_sqrt(1.0, warm), 30)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_linear_matches_lambda():
    total = 20
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.LambdaLR(
            o, lambda s: 1 - s / total
        ),
        total,
    )
    got = jax_lrs(linear_decay(1.0, total), total)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cyclic_triangular2_matches_torch():
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.CyclicLR(
            o, base_lr=1e-5, max_lr=1e-3, step_size_up=8,
            mode="triangular2", cycle_momentum=False,
        ),
        40,
    )
    got = jax_lrs(cyclic_triangular2(1e-5, 1e-3, 8), 40)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_cosine_restarts_matches_torch():
    t0 = 10
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            o, T_0=t0, eta_min=0.0
        ),
        25,
    )
    got = jax_lrs(cosine_restarts(1.0, t0), 25)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_build_schedule_dispatch():
    for m in ["cycle", "step", "warmup", "linear", "restart", "cyclic"]:
        s = build_schedule(m, 1e-3, 10, 10, warmup_epochs=2)
        v = float(s(jnp.asarray(5)))
        assert np.isfinite(v) and v >= 0
