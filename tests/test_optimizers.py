"""Optimizer update-rule tests against independent torch computations of the
reference rules (utils/optimizer.py: adam :9-52, lamb :380-499) including
complex parameters."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from dpot_tpu.train.optimizers import (
    adam,
    adamw,
    build_optimizer,
    clip_by_global_norm,
    lamb,
)


def run_jax_opt(tx, p0, grads_seq):
    params = {"p": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"p": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return np.asarray(params["p"])


def torch_adam_ref(p0, grads_seq, lr, b1, b2, eps, wd):
    p = torch.from_numpy(p0.copy())
    m = torch.zeros_like(p)
    v = torch.zeros_like(p, dtype=torch.float32 if not p.is_complex() else torch.complex64)
    step = 0
    for g in grads_seq:
        g = torch.from_numpy(g)
        step += 1
        bc1 = 1 - b1**step
        bc2 = 1 - b2**step
        if wd:
            g = g + wd * p
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g.conj())
        denom = (v.real.sqrt() / np.sqrt(bc2)) + eps
        p = p - (lr / bc1) * m / denom
    return p.numpy()


def test_adam_matches_reference_rule_real():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    gs = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]
    got = run_jax_opt(adam(1e-2, 0.9, 0.999, 1e-8, 1e-6), p0, gs)
    want = torch_adam_ref(p0, gs, 1e-2, 0.9, 0.999, 1e-8, 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_adam_complex_params():
    rng = np.random.default_rng(1)
    p0 = (rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))).astype(
        np.complex64
    )
    gs = [
        (rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))).astype(
            np.complex64
        )
        for _ in range(4)
    ]
    got = run_jax_opt(adam(1e-2, 0.9, 0.999, 1e-8, 0.0), p0, gs)
    want = torch_adam_ref(p0, gs, 1e-2, 0.9, 0.999, 1e-8, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lamb_adam_mode_no_debias():
    """Lamb(adam=True, debias=False) — the exercised configuration
    (train_temporal.py:133)."""
    rng = np.random.default_rng(2)
    p0 = rng.standard_normal((5,)).astype(np.float32)
    gs = [rng.standard_normal((5,)).astype(np.float32) for _ in range(3)]
    got = run_jax_opt(lamb(1e-3, 0.9, 0.999, 1e-6, 1e-4), p0, gs)

    # independent reference of the rule
    p = p0.copy()
    m = np.zeros_like(p0)
    v = np.zeros_like(p0)
    for g in gs:
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        step = m / (np.sqrt(v) + 1e-6) + 1e-4 * p
        p = p - 1e-3 * step
    np.testing.assert_allclose(got, p, rtol=1e-5, atol=1e-6)


def test_global_norm_clip_matches_torch():
    rng = np.random.default_rng(3)
    gs = {
        "a": rng.standard_normal((4, 4)).astype(np.float32),
        "b": rng.standard_normal((7,)).astype(np.float32) * 10,
    }
    tx = clip_by_global_norm(1.0)
    state = tx.init(gs)
    clipped, _ = tx.update({k: jnp.asarray(v) for k, v in gs.items()}, state)

    ts = [torch.from_numpy(v.copy()).requires_grad_(True) for v in gs.values()]
    for t, v in zip(ts, gs.values()):
        t.grad = torch.from_numpy(v.copy())
    torch.nn.utils.clip_grad_norm_(ts, 1.0)
    np.testing.assert_allclose(
        np.asarray(clipped["a"]), ts[0].grad.numpy(), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(clipped["b"]), ts[1].grad.numpy(), rtol=1e-4
    )


def test_build_optimizer_dispatch():
    for name in ["adam", "adamw", "lamb"]:
        tx = build_optimizer(name, 1e-3, grad_clip=1.0)
        p = {"w": jnp.ones((2, 2))}
        s = tx.init(p)
        u, _ = tx.update({"w": jnp.ones((2, 2))}, s, p)
        assert jnp.isfinite(u["w"]).all()


def test_bf16_moments_track_f32():
    """moment_dtype=bf16: moments STORE in bf16 (complex leaves keep c64),
    updates stay param-dtype, and a short trajectory tracks the f32-moment
    optimizer closely (accumulation happens in f32; only storage narrows)."""
    import jax
    import jax.numpy as jnp
    from dpot_tpu.train.optimizers import build_optimizer

    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((16, 16)), jnp.float32),
        "c": jnp.asarray(
            rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4)),
            jnp.complex64,
        ),
    }

    def run(moment_dtype):
        tx = build_optimizer(
            "lamb", 1e-2, grad_clip=1.0, moment_dtype=moment_dtype
        )
        p = params
        st = tx.init(p)
        for i in range(5):
            g = jax.tree.map(
                lambda x: (0.1 * (i + 1) * x).astype(x.dtype), p
            )
            upd, st = tx.update(g, st, p)
            p = jax.tree.map(jnp.add, p, upd)
        return p, st

    p32, _ = run(None)
    pbf, st = run(jnp.bfloat16)
    assert st.mu["w"].dtype == jnp.bfloat16
    assert st.mu["c"].dtype == jnp.complex64  # no complex-bf16
    # the SECOND moment must stay f32: b2=0.999 decays 0.1%/step, below
    # bf16's ~0.4% ULP near 1 — a bf16 nu would absorb the decay and
    # freeze (optimizers._moment_init)
    assert st.nu["w"].dtype == jnp.float32
    assert st.nu["c"].dtype == jnp.float32
    assert pbf["w"].dtype == jnp.float32  # updates stay param dtype
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p32[k]), np.asarray(pbf[k]), rtol=2e-2, atol=2e-3
        )
    # and every optimizer accepts the knob
    for name in ("adam", "adamw"):
        tx = build_optimizer(name, 1e-3, moment_dtype=jnp.bfloat16)
        st = tx.init(params)
        upd, _ = tx.update(params, st, params)
        assert jax.tree.leaves(upd)[0].dtype in (jnp.float32, jnp.complex64)


def test_bf16_moments_decay_constants_stay_f32():
    """Weak-type promotion regression: the decay multiply must promote a
    bf16 STORED moment to f32 (optimizers._acc), not cast the Python
    decay constant down to bf16 — bf16(0.999) rounds to exactly 1.0, so
    the un-promoted form turns the EMA into a non-decaying sum. Pinned
    both at the expression level and through a real update: with bf16
    moments and zero gradients, nu (kept f32) must decay by exactly b2."""
    import jax.numpy as jnp
    from dpot_tpu.train.optimizers import _acc, adam

    m = jnp.ones((), jnp.bfloat16)
    assert (0.999 * m).dtype == jnp.bfloat16  # the trap this guards
    assert float(0.999 * m) == 1.0
    prod = 0.999 * _acc(m)
    assert prod.dtype == jnp.float32
    np.testing.assert_allclose(float(prod), 0.999, rtol=1e-6)

    params = {"w": jnp.ones((4,), jnp.float32)}
    tx = adam(1e-3, b1=0.9, b2=0.999, weight_decay=0.0,
              moment_dtype=jnp.bfloat16)
    st = tx.init(params)
    st = st._replace(nu={"w": jnp.ones((4,), jnp.float32)})
    zero_g = {"w": jnp.zeros((4,), jnp.float32)}
    _, st2 = tx.update(zero_g, st, params)
    np.testing.assert_allclose(
        np.asarray(st2.nu["w"], np.float32), 0.999, rtol=1e-6
    )
