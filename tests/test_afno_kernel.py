"""Fused AFNO Pallas kernel: parity vs the XLA-composed path (interpreter
mode on CPU) for values AND gradients."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setenv("DPOT_PALLAS_INTERPRET", "1")


def make_inputs(nb=4, N=64, bs=64):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((nb, N, 2 * bs)), jnp.float32)
    W1 = jnp.asarray(rng.standard_normal((nb, 2 * bs, 2 * bs)) * 0.05, jnp.float32)
    B1 = jnp.asarray(rng.standard_normal((nb, 2 * bs)) * 0.05, jnp.float32)
    W2 = jnp.asarray(rng.standard_normal((nb, 2 * bs, 2 * bs)) * 0.05, jnp.float32)
    B2 = jnp.asarray(rng.standard_normal((nb, 2 * bs)) * 0.05, jnp.float32)
    return z, W1, B1, W2, B2


def test_fused_kernel_matches_xla(interpret_mode):
    from dpot_tpu.ops.pallas.afno_kernel import _xla_forward, afno_mlp

    args = make_inputs()
    got = afno_mlp(*args)
    want = _xla_forward(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)


def test_fused_kernel_gradients(interpret_mode):
    from dpot_tpu.ops.pallas.afno_kernel import _xla_forward, afno_mlp

    args = make_inputs(nb=2, N=16, bs=64)

    def loss_k(*a):
        return jnp.sum(jnp.square(afno_mlp(*a)))

    def loss_x(*a):
        return jnp.sum(jnp.square(_xla_forward(*a)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(*args)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_afno_filter_pallas_impl_matches_xla(interpret_mode, monkeypatch):
    from dpot_tpu.ops.activations import get_activation
    from dpot_tpu.ops.spectral import afno_filter_2d

    rng = np.random.default_rng(1)
    B, H, W, C, nb = 2, 16, 16, 256, 2  # bs=128 -> lane-aligned
    bs = C // nb
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    args = [
        jnp.asarray(rng.random(s) * 0.01, jnp.float32)
        for s in [(2, nb, bs, bs), (2, nb, bs), (2, nb, bs, bs), (2, nb, bs)]
    ]
    monkeypatch.setenv("DPOT_AFNO_IMPL", "xla")
    y_xla = afno_filter_2d(x, *args, 8, get_activation("gelu"))
    monkeypatch.setenv("DPOT_AFNO_IMPL", "pallas")
    y_pal = afno_filter_2d(x, *args, 8, get_activation("gelu"))
    np.testing.assert_allclose(
        np.asarray(y_xla), np.asarray(y_pal), atol=1e-4, rtol=1e-4
    )


def test_pallas_impl_refused_for_unaligned_or_nongelu(monkeypatch):
    from dpot_tpu.ops.activations import get_activation
    from dpot_tpu.ops.spectral import _use_pallas_mlp

    monkeypatch.setenv("DPOT_AFNO_IMPL", "pallas")
    gelu = get_activation("gelu")
    assert _use_pallas_mlp((2, 4, 64, 64), gelu)
    assert not _use_pallas_mlp((2, 4, 48, 48), gelu)  # unaligned
    assert not _use_pallas_mlp((2, 4, 64, 64), get_activation("tanh"))
    monkeypatch.setenv("DPOT_AFNO_IMPL", "xla")
    assert not _use_pallas_mlp((2, 4, 64, 64), gelu)
