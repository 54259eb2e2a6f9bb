"""Fused GroupNorm+AFNO Pallas kernel (ops/pallas/afno_fused.py): parity vs
the XLA-composed production path (interpreter mode on CPU), gradient flow,
and the Block-level integration switch.

Measured role (TPU v5e, DPOT-M B=8): op-level fwd 0.081 ms vs XLA 0.0875 ms
per block; full train step 51.7 vs 51.5 steps/s — parity, so the XLA path
stays the default and the kernel is opt-in via DPOT_AFNO_IMPL=fused.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setenv("DPOT_PALLAS_INTERPRET", "1")


def make_case(B=4, H=8, W=8, C=256, nb=2, modes=8, seed=0):
    from dpot_tpu.ops.spectral import (
        _combined_spectral_ops,
        _complex_as_real_weight,
    )

    bs = C // nb
    kh, kw = min(modes, H), min(modes, W // 2 + 1)
    K = kh * kw
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, H * W, C)), jnp.float32)
    gs = jnp.asarray(1.0 + 0.1 * rng.standard_normal((1, C)), jnp.float32)
    gb = jnp.asarray(0.1 * rng.standard_normal((1, C)), jnp.float32)
    A_np, Ai_np = _combined_spectral_ops(H, W, kh, kw)
    w1 = jnp.asarray(rng.standard_normal((2, nb, bs, bs)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((2, nb, bs)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((2, nb, bs, bs)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((2, nb, bs)) * 0.02, jnp.float32)
    kernel_args = (
        x, gs, gb,
        jnp.asarray(A_np, jnp.float32),
        jnp.asarray(Ai_np, jnp.float32),
        _complex_as_real_weight(w1[0], w1[1]),
        jnp.concatenate([b1[0], b1[1]], -1)[:, None, :],
        _complex_as_real_weight(w2[0], w2[1]),
        jnp.concatenate([b2[0], b2[1]], -1)[:, None, :],
        K,
    )
    raw = (w1, b1, w2, b2, modes)
    return kernel_args, raw, (B, H, W, C)


def test_fused_matches_production_gn_afno(interpret_mode):
    """Kernel output == GroupNorm + afno_filter_2d composed (the ops the
    kernel replaces in Block, models/dpot.py)."""
    from dpot_tpu.ops.activations import get_activation
    from dpot_tpu.ops.norms import group_norm
    from dpot_tpu.ops.pallas.afno_fused import fused_gn_afno
    from dpot_tpu.ops.spectral import afno_filter_2d

    kernel_args, (w1, b1, w2, b2, modes), (B, H, W, C) = make_case()
    got = np.asarray(fused_gn_afno(*kernel_args))

    x4 = kernel_args[0].reshape(B, H, W, C)
    xn = group_norm(x4, kernel_args[1][0], kernel_args[2][0], 8)
    want = afno_filter_2d(
        xn, w1, b1, w2, b2, modes, get_activation("gelu")
    ).reshape(B, H * W, C)
    # interpret mode runs f32 end-to-end; the only deviation is tanh- vs
    # erf-gelu inside the tiny mode MLP
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-4, rtol=2e-3)


def test_fused_gradients_match_xla_reference(interpret_mode):
    from dpot_tpu.ops.pallas.afno_fused import _xla_reference, fused_gn_afno

    kernel_args, _, _ = make_case(B=2, H=4, W=4, C=128, nb=2, modes=4, seed=1)
    x0, gs0, gb, A, Ai, W1_0, B1, W2, B2, K = kernel_args

    def loss_k(x, W1, gs):
        return jnp.sum(
            jnp.square(fused_gn_afno(x, gs, gb, A, Ai, W1, B1, W2, B2, K))
        )

    def loss_x(x, W1, gs):
        return jnp.sum(
            jnp.square(_xla_reference(x, gs, gb, A, Ai, W1, B1, W2, B2, K))
        )

    x, gs, W1 = x0, gs0, W1_0
    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, W1, gs)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, W1, gs)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )


def test_block_fused_switch_shapes():
    """Block._use_fused_afno: opt-in env, bf16-only, qualifying shapes."""
    from dpot_tpu.models.dpot import Block

    x_ok = jnp.zeros((4, 16, 16, 256), jnp.bfloat16)
    blk16 = Block(width=256, num_blocks=2, modes=8, dtype=jnp.bfloat16)
    blk32 = Block(width=256, num_blocks=2, modes=8, dtype=jnp.float32)

    os.environ.pop("DPOT_AFNO_IMPL", None)
    assert not blk16._use_fused_afno(x_ok)  # default: xla
    os.environ["DPOT_AFNO_IMPL"] = "fused"
    try:
        assert blk16._use_fused_afno(x_ok)
        assert not blk32._use_fused_afno(x_ok)  # f32 keeps the golden path
        # odd batch -> fallback
        assert not blk16._use_fused_afno(jnp.zeros((3, 16, 16, 256), jnp.bfloat16))
        # unaligned block channels (2bs % 128 != 0) -> fallback
        blk_bad = Block(width=192, num_blocks=2, modes=8, dtype=jnp.bfloat16)
        assert not blk_bad._use_fused_afno(jnp.zeros((4, 16, 16, 192), jnp.bfloat16))
    finally:
        os.environ.pop("DPOT_AFNO_IMPL", None)
