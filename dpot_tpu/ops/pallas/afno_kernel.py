"""Pallas fused AFNO mode-MLP kernel.

The AFNO spectral mixer's core compute (reference models/dpot.py:72-94) is,
in this framework's real-form lowering, two batched matmuls per block with
a GELU between (dpot_tpu/ops/spectral.py afno_mode_mlp). XLA already runs
those on the MXU but materializes the hidden activations to HBM between
layers; this kernel fuses both layers + bias + GELU in one pass, holding
the per-block weights (2bs x 2bsf, exact MXU tiles at bs=128) and the
hidden layer entirely in VMEM.

Forward-only kernel wrapped in custom_vjp; the backward recomputes through
the composed XLA path (matmul-dominated, negligible overhead vs
hand-written bwd kernels at these sizes).

Select with DPOT_AFNO_IMPL=pallas. Measured on TPU v5e at the DPOT-M
operating point (nb=8, N=1152, 2bs=256): fused kernel 530us vs XLA 487us
forward — XLA's batched-matmul path already keeps this op MXU-bound, so
the default stays 'xla' and the kernel remains an opt-in (the mode MLP is
<1% of step FLOPs at DPOT-M; the win case is very large `modes` at small
embed, where the hidden-layer HBM round-trip matters).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return os.environ.get("DPOT_PALLAS_INTERPRET", "0") == "1"


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (abs err < 1.5e-7) — Pallas
    TPU has no erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax
    )
    return s * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]  # (TN, 2bs)
    h = (
        jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    h = _gelu_exact(h)
    o = (
        jnp.dot(h, w2_ref[0], preferred_element_type=jnp.float32)
        + b2_ref[0]
    )
    o_ref[0] = o.astype(o_ref.dtype)


def afno_mlp_fused(
    z: jax.Array,   # (nb, N, 2bs)
    W1: jax.Array,  # (nb, 2bs, 2bsf)
    B1: jax.Array,  # (nb, 2bsf)
    W2: jax.Array,  # (nb, 2bsf, 2bs)
    B2: jax.Array,  # (nb, 2bs)
    row_tile: int = 512,
) -> jax.Array:
    nb, N, d_in = z.shape
    d_hid = W1.shape[-1]
    tile = min(row_tile, N)
    grid = (nb, pl.cdiv(N, tile))

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((nb, N, d_in), z.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d_in), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_in, d_hid), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_hid), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_hid, d_in), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_in), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d_in), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(z, W1, B1[:, None, :], W2, B2[:, None, :])


def _xla_forward(z, W1, B1, W2, B2):
    h = jax.nn.gelu(
        jnp.einsum("bni,bio->bno", z, W1, preferred_element_type=z.dtype)
        + B1[:, None, :],
        approximate=False,
    )
    return (
        jnp.einsum("bni,bio->bno", h, W2, preferred_element_type=z.dtype)
        + B2[:, None, :]
    )


@jax.custom_vjp
def afno_mlp(z, W1, B1, W2, B2):
    return afno_mlp_fused(z, W1, B1, W2, B2)


def _fwd(z, W1, B1, W2, B2):
    return afno_mlp_fused(z, W1, B1, W2, B2), (z, W1, B1, W2, B2)


def _bwd(res, g):
    z, W1, B1, W2, B2 = res
    _, vjp = jax.vjp(_xla_forward, z, W1, B1, W2, B2)
    return vjp(g)


afno_mlp.defvjp(_fwd, _bwd)


def _block_kernel_ok(nb: int, d_in: int, d_hid: int) -> bool:
    """Tile cleanly on the MXU/VPU: lane dim multiple of 128."""
    return d_in % 128 == 0 and d_hid % 128 == 0
