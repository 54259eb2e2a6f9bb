"""Pallas fused bias+activation+gain+clamp kernel (VPU elementwise).

TPU-native counterpart of the reference's bias_act CUDA kernel
(torch_utils/ops/bias_act.cu: choose_bias_act_kernel :24,152-167). One pass
over the tensor in VMEM tiles: add per-channel bias, apply activation,
scale, clamp. Gradients via custom_jvp whose tangent rule composes through
the reference path: reverse mode falls out of linearize+transpose, and the
rule is differentiable to ANY order — matching the 1st/2nd-order gradient
capability the reference hand-writes in CUDA (bias_act.py:72-229,
bias_act.cu:152-167) without hand-written kernels for the derivatives.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dpot_tpu.ops.bias_act import _resolve, bias_act_ref

_ROW_TILE = 256


def _interpret() -> bool:
    """Interpreter mode for CPU testing of TPU kernels."""
    return os.environ.get("DPOT_PALLAS_INTERPRET", "0") == "1"


def _kernel(x_ref, b_ref, o_ref, *, act, alpha, gain, clamp):
    from dpot_tpu.ops.bias_act import activation_funcs

    x = x_ref[:] + b_ref[:]
    x = activation_funcs[act].func(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    o_ref[:] = x


@partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5))
def bias_act_pallas(
    x: jax.Array,
    b: Optional[jax.Array],
    act: str = "linear",
    alpha=None,
    gain=None,
    clamp=None,
) -> jax.Array:
    """Channels-last fused kernel: x (..., C), b (C,) or None."""
    _, alpha_v, gain_v, clamp_v = _resolve(act, alpha, gain, clamp)
    C = x.shape[-1]
    # dtype contract matches bias_act_ref (the impl='auto' fallback AND
    # this op's own VJP recompute): promote to result_type(x, b) — a
    # silent bf16 downcast here would make results platform-dependent
    # and the backward differentiate a differently-rounded forward
    out_dtype = (
        jnp.result_type(x.dtype, b.dtype) if b is not None else x.dtype
    )
    bb = b if b is not None else jnp.zeros((C,), x.dtype)
    orig_shape = x.shape
    x2 = x.reshape(-1, C).astype(out_dtype)
    N = x2.shape[0]
    if N == 0:  # empty input: tile would be 0 -> cdiv division by zero
        return x.astype(out_dtype)
    tile = min(_ROW_TILE, N)
    grid = (pl.cdiv(N, tile),)

    out = pl.pallas_call(
        partial(_kernel, act=act, alpha=alpha_v, gain=gain_v, clamp=clamp_v),
        out_shape=jax.ShapeDtypeStruct((N, C), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x2, bb.reshape(1, C).astype(out_dtype))
    return out.reshape(orig_shape)


@bias_act_pallas.defjvp
def _jvp(act, alpha, gain, clamp, primals, tangents):
    """Primal through the fused kernel; tangent through the composed
    reference path (identical math, so the pair is consistent). The rule
    itself is smooth jnp code, so JAX can differentiate it again —
    grad-of-grad and jvp-of-vjp both work (test_native_ops.py)."""
    x, b = primals
    tx, tb = tangents
    y = bias_act_pallas(x, b, act, alpha, gain, clamp)

    def f(*args):
        return bias_act_ref(
            args[0], args[1] if len(args) > 1 else None,
            dim=-1, act=act, alpha=alpha, gain=gain, clamp=clamp,
        )

    if b is None:
        _, ty = jax.jvp(f, (x,), (tx,))
    else:
        _, ty = jax.jvp(f, (x, b), (tx, tb))
    return y, ty.astype(y.dtype)
