"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference's CUDA bias_act plugin
(torch_utils/ops/bias_act.py:72-229, .cu/.cpp kernels): same 9-activation
spec table (:40-50) with default alpha/gain, channels-last default dim.

Two implementations:
- 'ref': composed jnp ops (fully differentiable to any order — replaces the
  reference's hand-written 1st/2nd-order CUDA gradients, which JAX derives
  automatically),
- 'pallas': a single fused VPU kernel (dpot_tpu/ops/pallas/bias_act_kernel
  .py) for the inference hot path; wrapped in custom_jvp with the ref
  tangent rule, so it differentiates to any order (matching the
  reference CUDA op's explicit 1st/2nd-order gradient support).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ActSpec:
    func: Callable
    def_alpha: float
    def_gain: float


activation_funcs: dict[str, ActSpec] = {
    "linear": ActSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActSpec(lambda x, alpha: jax.nn.relu(x), 0.0, float(np.sqrt(2))),
    "lrelu": ActSpec(
        lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, float(np.sqrt(2))
    ),
    "tanh": ActSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActSpec(lambda x, alpha: jax.nn.silu(x), 0.0, float(np.sqrt(2))),
}


def _resolve(act: str, alpha, gain, clamp):
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1.0)
    assert clamp >= 0 or clamp == -1.0
    return spec, alpha, gain, clamp


def bias_act_ref(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = -1,
    act: str = "linear",
    alpha=None,
    gain=None,
    clamp=None,
) -> jax.Array:
    """Reference-composition implementation (bias_act.py:110-130)."""
    spec, alpha, gain, clamp = _resolve(act, alpha, gain, clamp)
    if b is not None:
        dimp = dim % x.ndim
        shape = [1] * x.ndim
        shape[dimp] = -1
        x = x + b.reshape(shape)
    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = -1,
    act: str = "linear",
    alpha=None,
    gain=None,
    clamp=None,
    impl: str = "auto",
) -> jax.Array:
    """Fused bias+act+gain+clamp. impl: 'ref' | 'pallas' | 'auto'
    (pallas on TPU when the layout allows, else ref — mirroring the
    reference's impl='cuda' fallback logic, bias_act.py:98-106)."""
    if impl == "auto":
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        impl = "pallas" if platform == "tpu" and dim in (-1, x.ndim - 1) else "ref"
    if impl == "pallas":
        if dim not in (-1, x.ndim - 1):
            # the kernel is channels-last-only; an explicit impl='pallas'
            # with another dim would silently add the bias along the
            # WRONG axis (no exception -> the fallback never fires)
            raise ValueError(
                f"impl='pallas' supports only the last axis, got dim={dim}"
            )
        from dpot_tpu.ops.pallas.bias_act_kernel import bias_act_pallas

        try:
            return bias_act_pallas(x, b, act, alpha, gain, clamp)
        except Exception:
            pass  # fall through to ref on unsupported shapes/platforms
    return bias_act_ref(x, b, dim=dim, act=act, alpha=alpha, gain=gain, clamp=clamp)
