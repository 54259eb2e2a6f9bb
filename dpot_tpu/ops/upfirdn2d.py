"""upfirdn2d — upsample, FIR filter, downsample in one fused op.

TPU-native equivalent of the reference CUDA plugin
(torch_utils/ops/upfirdn2d.{cu,py}): the zero-insert -> pad/crop -> FIR ->
stride pipeline (_upfirdn2d_ref, upfirdn2d.py:167-215) lowers to ONE
`lax.conv_general_dilated` call — lhs_dilation does the upsample,
window_strides the downsample, and the depthwise FIR rides the MXU/VPU via
XLA's native conv path, so no hand-written kernel is needed on TPU (the
"measure first" branch of SURVEY.md §2.4).

Layout is channels-last (B, H, W, C). Helper wrappers (setup_filter,
filter2d, upsample2d, downsample2d) mirror upfirdn2d.py:70-389 including
their implicit padding math and gain conventions.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Filt = Union[None, Sequence[float], np.ndarray, jax.Array]


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    return [int(p) for p in padding]


def setup_filter(
    f: Filt,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> jax.Array:
    """Port of setup_filter (upfirdn2d.py:70-115)."""
    if f is None:
        f = 1
    f = jnp.asarray(f, jnp.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[None]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def _get_filter_size(f):
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[-1]), int(f.shape[0])  # (fw, fh)


def upfirdn2d(
    x: jax.Array,
    f: Optional[jax.Array],
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """x: (B, H, W, C); f: (fh, fw) or (taps,) separable or None."""
    B, H, W, C = x.shape
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f = jnp.asarray(f, jnp.float32)

    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    # XLA lhs_dilation inserts zeros BETWEEN samples ((H-1)*up+1 elements);
    # the reference zero-insert appends after each sample (H*up elements).
    # The (up-1) missing trailing zeros fold into the after-padding.
    pady1_d = pady1 + (upy - 1)
    padx1_d = padx1 + (upx - 1)

    def dw_conv(z, kern, pads, strides, dil):
        k = jnp.broadcast_to(
            kern[..., None, None], (*kern.shape[:2], 1, C)
        ).astype(z.dtype)
        return jax.lax.conv_general_dilated(
            z, k,
            window_strides=strides,
            padding=pads,
            lhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    if f.ndim == 2:
        return dw_conv(
            x, f, [(pady0, pady1_d), (padx0, padx1_d)], (downy, downx),
            (upy, upx),
        )
    # separable: two passes, vertical then horizontal (matching ref order)
    z = dw_conv(
        x, f[:, None], [(pady0, pady1_d), (0, 0)], (downy, 1), (upy, 1)
    )
    return dw_conv(
        z, f[None, :], [(0, 0), (padx0, padx1_d)], (1, downx), (1, upx)
    )


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """Same-resolution filtering (upfirdn2d.py:277-310)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """Upsample with FIR (upfirdn2d.py:313-349)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(
        x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy
    )


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """Downsample with FIR (upfirdn2d.py:352-389)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


def filtered_lrelu(
    x: jax.Array,
    fu: Optional[jax.Array] = None,
    fd: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = float(np.sqrt(2)),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
) -> jax.Array:
    """Fused upsample -> bias -> leaky-relu -> clamp -> downsample.

    Port of the reference composition path (torch_utils/ops/
    filtered_lrelu.py:121-156 _filtered_lrelu_ref): upfirdn2d(up, with
    the RAW user padding — no filter-centering offsets, unlike
    upsample2d) -> bias_act(lrelu, gain, clamp) -> upfirdn2d(down, NO
    padding). The caller supplies whatever padding centers its filters
    (the reference's SynthesisLayer computes it explicitly). XLA fuses
    the elementwise middle into the convs; the CUDA sign-buffer trick is
    unnecessary because JAX recomputes/saves activations as the AD
    schedule decides. Golden vs an independent torch implementation of
    _filtered_lrelu_ref in tests/test_native_ops.py."""
    from dpot_tpu.ops.bias_act import bias_act

    px0, px1, py0, py1 = _parse_padding(padding)
    if b is not None:
        x = x + b.reshape(1, 1, 1, -1)
    x = upfirdn2d(
        x, fu, up=up, padding=[px0, px1, py0, py1], gain=up**2,
        flip_filter=flip_filter,
    )
    x = bias_act(x, None, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
