"""Fused GroupNorm + AFNO spectral-mixer Pallas kernel.

Fuses the whole norm1 -> AFNO pipeline of a DPOT block (reference
models/dpot.py:142-149: GroupNorm(8) then AFNO2D with its internal
residual) into ONE VMEM-resident kernel per batch tile:

    xn = GroupNorm8(x)                      # stats + affine, f32
    z  = A @ xn                             # combined DFT analysis matmul
    o  = blockMLP(z)                        # 2-layer complex block MLP
    y  = Ainv @ o                           # combined iDFT synthesis matmul
    out = y + xn                            # AFNO's internal residual

where A/Ainv are the combined real spectral operators from
dpot_tpu/ops/spectral.py (_combined_spectral_ops). The XLA-composed path
materializes xn, z, the MLP hidden layer, o and y to HBM between ops
(~6 round-trips of 4-9 MB per block at DPOT-M); here everything after the
x load stays in VMEM.

bf16-compute only (the f32 golden path stays on the XLA ops); used by
models/dpot.py Block when shapes qualify (see `fused_gn_afno_supported`).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5  # torch.nn.GroupNorm default, matches ops/norms.py


def _interpret() -> bool:
    return os.environ.get("DPOT_PALLAS_INTERPRET", "0") == "1"


def _kernel(x_ref, gs_ref, gb_ref, A_ref, Ai_ref, W1_ref, B1_ref, W2_ref,
            B2_ref, out_ref, o_scr, *, bt, K, nb, bs, groups, mm):
    HW = x_ref.shape[1]
    C = x_ref.shape[2]
    for s in range(bt):
        xs = x_ref[s].astype(jnp.float32)                    # (HW, C)
        # GroupNorm(groups) per sample: stats over (HW, C/groups)
        xg = xs.reshape(HW, groups, C // groups)
        mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(0, 2), keepdims=True)
        xn = ((xg - mean) * jax.lax.rsqrt(var + _EPS)).reshape(HW, C)
        xn = xn * gs_ref[0] + gb_ref[0]
        xnb = xn.astype(mm)
        # analysis: stacked [re; im] of the kept spectral corner
        z = jnp.dot(A_ref[...], xnb, preferred_element_type=jnp.float32)
        zb = z.astype(mm)                                    # (2K, C)
        # complex block MLP in real form, one block-column at a time
        for j in range(nb):
            zj = jnp.concatenate(
                [zb[:K, j * bs:(j + 1) * bs], zb[K:, j * bs:(j + 1) * bs]],
                axis=-1,
            )                                                # (K, 2bs)
            h = (
                jnp.dot(zj, W1_ref[j], preferred_element_type=jnp.float32)
                + B1_ref[j]
            )
            h = jax.nn.gelu(h, approximate=True).astype(mm)
            o = (
                jnp.dot(h, W2_ref[j], preferred_element_type=jnp.float32)
                + B2_ref[j]
            )                                                # (K, 2bs)
            o_scr[:K, j * bs:(j + 1) * bs] = o[:, :bs].astype(mm)
            o_scr[K:, j * bs:(j + 1) * bs] = o[:, bs:].astype(mm)
        # synthesis + AFNO-internal residual (the GN'd input)
        y = jnp.dot(Ai_ref[...], o_scr[...], preferred_element_type=jnp.float32)
        out_ref[s] = (y + xn).astype(out_ref.dtype)


def fused_gn_afno_supported(
    HW: int, C: int, nb: int, batch: int, hidden_size_factor: int = 1,
    groups: int = 8, K: int | None = None,
    vmem_budget: int = 12 * 2**20,
) -> bool:
    """Shapes the kernel handles efficiently: combined-operator latents,
    MXU-aligned block channels, an even batch for the 2-sample tile, a
    square mode MLP (the kernel's blocks assume hidden == 2*bs), a group
    count that tiles the channel axis, AND a VMEM footprint under budget
    — a qualifying-by-alignment 512^2/patch-8 shape (HW=4096, K=1024)
    puts ~16 MB PER DFT operator in VMEM and would fail at Mosaic
    compile time instead of gracefully using the XLA path. K = kept
    spectral modes kh*kw (None = assume the worst case for this HW)."""
    bs = C // nb
    k_modes = K if K is not None else min(1024, HW)
    # resident per grid step: A (2K, HW) + Ainv (HW, 2K) bf16, the
    # double-buffered (2, HW, C) x/out tiles bf16, and the (2K, C) f32
    # spectral scratch
    vmem_bytes = (
        2 * (2 * k_modes * HW * 2)
        + 4 * (HW * C * 2)
        + (2 * k_modes * C * 4)
    )
    return (
        HW <= 4096
        and C % nb == 0
        and (2 * bs) % 128 == 0
        and batch % 2 == 0
        and hidden_size_factor == 1
        and groups > 0
        and C % groups == 0
        and vmem_bytes <= vmem_budget
    )


@partial(jax.jit, static_argnames=("K", "nb", "groups"))
def _fused_fwd(x, gscale, gbias, A, Ainv, W1, B1, W2, B2, *, K, nb, groups):
    B, HW, C = x.shape
    bs = C // nb
    # the BlockSpecs below assume hidden == 2*bs; a hidden_size_factor > 1
    # weight would be silently truncated otherwise
    assert W1.shape[-1] == 2 * bs and W2.shape[-2] == 2 * bs, (
        f"fused kernel requires hidden_size_factor == 1, got W1 {W1.shape}"
    )
    bt = 2 if B % 2 == 0 else 1
    grid = (B // bt,)
    # interpret mode runs on CPU, whose dot has no bf16 x bf16 -> f32
    mm = jnp.float32 if _interpret() else jnp.bfloat16
    return pl.pallas_call(
        partial(_kernel, bt=bt, K=K, nb=nb, bs=bs, groups=groups, mm=mm),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * K, HW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW, 2 * K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2 * bs, 2 * bs), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, 2 * bs), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2 * bs, 2 * bs), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, 2 * bs), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * K, C), mm)],
        interpret=_interpret(),
    )(x, gscale, gbias, A, Ainv, W1, B1, W2, B2)


def _xla_reference(x, gscale, gbias, A, Ainv, W1, B1, W2, B2, K, groups=8):
    """The composed XLA computation the kernel replaces (bf16 semantics);
    also the recompute path for the backward pass."""
    from dpot_tpu.ops.norms import group_norm

    B, HW, C = x.shape
    nb = W1.shape[0]
    bs = C // nb
    cd = A.dtype  # compute dtype follows the pre-cast operator matrices
    xn32 = group_norm(
        x.astype(jnp.float32), gscale[0], gbias[0], num_groups=groups
    )
    xn = xn32.astype(cd)
    z = jnp.einsum(
        "mn,bnc->bmc", A, xn, preferred_element_type=jnp.float32
    )
    zb = z.astype(cd)
    zj = jnp.concatenate(
        [
            zb[:, :K].reshape(B, K, nb, bs),
            zb[:, K:].reshape(B, K, nb, bs),
        ],
        axis=-1,
    )  # (B, K, nb, 2bs)
    h = (
        jnp.einsum("bkji,jio->bkjo", zj, W1, preferred_element_type=jnp.float32)
        + B1[:, 0]
    )
    h = jax.nn.gelu(h, approximate=True).astype(cd)
    o = (
        jnp.einsum("bkji,jio->bkjo", h, W2, preferred_element_type=jnp.float32)
        + B2[:, 0]
    )  # (B, K, nb, 2bs) f32
    ob = jnp.concatenate(
        [
            o[..., :bs].reshape(B, K, C),
            o[..., bs:].reshape(B, K, C),
        ],
        axis=1,
    ).astype(cd)
    y = jnp.einsum(
        "nm,bmc->bnc", Ainv, ob, preferred_element_type=jnp.float32
    )
    return (y + xn32).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_gn_afno(x, gscale, gbias, A, Ainv, W1, B1, W2, B2, K, groups=8):
    """x: (B, HW, C) bf16. gscale/gbias: (1, C) f32. A: (2K, HW) bf16,
    Ainv: (HW, 2K) bf16. W1/W2: (nb, 2bs, 2bs_f) bf16 real-form,
    B1/B2: (nb, 1, 2bs_f) f32. groups: GroupNorm group count (follows the
    model's norm1 config; Block threads it). Returns GroupNorm+AFNO(x)
    incl. the AFNO-internal residual."""
    nb = W1.shape[0]
    return _fused_fwd(
        x, gscale, gbias, A, Ainv, W1, B1, W2, B2, K=K, nb=nb, groups=groups
    )


def _fwd(x, gscale, gbias, A, Ainv, W1, B1, W2, B2, K, groups=8):
    out = fused_gn_afno(x, gscale, gbias, A, Ainv, W1, B1, W2, B2, K, groups)
    return out, (x, gscale, gbias, A, Ainv, W1, B1, W2, B2)


def _bwd(K, groups, res, g):
    x, gscale, gbias, A, Ainv, W1, B1, W2, B2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, K=K, groups=groups),
        x, gscale, gbias, A, Ainv, W1, B1, W2, B2,
    )
    return vjp(g)


fused_gn_afno.defvjp(_fwd, _bwd)
