"""Losses and evaluation metrics.

`rel_lp_loss` is the training/eval loss of the reference (SimpleLpLoss,
utils/criterion.py:23-74, in its exercised configuration
size_average=False): per-channel relative Lp norm over flattened
space-time, masked, summed over channels, divided by the count of
channels with non-zero mask, summed over the batch.

The metric battery mirrors reference Evaluator/compute_fourier_error
(utils/criterion.py:189-360).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rel_lp_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array | None = None,
    p: int = 2,
    reduce_batch: bool = True,
) -> jax.Array:
    """pred/target: (B, ..., C); mask broadcastable to them (the data layer
    produces (B, H, W, 1, C)). Returns the summed-over-batch loss (reference
    SimpleLpLoss with size_average=False, utils/criterion.py:59) or the
    per-sample vector when reduce_batch=False."""
    B = pred.shape[0]
    C = pred.shape[-1]
    if mask is not None:
        x = pred * mask
        y = target * mask
        # channels with any nonzero mask weight (reference :48)
        reduce_axes = tuple(range(1, mask.ndim - 1))
        msk_channels = jnp.count_nonzero(
            jnp.sum(mask, axis=reduce_axes), axis=-1
        ).astype(pred.dtype)  # (B,)
    else:
        x, y = pred, target
        msk_channels = jnp.full((B,), C, dtype=pred.dtype)

    xf = x.reshape(B, -1, C)
    yf = y.reshape(B, -1, C)
    if p == 2:
        diff_norms = jnp.sqrt(jnp.sum(jnp.square(xf - yf), axis=1))
        y_norms = jnp.sqrt(jnp.sum(jnp.square(yf), axis=1)) + 1e-8
    else:
        diff_norms = jnp.sum(jnp.abs(xf - yf) ** p, axis=1) ** (1.0 / p)
        y_norms = jnp.sum(jnp.abs(yf) ** p, axis=1) ** (1.0 / p) + 1e-8

    per_sample = jnp.sum(diff_norms / y_norms, axis=-1) / msk_channels
    if reduce_batch:
        return jnp.sum(per_sample)
    return per_sample


def lp_metric(pred: jax.Array, target: jax.Array, p: int = 2) -> jax.Array:
    """Component-wise absolute Lp metric (reference LpLoss._lp_losses,
    utils/criterion.py:89-101): mean over batch and channels."""
    B, C = pred.shape[0], pred.shape[-1]
    d = (pred - target).reshape(B, -1, C)
    losses = jnp.mean(jnp.abs(d) ** p, axis=1) ** (1.0 / p)
    return jnp.mean(losses)


def rel_lp_metric(
    pred: jax.Array, target: jax.Array, p: int = 2, per_channel: bool = False
) -> jax.Array:
    """Relative Lp metric (reference RelLpLoss._lp_losses,
    utils/criterion.py:131-155, component='all')."""
    B, C = pred.shape[0], pred.shape[-1]
    err = jnp.sum(jnp.abs((pred - target).reshape(B, -1, C)) ** p, axis=1)
    ref = jnp.sum(jnp.abs(target.reshape(B, -1, C)) ** p, axis=1)
    losses = (err / ref) ** (1.0 / p)  # (B, C)
    if per_channel:
        return jnp.mean(losses, axis=0)
    return jnp.mean(losses)


def rfne_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Relative Frobenius-norm error (reference RFNELoss,
    utils/criterion.py:176-186):

      RFNE(y, y_hat) = ||y_hat - y||_F / ||y||_F

    with the norm taken over the spatial axes, leaving (batch, T, C), then
    averaged. pred/target: (B, nx..., T, C).

    Note: the reference body passes `dims[1:-2]` — a slice of *sizes*, not
    axis indices — to torch.norm, which raises for any real input; the
    docstring'd intent (norm over the nx^i axes) is what is implemented
    here.
    """
    spatial_axes = tuple(range(1, pred.ndim - 2))
    err = jnp.sqrt(jnp.sum(jnp.square(pred - target), axis=spatial_axes))
    ref = jnp.sqrt(jnp.sum(jnp.square(target), axis=spatial_axes))
    return jnp.mean(err / ref)


def evaluator_metrics(
    pred: jax.Array, target: jax.Array, temporal: bool = False
) -> dict[str, jax.Array]:
    """nMAE / nMSE / nMXE (+ _t temporal variants), matching reference
    Evaluator.forward (utils/criterion.py:206-239). pred/target:
    (B, spatial..., T, C)."""
    B, C = pred.shape[0], pred.shape[-1]
    p = pred.reshape(B, -1, C)
    t = target.reshape(B, -1, C)
    out = {
        "nmae": jnp.mean(
            jnp.sum(jnp.abs(p - t), axis=1) / jnp.sum(jnp.abs(t), axis=1), axis=0
        ),
        "nmse": jnp.mean(
            jnp.sqrt(
                jnp.sum(jnp.square(p - t), axis=1) / jnp.sum(jnp.square(t), axis=1)
            ),
            axis=0,
        ),
        "nmxe": jnp.mean(
            jnp.max(jnp.abs(p - t), axis=1) / jnp.max(jnp.abs(t), axis=1), axis=0
        ),
    }
    if temporal:
        T = pred.shape[-2]
        pt = pred.reshape(B, -1, T, C)
        tt = target.reshape(B, -1, T, C)
        out["nmae_t"] = jnp.mean(
            jnp.sum(jnp.abs(pt - tt), axis=1) / jnp.sum(jnp.abs(tt), axis=1), axis=0
        )
        out["nmse_t"] = jnp.mean(
            jnp.sqrt(
                jnp.sum(jnp.square(pt - tt), axis=1)
                / jnp.sum(jnp.square(tt), axis=1)
            ),
            axis=0,
        )
        out["nmxe_t"] = jnp.mean(
            jnp.max(jnp.abs(pt - tt), axis=1) / jnp.max(jnp.abs(tt), axis=1), axis=0
        )
    return out


def boundary_rmse_2d(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Boundary RMSE for 2D grids (reference compute_fourier_error err_BD,
    utils/criterion.py:287-294). pred/target: (B, X, Y, T, C) ->
    channel-first internally (B, C, X, Y, T)."""
    p = jnp.transpose(pred, (0, 4, 1, 2, 3))
    t = jnp.transpose(target, (0, 4, 1, 2, 3))
    nx, ny = p.shape[2], p.shape[3]
    ebx = jnp.square(p[:, :, 0] - t[:, :, 0]) + jnp.square(p[:, :, -1] - t[:, :, -1])
    eby = jnp.square(p[:, :, :, 0] - t[:, :, :, 0]) + jnp.square(
        p[:, :, :, -1] - t[:, :, :, -1]
    )
    err = (jnp.sum(ebx, axis=-2) + jnp.sum(eby, axis=-2)) / (2 * nx + 2 * ny)
    return jnp.mean(jnp.sqrt(err), axis=0)  # (C, T)


def spectral_band_mse_2d(
    pred: jax.Array, target: jax.Array, ilow: int = 4, ihigh: int = 12
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Binned low/mid/high-frequency spectral MSE for 2D grids (reference
    compute_fourier_error, utils/criterion.py:314-344). pred/target:
    (B, X, Y, T, C). Returns (low, mid, high) each (T, C).

    The O(nx*ny) python loop of the reference is replaced with a
    radial-bin scatter via a precomputed one-hot binning matmul —
    jit-friendly and MXU-shaped.
    """
    from dpot_tpu.ops.fourier import fft2_pair

    p = jnp.transpose(pred, (0, 4, 1, 2, 3))  # B, C, X, Y, T
    t = jnp.transpose(target, (0, 4, 1, 2, 3))
    nb_, nc, nx, ny, nt = p.shape
    # full fft via the pair API (the tunneled TPU has no FFT lowering)
    dr, di = fft2_pair((p - t).astype(jnp.float32), axes=(2, 3))
    err = jnp.square(dr) + jnp.square(di)  # B, C, X, Y, T

    nbin = min(nx // 2, ny // 2)
    ii = jnp.arange(nx // 2)[:, None]
    jj = jnp.arange(ny // 2)[None, :]
    radial = jnp.floor(jnp.sqrt(ii**2 + jj**2)).astype(jnp.int32)  # nx/2, ny/2
    onehot = jax.nn.one_hot(radial, nbin, dtype=jnp.float32)  # nx/2, ny/2, nbin
    # keep only the [0:nx//2, 0:ny//2] quadrant as the reference loop does
    binned = jnp.einsum(
        "bcxyt,xyn->bcnt", err[:, :, : nx // 2, : ny // 2], onehot
    )
    ef = jnp.sqrt(jnp.mean(binned, axis=0)) / (nx * ny)  # C, nbin, T
    low = jnp.mean(ef[:, :ilow], axis=1).T
    mid = jnp.mean(ef[:, ilow:ihigh], axis=1).T
    high = jnp.mean(ef[:, ihigh:], axis=1).T
    return low, mid, high


def spectral_band_mse_1d(
    pred: jax.Array, target: jax.Array, ilow: int = 4, ihigh: int = 12
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """1D binned spectral MSE (reference compute_fourier_error
    len(idxs)==4 branch, utils/criterion.py:309-313,343-346: rfft over x,
    sqrt(mean_B |dF|^2)/nx, then low/mid/high means over the frequency
    axis). pred/target: (B, X, T, C). Returns (low, mid, high), each
    (T, C). The rfft runs via the pair API (no jnp.fft on the tunneled
    TPU backend)."""
    from dpot_tpu.ops.fourier import _rfft_axis

    p = jnp.transpose(pred, (0, 3, 1, 2))  # B, C, X, T
    t = jnp.transpose(target, (0, 3, 1, 2))
    nx = p.shape[2]
    # torch.fft.rfft's default 'backward' norm is the unscaled forward —
    # exactly what _rfft_axis computes
    dr, di = _rfft_axis((p - t).astype(jnp.float32), 2)
    err = jnp.square(dr) + jnp.square(di)  # B, C, F, T
    ef = jnp.sqrt(jnp.mean(err, axis=0)) / nx  # C, F, T
    low = jnp.mean(ef[:, :ilow], axis=1).T
    mid = jnp.mean(ef[:, ilow:ihigh], axis=1).T
    high = jnp.mean(ef[:, ihigh:], axis=1).T
    return low, mid, high


def boundary_rmse_1d(pred: jax.Array, target: jax.Array) -> jax.Array:
    """1D boundary RMSE (reference compute_fourier_error len(idxs)==4 branch,
    utils/criterion.py:284-286). pred/target: (B, X, T, C)."""
    p = jnp.transpose(pred, (0, 3, 1, 2))  # B, C, X, T
    t = jnp.transpose(target, (0, 3, 1, 2))
    err = jnp.square(p[:, :, 0] - t[:, :, 0]) + jnp.square(
        p[:, :, -1] - t[:, :, -1]
    )
    return jnp.mean(jnp.sqrt(err / 2.0), axis=0)  # (C, T)


def boundary_rmse_3d(pred: jax.Array, target: jax.Array) -> jax.Array:
    """3D boundary RMSE (reference utils/criterion.py:295-307).
    pred/target: (B, X, Y, Z, T, C). Returns (C, T).

    INTENTIONAL deviation: the reference's view([nb,-1,nt]) collapses
    CHANNELS into the face sum (returning (T,)), unlike its own 1D/2D
    branches which keep (C, T) — an inconsistency, not a semantic. This
    port keeps channels separate across all ranks; identical at C=1
    (golden-tested, tests/test_criterion.py)."""
    p = jnp.transpose(pred, (0, 5, 1, 2, 3, 4))  # B,C,X,Y,Z,T
    t = jnp.transpose(target, (0, 5, 1, 2, 3, 4))
    B, C = p.shape[0], p.shape[1]
    nx, ny, nz, nt = p.shape[2], p.shape[3], p.shape[4], p.shape[5]

    def face_sq(a, b, axis0):
        sl0 = [slice(None)] * p.ndim
        sl1 = [slice(None)] * p.ndim
        sl0[axis0], sl1[axis0] = 0, -1
        e = jnp.square(a[tuple(sl0)] - b[tuple(sl0)]) + jnp.square(
            a[tuple(sl1)] - b[tuple(sl1)]
        )
        return jnp.sum(e.reshape(B, C, -1, nt), axis=2)

    err = face_sq(p, t, 2) + face_sq(p, t, 3) + face_sq(p, t, 4)
    err = err / (2 * nx * ny + 2 * ny * nz + 2 * nz * nx)
    return jnp.mean(jnp.sqrt(err), axis=0)  # (C, T)


def spectral_band_mse_3d(
    pred: jax.Array, target: jax.Array, ilow: int = 4, ihigh: int = 12
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """3D binned spectral MSE (reference utils/criterion.py:327-344),
    radial binning as a one-hot contraction. pred/target:
    (B, X, Y, Z, T, C). Returns (low, mid, high) each (T, C)."""
    from dpot_tpu.ops.fourier import fft3_pair

    p = jnp.transpose(pred, (0, 5, 1, 2, 3, 4))
    t = jnp.transpose(target, (0, 5, 1, 2, 3, 4))
    _, _, nx, ny, nz, _ = p.shape
    dr, di = fft3_pair((p - t).astype(jnp.float32), axes=(2, 3, 4))
    err = jnp.square(dr) + jnp.square(di)
    nbin = min(nx // 2, ny // 2, nz // 2)
    ii = jnp.arange(nx // 2)[:, None, None]
    jj = jnp.arange(ny // 2)[None, :, None]
    kk = jnp.arange(nz // 2)[None, None, :]
    radial = jnp.floor(jnp.sqrt(ii**2 + jj**2 + kk**2)).astype(jnp.int32)
    onehot = jax.nn.one_hot(radial, nbin, dtype=jnp.float32)
    binned = jnp.einsum(
        "bcxyzt,xyzn->bcnt",
        err[:, :, : nx // 2, : ny // 2, : nz // 2],
        onehot,
    )
    ef = jnp.sqrt(jnp.mean(binned, axis=0)) / (nx * ny * nz)  # C, nbin, T
    low = jnp.mean(ef[:, :ilow], axis=1).T
    mid = jnp.mean(ef[:, ilow:ihigh], axis=1).T
    high = jnp.mean(ef[:, ihigh:], axis=1).T
    return low, mid, high


def cross_entropy_sum(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch CrossEntropyLoss(reduction='sum') equivalent
    (used by train_temporal.py:182 for the dataset classifier)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))
