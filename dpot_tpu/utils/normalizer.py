"""Data normalizers (numpy host-side, jax-compatible arrays).

Ports of reference utils/normalizer.py: UnitTransformer (:98-122),
MinMaxTransformer (:125-148), PointWiseUnitTransformer (:155-185),
IdentityTransformer. Stats use ddof=1 (torch's unbiased .std()).

Note: the reference dataset path that slices normalizer stats by timestep
(griddataset.py:166) indexes a size-1 axis and only works because
`normalize=False` everywhere in the entry scripts; here stats broadcast
(size-1 time axis) so the path is actually usable.
"""

from __future__ import annotations

import numpy as np


class IdentityTransformer:
    def __init__(self, X=None, eps: float = 0.0):
        self.mean = np.zeros(1, dtype=np.float32)
        self.std = np.ones(1, dtype=np.float32)
        self.eps = eps

    def transform(self, X, inverse=True, component="all"):
        return X


class UnitTransformer:
    """Per-channel mean/std over all leading axes."""

    def __init__(self, X: np.ndarray, eps: float = 1e-3):
        X = np.asarray(X, dtype=np.float32)
        axes = tuple(range(X.ndim - 1))
        self.mean = X.mean(axis=axes, keepdims=True)
        self.std = X.std(axis=axes, keepdims=True, ddof=1)
        self.eps = eps

    def transform(self, X, inverse=True, component="all"):
        if component in ("all", "all-reduce"):
            if inverse:
                return X * (self.std + self.eps) + self.mean
            return (X - self.mean) / (self.std + self.eps)
        if inverse:
            return X * (self.std[..., component] + self.eps) + self.mean[..., component]
        return (X - self.mean[..., component]) / (self.std[..., component] + self.eps)


class MinMaxTransformer:
    def __init__(self, X: np.ndarray, eps: float = 1e-4):
        X = np.asarray(X, dtype=np.float32)
        axes = tuple(range(X.ndim - 1))
        self.min = X.min(axis=axes, keepdims=True)
        self.max = X.max(axis=axes, keepdims=True)
        self.eps = eps

    def transform(self, X, inverse=True, component="all"):
        rng = self.max - self.min + self.eps
        if component in ("all", "all-reduce"):
            if inverse:
                return X * rng + self.min
            return (X - self.min) / rng
        if inverse:
            return X * rng[..., component] + self.min[..., component]
        return (X - self.min[..., component]) / rng[..., component]


class PointWiseUnitTransformer:
    """Per-gridpoint mean/std (over samples, and time if temporal)."""

    def __init__(self, X: np.ndarray, temporal: bool = True, eps: float = 1e-4):
        X = np.asarray(X, dtype=np.float32)
        axes = (0, X.ndim - 2) if temporal else (0,)
        self.mean = X.mean(axis=axes, keepdims=True)
        self.std = X.std(axis=axes, keepdims=True, ddof=1)
        self.eps = eps

    def transform(self, X, inverse=True, component="all"):
        if component in ("all", "all-reduce"):
            if inverse:
                return X * (self.std + self.eps) + self.mean
            return (X - self.mean) / (self.std + self.eps)
        if inverse:
            return X * (self.std[..., component] + self.eps) + self.mean[..., component]
        return (X - self.mean[..., component]) / (self.std[..., component] + self.eps)


class QuantileTransformer:
    """Per-channel quantile (rank-gaussian/uniform) transformer — port of
    the reference's TorchQuantileTransformer + custom Interp1d
    (utils/normalizer.py:194-463) on numpy: fit per-channel quantiles,
    transform by piecewise-linear interpolation onto [0,1] (or its
    inverse). Invertible within the fitted range."""

    def __init__(self, X: np.ndarray, n_quantiles: int = 1000):
        X = np.asarray(X, dtype=np.float32)
        C = X.shape[-1]
        flat = X.reshape(-1, C)
        n_q = min(n_quantiles, flat.shape[0])
        self.references = np.linspace(0.0, 1.0, n_q, dtype=np.float32)
        self.quantiles = np.stack(
            [np.quantile(flat[:, c], self.references) for c in range(C)],
            axis=-1,
        )  # (n_q, C)

    def transform(self, X, inverse=False, component="all"):
        X = np.asarray(X, dtype=np.float32)
        C = X.shape[-1]
        out = np.empty_like(X)
        for c in range(C):
            if inverse:
                out[..., c] = np.interp(
                    X[..., c], self.references, self.quantiles[:, c]
                )
            else:
                out[..., c] = np.interp(
                    X[..., c], self.quantiles[:, c], self.references
                )
        return out


def init_normalizer(kind: str, X: np.ndarray, **kw):
    table = {
        "unit": UnitTransformer,
        "minmax": MinMaxTransformer,
        "pointwise": PointWiseUnitTransformer,
        "quantile": QuantileTransformer,
        "identity": IdentityTransformer,
        "none": IdentityTransformer,
    }
    return table[kind](X, **kw)
