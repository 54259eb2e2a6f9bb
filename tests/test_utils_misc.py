"""viz / inspection / profiling utils + the dataset normalize=True path."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dpot_tpu.utils.inspection import (
    assert_shape,
    check_replica_consistency,
    module_summary,
    save_results,
)
from dpot_tpu.utils.profiling import AverageMeter, EpochTimer, count_parameters


def test_assert_shape():
    assert_shape(np.zeros((2, 3, 4)), (2, None, 4))
    with pytest.raises(AssertionError):
        assert_shape(np.zeros((2, 3)), (2, 4))
    with pytest.raises(AssertionError):
        assert_shape(np.zeros((2, 3)), (2, 3, 1))


def test_module_summary_and_count():
    params = {"a": {"kernel": np.zeros((4, 8)), "bias": np.zeros(8)},
              "c": np.zeros((3,), np.complex64)}
    s = module_summary(params)
    assert "a/kernel" in s and "32" in s and "TOTAL" in s
    # complex counted twice (reference utilities.py:89-96)
    assert count_parameters(params) == 32 + 8 + 6


def test_replica_consistency():
    from dpot_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh(data=8, spatial=1)
    tree = replicate({"w": jnp.ones((4, 4))}, mesh)
    check_replica_consistency(tree)


def test_save_results(tmp_path):
    p = str(tmp_path / "r.csv")
    save_results(p, [{"ds": "a", "l2": 0.1}, {"ds": "b", "l2": 0.2}])
    txt = open(p).read()
    assert "ds,l2" in txt and "b,0.2" in txt


def test_meters():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    t = EpochTimer()
    t.tick("load")
    t.tick("train")
    assert t.get("load") >= 0 and t.get("train") >= 0


def test_viz_outputs(tmp_path):
    from dpot_tpu.utils.viz import plot_rollout_comparison, plot_trajectory

    traj = np.random.default_rng(0).standard_normal((16, 16, 4, 2)).astype(np.float32)
    ok = plot_trajectory(traj, str(tmp_path / "t.png"))
    ok2 = plot_rollout_comparison(traj, traj * 0.9, str(tmp_path / "r.png"))
    if ok:
        assert os.path.getsize(tmp_path / "t.png") > 0
    if ok2:
        assert os.path.getsize(tmp_path / "r.png") > 0


def test_dataset_normalize_path():
    from dpot_tpu.data.grid_dataset import MixedTemporalDataset
    from dpot_tpu.data.registry import make_synthetic_spec

    make_synthetic_spec("synth_norm", train_size=6, test_size=2,
                        t_total=10, t_test=2, in_size=(16, 16), n_channels=2)
    ds = MixedTemporalDataset(["synth_norm"], res=16, t_in=4, t_ar=1,
                              train=True, normalize=True)
    assert len(ds.normalizers) == 1
    rng = np.random.default_rng(0)
    x, y, msk, _ = ds.__getitem__(0, rng=rng)
    assert np.isfinite(x).all()
    # normalized inputs should be roughly centered
    assert abs(float(x[..., 0].mean())) < 1.0


def test_replica_consistency_tolerates_even_sharding():
    """An evenly-SHARDED array has same-shape shards with different
    contents by design — the check must compare shard INDICES, not
    shapes, or FSDP states raise false 'replica mismatch'."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dpot_tpu.parallel.mesh import make_mesh
    from dpot_tpu.utils.inspection import check_replica_consistency

    mesh = make_mesh(data=8, spatial=1)
    x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)
    sharded = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    check_replica_consistency({"w": sharded})  # must NOT raise

    replicated = jax.device_put(x, NamedSharding(mesh, P()))
    check_replica_consistency({"w": replicated})
