"""Visualization-helper smoke tests (Agg backend) — the reference ships
~5 ad-hoc plotting scripts (data_generation/visualize_data.py,
visualize_3d.py, cfdbench/pdearena/ns2d vis_data scripts); utils/viz.py
is their library form plus the rollout GIF used by evaluate --viz_dir.
Each helper must write its file(s) headlessly and never raise."""

import os

import numpy as np
import pytest

from dpot_tpu.utils import viz


@pytest.fixture(scope="module")
def traj():
    rng = np.random.default_rng(0)
    return rng.standard_normal((24, 24, 8, 3)).astype(np.float32)


def _nonempty(p):
    assert os.path.exists(p) and os.path.getsize(p) > 0, p


def test_plot_trajectory_and_rollout(traj, tmp_path):
    p1 = str(tmp_path / "traj.png")
    assert viz.plot_trajectory(traj, p1, title="t")
    _nonempty(p1)
    p2 = str(tmp_path / "cmp.png")
    assert viz.plot_rollout_comparison(traj, traj * 0.9, p2)
    _nonempty(p2)


def test_plot_snapshots_zoom(traj, tmp_path):
    paths = viz.plot_snapshots(
        traj, str(tmp_path / "snap"), start_idx=1, n_frames=2, zoom_to=48
    )
    assert len(paths) == 2
    for p in paths:
        _nonempty(p)


def test_plot_channels_grid(traj, tmp_path):
    paths = viz.plot_channels(
        traj, str(tmp_path / "ch"), channel_names=["u", "v"]
    )
    assert len(paths) == traj.shape[-1]
    for p in paths:
        _nonempty(p)


def test_plot_histograms_and_statistics(traj, tmp_path):
    ph = str(tmp_path / "hist.png")
    assert viz.plot_histograms(traj, ph, channel_names=["u", "v", "p"])
    _nonempty(ph)
    ps = str(tmp_path / "stats.png")
    assert viz.plot_statistics(traj, ps)
    _nonempty(ps)


def test_animate_rollout_gif(traj, tmp_path):
    p = str(tmp_path / "roll.gif")
    assert viz.animate_rollout(traj * 0.9, traj, p, fps=2)
    _nonempty(p)


def test_plot_volume(tmp_path):
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    p = str(tmp_path / "vol.png")
    assert viz.plot_volume(vol, p, step=4)
    _nonempty(p)


def test_save_eval_viz_2d_and_3d(tmp_path):
    rng = np.random.default_rng(2)
    pred2 = rng.standard_normal((16, 16, 4, 2)).astype(np.float32)
    w = viz.save_eval_viz(pred2, pred2 * 0.8, str(tmp_path), "ns2d_fno_1e-5")
    assert any(p.endswith(".gif") for p in w) and any(
        p.endswith("_rollout.png") for p in w
    )
    pred3 = rng.standard_normal((8, 8, 8, 3, 2)).astype(np.float32)
    w3 = viz.save_eval_viz(pred3, pred3, str(tmp_path), "ns3d_pdb_M1_rand")
    assert any("volume" in p for p in w3)
    for p in w + w3:
        _nonempty(p)
