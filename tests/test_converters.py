"""Golden tests for the offline corpus converters (CFDBench / PDEArena /
SuperBench) against the actual reference implementations run on synthetic
raw corpora."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)

h5py = pytest.importorskip("h5py")


def _ref_module(rel):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        # package import (needed by modules using relative imports)
        import importlib

        return importlib.import_module(rel.replace(".py", "").replace("/", "."))
    except Exception:
        spec = importlib.util.spec_from_file_location(
            "ref_" + rel.replace("/", "_").replace(".py", ""),
            os.path.join(REF, rel),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod


# ---------------------------------------------------------------------------
# synthetic raw corpora
# ---------------------------------------------------------------------------

CASE_JSON = {
    "cavity": dict(vel_top=12.0, density=4.0, viscosity=0.01, height=1.0,
                   width=1.0),
    "tube": dict(vel_in=8.0, density=3.0, viscosity=0.02, height=1.0,
                 width=2.0),
    "cylinder": dict(vel_in=6.0, density=2.0, viscosity=0.03, radius=0.2,
                     x_min=-0.5, x_max=1.5, y_min=-0.5, y_max=1.5),
    "dam": dict(velocity=0.05, density=1.5, viscosity=0.04,
                barrier_width=0.2, barrier_height=0.3, dx=0.1, dy=0.1,
                height=1.0, width=1.0),
}


def make_cfdbench_corpus(root, problems, n_cases=5, T=7, h=10, w=12):
    rng = np.random.default_rng(0)
    for problem in problems:
        # the cylinder auto-dataset uses data_delta_time=0.001
        # (cylinder.py:203), so delta_time=0.1 strides 100 frames — cases
        # must be longer than that for the reference loader to not crash
        T_p = 102 if problem == "cylinder" else T
        for subset in ("prop", "bc", "geo"):
            for i in range(n_cases):
                d = os.path.join(root, problem, subset, f"case{i}")
                os.makedirs(d)
                np.save(os.path.join(d, "u.npy"),
                        rng.standard_normal((T_p, h, w)).astype(np.float64))
                np.save(os.path.join(d, "v.npy"),
                        rng.standard_normal((T_p, h, w)).astype(np.float64))
                with open(os.path.join(d, "case.json"), "w") as f:
                    json.dump(CASE_JSON[problem], f)


@pytest.mark.parametrize("problem", ["cavity", "tube", "cylinder", "dam"])
def test_cfdbench_case_loader_matches_reference(problem, tmp_path):
    """load_cfdbench_case vs the reference per-problem load_case_data."""
    make_cfdbench_corpus(tmp_path, [problem], n_cases=1)
    case_dir = str(tmp_path / problem / "prop" / "case0")

    ref = _ref_module(f"data_generation/cfdbench/{problem}.py")
    want, want_params = ref.load_case_data(__import__("pathlib").Path(case_dir))

    from dpot_tpu.data.converters import load_cfdbench_case

    got, got_params = load_cfdbench_case(case_dir, problem)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got_params == want_params


def test_cfdbench_full_pipeline_matches_reference(tmp_path, monkeypatch):
    """convert_cfdbench vs the reference save_data flow (get_auto_dataset ->
    all_features -> split_trajectory -> transpose) on the same corpus."""
    monkeypatch.chdir(tmp_path)  # the cylinder loader caches to ./dataset/
    corpus = tmp_path / "cfdbench"
    problems = ["cavity", "cylinder", "tube"]
    make_cfdbench_corpus(corpus, problems)

    # --- reference flow (save_data.py:17-99 / preprocess.py:425-517)
    from pathlib import Path

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from data_generation.cfdbench import get_auto_dataset  # noqa: E402
    pre = _ref_module("data_generation/preprocess.py")

    train_feats, test_feats = [], []
    for problem in problems:
        tr, _, te = get_auto_dataset(
            data_dir=Path(corpus), data_name=f"{problem}_prop_bc_geo",
            delta_time=0.1, norm_props=True, norm_bc=True,
        )
        train_feats += tr.all_features
        test_feats += te.all_features
    # split_trajectory is defined inside preprocess_cfdbench_data; re-run
    # its exact body via the module's torch deps
    import torch
    import torch.nn.functional as F

    def ref_split(data_list, time_step, grid_size=64):
        out = []
        for x in data_list:
            T = x.shape[0]
            num_segments = int(np.ceil(T / time_step))
            padded = np.zeros((num_segments * time_step, *x.shape[1:]))
            padded[:T] = x
            if T % time_step != 0:
                padded[T:] = x[-1]
            padded = F.interpolate(
                torch.from_numpy(padded), size=(grid_size, grid_size),
                mode="bilinear", align_corners=True,
            ).numpy()
            out.append(padded.reshape((num_segments, time_step, *padded.shape[1:])))
        return np.concatenate(out, axis=0)

    want_train = ref_split(train_feats, 4, grid_size=16).transpose(0, 3, 4, 1, 2)
    want_test = ref_split(test_feats, 4, grid_size=16).transpose(0, 3, 4, 1, 2)

    # --- our converter
    from dpot_tpu.data.converters import convert_cfdbench

    dst_train = str(tmp_path / "ns2d_cdb_train.hdf5")
    dst_test = str(tmp_path / "ns2d_cdb_test.hdf5")
    n_tr, n_te = convert_cfdbench(
        str(corpus), dst_train, dst_test, problems=problems,
        infer_steps=4, grid_size=16,
    )
    assert (n_tr, n_te) == (want_train.shape[0], want_test.shape[0])
    with h5py.File(dst_train) as f:
        np.testing.assert_allclose(f["data"][:], want_train, rtol=1e-5,
                                   atol=1e-5)
    with h5py.File(dst_test) as f:
        np.testing.assert_allclose(f["data"][:], want_test, rtol=1e-5,
                                   atol=1e-5)


def test_pdearena_ns2d_matches_reference(tmp_path):
    """convert_pdearena_ns2d vs the reference preprocess_ns2d on a fake
    PDEArena shard set (train/valid/test .h5 files)."""
    rng = np.random.default_rng(1)
    src = tmp_path / "NavierStokes-2D"
    os.makedirs(src)
    for split, n in (("train", 3), ("valid", 2), ("test", 2)):
        with h5py.File(src / f"shard_{split}.h5", "w") as f:
            g = f.create_group(split)
            for k in ("u", "vx", "vy"):
                g.create_dataset(
                    k, data=rng.standard_normal((n, 5, 8, 8)).astype(np.float32)
                )

    pre = _ref_module("data_generation/preprocess.py")
    ref_out = tmp_path / "ref_out"
    pre.preprocess_ns2d(load_path=str(src), save_path=str(ref_out))

    from dpot_tpu.data.converters import convert_pdearena_ns2d

    my_out = tmp_path / "my_out"
    n_tr, n_te = convert_pdearena_ns2d(str(src), str(my_out))
    assert n_tr == 5 and n_te == 2

    for split in ("train", "test"):
        ref_files = sorted(os.listdir(ref_out / split))
        my_files = sorted(os.listdir(my_out / split))
        assert my_files == ref_files
        # os.walk file order is fs-dependent: compare as multisets of arrays
        def load_all(base, files):
            out = []
            for fn in files:
                with h5py.File(os.path.join(base, fn)) as f:
                    out.append(f["data"][:])
            return out

        want = load_all(ref_out / split, ref_files)
        got = load_all(my_out / split, my_files)
        for g in got:
            assert any(
                g.shape == w.shape and np.allclose(g, w) for w in want
            ), "converted trajectory not found in reference output"


def test_superbench_matches_reference(tmp_path):
    """convert_superbench vs the reference superbench preprocess (window
    slicing incl. tail flush + same-shape concat)."""
    rng = np.random.default_rng(2)
    src = tmp_path / "superbench_v1"
    # folder A: two same-shape files -> concatenated; T=15 w/ window 6,
    # stride 3 -> strided windows + tail flush
    os.makedirs(src / "nskt16000")
    for name in ("a.h5", "b.h5"):
        with h5py.File(src / "nskt16000" / name, "w") as f:
            f.create_dataset(
                "w", data=rng.standard_normal((8, 2, 6, 6)).astype(np.float32)
            )
    # folder B: a single file with a non-multiple length
    os.makedirs(src / "cosmo")
    with h5py.File(src / "cosmo" / "c.h5", "w") as f:
        f.create_dataset(
            "d", data=rng.standard_normal((11, 1, 4, 4)).astype(np.float32)
        )

    pre = _ref_module("data_generation/superbench/preprocess.py")
    pre.TIME_STEPS = 6  # scale the window down for the synthetic corpus
    ref_out = tmp_path / "ref_out"
    os.makedirs(ref_out / "nskt16000")
    os.makedirs(ref_out / "cosmo")
    tmp = str(tmp_path / "tmp.hdf5")
    pre.concat_datasets(
        [str(src / "nskt16000" / "a.h5"), str(src / "nskt16000" / "b.h5")], tmp
    )
    pre.slice_and_permute(tmp, str(ref_out / "nskt16000" / "a_b.hdf5"))
    pre.slice_and_permute(
        str(src / "cosmo" / "c.h5"), str(ref_out / "cosmo" / "c.hdf5")
    )

    from dpot_tpu.data.converters import convert_superbench

    my_out = tmp_path / "my_out"
    written = convert_superbench(str(src), str(my_out), time_steps=6)
    assert len(written) == 2

    for rel in ("nskt16000/a_b.hdf5", "cosmo/c.hdf5"):
        with h5py.File(ref_out / rel) as fr, h5py.File(my_out / rel) as fm:
            np.testing.assert_allclose(fm["data"][:], fr["data"][:])
