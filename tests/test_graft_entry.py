"""Regression tests for the driver-facing entry points in __graft_entry__.py.

Round-1 failure mode (VERDICT.md): dryrun_multichip relied on the ambient
JAX platform and crashed on the driver's 1-chip TPU backend. These tests run
the entry points in a clean subprocess — WITHOUT the CPU/8-device forcing
that tests/conftest.py injects — so they prove the functions are
self-sufficient in the driver's environment.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env() -> dict:
    """Environment as the driver would have it: no CPU forcing from us.

    JAX_PLATFORMS is left untouched if it points at a real backend in the
    driver; here we simply drop the test-suite overrides so the subprocess
    starts from a neutral default backend.
    """
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return env


def test_dryrun_multichip_8():
    """The driver's exact call: dryrun_multichip(8) must self-force a
    CPU mesh and complete one dp step and one fsdp step."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "ok" in proc.stdout, proc.stdout


def test_dryrun_multichip_4():
    """Non-default device count exercises the mesh-factorization logic."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(4)",
        ],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "ok" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_h():
    """DPOT-H (1.03B) FSDP+remat train step on the virtual 8-device mesh."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_h(8)",
        ],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "ok" in proc.stdout, proc.stdout


def test_entry_compiles():
    """entry() must return (fn, args) that jit-compile on the default
    backend (the driver compile-checks this single-chip)."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (2, 128, 128, 1, 4), out.shape\n"
        "print('entry ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "entry ok" in proc.stdout, proc.stdout
