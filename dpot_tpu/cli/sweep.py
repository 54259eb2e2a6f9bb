"""Sweep runner — reference trainer.py / parallel_trainer.py equivalent.

Expands the YAML `tasks:` grid (lists become grid axes, trainer.py:86-111,
README.md:76-88) and runs each job. The reference schedules jobs onto free
GPUs by polling nvidia-smi (trainer.py:19-34); TPU slices are not
dynamically partitioned by memory polling, so jobs run sequentially on the
local slice by default, or are launched as subprocesses with --parallel N
(useful on CPU / multi-host setups).

    python -m dpot_tpu.cli.sweep --config_file configs/pretrain_tiny.yaml
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def job_to_argv(job: dict) -> list[str]:
    argv = []
    for k, v in job.items():
        if k in ("script", "parallel"):
            continue
        argv.append(f"--{k}")
        if isinstance(v, (list, tuple)):
            argv.extend(str(x) for x in v)
        elif isinstance(v, bool):
            argv.append(str(v).lower())
        else:
            argv.append(str(v))
    return argv


def main(argv=None):
    sys.path.insert(0, ".")
    import yaml

    from dpot_tpu.utils.config import expand_tasks

    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--parallel", type=int, default=1,
                   help="max concurrent subprocesses (1 = in-process, sequential)")
    p.add_argument("--dry_run", action="store_true")
    ns = p.parse_args(argv)

    with open(ns.config_file) as f:
        y = yaml.safe_load(f)
    script = y.get("script", "dpot_tpu.cli.train")
    jobs = expand_tasks(y)
    print(f"{len(jobs)} job(s) expanded from {ns.config_file}")

    if ns.dry_run:
        for j in jobs:
            print(script, " ".join(job_to_argv(j)))
        return jobs

    if ns.parallel <= 1:
        from importlib import import_module

        mod = import_module(script)
        for i, j in enumerate(jobs):
            print(f"=== job {i+1}/{len(jobs)} ===")
            mod.main(job_to_argv(j))
        return jobs

    procs: list[subprocess.Popen] = []
    failed: list[tuple[str, int]] = []
    queue = list(jobs)
    while queue or procs:
        # collect finished jobs, KEEPING their exit status — a crashed
        # grid point must not vanish silently from a sweep that exits 0
        still = []
        for pr in procs:
            rc = pr.poll()
            if rc is None:
                still.append(pr)
            elif rc != 0:
                print(f"FAILED (exit {rc}): {' '.join(pr.args)}")
                failed.append((" ".join(pr.args), rc))
        procs = still
        while queue and len(procs) < ns.parallel:
            j = queue.pop(0)
            cmd = [sys.executable, "-m", script] + job_to_argv(j)
            print("launch:", " ".join(cmd))
            procs.append(subprocess.Popen(cmd))
        if procs:
            procs[0].wait()
    if failed:
        raise SystemExit(
            f"{len(failed)}/{len(jobs)} sweep jobs failed: "
            + "; ".join(f"exit {rc}: {c}" for c, rc in failed[:4])
        )
    return jobs


if __name__ == "__main__":
    main()
