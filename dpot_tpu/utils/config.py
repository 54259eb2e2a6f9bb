"""Config system: one dataclass, YAML load, CLI override, sweep expansion.

Replaces the reference's argparse-per-script (~40 flags,
train_temporal.py:36-87) + YAML->CLI flattening in the sweep runners
(trainer.py:40-59, grid expansion :86-111). Flag names are kept identical
to the reference so configs translate 1:1.
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import os
from typing import Any, List, Optional, Sequence


@dataclasses.dataclass
class TrainConfig:
    # model (train_temporal.py:48-60)
    model: str = "DPOT"
    width: int = 512
    n_layers: int = 4
    modes: int = 32
    patch_size: int = 8
    n_blocks: int = 4
    mlp_ratio: float = 1.0
    out_layer_dim: int = 32
    act: str = "gelu"
    normalize: bool = False
    time_agg: str = "exp_mlp"
    use_ln: int = 0  # FNO GroupNorm(4) layers (reference configs use_ln)

    # data (train_temporal.py:39-47)
    train_paths: List[str] = dataclasses.field(
        default_factory=lambda: ["ns2d_fno_1e-5"]
    )
    test_paths: List[str] = dataclasses.field(default_factory=list)
    ntrain_list: Optional[List[int]] = None
    # per-test-set sample caps (reference configs' ntest_list,
    # dpot_evaluate.yaml:41); None = each spec's full test_size
    ntest_list: Optional[List[int]] = None
    data_weights: List[int] = dataclasses.field(default_factory=lambda: [1])
    res: int = 128
    T_in: int = 10
    T_ar: int = 1
    T_bundle: int = 1
    noise_scale: float = 0.0

    # optimization (train_temporal.py:62-76)
    opt: str = "adam"
    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: Optional[float] = None
    lr_method: str = "cycle"
    # torch OneCycleLR's cycle_momentum default: under lr_method='cycle'
    # the REFERENCE trains with beta1 cycled 0.95->0.85->0.95 (OneCycleLR
    # overwrites group['betas'] each step and the reference optimizers
    # read it, utils/optimizer.py:120,287) — --beta1 is ignored there.
    # True = reference-exact; False = honor --beta1 as a constant.
    cycle_momentum: bool = True
    lr_step_size: int = 20
    step_size: int = 100
    step_gamma: float = 0.5
    warmup_epochs: int = 5
    grad_clip: float = 10000.0
    # bfloat16: store the FIRST Adam/Lamb moment in bf16 (accumulation
    # stays f32; the second moment keeps f32 — b2=0.999's 0.1%/step decay
    # is below bf16's ULP near 1, a bf16 nu would freeze). Cuts optimizer
    # state HBM 25% (-2 GB at DPOT-H) and the HBM-bound optimizer pass's
    # moment traffic. float32 = the reference-exact default.
    opt_moment_dtype: str = "float32"
    batch_size: int = 8
    # >1: fuse K optimizer steps into ONE device dispatch (lax.scan over K
    # stacked batches, train/step.py scan_steps) — same trajectory, K x
    # fewer dispatches/host round-trips. The throughput lever for
    # dispatch-bound small models (Ti/S) and remote-chip topologies.
    # Trailing partial loader batches fall back to single-step dispatches,
    # so epochs consume exactly the K=1 sample stream. Single-process,
    # mesh_spatial=1 only.
    steps_per_dispatch: int = 1
    # >1: split each batch into N microbatches, scan fwd+bwd over them and
    # apply ONE summed-gradient update — exactly the full-batch step with
    # 1/N the activation memory (train/step.py). The lever for large
    # effective batches at H scale; batch_size % grad_accum must be 0.
    grad_accum: int = 1
    epochs: int = 500

    # failure detection: rollback to the last good state when a batch
    # loss exceeds rollback_factor x the running EMA of batch losses
    # (0 disables). The reference's own check (train_temporal.py:240-245)
    # compares against a loss_previous that stays inf and is therefore
    # dead code; this is a working, statistically safer replacement.
    rollback_factor: float = 10.0
    rollback_warmup_steps: int = 20
    # snapshot cadence for the rollback state: 0 = once per epoch (end of
    # epoch), N>0 = every N steps (a mid-epoch explosion then replays at
    # most N steps), -1 = never snapshot (disables rollback). Snapshots are
    # device-side copies (no host traffic) but DOUBLE the params+opt HBM
    # residency while held; when the doubled per-device state would exceed
    # ~80% of chip memory (DPOT-H unsharded: 12.3 GB on a 16 GB chip) the
    # loop automatically falls back to host-side copies and logs it
    # (override: DPOT_SNAPSHOT_MODE=device|host).
    rollback_snapshot_steps: int = 0
    # overlap checkpoint disk writes with training (the host fetch stays
    # synchronous; an H-scale state is ~12 GB of IO per save otherwise).
    # train() fences pending writes before returning.
    async_ckpt: bool = True

    # runtime
    seed: int = 0
    num_workers: int = 8
    # loader architecture (-1 = auto). On a 1-core host the producer
    # thread's GIL/condition handoffs cost ~1.3 ms/batch, so auto picks
    # INLINE loading (prefetch=0 — jax's async dispatch already overlaps
    # the next load with device compute) plus recycled batch buffers
    # (slot_ring=2: safe under the loop's one-step-lagged metric fetch,
    # see data/loader.py). Multi-worker hosts keep the threaded loader.
    loader_prefetch: int = -1
    loader_slot_ring: int = -1
    n_channels: int = 4  # model input channels when no dataset infers them
                         # (serve CLI; training derives it from the mixture)
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    # host->device wire format for the train inputs x (auto = bfloat16
    # when the compute dtype is bfloat16): the model casts x to the
    # compute dtype at the first matmul anyway, so shipping bf16 halves
    # the per-step H2D bytes. 'bfloat16' additionally casts y (cheaper
    # wire, slightly coarser loss denominators); 'float32' forces exact.
    wire_dtype: str = "auto"  # auto | float32 | bfloat16
    remat: bool = False
    mesh_data: Optional[int] = None  # None = all devices
    mesh_spatial: int = 1
    mesh_model: int = 1  # tensor-parallel axis (parallel/tensor.py)
    mesh_pipe: int = 1  # pipeline stages over block depth (parallel/pipeline.py)
    pipe_microbatches: int = 0  # 0 = one microbatch per pipeline stage
    # parameter placement over the mesh: replicate (DP; the reference's
    # only strategy) | fsdp (params+moments over 'data') | tp (block
    # weights over 'model') | tp_fsdp (2D: both)
    shard_params: str = "replicate"

    # logging / checkpoint (train_temporal.py:78-86)
    comment: str = ""
    log_path: str = ""
    use_writer: bool = False
    # evaluate CLI: render each dataset's first sample (rollout PNG+GIF,
    # 3D volume) into this directory (utils/viz.py; "" = off)
    viz_dir: str = ""
    # resume_path: FULL-state resume for train() — params + opt state +
    # step/schedule position + PRNG stream restore from an orbax dir, and
    # the loop continues at the right epoch (the reference's resume loses
    # scheduler state, train_temporal.py:125-128). For eval/finetune/serve
    # CLIs this stays the params source (they load params-only themselves).
    resume_path: str = ""
    # init_from: params-only warm start for train() (orbax checkpoint dir);
    # opt/schedule/PRNG start fresh. Use cli.convert first for .pth files.
    init_from: str = ""
    load_components: List[str] = dataclasses.field(
        default_factory=lambda: ["blocks", "pos", "time_agg"]
    )
    save_every: int = 1
    # >0: keep one checkpoint dir per N-epoch bucket (model_{ep//N}),
    # like the reference parallel path (train_temporal_parallel.py:170-171)
    ckpt_bucket_epochs: int = 0

    def __post_init__(self):
        if isinstance(self.train_paths, str):
            self.train_paths = [self.train_paths]
        if isinstance(self.test_paths, str):
            self.test_paths = [self.test_paths]
        if not self.test_paths:
            self.test_paths = list(self.train_paths)
        if len(self.data_weights) == 1 and len(self.train_paths) > 1:
            self.data_weights = [self.data_weights[0]] * len(self.train_paths)
        assert self.opt_moment_dtype in ("float32", "bfloat16"), (
            f"opt_moment_dtype {self.opt_moment_dtype!r} must be float32 "
            "or bfloat16 (a typo would silently train with f32 moments)"
        )
        assert self.grad_accum >= 1 and self.batch_size % self.grad_accum == 0, (
            f"batch_size {self.batch_size} must divide into "
            f"grad_accum={self.grad_accum} microbatches"
        )
        assert self.steps_per_dispatch >= 1, (
            f"steps_per_dispatch must be >= 1, got {self.steps_per_dispatch}"
        )


def _parser_for(cls) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", type=str, default=None)
    # adopt --resume_path's saved model architecture as the base config
    # (utils/config.ckpt_config_base); YAML and flags still override
    p.add_argument(
        "--config_from_ckpt", type=lambda v: v.lower() in ("1", "true", "yes"),
        default=False,
    )
    for f in dataclasses.fields(cls):
        name = f"--{f.name}"
        default: Any = None  # None sentinel: "not passed on CLI"
        if f.type in ("bool", bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=default)
        elif f.type in ("List[str]", "list[str]") or "List[str]" in str(f.type):
            p.add_argument(name, type=str, nargs="+", default=default)
        elif "List[int]" in str(f.type) or "Optional[List[int]]" in str(f.type):
            p.add_argument(name, type=int, nargs="+", default=default)
        elif "int" in str(f.type):
            p.add_argument(name, type=int, default=default)
        elif "float" in str(f.type):
            p.add_argument(name, type=float, default=default)
        else:
            p.add_argument(name, type=str, default=default)
    return p


def ckpt_config_base(resume_path: str) -> dict:
    """MODEL-ARCHITECTURE fields from a checkpoint dir's params.json (the
    config the state was trained with, saved by train/checkpoint.py).
    Only architecture-defining keys are adopted — an eval/serve run wants
    the checkpoint's model shape, not its training schedule or datasets.
    The act/use_ln class of mismatch is invisible to restore_params (same
    param treedef) and silently changes predictions; adopting the saved
    values roots that out."""
    import json as _json

    cfgp = os.path.join(os.path.abspath(resume_path), "params.json")
    if not os.path.exists(cfgp):
        return {}
    with open(cfgp) as f:
        saved = _json.load(f)
    arch_keys = (
        "model", "res", "patch_size", "width", "n_layers", "n_blocks",
        "modes", "T_in", "T_bundle", "mlp_ratio", "out_layer_dim", "act",
        "use_ln", "normalize", "time_agg",
    )
    return {k: saved[k] for k in arch_keys if k in saved}


def load_config(
    argv: Optional[Sequence[str]] = None, cls=TrainConfig
):
    """checkpoint params.json (--config_from_ckpt) < YAML (--config_file)
    < CLI flags, like the reference's trainer.py flatten-YAML-to-CLI
    scheme but in one step. --config_from_ckpt true makes --resume_path's
    saved architecture the base config (eval/serve no longer have to
    re-type —width/--act... and can't mis-type them)."""
    # every CLI funnels through here — wire the opt-in persistent XLA
    # compilation cache at this shared entry so evaluate/finetune/serve/
    # sweep get it too, not just train (DPOT_COMPILE_CACHE=<dir>)
    from dpot_tpu.utils.profiling import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    p = _parser_for(cls)
    ns = p.parse_args(argv)
    base: dict[str, Any] = {}
    if getattr(ns, "config_from_ckpt", None) and ns.resume_path:
        base.update(ckpt_config_base(ns.resume_path))
    if ns.config_file:
        import yaml

        with open(ns.config_file) as f:
            y = yaml.safe_load(f)
        base.update({k: v for k, v in y.items() if k in {f.name for f in dataclasses.fields(cls)}})
    for f in dataclasses.fields(cls):
        v = getattr(ns, f.name)
        if v is not None:
            base[f.name] = v
    return cls(**base)


def expand_tasks(yaml_dict: dict) -> list[dict]:
    """Expand a sweep config: any key under 'tasks' whose value is a list
    becomes a grid axis (reference trainer.py:86-111 / README.md:76-88)."""
    tasks = yaml_dict.get("tasks", {})
    base = {k: v for k, v in yaml_dict.items() if k != "tasks"}
    grid_keys = [k for k, v in tasks.items() if isinstance(v, list)]
    fixed = {k: v for k, v in tasks.items() if not isinstance(v, list)}
    out = []
    for combo in itertools.product(*[tasks[k] for k in grid_keys]) or [()]:
        job = dict(base)
        job.update(fixed)
        job.update(dict(zip(grid_keys, combo)))
        out.append(job)
    return out
