"""Trajectory-level TRAINING-DYNAMICS parity vs the reference trainer.

Forward parity (test_interop.py) pins the model; this pins the full
training composition — model fwd/bwd, SimpleLpLoss over the AR rollout,
grad clip, the reference's hand-rolled Adam/Lamb, OneCycleLR (lr AND its
cycle_momentum beta1 trajectory) — by converting a random-init reference
DPOT, training BOTH sides for 50 steps on identical batch sequences
(f32, noise off), and asserting the loss curves agree.

The reference loop semantics come from train_temporal.py:189-230 (AR
rollout loss accumulation, backward through the unrolled rollout,
clip_grad_norm_, per-iteration scheduler step), re-run here in torch
directly on fixed numpy batches: feeding both trainers one pre-generated
batch sequence removes DataLoader shuffle-order nondeterminism, which is
the only part of the reference loop NOT exercised (the loader itself is
pinned by test_data.py).
"""

import copy
import importlib.util
import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)

# small-but-real DPOT: 2 blocks, AR rollout of 2 steps per batch
MODEL_KW = dict(
    img_size=32, patch_size=4, in_channels=2, out_channels=2,
    in_timesteps=6, out_timesteps=1, n_blocks=4, embed_dim=32,
    out_layer_dim=16, depth=2, modes=8, mlp_ratio=1.0, n_cls=3,
    normalize=False,
)
N_STEPS = 50
STEPS_PER_EPOCH, EPOCHS, WARMUP = 10, 5, 1
LR, GRAD_CLIP, T_BUNDLE = 1e-3, 1.0, 1


def _load_ref(rel):
    spec = importlib.util.spec_from_file_location(
        "ref_" + rel.replace("/", "_")[:-3], os.path.join(REF, rel)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _batches(n, B=4, seed=0, rand_cls=False, shared_noise=False, res=32):
    """Fixed batch sequence: smooth random trajectories, x=first 6 frames,
    y=next 2 (T_ar=2 exercises the rollout feed-back path).

    shared_noise=True attaches pre-drawn standard-normal fields, one per
    AR rollout step, that BOTH trainers inject (torch randn_like and
    jax.random can never agree draw-for-draw, so the stochastic branch is
    pinned under a shared draw — train/step.py batch['noise'] hook).
    rand_cls=True gives each sample a random dataset label so the cls
    bookkeeping path (CE computed, argmax accuracy, NOT in the training
    loss — train_temporal.py:210-226) does real work."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        # temporally-persistent smooth fields: copying the last input frame
        # is a good predictor, so 50 steps of training visibly move the
        # loss (a pure-noise target would leave both curves flat at the
        # trivial minimum and the comparison toothless)
        base = rng.standard_normal((B, res // 4, res // 4, 1, 2)).astype(
            np.float32
        )
        traj = np.repeat(np.repeat(np.repeat(base, 4, axis=1), 4, axis=2),
                         8, axis=3)  # smooth res^2, constant in time
        traj += 0.05 * rng.standard_normal(
            (B, res, res, 8, 2)
        ).astype(np.float32)
        b = {
            "x": traj[..., :6, :],
            "y": traj[..., 6:8, :],
            "msk": np.ones((B, res, res, 1, 2), np.float32),
            "cls": (
                rng.integers(0, MODEL_KW["n_cls"], size=(B,))
                if rand_cls else np.zeros((B,))
            ).astype(np.int64),
        }
        if shared_noise:
            b["noise"] = rng.standard_normal(
                (2, B, res, res, 6, 2)
            ).astype(np.float32)  # one draw per AR step (T_ar=2)
        out.append(b)
    return out


def _run_reference(opt_name, batches, model_kw=MODEL_KW, noise_scale=0.0):
    """train_temporal.py:189-230 semantics in torch-CPU. noise_scale>0
    reproduces line 205 exactly (per-(sample,channel) L2 over dims
    (1,2,3), keepdim, gaussian) with the batch's shared draw substituted
    for randn_like."""
    ref_dpot = _load_ref("models/dpot.py")
    ref_opt = _load_ref("utils/optimizer.py")
    ref_crit = _load_ref("utils/criterion.py")

    torch.manual_seed(0)
    model = ref_dpot.DPOTNet(**model_kw)
    sd0 = copy.deepcopy(model.state_dict())
    myloss = ref_crit.SimpleLpLoss(size_average=False)
    clsloss = torch.nn.CrossEntropyLoss(reduction="sum")
    if opt_name == "lamb":
        opt = ref_opt.Lamb(
            model.parameters(), lr=LR, betas=(0.9, 0.999), adam=True,
            debias=False, weight_decay=1e-4,
        )
    else:
        opt = ref_opt.Adam(
            model.parameters(), lr=LR, betas=(0.9, 0.999), weight_decay=1e-6
        )
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, div_factor=1e4, final_div_factor=1e4,
        pct_start=WARMUP / EPOCHS, steps_per_epoch=STEPS_PER_EPOCH,
        epochs=EPOCHS,
    )
    losses, cls_losses = [], []
    for b in batches:
        xx = torch.from_numpy(b["x"])
        yy = torch.from_numpy(b["y"])
        msk = torch.from_numpy(b["msk"])
        cls = torch.from_numpy(b["cls"])
        loss = 0.0
        cls_loss = 0.0
        for s, t in enumerate(range(0, yy.shape[-2], T_BUNDLE)):
            y = yy[..., t : t + T_BUNDLE, :]
            if noise_scale > 0.0:
                eps = torch.from_numpy(b["noise"][s])
                xx = xx + noise_scale * torch.sum(
                    xx**2, dim=(1, 2, 3), keepdim=True
                ) ** 0.5 * eps
            im, cls_pred = model(xx)
            loss = loss + myloss(im, y, mask=msk)
            # computed for metrics, NOT added to the training loss
            # (train_temporal.py:226: total_loss = loss  # + 1.0*cls_loss)
            cls_loss = cls_loss + clsloss(cls_pred, cls.squeeze())
            xx = torch.cat((xx[..., T_BUNDLE:, :], im), dim=-2)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), GRAD_CLIP)
        opt.step()
        sched.step()
        losses.append(float(loss.item()))
        cls_losses.append(float(cls_loss.item()))
    return sd0, np.array(losses), np.array(cls_losses)


def _run_ours(opt_name, sd0, batches, model_kw=MODEL_KW, noise_scale=0.0):
    from dpot_tpu.models.dpot import DPOTNet
    from dpot_tpu.train.interop import dpot_params_from_torch
    from dpot_tpu.train.optimizers import build_optimizer
    from dpot_tpu.train.schedules import build_schedule, onecycle_momentum
    from dpot_tpu.train.state import TrainState
    from dpot_tpu.train.step import make_train_step

    model = DPOTNet(**model_kw)
    params = jax.tree.map(
        jnp.asarray,
        dpot_params_from_torch(
            sd0,
            depth=model_kw["depth"],
            normalize=model_kw.get("normalize", False),
        ),
    )
    total = STEPS_PER_EPOCH * EPOCHS
    sched = build_schedule(
        "cycle", LR, STEPS_PER_EPOCH, EPOCHS, warmup_epochs=WARMUP
    )
    beta1 = onecycle_momentum(total, WARMUP, EPOCHS)
    tx = build_optimizer(
        opt_name, sched, beta1, 0.999, grad_clip=GRAD_CLIP
    )
    state = TrainState.create(model.apply, params, tx, jax.random.key(0))
    step = make_train_step(
        t_bundle=T_BUNDLE, noise_scale=noise_scale, donate=False
    )
    losses, cls_losses = [], []
    for b in batches:
        jb = {
            "x": jnp.asarray(b["x"]),
            "y": jnp.asarray(b["y"]),
            "msk": jnp.asarray(b["msk"]),
            "cls": jnp.asarray(b["cls"], jnp.int32),
        }
        if noise_scale > 0.0:
            jb["noise"] = jnp.asarray(b["noise"])  # the shared draw
        state, aux = step(state, jb)
        losses.append(float(aux["loss_step"]))
        cls_losses.append(float(aux["cls_loss"]))
    return np.array(losses), np.array(cls_losses)


def _compare(name, ref_losses, our_losses, tol):
    rel = np.abs(our_losses - ref_losses) / np.abs(ref_losses)
    print(
        f"\n{name}: step0 ref={ref_losses[0]:.6f} ours={our_losses[0]:.6f}"
        f" | step{len(ref_losses)-1} ref={ref_losses[-1]:.6f} "
        f"ours={our_losses[-1]:.6f} | max rel dev {rel.max():.2e} "
        f"(final {rel[-1]:.2e})"
    )
    # training must actually move (the curves can't agree by standing still)
    assert ref_losses[-1] < 0.8 * ref_losses[0], ref_losses
    assert rel.max() < tol, rel
    return rel


@pytest.mark.parametrize("opt_name", ["adam", "lamb"])
def test_training_dynamics_match_reference(opt_name):
    batches = _batches(N_STEPS)
    sd0, ref_losses, _ = _run_reference(opt_name, batches)
    our_losses, _ = _run_ours(opt_name, sd0, batches)
    # measured on CPU: max rel dev 3.8e-6 (adam) / 5.9e-7 (lamb) over all
    # 50 steps — the dynamics are numerically faithful, not just close.
    # 1e-4 leaves room for BLAS/platform variation while still failing on
    # any real semantic drift (a constant-0.9 beta1 alone measures 2.4e-2)
    _compare(opt_name, ref_losses, our_losses, 1e-4)


def test_training_dynamics_noise_injection():
    """The stochastic branch (train_temporal.py:205): gaussian noise scaled
    by the per-(sample,channel) input norm, injected EVERY rollout step and
    carried into the slid window. Pinned under a shared pre-drawn noise
    field on both sides (deterministic once the draw is shared)."""
    batches = _batches(N_STEPS, shared_noise=True)
    sd0, ref_losses, _ = _run_reference("adam", batches, noise_scale=5e-3)
    our_losses, _ = _run_ours("adam", sd0, batches, noise_scale=5e-3)
    _compare("adam+noise", ref_losses, our_losses, 1e-4)


def test_training_dynamics_normalize_adain():
    """The normalize=True branch: reversible instance norm on the input +
    AdaIN feature modulation (models/dpot.py:298-300,366-371,386-387,
    400-401) — trains scale_feats_mu/sigma, a parameter subtree the
    default-config test never touches."""
    kw = dict(MODEL_KW, normalize=True)
    batches = _batches(N_STEPS)
    sd0, ref_losses, _ = _run_reference("adam", batches, model_kw=kw)
    our_losses, _ = _run_ours("adam", sd0, batches, model_kw=kw)
    _compare("adam+normalize", ref_losses, our_losses, 1e-4)


@pytest.mark.slow
def test_training_dynamics_larger_scale():
    """The same 50-step lamb trajectory at reference trunk geometry: the
    pretrain presets all run a 16^2 latent (res 128 / patch 8,
    configs/pretrain_*.yaml); this test hits that latent via 64^2/patch 4
    with embed 64, depth 4, 8 AFNO blocks, modes 16, mlp_ratio 2 — ~10x
    the parameter count of the default config above, so block-count/
    depth/mode-truncation arithmetic is pinned at scale, not just at the
    toy shape."""
    kw = dict(
        MODEL_KW, img_size=64, embed_dim=64, depth=4, n_blocks=8,
        modes=16, mlp_ratio=2.0, out_layer_dim=32,
    )
    batches = _batches(N_STEPS, res=64)
    sd0, ref_losses, _ = _run_reference("lamb", batches, model_kw=kw)
    our_losses, _ = _run_ours("lamb", sd0, batches, model_kw=kw)
    _compare("lamb+larger", ref_losses, our_losses, 1e-4)


def test_training_dynamics_cls_bookkeeping():
    """The classifier side-channel (train_temporal.py:210-226): CE loss is
    computed per rollout step with reduction='sum' but NOT added to the
    training loss. With random labels, the main-loss curves can only agree
    if neither side trains on cls_loss, and the cls_loss curves can only
    agree if the (untrained-by-it) cls head evolves identically under the
    main objective."""
    batches = _batches(N_STEPS, rand_cls=True)
    sd0, ref_losses, ref_cls = _run_reference("lamb", batches)
    our_losses, our_cls = _run_ours("lamb", sd0, batches)
    _compare("lamb+cls", ref_losses, our_losses, 1e-4)
    cls_rel = np.abs(our_cls - ref_cls) / np.abs(ref_cls)
    print(f"cls_loss max rel dev {cls_rel.max():.2e}")
    assert cls_rel.max() < 1e-4, cls_rel
