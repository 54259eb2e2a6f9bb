"""Jitted train / eval steps with autoregressive rollout.

Semantics pinned to the reference train loop (train_temporal.py:179-248):
- per AR step: noise injection x += noise_scale * ||x||_(H,W,T) * eps
  (train_temporal.py:205), model forward, masked relative-L2 accumulated
  over rollout steps, prediction fed back by sliding the time window
  (train_temporal.py:219);
- backward through the whole unrolled rollout;
- global-norm grad clip -> optimizer -> per-iteration LR schedule;
- the classifier CE loss is computed for metrics but NOT added to the
  training loss (train_temporal.py:226: `total_loss = loss`).

Eval rollout (train_temporal.py:252-284 / evaluate.py:183-216) is a
`lax.scan` over t_test/T_bundle model applications.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from dpot_tpu.train.state import TrainState
from dpot_tpu.utils.criterion import cross_entropy_sum, rel_lp_loss


def wrap_pred_only(apply_fn, n_cls: int = 1):
    """Adapt a pred-only model (DPOTNet3D, FNO3d) to the (pred, cls_logits)
    step contract."""

    def fn(params, x):
        pred = apply_fn(params, x)
        return pred, jnp.zeros((x.shape[0], n_cls), jnp.float32)

    return fn


def make_train_step(
    t_bundle: int = 1,
    noise_scale: float = 0.0,
    donate: bool = True,
    time_major: bool = False,
    ones_mask: bool = False,
    grad_accum: int = 1,
    scan_steps: int = 1,
    grad_wire_dtype=None,
) -> Callable[[TrainState, dict[str, jax.Array]], tuple[TrainState, dict]]:
    """Build a jitted train step.

    batch: dict(x=(B,H,W,T_in,C), y=(B,H,W,T_ar,C), msk=(B,H,W,1,C),
    cls=(B,)). The number of rollout steps T_ar // t_bundle is static, so
    the rollout unrolls inside jit exactly like the reference's Python loop
    unrolls in autograd.

    scan_steps=K returns a MULTI-step function: it takes batch leaves with
    a leading (K,) axis (K stacked batches), lax.scan's K full train steps
    in ONE dispatch, and returns aux leaves stacked (K,). Exactly the
    same trajectory as K sequential calls; amortizes per-dispatch host
    cost, the throughput bound for small presets.

    grad_accum=N splits the batch into N microbatches and lax.scan's the
    fwd+bwd over them, summing gradients before ONE optimizer update. The
    update equals the full-batch step exactly (the loss is summed over the
    batch, so microbatch gradients ADD; grad-clip/optimizer see the same
    total gradient) while activation memory drops to 1/N — the lever for
    large effective batches at H scale, where activations, not weights,
    bound the batch size (no reference analogue; torch would need manual
    loss.backward() accumulation). Noise draws stay per-microbatch
    (stream split N ways), so noise_scale>0 trajectories differ from the
    full-batch run in the draws, not the semantics.

    time_major=True accepts x=(B,T_in,spatial...,C) / y=(B,T_ar,spatial...,C)
    — the ingest fast path's layout (time-major corpora window as one
    contiguous host copy, data/grid_dataset.py fetch_into) — and undoes
    the transpose HERE, on device, where XLA fuses it into the first
    consumer (msk stays (B,spatial...,1,C)).

    ones_mask=True declares the train masks all-ones (true for every
    train-mode dataset in the data layer; datasets advertise it via
    `train_masks_are_ones`): the batch then needs NO 'msk' entry and the
    loss runs unmasked — bit-identical result, one fewer H2D transfer
    (the mask is B*H*W*C floats of pure ones otherwise).

    grad_wire_dtype=jnp.bfloat16 rounds the param gradients to bf16 on
    the wire between bwd and the optimizer (f32 params stay the master;
    the optimizers upcast for all moment arithmetic). XLA fuses the cast
    into the grad-producing matmuls, halving the grad write + optimizer
    grad read traffic (~0.5 GB -> 0.25 GB at DPOT-M). Numerics deviation:
    one bf16 rounding of each gradient (grads are consumed exactly once;
    bf16 has ~3 decimal digits, so the update differs at ~1e-3 relative) —
    opt-in lever only, measured in the bench ladder (m8_bf16g).
    """
    import jax.numpy as _jnp

    def _round_grads(grads):
        if grad_wire_dtype is None:
            return grads
        return jax.tree.map(
            lambda g: g.astype(grad_wire_dtype)
            if hasattr(g, "dtype") and g.dtype == _jnp.float32
            else g,
            grads,
        )

    def loss_fn(params, apply_fn, batch, rng):
        x, y, cls = batch["x"], batch["y"], batch["cls"]
        msk = None if ones_mask else batch["msk"]
        # optional EXTERNAL standard-normal draws, stacked (n_steps, *x):
        # lets parity tests share the exact noise fields with a torch twin
        # (randn_like and jax.random can never agree draw-for-draw). The
        # scaling below is identical either way — only eps is substituted.
        ext_noise = batch.get("noise") if hasattr(batch, "get") else None
        if time_major:
            x = jnp.moveaxis(x, 1, -2)
            y = jnp.moveaxis(y, 1, -2)
        t_ar = y.shape[-2]
        n_steps = max(t_ar // t_bundle, 1)

        # models with running-average norms (UNet's BatchNorm) carry a
        # 'batch_stats' collection in the variables tree; train mode
        # mutates it, and the updated stats are threaded through the
        # rollout and returned via aux
        has_stats = hasattr(params, "keys") and "batch_stats" in params
        stats = params["batch_stats"] if has_stats else None

        loss = 0.0
        cls_loss = 0.0
        cls_correct = 0.0
        preds = []
        for s in range(n_steps):
            y_s = y[..., s * t_bundle : (s + 1) * t_bundle, :]
            if noise_scale > 0.0:
                rng, nrng = jax.random.split(rng)
                # per-(sample, channel) norm over all spatial+time axes
                # (train_temporal.py:205 dims (1,2,3); generalized to 3D)
                norm_axes = tuple(range(1, x.ndim - 1))
                xnorm = jnp.sqrt(
                    jnp.sum(jnp.square(x), axis=norm_axes, keepdims=True)
                )
                eps = (
                    ext_noise[s].astype(x.dtype)
                    if ext_noise is not None
                    else jax.random.normal(nrng, x.shape, x.dtype)
                )
                x = x + noise_scale * xnorm * eps
            if has_stats:
                (im, cls_pred), mut = apply_fn(
                    {**params, "batch_stats": stats}, x, train=True,
                    mutable=["batch_stats"],
                )
                stats = mut["batch_stats"]
            else:
                im, cls_pred = apply_fn(params, x)
            loss = loss + rel_lp_loss(im, y_s, msk)
            cls_loss = cls_loss + cross_entropy_sum(cls_pred, cls)
            cls_correct = cls_correct + jnp.sum(
                jnp.argmax(cls_pred, axis=-1) == cls
            )
            preds.append(im)
            x = jnp.concatenate([x[..., t_bundle:, :], im], axis=-2)

        pred_full = jnp.concatenate(preds, axis=-2) if len(preds) > 1 else preds[0]
        full_loss = rel_lp_loss(pred_full, y[..., : pred_full.shape[-2], :], msk)
        aux = {
            "loss_step": loss,
            "loss_full": full_loss,
            "cls_loss": cls_loss,
            "cls_correct": cls_correct,
            "n_steps": jnp.asarray(n_steps, jnp.float32),
        }
        if has_stats:
            aux["batch_stats"] = stats
        return loss, aux

    def _accum_grads(state, batch, step_rng):
        """lax.scan fwd+bwd over grad_accum microbatches; gradients and the
        summed aux counters ADD to exactly the full-batch values (losses
        are batch sums). One microbatch's activations live at a time."""
        n = grad_accum
        B = batch["x"].shape[0]
        assert B % n == 0, (
            f"batch {B} must divide into grad_accum={n} microbatches"
        )
        assert "noise" not in batch, (
            "external noise draws are a parity-test hook; the microbatch "
            "reshape would mangle their (n_steps, ...) leading axis"
        )
        micro = jax.tree.map(
            lambda a: a.reshape(n, B // n, *a.shape[1:]), batch
        )
        rngs = jax.random.split(step_rng, n)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        has_stats = hasattr(state.params, "keys") and "batch_stats" in state.params

        def body(carry, mb_rng):
            gsum, asum, stats = carry
            mb, r = mb_rng
            params = (
                {**state.params, "batch_stats": stats} if has_stats
                else state.working_params
            )
            (_, aux), g = grad_fn(params, state.apply_fn, mb, r)
            new_stats = aux.pop("batch_stats", stats)
            aux.pop("n_steps")
            return (
                jax.tree.map(jnp.add, gsum, g),
                jax.tree.map(jnp.add, asum, aux),
                new_stats,
            ), None

        g0 = jax.tree.map(jnp.zeros_like, state.working_params)
        a0 = {
            k: jnp.zeros((), jnp.float32)
            for k in ("loss_step", "loss_full", "cls_loss", "cls_correct")
        }
        s0 = state.params["batch_stats"] if has_stats else 0
        (grads, aux, stats), _ = jax.lax.scan(body, (g0, a0, s0), (micro, rngs))
        # n_steps is shape-static — recover it without a scan carry
        t_ar = batch["y"].shape[1] if time_major else batch["y"].shape[-2]
        aux["n_steps"] = jnp.asarray(max(t_ar // t_bundle, 1), jnp.float32)
        if has_stats:
            aux["batch_stats"] = stats
        return aux["loss_step"], aux, grads

    def step_core(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, step_rng = jax.random.split(state.rng)
        if grad_accum > 1:
            # cast AFTER the microbatch sum — the scan carry must stay f32
            # (accumulating in bf16 would compound rounding across N adds)
            loss, aux, grads = _accum_grads(state, batch, step_rng)
            grads = _round_grads(grads)
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            # working_params: the bf16 working copy when the state carries
            # one (fwd/bwd never touch the f32 master; grads arrive bf16
            # and the optimizers upcast for accumulation — train/state.py)
            (loss, aux), grads = grad_fn(
                state.working_params, state.apply_fn, batch, step_rng
            )
            grads = _round_grads(grads)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        if "batch_stats" in aux:
            # running stats are state, not weights: overwrite whatever the
            # optimizer did to those (zero-gradient) leaves with the values
            # the forward pass tracked
            new_params = {**new_state.params, "batch_stats": aux.pop("batch_stats")}
            new_state = new_state.replace(params=new_params)
        # the fused optimizers compute the pre-clip global norm in-pass
        # (AdamState.grad_norm); recompute only for foreign optimizers.
        # Search recursively: the state may be wrapped (chained transforms
        # are tuples; optax.masked nests it in MaskedState.inner_state)
        def find_grad_norm(entry):
            g = getattr(entry, "grad_norm", None)
            if g is not None:
                return g
            if isinstance(entry, tuple):  # incl. NamedTuple wrappers
                for sub in entry:
                    g = find_grad_norm(sub)
                    if g is not None:
                        return g
            return None

        gnorm = find_grad_norm(new_state.opt_state)
        if gnorm is None:
            gnorm = jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(jnp.abs(g)))
                    for g in jax.tree.leaves(grads)
                )
            )
        aux["grad_norm"] = gnorm
        return new_state, aux

    if scan_steps <= 1:
        return jax.jit(step_core, donate_argnums=(0,) if donate else ())

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_multi(state: TrainState, batches) -> tuple[TrainState, dict]:
        # K steps fused into ONE dispatch: batch leaves carry a leading
        # (scan_steps,) axis; aux leaves come back stacked (K,). Bit-for-
        # bit the same trajectory as K sequential calls (the scan body IS
        # step_core, rng threads through the carried state) — this buys
        # dispatch amortization, which is what bounds the SMALL presets
        # (Ti is host-dispatch-bound at ~5 ms/step over the tunnel).
        return jax.lax.scan(step_core, state, batches)

    return train_multi


def make_eval_rollout(
    t_bundle: int = 1,
) -> Callable[[Any, Any, dict[str, jax.Array]], dict]:
    """Build a jitted full-trajectory rollout evaluator.

    Returns summed step loss, full-trajectory loss, and the final
    prediction stack (for metric batteries). t_test is static per test
    dataset (shape-bucketed, SURVEY.md §7 hard part (e)).
    """

    @partial(jax.jit, static_argnums=(0,))
    def eval_rollout(apply_fn, params, batch) -> dict:
        x, y, msk = batch["x"], batch["y"], batch["msk"]
        t_test = y.shape[-2]
        n_steps = (t_test + t_bundle - 1) // t_bundle

        def body(carry, _):
            xc = carry
            im, _ = apply_fn(params, xc)
            # trace-time config check: a t_bundle that disagrees with the
            # model's out_timesteps otherwise surfaces as an opaque scan
            # carry-shape error
            assert im.shape[-2] == t_bundle, (
                f"eval rollout t_bundle={t_bundle} but the model emits "
                f"{im.shape[-2]} frames per application (out_timesteps)"
            )
            xn = jnp.concatenate([xc[..., t_bundle:, :], im], axis=-2)
            return xn, im

        _, ims = jax.lax.scan(body, x, None, length=n_steps)
        # ims: (n_steps, B, H, W, t_bundle, C) -> (B, H, W, n_steps*t_bundle, C)
        pred = jnp.moveaxis(ims, 0, -3).reshape(
            *x.shape[:-2], n_steps * t_bundle, x.shape[-1]
        )
        pred = pred[..., :t_test, :]

        step_loss = 0.0
        for s in range(n_steps):
            sl = slice(s * t_bundle, min((s + 1) * t_bundle, t_test))
            step_loss = step_loss + rel_lp_loss(pred[..., sl, :], y[..., sl, :], msk)
        full_loss = rel_lp_loss(pred, y, msk)
        return {"loss_step": step_loss, "loss_full": full_loss, "pred": pred}

    return eval_rollout
