"""Native-ops layer parity tests — the replacement for the reference's
CUDA-vs-ref test surface (torch_utils/custom_ops.py JIT infra): bias_act
table/semantics, the Pallas kernel vs composed path (interpret mode on
CPU), upfirdn2d vs an independent torch implementation of the reference
algorithm (zero-insert -> pad -> depthwise conv -> stride), and
filtered_lrelu composition."""

import os

import numpy as np
import torch
import pytest
import jax
import jax.numpy as jnp

from dpot_tpu.ops.bias_act import activation_funcs, bias_act, bias_act_ref
from dpot_tpu.ops.upfirdn2d import (
    downsample2d,
    filter2d,
    filtered_lrelu,
    setup_filter,
    upfirdn2d,
    upsample2d,
)


@pytest.mark.parametrize("act", sorted(activation_funcs))
def test_bias_act_ref_matches_torch(act):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 8, 8, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    got = np.asarray(bias_act_ref(jnp.asarray(x), jnp.asarray(b), act=act,
                                  clamp=0.5))

    t = torch.from_numpy(x) + torch.from_numpy(b)
    tf = {
        "linear": lambda z: z,
        "relu": torch.nn.functional.relu,
        "lrelu": lambda z: torch.nn.functional.leaky_relu(z, 0.2),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "elu": torch.nn.functional.elu,
        "selu": torch.nn.functional.selu,
        "softplus": torch.nn.functional.softplus,
        "swish": lambda z: torch.sigmoid(z) * z,
    }[act]
    gain = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}.get(act, 1.0)
    want = torch.clamp(tf(t) * gain, -0.5, 0.5).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_bias_act_pallas_matches_ref_interpret():
    os.environ["DPOT_PALLAS_INTERPRET"] = "1"
    try:
        from dpot_tpu.ops.pallas.bias_act_kernel import bias_act_pallas

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(128), jnp.float32)
        got = bias_act_pallas(x, b, "lrelu", None, None, 1.0)
        want = bias_act_ref(x, b, act="lrelu", clamp=1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

        # gradient path (custom_jvp tangent rule via the ref path)
        g = jax.grad(lambda x_: jnp.sum(bias_act_pallas(x_, b, "lrelu", None, None, 1.0)))(x)
        gref = jax.grad(lambda x_: jnp.sum(bias_act_ref(x_, b, act="lrelu", clamp=1.0)))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-5)
    finally:
        os.environ.pop("DPOT_PALLAS_INTERPRET", None)


def test_bias_act_second_order_golden_vs_torch():
    """2nd-order gradients through BOTH impls — the capability the
    reference CUDA op hand-writes (torch_utils/ops/bias_act.py:72-229,
    bias_act.cu:152-167). HVP of sum(swish(x+b))^2-style scalar vs torch
    double-backward; the Pallas path (interpret mode) must agree because
    its custom_jvp rule is itself differentiable."""
    os.environ["DPOT_PALLAS_INTERPRET"] = "1"
    try:
        from dpot_tpu.ops.pallas.bias_act_kernel import bias_act_pallas

        rng = np.random.default_rng(7)
        xn = rng.standard_normal((8, 128)).astype(np.float32)
        bn = rng.standard_normal(128).astype(np.float32)
        vn = rng.standard_normal((8, 128)).astype(np.float32)
        x, b, v = jnp.asarray(xn), jnp.asarray(bn), jnp.asarray(vn)

        def scalar_ref(x_):
            return jnp.sum(bias_act_ref(x_, b, act="swish", clamp=2.0) ** 2)

        def scalar_pal(x_):
            return jnp.sum(bias_act_pallas(x_, b, "swish", None, None, 2.0) ** 2)

        def hvp(f, x_, v_):
            return jax.grad(lambda z: jnp.vdot(jax.grad(f)(z), v_))(x_)

        h_ref = np.asarray(hvp(scalar_ref, x, v))
        h_pal = np.asarray(hvp(scalar_pal, x, v))
        # also forward-over-reverse (the jvp-of-vjp composition custom_vjp
        # could not support at all)
        h_for = np.asarray(jax.jvp(jax.grad(scalar_pal), (x,), (v,))[1])

        xt = torch.from_numpy(xn).requires_grad_(True)
        vt = torch.from_numpy(vn)
        gain = float(np.sqrt(2))
        yt = torch.clamp(
            torch.nn.functional.silu(xt + torch.from_numpy(bn)) * gain,
            -2.0, 2.0,
        )
        st = (yt**2).sum()
        (gt,) = torch.autograd.grad(st, xt, create_graph=True)
        (ht,) = torch.autograd.grad((gt * vt).sum(), xt)
        want = ht.detach().numpy()

        np.testing.assert_allclose(h_ref, want, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(h_pal, want, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(h_for, want, atol=1e-4, rtol=1e-4)

        # grad wrt the BIAS at second order too (db d(dx) cross term)
        def scalar_b_pal(b_):
            return jnp.sum(bias_act_pallas(x, b_, "swish", None, None, 2.0) ** 2)

        hb_pal = np.asarray(
            jax.grad(lambda z: jnp.vdot(jax.grad(scalar_b_pal)(z),
                                        jnp.asarray(vn[0])))(b)
        )
        bt = torch.from_numpy(bn).requires_grad_(True)
        yt2 = torch.clamp(
            torch.nn.functional.silu(torch.from_numpy(xn) + bt) * gain,
            -2.0, 2.0,
        )
        (gbt,) = torch.autograd.grad((yt2**2).sum(), bt, create_graph=True)
        (hbt,) = torch.autograd.grad(
            (gbt * torch.from_numpy(vn[0])).sum(), bt
        )
        np.testing.assert_allclose(
            hb_pal, hbt.detach().numpy(), atol=1e-4, rtol=1e-4
        )
    finally:
        os.environ.pop("DPOT_PALLAS_INTERPRET", None)


def test_upfirdn2d_second_order_golden_vs_torch():
    """Grad-of-grad through upfirdn2d (the reference CUDA op implements
    2nd order via the transpose-filter trick, upfirdn2d.py:217-272; ours
    composes through lax.conv and must differentiate to any order).
    upfirdn2d is linear in x, so make the scalar nonlinear (sum of
    squares) and HVP against torch double-backward."""
    rng = np.random.default_rng(11)
    xn = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    vn = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    f = np.outer([1.0, 3.0, 3.0, 1.0], [1.0, 3.0, 3.0, 1.0]).astype(np.float32) / 64.0

    def scalar(x_):
        return jnp.sum(
            upfirdn2d(x_, jnp.asarray(f), up=2, down=1,
                      padding=[2, 1, 2, 1], gain=2.0) ** 2
        )

    x, v = jnp.asarray(xn), jnp.asarray(vn)
    h = np.asarray(
        jax.grad(lambda z: jnp.vdot(jax.grad(scalar)(z), v))(x)
    )

    xt = torch.from_numpy(xn).requires_grad_(True)
    # independent torch forward of the same op (NCHW conv formulation)
    def tfwd(z):
        zz = z.permute(0, 3, 1, 2)
        B, C, H, W = zz.shape
        zz = zz.reshape(B, C, H, 1, W, 1)
        zz = torch.nn.functional.pad(zz, [0, 1, 0, 0, 0, 1]).reshape(B, C, 2 * H, 2 * W)
        zz = torch.nn.functional.pad(zz, [2, 1, 2, 1])
        w = torch.from_numpy(f * 2.0).flip([0, 1])[None, None].repeat(C, 1, 1, 1)
        return torch.nn.functional.conv2d(zz, w, groups=C).permute(0, 2, 3, 1)

    st = (tfwd(xt) ** 2).sum()
    (gt,) = torch.autograd.grad(st, xt, create_graph=True)
    (ht,) = torch.autograd.grad((gt * torch.from_numpy(vn)).sum(), xt)
    np.testing.assert_allclose(h, ht.detach().numpy(), atol=1e-3, rtol=1e-4)

    # filtered_lrelu (nonlinear): just assert grad-of-grad traces and is
    # finite — the 1st-order golden above pins the math
    fu = setup_filter([1, 3, 3, 1])
    b = jnp.asarray(rng.standard_normal(2).astype(np.float32))

    def scalar_fl(x_):
        return jnp.sum(
            filtered_lrelu(x_, fu, fu, b, up=2, down=2,
                           padding=(2, 1, 2, 1), slope=0.2, clamp=2.0) ** 2
        )

    h2 = jax.grad(lambda z: jnp.vdot(jax.grad(scalar_fl)(z), v))(x)
    assert np.isfinite(np.asarray(h2)).all()


def torch_upfirdn2d_ref(x, f, up, down, padding, flip_filter=False, gain=1.0):
    """Independent torch implementation of the reference algorithm
    (upfirdn2d.py:167-215), NCHW."""
    x = torch.from_numpy(x).permute(0, 3, 1, 2)
    B, C, H, W = x.shape
    upx = upy = up
    downx = downy = down
    padx0, padx1, pady0, pady1 = padding
    f = torch.from_numpy(np.asarray(f, np.float32))
    if f.ndim == 1:
        f = torch.outer(f, f)
    x = x.reshape(B, C, H, 1, W, 1)
    x = torch.nn.functional.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape(B, C, H * upy, W * upx)
    x = torch.nn.functional.pad(
        x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)]
    )
    x = x[:, :, max(-pady0, 0): x.shape[2] - max(-pady1, 0),
          max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f.flip([0, 1])
    w = f[None, None].repeat(C, 1, 1, 1)
    x = torch.nn.functional.conv2d(x, w, groups=C)
    x = x[:, :, ::downy, ::downx]
    return x.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)),
                                         (1, 2, (1, 1, 1, 1)), (2, 2, (2, 2, 2, 2))])
def test_upfirdn2d_matches_torch_ref(up, down, pad):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    f = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
    f2 = np.outer(f, f) / 64.0
    got = np.asarray(
        upfirdn2d(jnp.asarray(x), jnp.asarray(f2), up=up, down=down,
                  padding=list(pad), gain=2.0)
    )
    want = torch_upfirdn2d_ref(x, f2, up, down, list(pad), gain=2.0)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_upfirdn2d_separable_matches_dense():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 10, 10, 2)).astype(np.float32)
    taps = np.array([1, 2, 4, 6, 6, 4, 2, 1], np.float32)
    f_sep = jnp.asarray(taps / taps.sum())
    f_dense = jnp.outer(f_sep, f_sep)
    a = upfirdn2d(jnp.asarray(x), f_sep, up=2, padding=[4, 3, 4, 3])
    b = upfirdn2d(jnp.asarray(x), f_dense, up=2, padding=[4, 3, 4, 3])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_setup_filter_and_wrappers():
    f = setup_filter([1, 3, 3, 1])
    assert f.ndim == 2 and abs(float(jnp.sum(f)) - 1.0) < 1e-6
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 8, 8, 2)),
                    jnp.float32)
    assert filter2d(x, f).shape == (1, 8, 8, 2)
    assert upsample2d(x, f, up=2).shape == (1, 16, 16, 2)
    assert downsample2d(x, f, down=2).shape == (1, 4, 4, 2)
    # DC preservation through normalize + upsample gain
    const = jnp.ones((1, 8, 8, 1))
    up = upsample2d(const, f, up=2)
    np.testing.assert_allclose(np.asarray(up[0, 4:12, 4:12, 0]), 1.0, atol=1e-4)


def torch_filtered_lrelu_ref(x, fu, fd, b, up, down, padding, gain, slope,
                             clamp):
    """Independent torch/numpy implementation of the reference
    _filtered_lrelu_ref (filtered_lrelu.py:121-156): bias -> upfirdn2d
    with the RAW user padding -> lrelu(gain, clamp) -> upfirdn2d(down)
    with NO padding. Channels-last numpy in/out (torch_upfirdn2d_ref's
    convention)."""
    if b is not None:
        x = x + b.reshape(1, 1, 1, -1)
    x = torch_upfirdn2d_ref(x, fu, up, 1, list(padding), gain=up**2)
    x = torch.nn.functional.leaky_relu(torch.from_numpy(x), slope) * gain
    if clamp is not None:
        x = x.clamp(-clamp, clamp)
    return torch_upfirdn2d_ref(x.numpy(), fd, 1, down, [0, 0, 0, 0])


def test_filtered_lrelu_golden_vs_reference():
    """Golden vs an independent torch port of _filtered_lrelu_ref — incl.
    the shape contract (out = (in*up + px - (fu-1) - (fd-1) + down-1) //
    down): the raw user padding goes to the UP pass only; the down pass
    gets none (a centering-offset port diverged here silently)."""
    rng = np.random.default_rng(5)
    xn = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    bn = rng.standard_normal(4).astype(np.float32)
    fu = setup_filter([1, 3, 3, 1])
    fd = setup_filter([1, 3, 3, 1])
    for up, down, pad in ((2, 2, (2, 1, 2, 1)), (1, 1, (1, 1, 1, 1)),
                          (2, 1, (3, 3, 3, 3))):
        y = filtered_lrelu(
            jnp.asarray(xn), fu, fd, jnp.asarray(bn), up=up, down=down,
            padding=pad, slope=0.2, clamp=0.5,
        )
        want = torch_filtered_lrelu_ref(
            xn, np.asarray(fu), np.asarray(fd), bn, up, down, pad,
            float(np.sqrt(2)), 0.2, 0.5,
        )
        np.testing.assert_allclose(
            np.asarray(y), want, atol=1e-5,
            err_msg=f"up={up} down={down} pad={pad}",
        )
    # identity filters, no resampling == bias_act lrelu
    y2 = filtered_lrelu(jnp.asarray(xn), None, None, jnp.asarray(bn),
                        up=1, down=1, slope=0.2)
    want = bias_act(jnp.asarray(xn), jnp.asarray(bn), act="lrelu", alpha=0.2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want), atol=1e-5)
