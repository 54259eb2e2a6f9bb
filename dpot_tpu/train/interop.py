"""PyTorch checkpoint interop: reference/HF .pth state dicts -> dpot_tpu params.

Converts the released DPOT weights (https://huggingface.co/hzk17/DPOT,
reference README.md:28-31) and any reference-format state dict
(torch.save({'args','model','optimizer'}, ...), train_temporal.py:287) into
this framework's flax param trees:

- 'module.' DDP prefixes stripped (reference utilities.py:99-109),
- conv kernels OIHW -> HWIO, linear weights (out,in) -> (in,out),
- ConvTranspose2d (in,out,kh,kw) -> flax (kh,kw,in,out) with spatial flip
  (flax ConvTranspose cross-correlates the kernel; torch's transposed conv
  applies it un-flipped — verified by tests/test_interop.py),
- pos_embed NCHW -> NHWC,
- AFNO w1/b1/w2/b2 copied as-is (layouts match by construction),
- pos-embed resolution adaptation via bilinear resize
  (port of models/dpot.py:424-441 resize_pos_embed),
- 2D -> 3D component inflation (utilities.py:170-207) — trivial here
  because 1x1 convs are Dense layers with identical shapes in 2D and 3D.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

from dpot_tpu.data.resize import resize_linear_nd


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def strip_module_prefix(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Strip the DDP 'module.' prefix PER KEY — a mixed dict (some keys
    unprefixed) must not have 7 chars sliced off its clean keys, and an
    empty dict is a plain empty dict, not a StopIteration."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _linear(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (O, I, kh, kw) or (O, I, k, k, k)
    nd = w.ndim - 2
    kernel = np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))  # HWIO
    out = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv_transpose(sd, prefix):
    """torch ConvTranspose2d -> flax nn.ConvTranspose kernel (spatial flip
    + (k..., I, O)); used for models that keep the flax module (UNet)."""
    w = _np(sd[f"{prefix}.weight"])  # (I, O, kh, kw[, kz])
    nd = w.ndim - 2
    w = np.flip(w, axis=tuple(range(2, 2 + nd)))
    kernel = np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))
    out = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _unpatch(sd, prefix):
    """torch ConvTranspose2d(k=p, s=p) -> UnpatchConv kernel (p,p,D,O):
    K[i,j,d,o] = W_t[d,o,i,j], NO spatial flip (for stride==kernel the
    transposed conv scatters weight[r] to output offset r directly)."""
    w = _np(sd[f"{prefix}.weight"])  # (D, O, p, p)
    kernel = np.transpose(w, (2, 3, 0, 1))
    out = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _dense_from_1x1(sd, prefix):
    """torch 1x..x1 ConvNd (O, I, 1...) -> Dense kernel (I, O); works for
    any number of trailing singleton spatial dims."""
    w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


# the N-d and 2-d cases are the same reshape
_dense_from_1x1_nd = _dense_from_1x1


def _afno_trunk_blocks(sd, depth, mlp=_dense_from_1x1):
    """blocks_{i} subtrees shared by every AFNO-trunk family (DPOT 2D/3D,
    CDPOT): GroupNorm pair + filter w1..b2 + pointwise-conv MLP."""
    out = {}
    for i in range(depth):
        b = f"blocks.{i}"
        out[f"blocks_{i}"] = {
            "norm1": _groupnorm(sd, f"{b}.norm1"),
            "norm2": _groupnorm(sd, f"{b}.norm2"),
            "filter": {
                k: _np(sd[f"{b}.filter.{k}"]) for k in ("w1", "b1", "w2", "b2")
            },
            "mlp_fc1": mlp(sd, f"{b}.mlp.0"),
            "mlp_fc2": mlp(sd, f"{b}.mlp.2"),
        }
    return out


def _cls_head(sd):
    return {
        f"cls_head_{j}": _linear(sd, f"cls_head.{src}")
        for j, src in enumerate([0, 2, 4])
        if f"cls_head.{src}.weight" in sd
    }


def _time_agg(sd):
    ta = {"w": _np(sd["time_agg_layer.w"])}
    if "time_agg_layer.gamma" in sd:
        ta["gamma"] = _np(sd["time_agg_layer.gamma"])
    return ta


def _groupnorm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def resize_pos_embed_nhwc(pos: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear pos-embed resolution adaptation (port of reference
    resize_pos_embed, models/dpot.py:424-441, on NHWC)."""
    if pos.shape[1] == h and pos.shape[2] == w:
        return pos
    return resize_linear_nd(pos[0], (h, w))[None]


def dpot_params_from_torch(
    sd: Mapping[str, Any],
    depth: int,
    normalize: bool = False,
    latent_size: tuple[int, int] | None = None,
) -> dict:
    """Reference DPOTNet state dict -> dpot_tpu DPOTNet params['params']."""
    sd = strip_module_prefix(sd)
    p: dict[str, Any] = {}

    p["patch_embed"] = {
        "proj1": _conv(sd, "patch_embed.proj.0"),
        "proj2": _dense_from_1x1(sd, "patch_embed.proj.2"),
    }
    pos = _np(sd["pos_embed"])  # (1, D, h, w)
    pos = np.transpose(pos, (0, 2, 3, 1))
    if latent_size is not None:
        pos = resize_pos_embed_nhwc(pos, *latent_size)
    p["pos_embed"] = pos

    p["time_agg"] = _time_agg(sd)

    if normalize and "scale_feats_mu.weight" in sd:
        p["scale_feats_mu"] = _linear(sd, "scale_feats_mu")
        p["scale_feats_sigma"] = _linear(sd, "scale_feats_sigma")

    p.update(_afno_trunk_blocks(sd, depth))
    p.update(_cls_head(sd))

    p["out_deconv"] = _unpatch(sd, "out_layer.0")
    p["out_conv1"] = _dense_from_1x1(sd, "out_layer.2")
    p["out_conv2"] = _dense_from_1x1(sd, "out_layer.4")

    return {"params": p}


def _unpatch3d(sd, prefix):
    """torch ConvTranspose3d(k=p, s=p) -> UnpatchConv3D kernel (p,p,p,D,O)
    (same no-flip scatter mapping as _unpatch)."""
    w = _np(sd[f"{prefix}.weight"])  # (D, O, p, p, p)
    out = {"kernel": np.transpose(w, (2, 3, 4, 0, 1))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def dpot3d_params_from_torch(
    sd: Mapping[str, Any],
    depth: int,
    normalize: bool = False,
) -> dict:
    """Reference DPOTNet3D state dict (models/dpot3d.py:228-350) ->
    dpot_tpu DPOTNet3D params['params']; mirrors dpot_params_from_torch
    with Conv3d/ConvTranspose3d kernel layouts."""
    sd = strip_module_prefix(sd)
    p: dict[str, Any] = {}

    p["patch_embed"] = {
        "proj1": _conv(sd, "patch_embed.proj.0"),  # (p,p,p,I,O)
        "proj2": _dense_from_1x1_nd(sd, "patch_embed.proj.2"),
    }
    pos = _np(sd["pos_embed"])  # (1, D, h, w, l)
    p["pos_embed"] = np.transpose(pos, (0, 2, 3, 4, 1))

    p["time_agg"] = _time_agg(sd)

    if normalize and "scale_feats_mu.weight" in sd:
        p["scale_feats_mu"] = _linear(sd, "scale_feats_mu")
        p["scale_feats_sigma"] = _linear(sd, "scale_feats_sigma")

    p.update(_afno_trunk_blocks(sd, depth))
    p.update(_cls_head(sd))

    p["out_deconv"] = _unpatch3d(sd, "out_layer.0")
    p["out_conv1"] = _dense_from_1x1_nd(sd, "out_layer.2")
    p["out_conv2"] = _dense_from_1x1_nd(sd, "out_layer.4")

    return {"params": p}


def cdpot_params_from_torch(
    sd: Mapping[str, Any],
    depth: int,
    normalize: bool = False,
) -> dict:
    """Reference CDPOTNet state dict (models/dpot_res.py:393-603) ->
    dpot_tpu CDPOTNet params['params']. The trunk maps like DPOTNet; the
    CNO pieces add filtered-activation biases (LReLu_torch.bias — note
    `act_patching` and `proj.1` are the same module registered twice,
    models/dpot_res.py:341-349) and the CNOBlock output head."""
    sd = strip_module_prefix(sd)
    p: dict[str, Any] = {}

    p["patch_embed"] = {
        "proj1": _conv(sd, "patch_embed.proj.0"),
        "act_bias": _np(sd["patch_embed.proj.1.bias"]),
        "proj2": _conv(sd, "patch_embed.proj.2"),
    }
    pos = _np(sd["pos_embed"])  # (1, D, h, w)
    p["pos_embed"] = np.transpose(pos, (0, 2, 3, 1))

    p["time_agg"] = _time_agg(sd)

    if normalize and "scale_feats_mu.weight" in sd:
        p["scale_feats_mu"] = _linear(sd, "scale_feats_mu")
        p["scale_feats_sigma"] = _linear(sd, "scale_feats_sigma")

    p.update(_afno_trunk_blocks(sd, depth))
    p.update(_cls_head(sd))

    p["out_cno"] = {
        "convolution": _conv(sd, "out_layer.0.convolution"),
        "act_bias": _np(sd["out_layer.0.activation.bias"]),
    }
    p["out_conv1"] = _conv(sd, "out_layer.1")
    p["out_conv2"] = _conv(sd, "out_layer.3")

    return {"params": p}


def fno2d_params_from_torch(
    sd: Mapping[str, Any],
    n_layers: int,
    normalize: bool = False,
    use_ln: bool = False,
) -> dict:
    """Reference FNO2d state dict (models/fno.py:85-283) -> dpot_tpu FNO2d
    params['params']. Spectral weights are stored (2, I, O, m1, m2)
    real-stacked on both sides — a direct copy."""
    sd = strip_module_prefix(sd)
    p: dict[str, Any] = {
        "patch_embed": {
            "proj1": _conv(sd, "patch_embed.proj.0"),
            "proj2": _dense_from_1x1(sd, "patch_embed.proj.2"),
        },
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
    }
    if normalize and "scale_feats.weight" in sd:
        p["scale_feats"] = _linear(sd, "scale_feats")
    for i in range(n_layers):
        p[f"spectral_{i}"] = {
            "weights1": _np(sd[f"spectral_convs.{i}.weights1"]),
            "weights2": _np(sd[f"spectral_convs.{i}.weights2"]),
        }
        p[f"w_{i}"] = _dense_from_1x1(sd, f"convs.{i}")
        if use_ln and f"ln_layers.{i}.weight" in sd:
            p[f"ln_{i}"] = _groupnorm(sd, f"ln_layers.{i}")
    p.update(_cls_head(sd))
    return {"params": p}


def fno3d_params_from_torch(
    sd: Mapping[str, Any],
    n_layers: int,
    use_ln: bool = False,
) -> dict:
    """Reference FNO3d state dict (models/fno.py:346-435) -> dpot_tpu FNO3d
    params['params']. The reference stores torch.cfloat spectral weights;
    this framework keeps everything real on device, so they are split into
    the real-stacked (2, I, O, m1, m2, m3) layout."""
    sd = strip_module_prefix(sd)

    def _split_complex(t):
        a = _np(t)
        return np.stack([a.real, a.imag], axis=0).astype(np.float32)

    p: dict[str, Any] = {
        "fc0": _linear(sd, "fc0"),
        "fc1": _linear(sd, "fc1"),
        "fc2": _linear(sd, "fc2"),
    }
    for i in range(n_layers):
        p[f"spectral_{i}"] = {
            f"weights{k}": _split_complex(sd[f"spectral_convs.{i}.weights{k}"])
            for k in range(1, 5)
        }
        p[f"w_{i}"] = _dense_from_1x1_nd(sd, f"convs.{i}")
        if use_ln and f"ln_layers.{i}.weight" in sd:
            p[f"ln_{i}"] = _groupnorm(sd, f"ln_layers.{i}")
    return {"params": p}


def mlp_params_from_torch(sd: Mapping[str, Any], n_layers: int) -> dict:
    """Reference residual MLP state dict (models/mlp.py:14-45) ->
    dpot_tpu MLP params['params']."""
    sd = strip_module_prefix(sd)
    p: dict[str, Any] = {
        "linear_pre": _linear(sd, "linear_pre"),
        "linear_post": _linear(sd, "linear_post"),
    }
    for i in range(n_layers):
        p[f"linears_{i}"] = _linear(sd, f"linears.{i}")
    return {"params": p}


def unet_params_from_torch(sd: Mapping[str, Any]) -> dict:
    """Reference UNet state dict (models/unet.py:372-564) -> dpot_tpu UNet
    variables {'params', 'batch_stats'}.

    Torch module names: encoder{i}.enc{i}conv{j} / .enc{i}norm{j},
    bottleneck.bottleneckconv{j}, decoder{i}.dec{i}conv{j}, upconv{i},
    conv (the 1x1 head). BatchNorm running_mean/running_var map into the
    'batch_stats' collection (num_batches_tracked is unused: torch only
    reads it when momentum=None)."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def block(dst: str, tmod: str, tname: str) -> None:
        p: dict[str, Any] = {}
        s: dict[str, Any] = {}
        for j in (1, 2):
            p[f"conv{j}"] = _conv(sd, f"{tmod}.{tname}conv{j}")
            p[f"norm{j}"] = {
                "scale": _np(sd[f"{tmod}.{tname}norm{j}.weight"]),
                "bias": _np(sd[f"{tmod}.{tname}norm{j}.bias"]),
            }
            s[f"norm{j}"] = {
                "mean": _np(sd[f"{tmod}.{tname}norm{j}.running_mean"]),
                "var": _np(sd[f"{tmod}.{tname}norm{j}.running_var"]),
            }
        params[dst] = p
        stats[dst] = s

    for i in (1, 2, 3, 4):
        block(f"enc{i}", f"encoder{i}", f"enc{i}")
        block(f"dec{i}", f"decoder{i}", f"dec{i}")
        params[f"upconv{i}"] = _conv_transpose(sd, f"upconv{i}")
    block("bottleneck", "bottleneck", "bottleneck")
    params["out_conv"] = _conv(sd, "conv")
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint ({'args','model','optimizer'} or a
    bare state dict) into a plain numpy state dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj["model"] if isinstance(obj, dict) and "model" in obj else obj
    return {k: _np(v) for k, v in strip_module_prefix(sd).items()}


def inflate_2d_to_3d(
    params3d: dict,
    params2d: dict,
    components: Sequence[str] = ("blocks", "time_agg"),
) -> tuple[dict, list[str]]:
    """2D -> 3D weight inflation (reference load_3d_components_from_2d,
    utilities.py:170-207). The reference unsqueezes 1x1 conv kernels to
    1x1x1; in this framework both are Dense layers with identical shapes,
    and the AFNO w1/b1/w2/b2 layouts match, so inflation is a filtered
    copy of matching-shape leaves inside the selected components."""
    import jax

    t = jax.device_get(params3d)
    s = jax.device_get(params2d)
    tp = t["params"] if "params" in t else t
    sp = s["params"] if "params" in s else s
    copied = []
    prefixes = []
    for c in components:
        if c == "blocks":
            prefixes.append("blocks_")
        elif c == "time_agg":
            prefixes.append("time_agg")
        else:
            prefixes.append(c)
    for key in tp:
        if not any(key.startswith(pfx) for pfx in prefixes):
            continue
        if key not in sp:
            continue

        def merge(dst, src, path):
            out = {}
            for k in dst:
                if isinstance(dst[k], dict):
                    out[k] = merge(dst[k], src.get(k, {}), f"{path}/{k}")
                elif k in src and np.shape(src[k]) == np.shape(dst[k]):
                    out[k] = src[k]
                    copied.append(f"{path}/{k}")
                else:
                    out[k] = dst[k]
            return out

        tp[key] = merge(tp[key], sp[key], key)
    return t, copied
