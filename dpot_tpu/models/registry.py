"""Model registry + the reference's scale ladder presets.

Presets from reference README.md:19-25 and configs/pretrain_*.yaml:
Tiny 7M / Small 30M / Medium 122M / Large 509M / Huge 1.03B.
"""

from __future__ import annotations

from typing import Any

MODEL_PRESETS: dict[str, dict[str, Any]] = {
    "Ti": dict(embed_dim=512, mlp_ratio=1.0, depth=4, n_blocks=4, out_layer_dim=32),
    "S": dict(embed_dim=1024, mlp_ratio=1.0, depth=6, n_blocks=8, out_layer_dim=32),
    "M": dict(embed_dim=1024, mlp_ratio=4.0, depth=12, n_blocks=8, out_layer_dim=32),
    "L": dict(embed_dim=1536, mlp_ratio=4.0, depth=24, n_blocks=16, out_layer_dim=128),
    "H": dict(embed_dim=2048, mlp_ratio=3.951171875, depth=27, n_blocks=8, out_layer_dim=128),
}


def build_model(
    model: str = "DPOT",
    *,
    img_size: int = 128,
    patch_size: int = 8,
    in_channels: int = 4,
    out_channels: int | None = None,
    in_timesteps: int = 10,
    out_timesteps: int = 1,
    modes: int = 32,
    n_cls: int = 12,
    normalize: bool = False,
    act: str = "gelu",
    use_ln: int = 0,  # FNO-family GroupNorm(4) layers (reference use_ln)
    preset: str | None = None,
    dtype=None,
    remat: bool = False,
    **overrides,
):
    """Build a model by family name, mirroring the dispatch in the reference
    entry scripts (train_temporal.py:115-124)."""
    import jax.numpy as jnp

    out_channels = out_channels if out_channels is not None else in_channels
    dtype = dtype if dtype is not None else jnp.float32

    kwargs: dict[str, Any] = dict(
        img_size=img_size,
        patch_size=patch_size,
        in_channels=in_channels,
        out_channels=out_channels,
        in_timesteps=in_timesteps,
        out_timesteps=out_timesteps,
        modes=modes,
        n_cls=n_cls,
        normalize=normalize,
        act=act,
        dtype=dtype,
    )
    if preset is not None:
        kwargs.update(MODEL_PRESETS[preset])
    kwargs.update(overrides)
    # FNO-family-only knob: pop so **kwargs model families never see it
    use_ln = bool(kwargs.pop("use_ln", use_ln))

    # 'AFNO' is the legacy name for the AFNO-mixer transformer in the
    # reference's older configs (ns2d_pretrain.yaml, afno_config_single.yaml
    # say `model: AFNO`); its own dispatch (train_temporal.py:115-124) no
    # longer accepts it — here it resolves to DPOTNet so those recipes run.
    if model in ("DPOT", "dpot", "AFNO", "afno"):
        from dpot_tpu.models.dpot import DPOTNet

        return DPOTNet(remat=remat, **kwargs)
    if model in ("DPOT3D", "dpot3d"):
        from dpot_tpu.models.dpot3d import DPOTNet3D

        return DPOTNet3D(remat=remat, **kwargs)
    if model in ("FNO", "fno"):
        from dpot_tpu.models.fno import FNO2d

        return FNO2d(
            img_size=img_size,
            patch_size=patch_size,
            n_channels=in_channels,
            in_timesteps=in_timesteps,
            out_timesteps=out_timesteps,
            modes1=modes,
            modes2=modes,
            width=kwargs.get("embed_dim", 768),
            n_layers=kwargs.get("depth", 4),
            n_cls=n_cls,
            normalize=normalize,
            act=act,
            use_ln=use_ln,
            dtype=kwargs.get("dtype", dtype),
        )
    if model in ("FNO3D", "fno3d"):
        from dpot_tpu.models.fno import FNO3d

        return FNO3d(
            img_size=img_size,
            n_channels=in_channels,
            in_timesteps=in_timesteps,
            out_timesteps=out_timesteps,
            modes1=modes,
            modes2=modes,
            modes3=modes,
            width=kwargs.get("embed_dim", 768),
            n_layers=kwargs.get("depth", 4),
            n_cls=n_cls,
            normalize=normalize,
            use_ln=use_ln,
            dtype=kwargs.get("dtype", dtype),
        )
    if model in ("UNet", "unet"):
        from dpot_tpu.models.unet import UNet

        return UNet(
            in_channels=in_channels,
            out_channels=out_channels,
            out_timesteps=out_timesteps,
            width=kwargs.get("out_layer_dim", 32),
            n_cls=n_cls,
            n_dim=2,
            act=kwargs.get("act", act),
            dtype=kwargs.get("dtype", dtype),
        )
    if model in ("CDPOT", "cdpot"):
        from dpot_tpu.models.cdpot import CDPOTNet

        return CDPOTNet(remat=remat, **kwargs)
    raise ValueError(f"unknown model family {model!r}")
