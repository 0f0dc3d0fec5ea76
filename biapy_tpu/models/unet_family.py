"""The U-Net model family, as one configurable Flax module.

Reference analog: biapy/models/unet.py (U_Net), resunet.py (ResUNet),
seunet.py (SE_U_Net), resunet_se.py (ResUNet_SE), attention_unet.py
(Attention_U_Net). The five reference architectures differ only in block
choice (plain conv / residual / squeeze-excite / attention gates); here one
module parameterizes that, which is both less code and friendlier to XLA —
every variant lowers to the same fused conv graph shapes.

Contract (mirrors reference build_model -> forward):
* input: channels-last (B, y, x, C) or (B, z, y, x, C),
* output: dict with "pred" = all non-class heads concatenated channel-wise,
  optional "class" (per-pixel class head) and "embed" (contrastive
  projection); a bare tensor is returned when only "pred" exists,
* activations are NOT applied inside the model (the engine applies them,
  reference: base_workflow.apply_model_activations).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import (
    KERNEL_INIT,
    Conv,
    ConvTranspose,
    ConvBlock,
    Norm,
    ProjectionHead,
    ResConvBlock,
    UpBlock,
    aniso_kernel,
    fold3d,
    fold_depth,
    get_decoder_feature_maps,
    max_pool,
    refold4d,
    unfold5d,
)


class UNetFamily(nn.Module):
    """Configurable U-Net: variant in {'unet','resunet','seunet','resunet_se',
    'attention_unet'}."""

    variant: str = "unet"
    ndim: int = 2
    activation: str = "elu"
    feature_maps: Sequence[int] = (32, 64, 128, 256)
    drop_values: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    normalization: str = "none"
    k_size: int = 3
    upsample_layer: str = "convtranspose"
    yx_down: Sequence[int] = (2, 2, 2, 2)
    z_down: Sequence[int] = (2, 2, 2, 2)
    output_channels: Sequence[int] = (1,)
    output_channel_info: Sequence[str] = ("F",)
    separated_decoders: bool = False
    divide_decoder_feature_maps: bool = False
    upsampling_factor: Tuple[int, ...] = ()
    upsampling_position: str = "pre"
    isotropy: Sequence[bool] = (True,)
    larger_io: bool = True
    conv_layers: Sequence[int] = (2, 2, 2, 2, 2)
    contrast: bool = False
    contrast_proj_dim: int = 256
    conv_block_order: str = "conv_norm_act"

    def _enc_block(self, feats: int, k, drop: float, nconvs: int, first: bool):
        se = self.variant in ("seunet", "resunet_se")
        if self.variant in ("resunet", "resunet_se"):
            # ResUNet_SE adds a pre-activated extra conv before each residual
            # block (reference: resunet_se.py:76, extra_conv=True default).
            return ResConvBlock(
                feats, k, act=self.activation, norm=self.normalization, dropout=drop,
                first_block=first, se_block=se, extra_conv=(self.variant == "resunet_se"),
                nconvs=nconvs, order=self.conv_block_order,
            )
        return ConvBlock(
            feats, k, act=self.activation, norm=self.normalization, dropout=drop,
            se_block=se, nconvs=nconvs, order=self.conv_block_order,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        from biapy_tpu.ops.conv3d import fold3d_enabled

        if self.ndim == 3 and x.ndim == 5 and fold3d_enabled():
            # z-folded mode: the whole network runs on (b*z, y, x, c)
            # activations (blocks.py fold3d) — one 4D layout end-to-end
            # instead of 5D<->4D round trips around every conv. Parameter
            # shapes/names are identical; outputs are unfolded at exit.
            b, d = x.shape[0], x.shape[1]
            with fold3d(b):
                out = self._body(x.reshape((b * d,) + x.shape[2:]), train)
            # branches that internally unfolded (e.g. the contrast head's
            # broadcast dropout) already return 5D tensors
            unfold = lambda t: (t.reshape((b, d) + t.shape[1:])
                                if t.ndim == 4 else t)
            if isinstance(out, dict):
                return {k: unfold(v) for k, v in out.items()}
            return unfold(out)
        return self._body(x, train)

    def _body(self, x, train: bool = False):
        depth = len(self.feature_maps) - 1
        iso = list(self.isotropy)
        if len(iso) == 1:
            iso = iso * len(self.feature_maps)
        residual = self.variant in ("resunet", "resunet_se")
        se = self.variant in ("seunet", "resunet_se")
        attn = self.variant == "attention_unet"

        # Super-resolution pre-upsampling (reference: unet.py pre_upsampling).
        if self.upsampling_factor and self.upsampling_position == "pre":
            x = ConvTranspose(
                x.shape[-1], kernel_size=self.upsampling_factor,
                strides=self.upsampling_factor, kernel_init=KERNEL_INIT,
            )(x)

        # Extra larger-kernel input conv.
        if self.larger_io:
            k_in = aniso_kernel(self.k_size + 2, self.ndim, iso[0])
            x = ConvBlock(
                self.feature_maps[0], k_in, act=self.activation,
                norm=self.normalization, order=self.conv_block_order,
            )(x, train)

        # Encoder
        skips = []
        for i in range(depth):
            k = aniso_kernel(self.k_size, self.ndim, iso[i])
            x = self._enc_block(
                self.feature_maps[i], k, self.drop_values[i], self.conv_layers[i],
                first=(i == 0),
            )(x, train)
            skips.append(x)
            window = (
                (self.z_down[i], self.yx_down[i], self.yx_down[i])
                if self.ndim == 3
                else (self.yx_down[i], self.yx_down[i])
            )
            x = max_pool(x, window)

        # Bottleneck
        k = aniso_kernel(self.k_size, self.ndim, iso[-1])
        x_bot = self._enc_block(
            self.feature_maps[-1], k, self.drop_values[-1], self.conv_layers[-1], first=False
        )(x, train)

        # Decoder(s)
        num_decoders = len(self.output_channels) if self.separated_decoders else 1
        dec_fm = get_decoder_feature_maps(self.feature_maps, num_decoders, self.divide_decoder_feature_maps)
        feats = []
        for j in range(num_decoders):
            h = x_bot
            for i in range(depth - 1, -1, -1):
                k = aniso_kernel(self.k_size, self.ndim, iso[i])
                scale = (
                    (self.z_down[i], self.yx_down[i], self.yx_down[i])
                    if self.ndim == 3
                    else (self.yx_down[i], self.yx_down[i])
                )
                h = UpBlock(
                    dec_fm[i], scale, k, up_mode=self.upsample_layer,
                    act=self.activation, norm=self.normalization,
                    dropout=self.drop_values[i], attention_gate=attn,
                    se_block=se, residual=residual,
                    extra_conv=(self.variant == "resunet_se"),
                    nconvs=self.conv_layers[i], order=self.conv_block_order,
                )(h, skips[i], train)
            if self.larger_io:
                k_out = aniso_kernel(self.k_size + 2, self.ndim, iso[0])
                h = ConvBlock(
                    dec_fm[0], k_out, act=self.activation,
                    norm=self.normalization, order=self.conv_block_order,
                )(h, train)
            feats.append(h)

        # Super-resolution post-upsampling (applied to every decoder's features;
        # the reference only ever combines SR with a single decoder).
        if self.upsampling_factor and self.upsampling_position == "post":
            for j in range(num_decoders):
                feats[j] = ConvTranspose(
                    dec_fm[0], kernel_size=self.upsampling_factor,
                    strides=self.upsampling_factor, kernel_init=KERNEL_INIT,
                )(feats[j])

        one = (1,) * self.ndim
        out = {}
        if self.contrast:
            feat0 = feats[0]
            if fold_depth() is not None and feat0.ndim == 4:
                # the broadcast dropout below needs per-sample z/y/x dims
                feat0 = unfold5d(feat0, fold_depth(feat0))
            h = Conv(dec_fm[0], kernel_size=aniso_kernel(3, self.ndim, True), padding="SAME",
                        kernel_init=KERNEL_INIT)(feat0)
            h = Norm(self.normalization)(h, train)
            h = nn.Dropout(0.10, deterministic=not train,
                           broadcast_dims=tuple(range(1, 1 + self.ndim)))(h)
            out["pred"] = Conv(self.output_channels[0], kernel_size=one, use_bias=False,
                                  kernel_init=KERNEL_INIT)(h)
            out["embed"] = ProjectionHead(self.contrast_proj_dim)(feat0, train)
        else:
            preds, class_outs = [], []
            for i, out_ch in enumerate(self.output_channels):
                feat = feats[i] if num_decoders > 1 else feats[0]
                head = Conv(out_ch, kernel_size=one, kernel_init=KERNEL_INIT)(feat)
                if "class" in self.output_channel_info[i]:
                    class_outs.append(head)
                else:
                    preds.append(head)
            out["pred"] = jnp.concatenate(preds, axis=-1)
            if class_outs:
                out["class"] = jnp.concatenate(class_outs, axis=-1)

        if len(out) == 1:
            return out["pred"]
        return out


def network_stride(ndim: int) -> List[int]:
    """U-Nets reconstruct full resolution (reference: models/__init__.py:181)."""
    return [1] * ndim
