"""ResUNet++.

Reference analog: biapy/models/resunet++.py (ResUNetPlusPlus:40; Jha et al.
2019). Residual encoder with SE recalibration between levels, ASPP bridge,
attention-gated residual decoder, ASPP output refinement.

Level layout matches the reference: the first encoder block is NOT pooled;
``feature_maps[i+1]`` blocks are pooled; depth = len(feature_maps) - 2.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv, ConvTranspose

from biapy_tpu.models.blocks import (
    KERNEL_INIT,
    ConvBlock,
    Norm,
    ProjectionHead,
    ResConvBlock,
    SqExBlock,
    UpBlock,
    aniso_kernel,
    get_decoder_feature_maps,
    max_pool,
)
from biapy_tpu.models.heads import ASPP, ResUNetPlusPlusAttention


class ResUNetPlusPlus(nn.Module):
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = list(self.feature_maps)
        depth = len(fm) - 2
        iso = list(self.isotropy)
        if len(iso) == 1:
            iso = iso * len(fm)
        conv_layers = list(self.conv_layers)
        if len(conv_layers) < len(fm):
            conv_layers = conv_layers + [conv_layers[-1]] * (len(fm) - len(conv_layers))
        drops = list(self.drop_values)
        if len(drops) < len(fm) + 1:
            drops = drops + [drops[-1]] * (len(fm) + 1 - len(drops))

        def pool_of(i):
            return (
                (self.z_down[i], self.yx_down[i], self.yx_down[i])
                if self.ndim == 3
                else (self.yx_down[i], self.yx_down[i])
            )

        if self.upsampling_factor and self.upsampling_position == "pre":
            x = ConvTranspose(x.shape[-1], kernel_size=self.upsampling_factor,
                                 strides=self.upsampling_factor, kernel_init=KERNEL_INIT)(x)
        if self.larger_io:
            k_in = aniso_kernel(self.k_size + 2, self.ndim, iso[0])
            x = ConvBlock(fm[0], k_in, act=self.activation, norm=self.normalization,
                          order=self.conv_block_order)(x, train)

        # Encoder (reference forward, resunet++.py:440-452): per level —
        # residual block, SE (except the last), pool (except level 0).
        # Level i's skip is the POOLED output, so skips[i] sits at 1/2^i res.
        k0 = aniso_kernel(self.k_size, self.ndim, iso[0])
        x = ResConvBlock(fm[0], k0, act=self.activation, norm=self.normalization,
                         dropout=drops[0], skip_k_size=k0, skip_norm=self.normalization,
                         first_block=True, nconvs=conv_layers[0], order=self.conv_block_order)(x, train)
        x = SqExBlock()(x)
        skips = [x]
        for i in range(1, depth + 1):
            k = aniso_kernel(self.k_size, self.ndim, iso[min(i, len(iso) - 1)])
            x = ResConvBlock(fm[i], k, act=self.activation, norm=self.normalization,
                             dropout=drops[i - 1], skip_k_size=k, skip_norm=self.normalization,
                             nconvs=conv_layers[i], order=self.conv_block_order)(x, train)
            if i < depth:
                x = SqExBlock()(x)
            x = max_pool(x, pool_of(i))
            skips.append(x)

        x_bot = ASPP(fm[-1], norm=self.normalization)(x, train)

        num_decoders = len(self.output_channels) if self.separated_decoders else 1
        dec_fm = get_decoder_feature_maps(fm, num_decoders, self.divide_decoder_feature_maps)
        feats = []
        for j in range(num_decoders):
            h = x_bot
            for i in range(depth - 1, -1, -1):
                k = aniso_kernel(self.k_size, self.ndim, iso[i])
                h = ResUNetPlusPlusAttention(h.shape[-1], pool_of(i + 1), norm=self.normalization)(
                    skips[i], h, train
                )
                h = UpBlock(dec_fm[i + 1], pool_of(i + 1), k, up_mode=self.upsample_layer,
                            act=self.activation, norm=self.normalization, dropout=drops[i + 2],
                            residual=True, skip_k_size=k, skip_norm=self.normalization,
                            nconvs=conv_layers[i + 1], order=self.conv_block_order)(h, skips[i], train)
            h = ASPP(dec_fm[0], norm=self.normalization)(h, train)
            if self.larger_io:
                k_out = aniso_kernel(self.k_size + 2, self.ndim, iso[0])
                h = ConvBlock(dec_fm[0], k_out, act=self.activation, norm=self.normalization,
                              order=self.conv_block_order)(h, train)
            feats.append(h)

        if self.upsampling_factor and self.upsampling_position == "post":
            for j in range(num_decoders):
                feats[j] = ConvTranspose(dec_fm[0], kernel_size=self.upsampling_factor,
                                            strides=self.upsampling_factor, kernel_init=KERNEL_INIT)(feats[j])

        one = (1,) * self.ndim
        out = {}
        if self.contrast:
            h = Conv(dec_fm[0], kernel_size=aniso_kernel(3, self.ndim, True), padding="SAME",
                        kernel_init=KERNEL_INIT)(feats[0])
            h = Norm(self.normalization)(h, train)
            h = nn.Dropout(0.10, deterministic=not train)(h)
            out["pred"] = Conv(self.output_channels[0], kernel_size=one, use_bias=False,
                                  kernel_init=KERNEL_INIT)(h)
            out["embed"] = ProjectionHead(self.contrast_proj_dim)(feats[0], train)
        else:
            preds, class_outs = [], []
            for i, out_ch in enumerate(self.output_channels):
                feat = feats[i] if num_decoders > 1 else feats[0]
                head = Conv(out_ch, kernel_size=one, kernel_init=KERNEL_INIT)(feat)
                (class_outs if "class" in self.output_channel_info[i] else preds).append(head)
            out["pred"] = jnp.concatenate(preds, axis=-1)
            if class_outs:
                out["class"] = jnp.concatenate(class_outs, axis=-1)
        return out["pred"] if len(out) == 1 else out
