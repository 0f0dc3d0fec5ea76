"""U-NeXt V1/V2: U-Net with ConvNeXt blocks.

Reference analog: biapy/models/unext_v1.py (U_NeXt_V1:42) and unext_v2.py
(U_NeXt_V2:42). ConvNeXt-style patchify stem (stride stem_k_size), stages of
ConvNeXt blocks with linearly-increasing stochastic depth, LayerNorm+strided
conv downsampling, decoder of (LN, transpose-conv upsample, attention-free
concat, 1-conv fuse, ConvNeXt blocks), inverted stem at the end. V2 swaps
layer-scale for GRN (ConvNeXt V2).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv, ConvTranspose

from biapy_tpu.models.blocks import (
    KERNEL_INIT,
    ConvBlock,
    ConvNeXtBlockV1,
    ConvNeXtBlockV2,
    ProjectionHead,
    aniso_kernel,
    get_decoder_feature_maps,
)


class UNeXt(nn.Module):
    version: int = 1
    ndim: int = 2
    feature_maps: Sequence[int] = (32, 64, 128, 256)
    cn_layers: Sequence[int] = (2, 2, 2, 2)
    yx_down: Sequence[int] = (2, 2, 2, 2)
    z_down: Sequence[int] = (2, 2, 2, 2)
    output_channels: Sequence[int] = (1,)
    output_channel_info: Sequence[str] = ("F",)
    separated_decoders: bool = False
    divide_decoder_feature_maps: bool = False
    upsampling_factor: Tuple[int, ...] = ()
    upsampling_position: str = "pre"
    isotropy: Sequence[bool] = (True,)
    upsample_layer: str = "convtranspose"
    stochastic_depth_prob: float = 0.1
    layer_scale: float = 1e-6
    stem_k_size: int = 2
    contrast: bool = False
    contrast_proj_dim: int = 256

    def _block(self, feats, sd_prob, k):
        if self.version == 1:
            return ConvNeXtBlockV1(feats, sd_prob=sd_prob, layer_scale=self.layer_scale, k_size=k)
        return ConvNeXtBlockV2(feats, sd_prob=sd_prob, k_size=k)

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = list(self.feature_maps)
        depth = len(fm) - 1
        iso = list(self.isotropy)
        if len(iso) == 1:
            iso = iso * len(fm)
        total_blocks = sum(self.cn_layers)
        block_id = 0

        def sd(bi):
            return self.stochastic_depth_prob * bi / max(total_blocks - 1.0, 1.0)

        if self.upsampling_factor and self.upsampling_position == "pre":
            x = ConvTranspose(x.shape[-1], kernel_size=self.upsampling_factor,
                                 strides=self.upsampling_factor, kernel_init=KERNEL_INIT)(x)

        # Patchify stem.
        z_factor = max(int(self.z_down[0] / self.stem_k_size), 1)
        stem = (
            (self.stem_k_size * z_factor, self.stem_k_size, self.stem_k_size)
            if self.ndim == 3
            else (self.stem_k_size, self.stem_k_size)
        )
        x = Conv(fm[0], kernel_size=stem, strides=stem, kernel_init=KERNEL_INIT)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)

        skips = []
        for i in range(depth):
            k = aniso_kernel(7, self.ndim, iso[i])
            for _ in range(self.cn_layers[i]):
                x = self._block(fm[i], sd(block_id), k)(x, train)
                block_id += 1
            skips.append(x)
            x = nn.LayerNorm(epsilon=1e-6)(x)
            pool = (
                (self.z_down[i], self.yx_down[i], self.yx_down[i])
                if self.ndim == 3
                else (self.yx_down[i], self.yx_down[i])
            )
            x = Conv(fm[i + 1], kernel_size=pool, strides=pool, kernel_init=KERNEL_INIT)(x)

        k = aniso_kernel(7, self.ndim, iso[-1])
        for _ in range(self.cn_layers[-1]):
            x = self._block(fm[-1], sd(block_id), k)(x, train)
            block_id += 1
        x_bot = x

        num_decoders = len(self.output_channels) if self.separated_decoders else 1
        dec_fm = get_decoder_feature_maps(fm, num_decoders, self.divide_decoder_feature_maps)
        feats = []
        for j in range(num_decoders):
            h = x_bot
            dec_block_id = block_id
            for i in range(depth - 1, -1, -1):
                k = aniso_kernel(7, self.ndim, iso[i])
                pool = (
                    (self.z_down[i], self.yx_down[i], self.yx_down[i])
                    if self.ndim == 3
                    else (self.yx_down[i], self.yx_down[i])
                )
                h = nn.LayerNorm(epsilon=1e-6)(h)
                h = ConvTranspose(dec_fm[i], kernel_size=pool, strides=pool,
                                     kernel_init=KERNEL_INIT)(h)
                h = jnp.concatenate([h, skips[i]], axis=-1)
                h = ConvBlock(dec_fm[i], 1)(h, train)
                for li in range(self.cn_layers[i]):
                    h = self._block(dec_fm[i], sd(max(dec_block_id - 1 - li, 0)), k)(h, train)
                dec_block_id -= self.cn_layers[i]
            # Inverted stem.
            h = ConvTranspose(dec_fm[0], kernel_size=stem, strides=stem, kernel_init=KERNEL_INIT)(h)
            h = nn.LayerNorm(epsilon=1e-6)(h)
            feats.append(h)

        if self.upsampling_factor and self.upsampling_position == "post":
            for j in range(num_decoders):
                feats[j] = ConvTranspose(dec_fm[0], kernel_size=self.upsampling_factor,
                                            strides=self.upsampling_factor, kernel_init=KERNEL_INIT)(feats[j])

        one = (1,) * self.ndim
        out: Dict = {}
        if self.contrast:
            f = Conv(dec_fm[0], kernel_size=aniso_kernel(3, self.ndim, True), padding="SAME",
                        kernel_init=KERNEL_INIT)(feats[0])
            f = nn.Dropout(0.10, deterministic=not train)(f)
            out["pred"] = Conv(self.output_channels[0], kernel_size=one, use_bias=False,
                                  kernel_init=KERNEL_INIT)(f)
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
