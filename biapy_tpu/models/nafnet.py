"""NAFNet restoration network + PatchGAN discriminator.

Reference analog: biapy/models/nafnet.py (NAFBlock:112, NAFNet:200; Chen et
al. 2022) and patchgan.py (PatchGANDiscriminator:28). Used by the GAN
denoising path (NAFNet generator + PatchGAN discriminator, dual optimizers).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv

from biapy_tpu.models.blocks import KERNEL_INIT
from biapy_tpu.models.sr_models import pixel_shuffle


def simple_gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


class NAFBlock(nn.Module):
    dw_expand: int = 2
    ffn_expand: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        dw = c * self.dw_expand
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = Conv(dw, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(h)
        h = Conv(dw, kernel_size=(3, 3), padding="SAME", feature_group_count=dw,
                    kernel_init=KERNEL_INIT)(h)
        h = simple_gate(h)
        # simplified channel attention
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = Conv(dw // 2, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(s)
        h = h * s
        h = Conv(c, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        beta = self.param("beta", nn.initializers.zeros, (c,))
        x = x + h * beta
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = Conv(self.ffn_expand * c, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(h)
        h = simple_gate(h)
        h = Conv(c, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return x + h * gamma


class NAFNet(nn.Module):
    ndim: int = 2  # NAFNet is 2D (the reference uses Conv2d only)
    img_channels: int = 1
    out_channels: int = 0  # 0 => same as img_channels
    width: int = 16
    middle_blk_num: int = 12
    enc_blk_nums: Sequence[int] = (2, 2, 4, 8)
    dec_blk_nums: Sequence[int] = (2, 2, 2, 2)
    dw_expand: int = 2
    ffn_expand: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.out_channels or self.img_channels
        h = Conv(self.width, kernel_size=(3, 3), padding="SAME", kernel_init=KERNEL_INIT)(x)
        skips = []
        chan = self.width
        for num in self.enc_blk_nums:
            for _ in range(num):
                h = NAFBlock(self.dw_expand, self.ffn_expand, self.dropout)(h, train)
            skips.append(h)
            h = Conv(2 * chan, kernel_size=(2, 2), strides=(2, 2), kernel_init=KERNEL_INIT)(h)
            chan *= 2
        for _ in range(self.middle_blk_num):
            h = NAFBlock(self.dw_expand, self.ffn_expand, self.dropout)(h, train)
        for num, skip in zip(self.dec_blk_nums, reversed(skips)):
            h = Conv(chan * 2, kernel_size=(1, 1), use_bias=False, kernel_init=KERNEL_INIT)(h)
            h = pixel_shuffle(h, 2)
            chan //= 2
            h = h + skip
            for _ in range(num):
                h = NAFBlock(self.dw_expand, self.ffn_expand, self.dropout)(h, train)
        h = Conv(out_ch, kernel_size=(3, 3), padding="SAME", kernel_init=KERNEL_INIT)(h)
        if out_ch == x.shape[-1]:
            h = h + x
        else:
            h = h + Conv(out_ch, kernel_size=(1, 1), use_bias=False, kernel_init=KERNEL_INIT)(x)
        return h


class PatchGANDiscriminator(nn.Module):
    """70x70-receptive-field patch discriminator (reference: patchgan.py:28)."""

    base_filters: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        h = x
        for i, (filters, norm) in enumerate([(f, False), (f * 2, True), (f * 4, True), (f * 8, True)]):
            h = Conv(filters, kernel_size=(4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        kernel_init=KERNEL_INIT)(h)
            if norm:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        return Conv(1, kernel_size=(4, 4), padding="SAME", kernel_init=KERNEL_INIT)(h)
