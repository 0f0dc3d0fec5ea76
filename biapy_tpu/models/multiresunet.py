"""MultiResUNet.

Reference analog: biapy/models/multiresunet.py (MultiResUnet:418; Ibtehaz &
Rahman 2020). Fixed 5-level topology with base widths 32·2^i, MultiRes
blocks (stacked 3-convs emulating 3/5/7 receptive fields, W split
0.167/0.333/0.5 by alpha) and ResPath skip connections of lengths 4/3/2/1.
BatchNorm throughout (the reference hard-wires BN in Conv_batchnorm).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv, ConvTranspose

from biapy_tpu.models.blocks import KERNEL_INIT, ProjectionHead, max_pool


class ConvBN(nn.Module):
    features: int
    k: int = 3
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        x = Conv(self.features, kernel_size=(self.k,) * ndim, padding="SAME",
                    kernel_init=KERNEL_INIT)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x) if self.act else x


def _split(num_filters: int, alpha: float) -> Tuple[int, int, int]:
    w = num_filters * alpha
    return int(w * 0.167), int(w * 0.333), int(w * 0.5)


class MultiResBlock(nn.Module):
    num_filters: int
    alpha: float = 1.67

    @nn.compact
    def __call__(self, x, train: bool = False):
        f3, f5, f7 = _split(self.num_filters, self.alpha)
        out_f = f3 + f5 + f7
        short = ConvBN(out_f, k=1, act=False)(x, train)
        a = ConvBN(f3)(x, train)
        b = ConvBN(f5)(a, train)
        c = ConvBN(f7)(b, train)
        h = jnp.concatenate([a, b, c], axis=-1)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)
        h = h + short
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)
        return nn.relu(h)


class ResPath(nn.Module):
    num_out: int
    length: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.length):
            short = ConvBN(self.num_out, k=1, act=False)(x, train)
            h = ConvBN(self.num_out, k=3)(x, train)
            # the reference applies one extra BN module twice around the
            # residual add (multiresunet.py Respath.forward)
            bn = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)
            h = nn.relu(bn(h))
            x = nn.relu(bn(h + short))
        return x


class MultiResUNet(nn.Module):
    ndim: int = 2
    input_channels: int = 1
    alpha: float = 1.67
    feature_maps: Sequence[int] = (32, 64, 128, 256, 512)  # informational; topology is fixed
    output_channels: Sequence[int] = (1,)
    output_channel_info: Sequence[str] = ("F",)
    z_down: Sequence[int] = (2, 2, 2, 2)
    upsampling_factor: Tuple[int, ...] = ()
    upsampling_position: str = "pre"
    contrast: bool = False
    contrast_proj_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = 32
        zd = list(self.z_down) + [2] * (4 - len(self.z_down))

        def pool_of(i):
            return (zd[i], 2, 2) if self.ndim == 3 else (2, 2)

        if self.upsampling_factor and self.upsampling_position == "pre":
            x = ConvTranspose(x.shape[-1], kernel_size=self.upsampling_factor,
                                 strides=self.upsampling_factor, kernel_init=KERNEL_INIT)(x)

        skips = []
        h = x
        for i in range(4):
            m = MultiResBlock(base * 2**i, self.alpha)(h, train)
            h = max_pool(m, pool_of(i))
            skips.append(ResPath(base * 2**i, 4 - i)(m, train))
        h = MultiResBlock(base * 16, self.alpha)(h, train)

        for i in range(3, -1, -1):
            up = ConvTranspose(base * 2**i, kernel_size=pool_of(i), strides=pool_of(i),
                                  kernel_init=KERNEL_INIT)(h)
            h = jnp.concatenate([up, skips[i]], axis=-1)
            h = MultiResBlock(base * 2**i, self.alpha)(h, train)

        if self.upsampling_factor and self.upsampling_position == "post":
            h = ConvTranspose(h.shape[-1], kernel_size=self.upsampling_factor,
                                 strides=self.upsampling_factor, kernel_init=KERNEL_INIT)(h)

        one = (1,) * self.ndim
        out: Dict = {}
        if self.contrast:
            f = Conv(h.shape[-1], kernel_size=(3,) * self.ndim, padding="SAME",
                        kernel_init=KERNEL_INIT)(h)
            f = nn.Dropout(0.10, deterministic=not train)(f)
            out["pred"] = Conv(self.output_channels[0], kernel_size=one, use_bias=False,
                                  kernel_init=KERNEL_INIT)(f)
            out["embed"] = ProjectionHead(self.contrast_proj_dim)(h, train)
        else:
            preds, class_outs = [], []
            for i, out_ch in enumerate(self.output_channels):
                head = Conv(out_ch, kernel_size=one, kernel_init=KERNEL_INIT)(h)
                (class_outs if "class" in self.output_channel_info[i] else preds).append(head)
            out["pred"] = jnp.concatenate(preds, axis=-1)
            if class_outs:
                out["class"] = jnp.concatenate(class_outs, axis=-1)
        return out["pred"] if len(out) == 1 else out
