"""EfficientNet B0-B7 classifier.

Reference analog: biapy/models/efficientnet.py, which wraps torchvision's
pretrained EfficientNets. torchvision is not part of this stack, so the
architecture (MBConv with SE, compound width/depth scaling — Tan & Le 2019)
is implemented natively in Flax; pretrained weights are not bundled (gap
noted; BMZ/pretrained import is a later milestone).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv

from biapy_tpu.models.blocks import KERNEL_INIT, DropPath

# (width_mult, depth_mult, dropout)
_VARIANTS = {
    "efficientnet_b0": (1.0, 1.0, 0.2),
    "efficientnet_b1": (1.0, 1.1, 0.2),
    "efficientnet_b2": (1.1, 1.2, 0.3),
    "efficientnet_b3": (1.2, 1.4, 0.3),
    "efficientnet_b4": (1.4, 1.8, 0.4),
    "efficientnet_b5": (1.6, 2.2, 0.4),
    "efficientnet_b6": (1.8, 2.6, 0.5),
    "efficientnet_b7": (2.0, 3.1, 0.5),
}

# base B0 stages: (expand, channels, layers, stride, kernel)
_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_channels(c: float, mult: float, divisor: int = 8) -> int:
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


class MBConv(nn.Module):
    out_ch: int
    expand: int
    stride: int
    kernel: int
    sd_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        mid = in_ch * self.expand

        def bn(t):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(t)

        if self.expand != 1:
            h = Conv(mid, kernel_size=(1, 1), use_bias=False, kernel_init=KERNEL_INIT)(h)
            h = nn.silu(bn(h))
        h = Conv(mid, kernel_size=(self.kernel, self.kernel), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    kernel_init=KERNEL_INIT)(h)
        h = nn.silu(bn(h))
        # SE with ratio 0.25 of the INPUT channels
        se_ch = max(1, in_ch // 4)
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = Conv(se_ch, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(s)
        s = nn.silu(s)
        s = Conv(mid, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(s)
        h = h * nn.sigmoid(s)
        h = Conv(self.out_ch, kernel_size=(1, 1), use_bias=False, kernel_init=KERNEL_INIT)(h)
        h = bn(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = x + DropPath(self.sd_prob)(h, train)
        return h


class EfficientNet(nn.Module):
    variant: str = "efficientnet_b0"
    n_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm, dropout = _VARIANTS[self.variant]

        def bn(t):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(t)

        h = Conv(_round_channels(32, wm), kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, kernel_init=KERNEL_INIT)(x)
        h = nn.silu(bn(h))
        total_blocks = sum(int(math.ceil(l * dm)) for _, _, l, _, _ in _STAGES)
        bi = 0
        for expand, ch, layers, stride, kernel in _STAGES:
            out_ch = _round_channels(ch, wm)
            reps = int(math.ceil(layers * dm))
            for li in range(reps):
                sd = 0.2 * bi / max(total_blocks - 1, 1)
                h = MBConv(out_ch, expand, stride if li == 0 else 1, kernel, sd)(h, train)
                bi += 1
        h = Conv(_round_channels(1280, wm), kernel_size=(1, 1), use_bias=False,
                    kernel_init=KERNEL_INIT)(h)
        h = nn.silu(bn(h))
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dropout(dropout, deterministic=not train)(h)
        return {"class": nn.Dense(self.n_classes, kernel_init=KERNEL_INIT)(h)}
