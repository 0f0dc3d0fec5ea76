"""Shared head modules: ASPP, projection head (contrastive), PSP/OCR.

Reference analog: biapy/models/heads.py (ASPP:13, ProjectionHead:~150) and
the FCN/OCR heads used by HRNet.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv

from biapy_tpu.models.blocks import KERNEL_INIT, Norm, aniso_kernel


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (DeepLabv3; reference: heads.py:13):
    three parallel dilated 3-convs (rates 6/12/18 by default) concatenated
    and fused by a 1-conv."""

    out_dims: int
    norm: str = "none"
    rates: Tuple[int, ...] = (6, 12, 18)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        outs = []
        for r in self.rates:
            h = Conv(
                self.out_dims, kernel_size=(3,) * ndim, padding="SAME",
                kernel_dilation=(r,) * ndim, kernel_init=KERNEL_INIT,
            )(x)
            h = nn.relu(h)
            h = Norm(self.norm)(h, train)
            outs.append(h)
        h = jnp.concatenate(outs, axis=-1)
        return Conv(self.out_dims, kernel_size=(1,) * ndim, kernel_init=KERNEL_INIT)(h)


class ResUNetPlusPlusAttention(nn.Module):
    """ResUNet++ skip attention (reference: blocks.py:2168): encoder branch
    (norm-relu-conv-pool) + decoder branch (norm-relu-conv) summed, squashed
    to one attention channel, multiplied onto the decoder features."""

    output_dim: int
    pool: Tuple[int, ...]
    norm: str = "none"

    @nn.compact
    def __call__(self, x_enc, x_dec, train: bool = False):
        ndim = x_dec.ndim - 2
        from biapy_tpu.models.blocks import max_pool

        e = Norm(self.norm)(x_enc, train)
        e = nn.relu(e)
        e = Conv(self.output_dim, kernel_size=(3,) * ndim, padding="SAME", kernel_init=KERNEL_INIT)(e)
        e = max_pool(e, self.pool)
        d = Norm(self.norm)(x_dec, train)
        d = nn.relu(d)
        d = Conv(self.output_dim, kernel_size=(3,) * ndim, padding="SAME", kernel_init=KERNEL_INIT)(d)
        a = e + d
        a = Norm(self.norm)(a, train)
        a = nn.relu(a)
        a = Conv(1, kernel_size=(1,) * ndim, kernel_init=KERNEL_INIT)(a)
        return a * x_dec
