"""Super-resolution model family: EDSR, RCAN, WDSR, DFCAN.

Reference analog: biapy/models/{edsr.py:18, rcan.py:225, wdsr.py:31,
dfcan.py:227}. All operate channels-last; upsampling uses pixel-shuffle
(depth-to-space) like the reference's nn.PixelShuffle, generalized to 3D.
Activations are applied by the engine, not here (same contract as the rest
of the zoo); WDSR's weight-norm is approximated by plain convs (it only
affects optimization dynamics, not capacity).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv

from biapy_tpu.models.blocks import KERNEL_INIT


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Depth-to-space for channels-last 2D/3D batches."""
    nd = x.ndim - 2
    b = x.shape[0]
    spatial = x.shape[1:-1]
    c = x.shape[-1]
    r = scale
    out_c = c // (r**nd)
    # (b, *s, out_c * r^nd) -> (b, *s, r, r[, r], out_c)
    x = x.reshape((b,) + spatial + (r,) * nd + (out_c,))
    # interleave
    perm = [0]
    for d in range(nd):
        perm += [1 + d, 1 + nd + d]
    perm += [1 + 2 * nd]
    x = x.transpose(perm)
    new_spatial = tuple(s * r for s in spatial)
    return x.reshape((b,) + new_spatial + (out_c,))


class _SRUpsampling(nn.Module):
    """Conv + pixel-shuffle upsampling (reference: edsr.py SR_upsampling:173)."""

    num_filters: int
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        steps = 2 if self.factor == 4 else 1
        f = 2 if self.factor == 4 else self.factor
        for _ in range(steps):
            x = Conv(self.num_filters * (f**nd), kernel_size=(3,) * nd, padding="SAME",
                        kernel_init=KERNEL_INIT)(x)
            x = pixel_shuffle(x, f)
        return x


class EDSR(nn.Module):
    """Enhanced Deep SR (reference: edsr.py:18; Lim et al. 2017)."""

    ndim: int = 2
    scale: int = 2
    num_filters: int = 64
    num_res_blocks: int = 16
    num_channels: int = 1
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.ndim
        k = (3,) * nd
        h0 = Conv(self.num_filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(x)
        h = h0
        for _ in range(self.num_res_blocks):
            r = Conv(self.num_filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(h)
            r = nn.relu(r)
            r = Conv(self.num_filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(r)
            h = h + r
        h = Conv(self.num_filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = h + h0
        h = _SRUpsampling(self.num_filters, self.scale)(h)
        return Conv(self.out_channels or self.num_channels, kernel_size=k, padding="SAME",
                       kernel_init=KERNEL_INIT)(h)


class _ChannelAttention(nn.Module):
    """Squeeze channel attention (reference: rcan.py ChannelAttention:36)."""

    num_features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        s = jnp.mean(x, axis=tuple(range(1, 1 + nd)), keepdims=True)
        s = Conv(self.num_features // self.reduction, kernel_size=(1,) * nd,
                    kernel_init=KERNEL_INIT)(s)
        s = nn.relu(s)
        s = Conv(self.num_features, kernel_size=(1,) * nd, kernel_init=KERNEL_INIT)(s)
        return x * nn.sigmoid(s)


class RCAN(nn.Module):
    """Residual Channel Attention Network (reference: rcan.py:225; Zhang et
    al. 2018)."""

    ndim: int = 2
    scale: int = 2
    filters: int = 16
    num_rg: int = 10
    num_rcab: int = 20
    reduction: int = 16
    num_channels: int = 1
    out_channels: Optional[int] = None
    upscaling_layer: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.ndim
        k = (3,) * nd
        h0 = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(x)
        h = h0
        for _ in range(self.num_rg):
            g_in = h
            for _ in range(self.num_rcab):
                r = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(h)
                r = nn.relu(r)
                r = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(r)
                r = _ChannelAttention(self.filters, self.reduction)(r)
                h = h + r
            h = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(h)
            h = h + g_in
        h = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = h + h0
        if self.upscaling_layer and self.scale > 1:
            h = Conv(self.filters * (self.scale**nd), kernel_size=k, padding="SAME",
                        kernel_init=KERNEL_INIT)(h)
            h = pixel_shuffle(h, self.scale)
        return Conv(self.out_channels or self.num_channels, kernel_size=k, padding="SAME",
                       kernel_init=KERNEL_INIT)(h)


class WDSR(nn.Module):
    """Wide-activation SR (reference: wdsr.py:31; Yu et al. 2018)."""

    ndim: int = 2
    scale: int = 2
    num_filters: int = 32
    num_res_blocks: int = 16
    res_block_expansion: int = 6
    num_channels: int = 1
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.ndim
        k = (3,) * nd
        out_c = self.out_channels or self.num_channels
        num_outputs = (self.scale**nd) * out_c
        res_scale = 1.0 / math.sqrt(self.num_res_blocks)

        # every conv is weight-normalized with the reference's weight_g
        # inits (wdsr.py:97-145,223-244): the per-block residual scaling is
        # baked into the LEARNABLE wn scale (g=2 expand, g=res_scale reduce),
        # not a fixed multiplier — param-count parity pinned by
        # tests/test_param_parity.py
        def wn(features, ksize, g):
            return nn.WeightNorm(
                Conv(features, kernel_size=ksize, padding="SAME",
                     kernel_init=KERNEL_INIT),
                scale_init=nn.initializers.constant(g))

        h = wn(self.num_filters, k, 1.0)(x)
        for _ in range(self.num_res_blocks):
            r = wn(self.num_filters * self.res_block_expansion, k, 2.0)(h)
            r = nn.relu(r)
            r = wn(self.num_filters, k, res_scale)(r)
            h = h + r
        h = wn(num_outputs, k, 1.0)(h)
        body = pixel_shuffle(h, self.scale)
        skip = wn(num_outputs, (5,) * nd, 1.0)(x)
        skip = pixel_shuffle(skip, self.scale)
        return body + skip


def _fftshift(x: jnp.ndarray, nd: int) -> jnp.ndarray:
    return jnp.fft.fftshift(x, axes=tuple(range(1, 1 + nd)))


class _FCAB(nn.Module):
    """Fourier channel attention block (reference: dfcan.py RCAB_dfcan:95)."""

    filters: int = 64

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        k = (3,) * nd
        h = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(x)
        h = nn.gelu(h)
        h = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = nn.gelu(h)
        # Fourier-domain attention (reference RCAB_dfcan.forward, dfcan.py:132):
        # gamma-compressed magnitude spectrum, 3-conv on the shifted
        # spectrum, global pool, squeeze/excite 1-convs.
        f = jnp.abs(jnp.fft.fftn(h.astype(jnp.complex64), axes=tuple(range(1, 1 + nd))))
        f = jnp.power(f + 1e-8, 0.8)
        f = _fftshift(f, nd)
        f = Conv(self.filters, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(f)
        f = nn.relu(f)
        s = jnp.mean(f, axis=tuple(range(1, 1 + nd)), keepdims=True)
        s = Conv(max(4, self.filters // 16), kernel_size=(1,) * nd, kernel_init=KERNEL_INIT)(s)
        s = nn.relu(s)
        s = Conv(self.filters, kernel_size=(1,) * nd, kernel_init=KERNEL_INIT)(s)
        s = nn.sigmoid(s)
        return x + h * s


class DFCAN(nn.Module):
    """Deep Fourier Channel Attention Network (reference: dfcan.py:227;
    Qiao et al. 2021)."""

    ndim: int = 2
    scale: int = 2
    n_resgroup: int = 4
    n_rcab: int = 4
    num_channels: int = 1
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.ndim
        k = (3,) * nd
        h = Conv(64, kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(x)
        h = nn.gelu(h)
        for _ in range(self.n_resgroup):
            g = h
            for _ in range(self.n_rcab):
                g = _FCAB(64)(g)
            h = h + g
        h = Conv(64 * (self.scale**nd), kernel_size=k, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = nn.gelu(h)
        h = pixel_shuffle(h, self.scale)
        return Conv(self.out_channels or self.num_channels, kernel_size=k, padding="SAME",
                       kernel_init=KERNEL_INIT)(h)
