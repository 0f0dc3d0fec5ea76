"""Shared head modules: ASPP, projection head (contrastive), PSP/OCR.

Reference analog: biapy/models/heads.py (ASPP:13, ProjectionHead:~150) and
the FCN/OCR heads used by HRNet.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


def _adaptive_avg_pool(x, out_sizes: Sequence[int]):
    """Exact torch-style AdaptiveAvgPool for channels-last ``x``: per axis,
    bin i covers [floor(i*H/p), ceil((i+1)*H/p)); realized as one tiny
    (p, H) averaging matmul per spatial axis (p <= 6), which XLA fuses —
    no gather, no dynamic shapes."""
    ndim = x.ndim - 2
    for d, p in enumerate(out_sizes):
        size = x.shape[1 + d]
        m = np.zeros((p, size), np.float32)
        for i in range(p):
            a = (i * size) // p
            b = -(-((i + 1) * size) // p)
            m[i, a:b] = 1.0 / (b - a)
        x = jnp.tensordot(jnp.asarray(m), x, axes=[[1], [1 + d]])
        x = jnp.moveaxis(x, 0, 1 + d)
    return x


class PSP(nn.Module):
    """Pyramid Scene Parsing head (PSPNet; reference: heads.py:231):
    adaptive-avg-pool branches at ``pool_sizes``, each 1-conv + relu
    (+norm), resized back and concatenated with the input, fused by a
    1-conv bottleneck (+norm) + relu. Output: ``out_dims`` features at the
    input resolution. Dimension-generic (reference supports 2D/3D)."""

    out_dims: int
    norm: str = "none"
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        one = (1,) * ndim
        priors = [x]
        for ps in self.pool_sizes:
            h = _adaptive_avg_pool(x, (ps,) * ndim)
            h = Conv(self.out_dims, kernel_size=one, use_bias=False,
                     kernel_init=KERNEL_INIT)(h)
            h = nn.relu(h)
            h = Norm(self.norm)(h, train)
            h = jax.image.resize(
                h, (h.shape[0],) + x.shape[1:-1] + (h.shape[-1],), method="linear")
            priors.append(h)
        h = jnp.concatenate(priors, axis=-1)
        h = Conv(self.out_dims, kernel_size=one, use_bias=False,
                 kernel_init=KERNEL_INIT)(h)
        h = Norm(self.norm)(h, train)
        return nn.relu(h)


class _KeyProj(nn.Module):
    """1-conv -> norm -> relu projection used by the OCR attention block
    (reference: ObjectAttentionBlock2D.f_pixel/f_object/f_down/f_up)."""

    features: int
    norm: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.features, use_bias=False, kernel_init=KERNEL_INIT)(x)
        # tokens are (B, N, C); Norm variants that need spatial context (bn
        # reduces over batch+tokens) see the token axis as spatial
        h = Norm(self.norm)(h, train)
        return nn.relu(h)


class OCRHead(nn.Module):
    """Object-Contextual Representations head (reference: heads.py:514).

    1) 3-conv to ``out_dims`` mid-features; 2) 1-conv coarse class scores;
    3) spatial gather: per-class soft region descriptors
       (softmax over space of scaled scores, reference heads.py:371);
    4) object attention: queries from pixels, keys/values from region
       descriptors, scaled dot-product over the K classes
       (reference heads.py:424);
    5) 1-conv bottleneck on the attended context.

    The token-level ops run on flattened spatial positions, so the same
    code serves 2D (the reference is 2D-only; validation still rejects 3D
    OCR for parity, check_configuration.py:3162)."""

    out_dims: int
    num_classes: int
    norm: str = "none"
    key_dims: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        feats = Conv(self.out_dims, kernel_size=(3,) * ndim, padding="SAME",
                     use_bias=False, kernel_init=KERNEL_INIT)(x)
        feats = Norm(self.norm)(feats, train)
        feats = nn.relu(feats)
        aux = Conv(self.num_classes, kernel_size=(1,) * ndim,
                   kernel_init=KERNEL_INIT)(feats)

        b = feats.shape[0]
        spatial = feats.shape[1:-1]
        f = feats.reshape(b, -1, self.out_dims)            # (B, N, C)
        p = aux.reshape(b, -1, self.num_classes)           # (B, N, K)
        attn = jax.nn.softmax(self.scale * p, axis=1)      # over space
        context = jnp.einsum("bnk,bnc->bkc", attn, f)      # (B, K, C)

        q = _KeyProj(self.key_dims, self.norm)(f, train)         # (B, N, key)
        k = _KeyProj(self.key_dims, self.norm)(context, train)   # (B, K, key)
        v = _KeyProj(self.key_dims, self.norm)(context, train)   # (B, K, key)
        sim = jnp.einsum("bnd,bkd->bnk", q, k) * (self.key_dims ** -0.5)
        sim = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bnk,bkd->bnd", sim, v)                  # (B, N, key)
        ctx = _KeyProj(self.out_dims, self.norm)(ctx, train)      # f_up
        ctx = ctx.reshape((b,) + spatial + (self.out_dims,))

        # Bottleneck on cat(context, pixel features) — the OCRNet paper's
        # composition (Yuan et al. 2020, eq. 6). The reference's torch head
        # bottlenecks the CONTEXT ALONE (heads.py:640 returns only
        # ocr_feats): with K softmax regions over near-uniform initial
        # attention the context is almost spatially constant, so a
        # classifier on it alone cannot learn (measured: spatial std 1e-5
        # of overall 0.1 at init; training collapses to IoU 0). Keeping the
        # pixel path is a deliberate fix over the reference, not a port.
        h = Conv(self.out_dims, kernel_size=(1,) * ndim, use_bias=False,
                 kernel_init=KERNEL_INIT)(jnp.concatenate([ctx, feats], axis=-1))
        h = Norm(self.norm)(h, train)
        return nn.relu(h)


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
