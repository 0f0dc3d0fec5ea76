"""Vision Transformer backbone and classifier.

Reference analog: biapy/models/vit.py (VisionTransformer:40, a timm ViT
subclass with optional global pooling) and models/tr_layers.py (patch
embedding). Supports 2D and 3D token grids. Returns {"class": logits} for
classification; ``features=True`` returns all token features (used by UNETR
and MAE).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import KERNEL_INIT


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding via strided conv (reference:
    tr_layers.py PatchEmbed)."""

    patch_size: int
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        p = (self.patch_size,) * nd
        x = nn.Conv(self.embed_dim, kernel_size=p, strides=p, kernel_init=KERNEL_INIT)(x)
        return x.reshape((x.shape[0], -1, self.embed_dim))


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.norm_eps)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=dim,
            dropout_rate=self.drop, deterministic=not train,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.norm_eps)(x)
        h = nn.Dense(int(dim * self.mlp_ratio), kernel_init=KERNEL_INIT)(h)
        h = nn.gelu(h)
        if self.drop > 0:
            h = nn.Dropout(self.drop, deterministic=not train)(h)
        h = nn.Dense(dim, kernel_init=KERNEL_INIT)(h)
        if self.drop > 0:
            h = nn.Dropout(self.drop, deterministic=not train)(h)
        return x + h


class ViT(nn.Module):
    """ViT encoder (+ classification head when n_classes > 0)."""

    ndim: int = 2
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    n_classes: int = 0
    global_pool: bool = False
    norm_eps: float = 1e-6
    # UNETR feeds raw block output to its decoder (reference unetr.py:532
    # applies no post-blocks norm); the MAE/classifier paths keep it
    final_norm: bool = True

    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** self.ndim

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False,
                 save_layers: Optional[Sequence[int]] = None):
        b = x.shape[0]
        tokens = PatchEmbed(self.patch_size, self.embed_dim)(x)
        n = tokens.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n + 1, self.embed_dim))
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim))
        tokens = tokens + pos[:, 1:]
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (b, 1, self.embed_dim))
        h = jnp.concatenate([cls_tok, tokens], axis=1)
        if self.drop_rate > 0:
            h = nn.Dropout(self.drop_rate, deterministic=not train)(h)
        saved: List[jnp.ndarray] = []
        for i in range(self.depth):
            h = TransformerBlock(self.num_heads, self.mlp_ratio, self.drop_rate, self.norm_eps)(h, train)
            if save_layers and (i + 1) in save_layers:
                saved.append(h)
        if features:
            if self.final_norm:
                h = nn.LayerNorm(epsilon=self.norm_eps)(h)
            if save_layers:
                return h, saved
            return h
        if self.global_pool:
            feat = jnp.mean(h[:, 1:], axis=1)
            feat = nn.LayerNorm(epsilon=self.norm_eps)(feat)
        else:
            h = nn.LayerNorm(epsilon=self.norm_eps)(h)
            feat = h[:, 0]
        logits = nn.Dense(self.n_classes, kernel_init=KERNEL_INIT)(feat)
        return {"class": logits}
