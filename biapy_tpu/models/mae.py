"""Masked Autoencoder (MAE) for self-supervised pretraining.

Reference analog: biapy/models/mae.py (MaskedAutoencoderViT:51; He et al.
2022): ViT encoder over the visible subset of patches (random or fixed
checkerboard grid masking), lightweight ViT decoder over all tokens with a
shared mask token, pixel-space reconstruction loss on masked patches.

JAX notes: masking uses ``jax.random`` keys threaded by the engine (rng
collection 'mask'); token gathering keeps static shapes (keep_len is a
config-time constant).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import KERNEL_INIT
from biapy_tpu.models.vit import PatchEmbed, TransformerBlock


class MAE(nn.Module):
    ndim: int = 2
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dec_embed_dim: int = 512
    dec_depth: int = 8
    dec_num_heads: int = 16
    dec_mlp_ratio: float = 4.0  # MAE_DEC_MLP_DIMS / dec_embed_dim
    mask_ratio: float = 0.5
    masking_type: str = "random"
    norm_pix_loss: bool = False
    norm_eps: float = 1e-6

    def _grid_len(self) -> int:
        return self.img_size // self.patch_size

    def num_patches(self) -> int:
        return self._grid_len() ** self.ndim

    # ---------------------------------------------------------------- patching
    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """(B, *spatial, C) -> (B, L, patch_dim) (reference: mae.py patchify)."""
        p = self.patch_size
        b = imgs.shape[0]
        c = imgs.shape[-1]
        g = self._grid_len()
        if self.ndim == 2:
            x = imgs.reshape(b, g, p, g, p, c)
            x = jnp.einsum("bhpwqc->bhwpqc", x)
            return x.reshape(b, g * g, p * p * c)
        x = imgs.reshape(b, g, p, g, p, g, p, c)
        x = jnp.einsum("bzpyqxrc->bzyxpqrc", x)
        return x.reshape(b, g**3, p**3 * c)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b = x.shape[0]
        g = self._grid_len()
        c = self.in_channels
        if self.ndim == 2:
            x = x.reshape(b, g, g, p, p, c)
            x = jnp.einsum("bhwpqc->bhpwqc", x)
            return x.reshape(b, g * p, g * p, c)
        x = x.reshape(b, g, g, g, p, p, p, c)
        x = jnp.einsum("bzyxpqrc->bzpyqxrc", x)
        return x.reshape(b, g * p, g * p, g * p, c)

    def _grid_mask_ids(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fixed checkerboard keep/drop ids (reference: mae.py grid_masking)."""
        g = self._grid_len()
        if self.ndim == 2:
            ii, jj = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij")
            keep = ((ii + jj) % 2 == 0).reshape(-1)
        else:
            ii, jj, kk = jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g), indexing="ij")
            keep = ((ii + jj + kk) % 2 == 0).reshape(-1)
        order = jnp.argsort(~keep, stable=True)  # kept ids first
        return order, keep

    @nn.compact
    def __call__(self, imgs, train: bool = False, return_just_preds: bool = False):
        b = imgs.shape[0]
        L = self.num_patches()
        if self.masking_type == "grid":
            keep_len = (L + 1) // 2
        else:
            keep_len = max(1, int(L * (1 - self.mask_ratio)))

        tokens = PatchEmbed(self.patch_size, self.embed_dim)(imgs)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, L + 1, self.embed_dim))
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim))
        tokens = tokens + pos[:, 1:]

        # -- masking -------------------------------------------------------
        if self.masking_type == "grid":
            order, keepb = self._grid_mask_ids()
            ids_shuffle = jnp.broadcast_to(order, (b, L))
        else:
            rng = self.make_rng("mask") if train or self.has_rng("mask") else jax.random.PRNGKey(0)
            noise = jax.random.uniform(rng, (b, L))
            ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :keep_len]
        x = jnp.take_along_axis(tokens, ids_keep[..., None], axis=1)
        mask = jnp.ones((b, L))
        mask = mask.at[:, :keep_len].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)  # 1 = masked

        # -- encoder -------------------------------------------------------
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (b, 1, self.embed_dim))
        h = jnp.concatenate([cls_tok, x], axis=1)
        for _ in range(self.depth):
            h = TransformerBlock(self.num_heads, self.mlp_ratio, norm_eps=self.norm_eps)(h, train)
        h = nn.LayerNorm(epsilon=self.norm_eps)(h)

        # -- decoder -------------------------------------------------------
        h = nn.Dense(self.dec_embed_dim, kernel_init=KERNEL_INIT)(h)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02), (1, 1, self.dec_embed_dim))
        mask_tokens = jnp.broadcast_to(mask_token, (b, L - keep_len, self.dec_embed_dim))
        full = jnp.concatenate([h[:, 1:], mask_tokens], axis=1)
        full = jnp.take_along_axis(full, ids_restore[..., None], axis=1)
        full = jnp.concatenate([h[:, :1], full], axis=1)
        dec_pos = self.param("dec_pos_embed", nn.initializers.normal(0.02),
                             (1, L + 1, self.dec_embed_dim))
        full = full + dec_pos
        for _ in range(self.dec_depth):
            full = TransformerBlock(self.dec_num_heads, self.dec_mlp_ratio, norm_eps=self.norm_eps)(full, train)
        full = nn.LayerNorm(epsilon=self.norm_eps)(full)
        patch_dim = (self.patch_size**self.ndim) * self.in_channels
        pred = nn.Dense(patch_dim, kernel_init=KERNEL_INIT)(full)[:, 1:]

        if return_just_preds:
            return self.unpatchify(pred)
        return {"pred": pred, "mask": mask, "target_patches": self.patchify(imgs)}

    def loss(self, imgs, out):
        """Masked-patch MSE (reference: mae.py forward_loss:592)."""
        target = out["target_patches"]
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        l2 = jnp.mean(jnp.square(out["pred"] - target), axis=-1)
        return jnp.sum(l2 * out["mask"]) / jnp.maximum(jnp.sum(out["mask"]), 1.0)
