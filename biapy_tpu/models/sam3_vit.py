"""SAM 3 image encoder as a Flax module (2D axial RoPE + windowed attention).

Reference analog: biapy/models/sam3_vit.py (SAM3Attention:152, SAM3Block:212,
build_sam3_blocks:368, SAM3_VIT_PARAMS:45). Geometry is fixed by the released
checkpoint: 32 blocks, 1024 dim, 16 heads, MLP 4.625x GELU, ln_pre, window
attention over 24x24 tokens except global blocks 7/15/23/31.

TPU-first notes: RoPE is computed as real cos/sin tables (no complex dtype on
TPU); window partitioning is a static reshape/transpose (token grids are
fixed by DATA.PATCH_SIZE so everything stays shape-monomorphic under jit).

Pretrained weights: this environment has no network egress, so only local
files are loadable (``load_sam3_weights``): a torch ``.pt``/``.pth`` state
dict or a ``.safetensors`` file containing the HF "facebook/sam3" image
encoder trunk. HF repo ids raise with instructions to download first.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SAM3_VIT_PARAMS = {
    "patch_size": 14,
    "embed_dim": 1024,
    "depth": 32,
    "num_heads": 16,
    "mlp_ratio": 4.625,
    "qkv_bias": True,
    "norm_eps": 1e-6,
    "in_chans": 3,
    "window_size": 24,
    "global_attn_indexes": (7, 15, 23, 31),
    "rope_theta": 10000.0,
    "pretrain_grid_size": 24,
}


def axial_rope_tables(head_dim: int, grid_h: int, grid_w: int,
                      theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables of the 2D axial RoPE, (tokens, head_dim//2) each
    (reference: sam3_axial_freqs_cis, sam3_vit.py:66 — same math with the
    complex polar() expanded to cos/sin)."""
    assert head_dim % 4 == 0
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[: head_dim // 4].astype(np.float64) / head_dim))
    t = np.arange(grid_h * grid_w, dtype=np.float64)
    tx, ty = t % grid_w, t // grid_w
    fx, fy = np.outer(tx, freqs), np.outer(ty, freqs)
    ang = np.concatenate([fx, fy], axis=-1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate q/k: consecutive channel pairs are (re, im) of a complex number
    multiplied by e^{i*ang} (reference: sam3_apply_rope, sam3_vit.py:117)."""
    def rot(x):
        xr = x.reshape(x.shape[:-1] + (-1, 2))
        re, im = xr[..., 0], xr[..., 1]
        ro = re * cos - im * sin
        io = re * sin + im * cos
        return jnp.stack([ro, io], axis=-1).reshape(x.shape)

    return rot(q.astype(jnp.float32)).astype(q.dtype), rot(k.astype(jnp.float32)).astype(k.dtype)


class SAM3Attention(nn.Module):
    """Multi-head attention with 2D axial RoPE; timm qkv/proj layout so the
    released weights map one-to-one (reference: SAM3Attention:152)."""

    dim: int
    num_heads: int
    grid: Tuple[int, int]  # token grid the rope covers (window or full)
    rope_theta: float = 10000.0

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        cos, sin = axial_rope_tables(hd, self.grid[0], self.grid[1], self.rope_theta)
        q, k = apply_rope(q, k, jnp.asarray(cos), jnp.asarray(sin))
        attn = (q @ k.swapaxes(-2, -1)) / jnp.sqrt(jnp.asarray(hd, q.dtype))
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).swapaxes(1, 2).reshape(b, n, c)
        return nn.Dense(self.dim, use_bias=True, name="proj")(out)


class SAM3Block(nn.Module):
    """Pre-norm transformer block, optionally windowed (reference:
    SAM3Block:212 / _windowed_attn:295)."""

    dim: int
    num_heads: int
    grid_size: Tuple[int, int]
    mlp_ratio: float = 4.625
    window_size: int = 0  # 0 => global
    norm_eps: float = 1e-6
    rope_theta: float = 10000.0

    @nn.compact
    def __call__(self, x):
        gh, gw = self.grid_size
        ws = self.window_size
        attn_grid = (ws, ws) if ws > 0 else self.grid_size
        attn = SAM3Attention(self.dim, self.num_heads, attn_grid,
                             rope_theta=self.rope_theta, name="attn")
        y = nn.LayerNorm(epsilon=self.norm_eps, name="norm1")(x)
        if ws > 0:
            b, n, c = y.shape
            patches = y.reshape(b, gh, gw, c)
            pad_h, pad_w = (ws - gh % ws) % ws, (ws - gw % ws) % ws
            if pad_h or pad_w:
                patches = jnp.pad(patches, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            ph, pw = gh + pad_h, gw + pad_w
            win = patches.reshape(b, ph // ws, ws, pw // ws, ws, c)
            win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
            win = attn(win)
            patches = win.reshape(b, ph // ws, pw // ws, ws, ws, c)
            patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
            if pad_h or pad_w:
                patches = patches[:, :gh, :gw]
            y = patches.reshape(b, gh * gw, c)
        else:
            y = attn(y)
        x = x + y
        h = nn.LayerNorm(epsilon=self.norm_eps, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hidden, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class SAM3ViTEncoder(nn.Module):
    """SAM 3 image encoder trunk: patch embed + ln_pre + 32 RoPE blocks.

    ``save_layers`` mirrors the ViT backbone contract used by UNETR — the
    listed block outputs are returned for the decoder skip connections.
    2D only (the pretrained weights are 2D, reference config.py:1395).
    ``patch_size`` may be overridden to 16 for UNETR (power-of-two decoder),
    matching the reference's resized patch embedding.
    """

    img_size: int = 336
    patch_size: int = 14
    in_channels: int = 3
    save_layers: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False,
                 save_layers: Optional[Sequence[int]] = None):
        p = SAM3_VIT_PARAMS
        dim = p["embed_dim"]
        g = self.img_size // self.patch_size
        taps = tuple(save_layers if save_layers is not None else self.save_layers)

        if x.shape[-1] != p["in_chans"]:
            x = jnp.repeat(x, p["in_chans"] // x.shape[-1], axis=-1)
        x = nn.Conv(dim, kernel_size=(self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, g * g, dim)
        x = nn.LayerNorm(epsilon=p["norm_eps"], name="ln_pre")(x)

        saved = []
        for i in range(p["depth"]):
            ws = 0 if i in p["global_attn_indexes"] else p["window_size"]
            x = SAM3Block(dim, p["num_heads"], (g, g), mlp_ratio=p["mlp_ratio"],
                          window_size=ws, norm_eps=p["norm_eps"],
                          rope_theta=p["rope_theta"], name=f"block{i}")(x)
            if (i + 1) in taps:
                saved.append(x)
        if features:
            return x, saved
        return x


def load_sam3_weights(source: str, params, patch_size: int = 14):
    """Map a local SAM 3 checkpoint's image-encoder trunk onto the flax
    params (reference: _sam3_read_trunk, sam3_vit.py:481). ``source`` must be
    a local .pt/.pth/.safetensors file; HF repo ids raise (no network here).
    """
    import os

    if not os.path.exists(source):
        raise FileNotFoundError(
            f"SAM3 weights '{source}' not found. This environment has no "
            "network access: download the facebook/sam3 image encoder "
            "weights elsewhere (HF gated model — accept the license and "
            "run 'hf download facebook/sam3') and pass the local file path "
            "via MODEL.VIT_PRETRAINED_WEIGHTS.")
    import torch

    if source.endswith(".safetensors"):
        from safetensors.torch import load_file  # pragma: no cover

        sd = load_file(source)
    else:
        sd = torch.load(source, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    # strip common trunk prefixes
    for pref in ("image_encoder.trunk.", "trunk.", "vision_encoder.", "model."):
        if any(k.startswith(pref) for k in sd):
            sd = {k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)}
    sd = {k: np.asarray(v.float()) for k, v in sd.items()}

    import jax

    new = jax.device_get(jax.tree_util.tree_map(lambda x: x, params))

    def put(path_keys, val):
        node = new
        for kk in path_keys[:-1]:
            node = node[kk]
        want = node[path_keys[-1]].shape
        if tuple(val.shape) != tuple(want):
            raise ValueError(f"shape mismatch at {'/'.join(path_keys)}: {val.shape} vs {want}")
        node[path_keys[-1]] = val.astype(np.float32)

    # patch embed: torch (D, 3, p, p) -> flax (p, p, 3, D); optionally resize 14->16
    pe = sd["patch_embed.proj.weight"]
    pe = np.transpose(pe, (2, 3, 1, 0))
    if patch_size != pe.shape[0]:
        from scipy import ndimage

        zoom = (patch_size / pe.shape[0], patch_size / pe.shape[1], 1, 1)
        pe = ndimage.zoom(pe, zoom, order=1)
    put(["patch_embed", "kernel"], pe)
    put(["patch_embed", "bias"], sd["patch_embed.proj.bias"])
    ln_pre_w = sd.get("ln_pre.weight")
    if ln_pre_w is not None:
        put(["ln_pre", "scale"], ln_pre_w)
        put(["ln_pre", "bias"], sd["ln_pre.bias"])
    for i in range(SAM3_VIT_PARAMS["depth"]):
        t = f"blocks.{i}."
        f = f"block{i}"
        put([f, "norm1", "scale"], sd[t + "norm1.weight"])
        put([f, "norm1", "bias"], sd[t + "norm1.bias"])
        put([f, "norm2", "scale"], sd[t + "norm2.weight"])
        put([f, "norm2", "bias"], sd[t + "norm2.bias"])
        put([f, "attn", "qkv", "kernel"], sd[t + "attn.qkv.weight"].T)
        put([f, "attn", "qkv", "bias"], sd[t + "attn.qkv.bias"])
        put([f, "attn", "proj", "kernel"], sd[t + "attn.proj.weight"].T)
        put([f, "attn", "proj", "bias"], sd[t + "attn.proj.bias"])
        put([f, "mlp_fc1", "kernel"], sd[t + "mlp.fc1.weight"].T)
        put([f, "mlp_fc1", "bias"], sd[t + "mlp.fc1.bias"])
        put([f, "mlp_fc2", "kernel"], sd[t + "mlp.fc2.weight"].T)
        put([f, "mlp_fc2", "bias"], sd[t + "mlp.fc2.bias"])
    return new
