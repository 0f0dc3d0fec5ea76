"""First-party Flax Swin Transformer t/s/b (torchvision layout) + import.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676). First-party Flax, channels-last, for the
224-input configuration (stage grids 56/28/14/7 are all multiples of the
7x7 window, so no pad branches are traced; validation enforces 224 like
the torchvision ViTs). ``load_torchvision_swin`` places LOCAL
``swin_*.pth`` state dicts bit-exactly; the ``relative_position_index``
buffers in torch state dicts are recomputed here and ignored on import.

Architecture (torchvision swin_transformer.py, v1):
- patchify: Conv 4x4 s4 -> LayerNorm
- 4 stages of SwinTransformerBlocks (shifted-window attention with a
  relative-position-bias table, window 7, alternating shift 0 / 3),
  PatchMerging between stages (LayerNorm(4C) -> Linear(4C, 2C, no bias))
- final LayerNorm -> global average pool -> Linear head
- stochastic depth linearly 0 -> sd across all blocks (row mode)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

_VARIANTS = {
    # C, depths, heads, stochastic depth
    "swin_t": (96, (2, 2, 6, 2), (3, 6, 12, 24), 0.2),
    "swin_s": (96, (2, 2, 18, 2), (3, 6, 12, 24), 0.3),
    "swin_b": (128, (2, 2, 18, 2), (4, 8, 16, 32), 0.5),
}
_WINDOW = 7


def _ln(name):
    return nn.LayerNorm(epsilon=1e-5, name=name)


def _rel_index(w: int) -> np.ndarray:
    """(w*w, w*w) index into the (2w-1)^2 relative-position-bias table
    (torchvision get_relative_position_bias)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(hp: int, wp: int, w: int, s: int) -> np.ndarray:
    """(nW, w*w, w*w) additive attention mask for shifted windows."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
        for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class _WindowAttention(nn.Module):
    dim: int
    heads: int
    shift: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = _WINDOW
        s = self.shift if min(H, W) > w else 0
        assert H % w == 0 and W % w == 0, (
            "Swin here is traced for the 224-input grids (56/28/14/7)")
        qkv_k = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                           (C, 3 * C))
        qkv_b = self.param("qkv_bias", nn.initializers.zeros, (3 * C,))
        proj_k = self.param("proj_kernel", nn.initializers.lecun_normal(),
                            (C, C))
        proj_b = self.param("proj_bias", nn.initializers.zeros, (C,))
        rpb = self.param("rel_pos_bias", nn.initializers.normal(0.02),
                         ((2 * w - 1) ** 2, self.heads))

        if s:
            x = jnp.roll(x, (-s, -s), axis=(1, 2))
        nh, nw = H // w, W // w
        xw = x.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B * nh * nw, w * w, C)
        qkv = xw @ qkv_k + qkv_b
        hd = C // self.heads
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(t.shape[0], w * w, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5)
        bias = rpb[jnp.asarray(_rel_index(w))]           # (ww, ww, heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if s:
            mask = jnp.asarray(_shift_mask(H, W, w, s))  # (nW, ww, ww)
            attn = attn.reshape(B, nh * nw, self.heads, w * w, w * w)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(B * nh * nw, self.heads, w * w, w * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, w * w, C)
        out = out @ proj_k + proj_b
        out = out.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, W, C)
        if s:
            out = jnp.roll(out, (s, s), axis=(1, 2))
        return out


class _SwinBlock(nn.Module):
    dim: int
    heads: int
    shift: int
    sd_prob: float = 0.0

    def _sd(self, h, x, train):
        if train and self.sd_prob > 0:
            keep = 1.0 - self.sd_prob
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep,
                                        (x.shape[0],) + (1,) * (x.ndim - 1))
            h = h * mask / keep
        return x + h

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _ln("norm1")(x)
        h = _WindowAttention(self.dim, self.heads, self.shift, name="attn")(h)
        x = self._sd(h, x, train)
        h = _ln("norm2")(x)
        h = nn.Dense(4 * self.dim, name="mlp1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp2")(h)
        return self._sd(h, x, train)


class _PatchMerging(nn.Module):
    dim: int  # input dim C; output 2C

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # torchvision order: cat(x0..x3) where x0=(0::2,0::2), x1=(1::2,0::2),
        # x2=(0::2,1::2), x3=(1::2,1::2)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        h = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        h = _ln("norm")(h)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(h)


class Swin(nn.Module):
    """torchvision-layout Swin v1 classifier, channels-last 2D."""

    variant: str = "swin_t"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        C, depths, heads, sd = _VARIANTS[self.variant]
        h = nn.Conv(C, (4, 4), strides=(4, 4), name="patch_conv")(x)
        h = _ln("patch_ln")(h)
        total = sum(depths)
        bi = 0
        for si, (depth, nheads) in enumerate(zip(depths, heads)):
            dim = C * (2 ** si)
            if si > 0:
                h = _PatchMerging(dim // 2, name=f"merge{si}")(h)
            for j in range(depth):
                p = sd * bi / max(total - 1, 1)
                h = _SwinBlock(dim, nheads, shift=0 if j % 2 == 0 else _WINDOW // 2,
                               sd_prob=p, name=f"stage{si}_block{j}")(h, train)
                bi += 1
        h = _ln("head_ln")(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="head_fc")(h)


def swin_key_map(variant: str = "swin_t", n_classes: int = 1000):
    C, depths, heads, _ = _VARIANTS[variant]
    params = []

    def add(fpath, tkey, tf=None):
        params.append((tuple(fpath), tkey, tf))

    def ln(fpath, tkey):
        add(list(fpath) + ["scale"], tkey + ".weight")
        add(list(fpath) + ["bias"], tkey + ".bias")

    def linear(fpath, tkey, bias=True):
        add(list(fpath) + ["kernel"], tkey + ".weight", "linear")
        if bias:
            add(list(fpath) + ["bias"], tkey + ".bias")

    add(["patch_conv", "kernel"], "features.0.0.weight", "conv")
    add(["patch_conv", "bias"], "features.0.0.bias")
    ln(["patch_ln"], "features.0.2")
    for si, depth in enumerate(depths):
        if si > 0:
            fi = 2 * si
            ln([f"merge{si}", "norm"], f"features.{fi}.norm")
            linear([f"merge{si}", "reduction"], f"features.{fi}.reduction",
                   bias=False)
        fi = 2 * si + 1
        for j in range(depth):
            mod = f"stage{si}_block{j}"
            base = f"features.{fi}.{j}"
            ln([mod, "norm1"], f"{base}.norm1")
            add([mod, "attn", "qkv_kernel"], f"{base}.attn.qkv.weight", "linear")
            add([mod, "attn", "qkv_bias"], f"{base}.attn.qkv.bias")
            add([mod, "attn", "proj_kernel"], f"{base}.attn.proj.weight", "linear")
            add([mod, "attn", "proj_bias"], f"{base}.attn.proj.bias")
            add([mod, "attn", "rel_pos_bias"],
                f"{base}.attn.relative_position_bias_table")
            ln([mod, "norm2"], f"{base}.norm2")
            linear([mod, "mlp1"], f"{base}.mlp.0")
            linear([mod, "mlp2"], f"{base}.mlp.3")
    ln(["head_ln"], "norm")
    linear(["head_fc"], "head")
    return params, []


def load_torchvision_swin(path: str, params, batch_stats=None,
                          variant: str = "swin_t", verbose: bool = False):
    """Bit-exact import; relative_position_index buffers are recomputed
    (ignored), the class-count head skips with the finetuning warning."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = swin_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="head_fc")


# ---------------------------------------------------------------------------
# Swin V2 (torchvision swin_v2_t/s/b: 256-input, window 8, cosine attention
# with learned logit_scale, continuous-position-bias MLP, post-norm blocks,
# PatchMergingV2 with the norm AFTER the reduction)
# ---------------------------------------------------------------------------

_V2_VARIANTS = {
    "swin_v2_t": (96, (2, 2, 6, 2), (3, 6, 12, 24), 0.2),
    "swin_v2_s": (96, (2, 2, 18, 2), (3, 6, 12, 24), 0.3),
    "swin_v2_b": (128, (2, 2, 18, 2), (4, 8, 16, 32), 0.5),
}
_WINDOW_V2 = 8


def _cpb_table(w: int) -> np.ndarray:
    """(1, (2w-1)^2, 2) log-scaled normalized relative-coords table
    (torchvision ShiftedWindowAttentionV2.define_relative_position_bias_table)."""
    r = np.arange(-(w - 1), w, dtype=np.float32)
    t = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)  # (2w-1, 2w-1, 2)
    t = t / (w - 1) * 8.0
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / 3.0
    return t.reshape(1, -1, 2)


class _WindowAttentionV2(nn.Module):
    dim: int
    heads: int
    shift: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = _WINDOW_V2
        s = self.shift if min(H, W) > w else 0
        assert H % w == 0 and W % w == 0, (
            "Swin V2 here is traced for the 256-input grids (64/32/16/8)")
        qkv_k = self.param("qkv_kernel", nn.initializers.lecun_normal(),
                           (C, 3 * C))
        qkv_b = self.param("qkv_bias", nn.initializers.zeros, (3 * C,))
        proj_k = self.param("proj_kernel", nn.initializers.lecun_normal(),
                            (C, C))
        proj_b = self.param("proj_bias", nn.initializers.zeros, (C,))
        logit_scale = self.param(
            "logit_scale",
            lambda k, sh: jnp.full(sh, float(np.log(10.0))), (self.heads, 1, 1))
        cpb1_k = self.param("cpb1_kernel", nn.initializers.lecun_normal(),
                            (2, 512))
        cpb1_b = self.param("cpb1_bias", nn.initializers.zeros, (512,))
        cpb2_k = self.param("cpb2_kernel", nn.initializers.lecun_normal(),
                            (512, self.heads))

        if s:
            x = jnp.roll(x, (-s, -s), axis=(1, 2))
        nh, nw = H // w, W // w
        xw = x.reshape(B, nh, w, nw, w, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B * nh * nw, w * w, C)
        qkv = xw @ qkv_k + qkv_b
        hd = C // self.heads
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(t.shape[0], w * w, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        # cosine attention: L2-normalized q/k, learned clamped logit scale
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))
        attn = (q @ k.transpose(0, 1, 3, 2)) * scale[None]
        # continuous position bias: 16*sigmoid(MLP(log-coords)), gathered
        # through the same relative index as v1
        tbl = jnp.asarray(_cpb_table(w))[0]              # ((2w-1)^2, 2)
        cpb = nn.relu(tbl @ cpb1_k + cpb1_b) @ cpb2_k    # ((2w-1)^2, heads)
        bias = 16.0 * jax.nn.sigmoid(cpb)[jnp.asarray(_rel_index(w))]
        attn = attn + bias.transpose(2, 0, 1)[None]
        if s:
            mask = jnp.asarray(_shift_mask(H, W, w, s))
            attn = attn.reshape(B, nh * nw, self.heads, w * w, w * w)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(B * nh * nw, self.heads, w * w, w * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, w * w, C)
        out = out @ proj_k + proj_b
        out = out.reshape(B, nh, nw, w, w, C).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, W, C)
        if s:
            out = jnp.roll(out, (s, s), axis=(1, 2))
        return out


class _SwinBlockV2(nn.Module):
    dim: int
    heads: int
    shift: int
    sd_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # POST-norm (v2): x + sd(norm(attn(x))), x + sd(norm(mlp(x)))
        h = _WindowAttentionV2(self.dim, self.heads, self.shift,
                               name="attn")(x)
        h = _ln("norm1")(h)
        x = _SwinBlock._sd(self, h, x, train)
        h = nn.Dense(4 * self.dim, name="mlp1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp2")(h)
        h = _ln("norm2")(h)
        return _SwinBlock._sd(self, h, x, train)


class _PatchMergingV2(nn.Module):
    dim: int  # input dim C; output 2C

    @nn.compact
    def __call__(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        h = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        # v2: reduction FIRST, then norm over 2C
        h = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(h)
        return _ln("norm")(h)


class SwinV2(nn.Module):
    """torchvision-layout Swin V2 classifier, channels-last 2D (256-input,
    window 8)."""

    variant: str = "swin_v2_t"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        C, depths, heads, sd = _V2_VARIANTS[self.variant]
        h = nn.Conv(C, (4, 4), strides=(4, 4), name="patch_conv")(x)
        h = _ln("patch_ln")(h)
        total = sum(depths)
        bi = 0
        for si, (depth, nheads) in enumerate(zip(depths, heads)):
            dim = C * (2 ** si)
            if si > 0:
                h = _PatchMergingV2(dim // 2, name=f"merge{si}")(h)
            for j in range(depth):
                p = sd * bi / max(total - 1, 1)
                h = _SwinBlockV2(dim, nheads,
                                 shift=0 if j % 2 == 0 else _WINDOW_V2 // 2,
                                 sd_prob=p, name=f"stage{si}_block{j}")(h, train)
                bi += 1
        h = _ln("head_ln")(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="head_fc")(h)


def swin_v2_key_map(variant: str = "swin_v2_t", n_classes: int = 1000):
    C, depths, heads, _ = _V2_VARIANTS[variant]
    params = []

    def add(fpath, tkey, tf=None):
        params.append((tuple(fpath), tkey, tf))

    def ln(fpath, tkey):
        add(list(fpath) + ["scale"], tkey + ".weight")
        add(list(fpath) + ["bias"], tkey + ".bias")

    def linear(fpath, tkey, bias=True):
        add(list(fpath) + ["kernel"], tkey + ".weight", "linear")
        if bias:
            add(list(fpath) + ["bias"], tkey + ".bias")

    add(["patch_conv", "kernel"], "features.0.0.weight", "conv")
    add(["patch_conv", "bias"], "features.0.0.bias")
    ln(["patch_ln"], "features.0.2")
    for si, depth in enumerate(depths):
        if si > 0:
            fi = 2 * si
            linear([f"merge{si}", "reduction"], f"features.{fi}.reduction",
                   bias=False)
            ln([f"merge{si}", "norm"], f"features.{fi}.norm")
        fi = 2 * si + 1
        for j in range(depth):
            mod = f"stage{si}_block{j}"
            base = f"features.{fi}.{j}"
            ln([mod, "norm1"], f"{base}.norm1")
            add([mod, "attn", "qkv_kernel"], f"{base}.attn.qkv.weight", "linear")
            add([mod, "attn", "qkv_bias"], f"{base}.attn.qkv.bias")
            add([mod, "attn", "proj_kernel"], f"{base}.attn.proj.weight", "linear")
            add([mod, "attn", "proj_bias"], f"{base}.attn.proj.bias")
            add([mod, "attn", "logit_scale"], f"{base}.attn.logit_scale")
            add([mod, "attn", "cpb1_kernel"],
                f"{base}.attn.cpb_mlp.0.weight", "linear")
            add([mod, "attn", "cpb1_bias"], f"{base}.attn.cpb_mlp.0.bias")
            add([mod, "attn", "cpb2_kernel"],
                f"{base}.attn.cpb_mlp.2.weight", "linear")
            ln([mod, "norm2"], f"{base}.norm2")
            linear([mod, "mlp1"], f"{base}.mlp.0")
            linear([mod, "mlp2"], f"{base}.mlp.3")
    ln(["head_ln"], "norm")
    linear(["head_fc"], "head")
    return params, []


def load_torchvision_swin_v2(path: str, params, batch_stats=None,
                             variant: str = "swin_v2_t",
                             verbose: bool = False):
    """Bit-exact import; relative_coords_table / relative_position_index
    buffers are recomputed (ignored), the class-count head skips with the
    finetuning warning."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = swin_v2_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="head_fc")
