"""Flax feature-extractor nets for perceptual losses and distribution metrics.

TPU-native equivalents of the reference's torchvision/torchmetrics nets:

- ``VGG16Features`` — the conv stack of torchvision vgg16. ``features[:16]``
  (through relu3_3) is the GAN perceptual term (reference: metrics.py VGG
  class :2593, used by CycleGanLoss :2668 via LOSS.CYCLEGAN.ALPHA_PERCEPTUAL).
- ``SqueezeNetFeatures`` — squeezenet1_1 features with the 7 LPIPS taps
  (torchmetrics LearnedPerceptualImagePatchSimilarity net_type='squeeze',
  the reference's default, image_to_image.py:185).
- ``InceptionV3`` — torchvision inception_v3 geometry, returning the 2048-d
  pre-fc pool (FID) and the class logits (IS) (torchmetrics
  FrechetInceptionDistance / InceptionScore, image_to_image.py:176-180).
  Branch avg-pools exclude padding, matching the FID-variant Inception
  (pytorch-fid FIDInceptionA/C/E) that torchmetrics evaluates with.

No network egress in this environment: every loader takes a LOCAL torch
checkpoint path (a torchvision state dict, or an lpips-package state dict)
and maps it onto the flax params by module name. All nets are 2D and
inference-only (BN runs from the loaded running stats).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# weight loading helpers
# ---------------------------------------------------------------------------


def _load_torch_file(source: str) -> Dict[str, np.ndarray]:
    import os

    if not os.path.exists(source):
        raise FileNotFoundError(
            f"weights file '{source}' not found. This environment has no "
            "network access: download the torch checkpoint elsewhere and "
            "point the config key at the local file.")
    if source.endswith(".safetensors"):
        from safetensors.numpy import load_file  # pragma: no cover

        return dict(load_file(source))
    import torch

    try:
        sd = torch.load(source, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(source, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    for wrap in ("state_dict", "model"):
        if isinstance(sd, dict) and isinstance(sd.get(wrap), dict):
            sd = sd[wrap]
    return {k: np.asarray(v.float().numpy() if hasattr(v, "float") else v,
                          np.float32)
            for k, v in sd.items() if hasattr(v, "shape")}


def _conv_t(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _put(tree, path: Sequence[str], val: np.ndarray, ctx: str):
    node = tree
    for k in path[:-1]:
        if k not in node:
            raise ValueError(f"{ctx}: flax param path {'/'.join(path)} missing at '{k}'")
        node = node[k]
    want = tuple(node[path[-1]].shape)
    if want != tuple(val.shape):
        raise ValueError(f"{ctx}: shape {val.shape} vs flax {'/'.join(path)} {want}")
    node[path[-1]] = val


def _mutable(params):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(params))


# ---------------------------------------------------------------------------
# BN from loaded running stats (inference only)
# ---------------------------------------------------------------------------


class BNInference(nn.Module):
    """BatchNorm evaluated from loaded running stats; everything is a param
    so the torch->flax load is a plain tensor placement."""

    features: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


# ---------------------------------------------------------------------------
# VGG16 (torchvision.features indexing)
# ---------------------------------------------------------------------------

# (torch features index, out channels); 'M' = 2x2 maxpool
_VGG16_LAYOUT = [(0, 64), (2, 64), "M", (5, 128), (7, 128), "M",
                 (10, 256), (12, 256), (14, 256), "M",
                 (17, 512), (19, 512), (21, 512), "M",
                 (24, 512), (26, 512), (28, 512), "M"]

# torch feature indices of the ReLU after each conv (conv idx + 1)
VGG16_RELU3_3 = 15          # features[:16] — the GAN perceptual tap
VGG16_LPIPS_TAPS = (3, 8, 15, 22, 29)  # relu1_2 .. relu5_3

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv features, NHWC in [0,1]-normalized-to-ImageNet space is the
    CALLER's job (see ``imagenet_preprocess``). ``taps`` lists torch feature
    indices (post-ReLU) to return; computation stops at the last tap."""

    taps: Tuple[int, ...] = (VGG16_RELU3_3,)

    @nn.compact
    def __call__(self, x):
        out = []
        last = max(self.taps)
        for item in _VGG16_LAYOUT:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            idx, ch = item
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
            x = nn.relu(x)
            if idx + 1 in self.taps:
                out.append(x)
            if idx + 1 >= last:
                break
        return out


def imagenet_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC (1 or 3 channels) -> ImageNet-normalized 3-channel."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def load_vgg16_weights(source: str, params):
    """Map a torchvision vgg16 state dict (``features.{i}.weight/bias``) onto
    VGG16Features params; classifier tensors are ignored."""
    sd = _load_torch_file(source)
    new = _mutable(params)
    n = 0
    for name in list(new):
        idx = int(name.replace("conv", ""))
        w, b = sd.get(f"features.{idx}.weight"), sd.get(f"features.{idx}.bias")
        if w is None:
            raise ValueError(f"vgg16 weights: missing features.{idx}.weight in {source}")
        _put(new, (name, "kernel"), _conv_t(w), "vgg16")
        _put(new, (name, "bias"), b, "vgg16")
        n += 2
    return new, n


# ---------------------------------------------------------------------------
# SqueezeNet 1.1 (LPIPS 'squeeze' backbone)
# ---------------------------------------------------------------------------


class Fire(nn.Module):
    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(x))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1, name="expand3x3")(x))
        return jnp.concatenate([e1, e3], axis=-1)


# squeezenet1_1 features: (torch idx, kind, args)
_SQUEEZE_LAYOUT = [
    (0, "conv", 64), (None, "pool", None),
    (3, "fire", (16, 64)), (4, "fire", (16, 64)), (None, "pool", None),
    (6, "fire", (32, 128)), (7, "fire", (32, 128)), (None, "pool", None),
    (9, "fire", (48, 192)), (10, "fire", (48, 192)),
    (11, "fire", (64, 256)), (12, "fire", (64, 256)),
]

# LPIPS taps: outputs after torch features idx 1, 4, 7, 9, 10, 11, 12
SQUEEZE_LPIPS_TAPS = (1, 4, 7, 9, 10, 11, 12)
SQUEEZE_LPIPS_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


class SqueezeNetFeatures(nn.Module):
    """squeezenet1_1 feature stack with LPIPS taps. NHWC input already in the
    LPIPS scaling-layer space (see ``lpips_preprocess``)."""

    @nn.compact
    def __call__(self, x):
        out = []
        for idx, kind, arg in _SQUEEZE_LAYOUT:
            if kind == "pool":
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
                continue
            if kind == "conv":
                x = nn.relu(nn.Conv(arg, (3, 3), strides=(2, 2), name=f"f{idx}")(x))
                tap = idx + 1
            else:
                x = Fire(arg[0], arg[1], name=f"f{idx}")(x)
                tap = idx
            if tap in SQUEEZE_LPIPS_TAPS:
                out.append(x)
        return out


def load_squeezenet_weights(source: str, params, prefix_candidates=("features.", "net.")):
    """Map squeezenet1_1 conv weights onto SqueezeNetFeatures params. Accepts
    a torchvision state dict (``features.{i}...``) or an lpips-package state
    dict (``net.slice{k}.{i}...`` — the trailing integer is the same
    torchvision features index)."""
    sd = _load_torch_file(source)
    # normalize keys to '{features_idx}.{rest}'
    flat: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("features."):
            flat[k[len("features."):]] = v
        elif k.startswith("net.slice"):
            flat[k.split(".", 2)[2]] = v
    new = _mutable(params)
    n = 0
    for idx, kind, _ in _SQUEEZE_LAYOUT:
        if kind == "pool":
            continue
        name = f"f{idx}"
        if kind == "conv":
            _put(new, (name, "kernel"), _conv_t(flat[f"{idx}.weight"]), "squeezenet")
            _put(new, (name, "bias"), flat[f"{idx}.bias"], "squeezenet")
            n += 2
        else:
            for sub in ("squeeze", "expand1x1", "expand3x3"):
                _put(new, (name, sub, "kernel"), _conv_t(flat[f"{idx}.{sub}.weight"]), "squeezenet")
                _put(new, (name, sub, "bias"), flat[f"{idx}.{sub}.bias"], "squeezenet")
                n += 2
    return new, n


# LPIPS scaling layer constants (lpips package ScalingLayer)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC -> lpips scaling-layer space (normalize=True semantics:
    [0,1] is first mapped to [-1,1], then shift/scale)."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    x = x * 2.0 - 1.0
    return (x - _LPIPS_SHIFT) / _LPIPS_SCALE


def load_lpips_lin_weights(source: str) -> Tuple[np.ndarray, ...]:
    """The per-tap 1x1 'lin' calibration weights from an lpips-package state
    dict (``lin{k}.model.1.weight``, shape (1, C, 1, 1))."""
    sd = _load_torch_file(source)
    lins = []
    for k in range(len(SQUEEZE_LPIPS_TAPS)):
        w = sd.get(f"lin{k}.model.1.weight")
        if w is None:
            w = sd.get(f"lins.{k}.model.1.weight")
        if w is None:
            raise ValueError(
                f"LPIPS weights: no lin{k}.model.1.weight in {source} — pass "
                "an lpips-package (net='squeeze') state dict")
        lins.append(np.maximum(w.reshape(-1), 0.0).astype(np.float32))
    return tuple(lins)


# ---------------------------------------------------------------------------
# Inception V3 (torchvision geometry; FID-variant branch pooling)
# ---------------------------------------------------------------------------


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: object = 0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = BNInference(self.features, name="bn")(x)
        return nn.relu(x)


def _avg3(x):
    # branch_pool: 3x3 avg, stride 1, pad 1, padding EXCLUDED from the mean
    # (FID-variant Inception; torchmetrics evaluates with these weights)
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns ``(pool2048, logits)``. Input: NHWC, 3 channels, ALREADY
    resized to 299x299 and scaled to [-1, 1] (``inception_preprocess``)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1 -> (N, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(pool)
        return pool, logits


def inception_preprocess(x: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """[0,1] NHWC (1 or 3 ch) -> 299x299 3-channel in [-1,1] (pytorch-fid
    resize_input + normalize_input semantics)."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[-1]), "bilinear")
    return x * 2.0 - 1.0


def load_inception_weights(source: str, params, num_classes: int = 1000):
    """Map a torchvision inception_v3 state dict onto InceptionV3 params.
    Aux-classifier tensors (AuxLogits.*) are ignored; the torchmetrics
    FID-variant weights (1008-way fc) load with ``num_classes=1008``."""
    sd = _load_torch_file(source)
    new = _mutable(params)
    role = {"weight": "kernel", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}
    n = 0
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "AuxLogits" or parts[-1] == "num_batches_tracked":
            continue
        if parts[0] == "fc":
            _put(new, ("fc", "kernel" if parts[1] == "weight" else "bias"),
                 v.T if parts[1] == "weight" else v, "inception")
            n += 1
            continue
        leaf = parts[-1]
        mod = parts[-2]  # 'conv' or 'bn'
        path = tuple(parts[:-2])
        if mod == "conv":
            _put(new, path + ("conv", "kernel"), _conv_t(v), "inception")
        elif mod == "bn":
            r = "scale" if leaf == "weight" else role[leaf]
            _put(new, path + ("bn", r), v, "inception")
        else:
            continue
        n += 1
    if n == 0:
        raise ValueError(f"no inception_v3 tensors found in {source}")
    return new, n
