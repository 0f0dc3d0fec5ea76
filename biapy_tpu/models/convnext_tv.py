"""First-party Flax ConvNeXt (torchvision layout) + bit-exact weight import.

Reference analog: build_torchvision_model accepts the whole torchvision
classification namespace (biapy/models/__init__.py:1676) and ConvNeXt is
one of its modern families. This environment has neither torchvision nor
egress, so the model is first-party Flax (channels-last) and
``load_torchvision_convnext`` places a LOCAL ``convnext_*.pth`` state dict
bit-exactly through the static key map below (same policy as
models/resnet.py / models/mobilenetv3.py). Distinct from models/unext.py,
which is the reference's own U-NeXt segmentation architecture.

Architecture (torchvision convnext.py):
- stem: Conv 4x4 s4 (bias) + LayerNorm (channels, eps 1e-6)
- 4 stages of CNBlocks: depthwise 7x7 conv (bias) -> LayerNorm -> Linear
  dim->4dim -> GELU -> Linear 4dim->dim, scaled by a learnable
  ``layer_scale`` (init 1e-6) with stochastic depth (linearly 0 -> sd_prob
  across blocks), residual add
- between stages: LayerNorm + Conv 2x2 s2 downsample
- head: LayerNorm + global mean pool + Linear
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_VARIANTS = {
    # depths, dims, default stochastic depth
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768), 0.1),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768), 0.4),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024), 0.5),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536), 0.5),
}


def _ln(name):
    return nn.LayerNorm(epsilon=1e-6, name=name)


class _CNBlock(nn.Module):
    dim: int
    sd_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, name="dwconv")(x)
        h = _ln("ln")(h)
        h = nn.Dense(4 * self.dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        scale = self.param("layer_scale",
                           lambda k, s: jnp.full(s, 1e-6), (self.dim,))
        h = h * scale
        if train and self.sd_prob > 0:
            # torchvision StochasticDepth mode="row": per-sample keep mask
            keep = 1.0 - self.sd_prob
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) *
                                        (x.ndim - 1))
            h = h * mask / keep
        return x + h


class ConvNeXt(nn.Module):
    """torchvision-layout ConvNeXt classifier, channels-last 2D."""

    variant: str = "convnext_tiny"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims, sd = _VARIANTS[self.variant]
        h = nn.Conv(dims[0], (4, 4), strides=(4, 4), name="stem_conv")(x)
        h = _ln("stem_ln")(h)
        total = sum(depths)
        bi = 0
        for si, (depth, dim) in enumerate(zip(depths, dims)):
            if si > 0:
                h = _ln(f"down{si}_ln")(h)
                h = nn.Conv(dim, (2, 2), strides=(2, 2),
                            name=f"down{si}_conv")(h)
            for j in range(depth):
                p = sd * bi / max(total - 1, 1)
                h = _CNBlock(dim, sd_prob=p,
                             name=f"stage{si}_block{j}")(h, train)
                bi += 1
        h = _ln("head_ln")(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="head_fc")(h)


def convnext_key_map(variant: str = "convnext_tiny", n_classes: int = 1000):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``convnext_*`` state dict. No batch stats (LayerNorm only)."""
    depths, dims, _ = _VARIANTS[variant]
    params = []

    def conv_b(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))

    def ln(fpath, tkey):
        params.append((tuple(fpath) + ("scale",), tkey + ".weight", None))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))

    def linear(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "linear"))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))

    conv_b(["stem_conv"], "features.0.0")
    ln(["stem_ln"], "features.0.1")
    for si, depth in enumerate(depths):
        if si > 0:
            ln([f"down{si}_ln"], f"features.{2 * si}.0")
            conv_b([f"down{si}_conv"], f"features.{2 * si}.1")
        for j in range(depth):
            mod = f"stage{si}_block{j}"
            base = f"features.{2 * si + 1}.{j}"
            conv_b([mod, "dwconv"], f"{base}.block.0")
            ln([mod, "ln"], f"{base}.block.2")
            linear([mod, "fc1"], f"{base}.block.3")
            linear([mod, "fc2"], f"{base}.block.5")
            params.append(((mod, "layer_scale"), f"{base}.layer_scale", "flat"))
    ln(["head_ln"], "classifier.0")
    linear(["head_fc"], "classifier.2")
    return params, []


def load_torchvision_convnext(path: str, params, batch_stats=None,
                              variant: str = "convnext_tiny",
                              verbose: bool = False):
    """Place a LOCAL torchvision ``convnext_*`` state dict bit-exactly; the
    class-count classifier.2 linear skips with the finetuning warning."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = convnext_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="head_fc")
