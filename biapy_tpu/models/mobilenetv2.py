"""First-party Flax MobileNetV2 (torchvision layout).

Reference analog: build_torchvision_model accepts the whole torchvision
classification namespace (biapy/models/__init__.py:1676) including
``mobilenet_v2``. No torchvision/egress here, so the model is first-party
Flax and ``load_torchvision_mobilenetv2`` places a LOCAL ``.pth`` state
dict bit-exactly through a static key map (same policy as
models/mobilenetv3.py).

Architecture (torchvision mobilenetv2.py, width_mult=1.0):
- features.0: Conv 3x3 s2 (3->32) -> BN -> ReLU6
- features.1..17: InvertedResidual blocks from the (t, c, n, s) table
  (expand 1x1 -> BN -> ReLU6 when t != 1; depthwise 3x3 -> BN -> ReLU6;
  project 1x1 -> BN; residual add when stride == 1 and in == out)
- features.18: Conv 1x1 (320->1280) -> BN -> ReLU6
- classifier: Dropout -> Linear(1280, n_classes)
Published param count (1000 classes): 3,504,872.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.resnet import _bn

# (expand_ratio t, out_channels c, repeats n, first_stride s)
_MBV2_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class _InvertedResidualV2(nn.Module):
    expand_ratio: int
    out_ch: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False, name="expand_conv")(h)
            h = _relu6(_bn("expand_bn", train)(h))
        h = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    use_bias=False, name="dw_conv")(h)
        h = _relu6(_bn("dw_bn", train)(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name="project_conv")(h)
        h = _bn("project_bn", train)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    """torchvision-layout MobileNetV2 classifier, channels-last 2D."""

    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv_stem")(x)
        h = _relu6(_bn("bn_stem", train)(h))
        i = 0
        for t, c, n, s in _MBV2_SETTING:
            for j in range(n):
                h = _InvertedResidualV2(
                    expand_ratio=t, out_ch=c, stride=s if j == 0 else 1,
                    name=f"block{i + 1}")(h, train)
                i += 1
        h = nn.Conv(1280, (1, 1), use_bias=False, name="conv_last")(h)
        h = _relu6(_bn("bn_last", train)(h))
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)


def mobilenetv2_key_map(n_classes: int = 1000):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``mobilenet_v2`` state dict (features.{i}.conv.{j} nesting; the
    expand_ratio==1 first block has no expand stage, shifting indices)."""
    params, stats = [], []

    def conv(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))

    def bn(fpath, tkey):
        params.append((tuple(fpath) + ("scale",), tkey + ".weight", None))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))
        stats.append((tuple(fpath) + ("mean",), tkey + ".running_mean", None))
        stats.append((tuple(fpath) + ("var",), tkey + ".running_var", None))

    conv(["conv_stem"], "features.0.0")
    bn(["bn_stem"], "features.0.1")
    i = 0
    for t, c, n, s in _MBV2_SETTING:
        for _ in range(n):
            mod = f"block{i + 1}"
            base = f"features.{i + 1}.conv"
            if t != 1:
                conv([mod, "expand_conv"], f"{base}.0.0")
                bn([mod, "expand_bn"], f"{base}.0.1")
                conv([mod, "dw_conv"], f"{base}.1.0")
                bn([mod, "dw_bn"], f"{base}.1.1")
                conv([mod, "project_conv"], f"{base}.2")
                bn([mod, "project_bn"], f"{base}.3")
            else:
                conv([mod, "dw_conv"], f"{base}.0.0")
                bn([mod, "dw_bn"], f"{base}.0.1")
                conv([mod, "project_conv"], f"{base}.1")
                bn([mod, "project_bn"], f"{base}.2")
            i += 1
    conv(["conv_last"], "features.18.0")
    bn(["bn_last"], "features.18.1")
    params.append((("fc", "kernel"), "classifier.1.weight", "linear"))
    params.append((("fc", "bias"), "classifier.1.bias", None))
    return params, stats


def load_torchvision_mobilenetv2(path: str, params, batch_stats,
                                 verbose: bool = False):
    """Place a LOCAL torchvision ``mobilenet_v2`` state dict bit-exactly;
    the class-count-dependent classifier skips with the finetuning
    warning when shapes differ."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = mobilenetv2_key_map()
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant="mobilenet_v2", verbose=verbose,
                             head_marker="fc")
