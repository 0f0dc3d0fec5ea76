"""First-party Flax VGG 11/13/16/19 (+BN) (torchvision layout) + import.

Reference analog: build_torchvision_model accepts the whole torchvision
classification namespace (biapy/models/__init__.py:1676), VGG included.
First-party Flax, channels-last; ``load_torchvision_vgg`` places a LOCAL
``vgg*.pth`` state dict bit-exactly — including the channels-first
flatten-order fixup of ``classifier.0`` (torch flattens (C,7,7); this model
flattens (7,7,C), so the first FC's weight is permuted accordingly, making
the logits numerically identical).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512,
              512, 512, "M", 512, 512, 512, 512, "M"),
}


def _adaptive_avg_pool(x, out=7):
    """torch AdaptiveAvgPool2d((7,7)): bin i covers
    [floor(i*H/7), ceil((i+1)*H/7))."""
    h, w = x.shape[1:3]
    if h == out and w == out:
        return x
    rows = []
    for i in range(out):
        r0, r1 = (i * h) // out, -(-((i + 1) * h) // out)
        cols = []
        for j in range(out):
            c0, c1 = (j * w) // out, -(-((j + 1) * w) // out)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, 7, 7, C)


class VGG(nn.Module):
    """torchvision-layout VGG classifier, channels-last 2D."""

    variant: str = "vgg16"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = self.variant.replace("_bn", "")
        use_bn = self.variant.endswith("_bn")
        h = x
        ci = 0
        for v in _CFGS[base]:
            if v == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                continue
            h = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"conv{ci}")(h)
            if use_bn:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn{ci}")(h)
            h = nn.relu(h)
            ci += 1
        h = _adaptive_avg_pool(h, 7)
        h = h.reshape(h.shape[0], -1)  # (B, 7*7*512) channels-LAST order
        h = nn.relu(nn.Dense(4096, name="fc0")(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.Dense(4096, name="fc1")(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.n_classes, name="fc2")(h)


def vgg_key_map(variant: str = "vgg16", n_classes: int = 1000):
    base = variant.replace("_bn", "")
    use_bn = variant.endswith("_bn")
    params, stats = [], []
    fi = 0  # torch features index
    ci = 0
    for v in _CFGS[base]:
        if v == "M":
            fi += 1
            continue
        params.append(((f"conv{ci}", "kernel"), f"features.{fi}.weight", "conv"))
        params.append(((f"conv{ci}", "bias"), f"features.{fi}.bias", None))
        fi += 1
        if use_bn:
            params.append(((f"bn{ci}", "scale"), f"features.{fi}.weight", None))
            params.append(((f"bn{ci}", "bias"), f"features.{fi}.bias", None))
            stats.append(((f"bn{ci}", "mean"), f"features.{fi}.running_mean", None))
            stats.append(((f"bn{ci}", "var"), f"features.{fi}.running_var", None))
            fi += 1
        fi += 1  # ReLU
        ci += 1
    for fl, tn in (("fc0", "classifier.0"), ("fc1", "classifier.3"),
                   ("fc2", "classifier.6")):
        params.append(((fl, "kernel"), tn + ".weight", "linear"))
        params.append(((fl, "bias"), tn + ".bias", None))
    return params, stats


def load_torchvision_vgg(path: str, params, batch_stats=None,
                         variant: str = "vgg16", verbose: bool = False):
    """Bit-exact import; classifier.0 is permuted from torch's (C,7,7)
    flatten order to this model's (7,7,C) before the linear transpose."""
    import torch

    from biapy_tpu.models.tv_import import load_with_key_map

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = dict(sd)
    w0 = np.asarray(sd["classifier.0.weight"])
    if w0.shape[1] == 512 * 49:
        sd["classifier.0.weight"] = torch.from_numpy(np.ascontiguousarray(
            w0.reshape(-1, 512, 7, 7).transpose(0, 2, 3, 1)
            .reshape(-1, 49 * 512)))
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        torch.save(sd, f.name)
        tmp = f.name
    try:
        pa, sa = vgg_key_map(variant)
        return load_with_key_map(tmp, params, batch_stats, pa, sa,
                                 variant=variant, verbose=verbose,
                                 head_marker="fc2")
    finally:
        import os as _os

        _os.unlink(tmp)
