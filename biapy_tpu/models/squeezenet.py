"""First-party Flax SqueezeNet 1.0/1.1 (torchvision layout) + weight import.

Reference analog: build_torchvision_model special-cases squeezenet1_0/1_1
in the classification namespace — its head is a 1x1 CONV, not a linear, so
the head swap replaces ``classifier[1]`` with a fresh Conv2d
(biapy/models/__init__.py:1711-1718). Same here: ``n_classes != 1000``
replaces the final conv and the loader skips it with the finetuning
warning.

Architecture (torchvision squeezenet.py): stem conv + ReLU + ceil-mode
3x3/2 max pools between Fire stages; Fire = squeeze 1x1 -> ReLU ->
concat(expand1x1, expand3x3) each ReLU'd; head = dropout + 1x1 conv to
n_classes + ReLU + global average pool.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# (stem_out, stem_k, fire specs in features order, pool positions)
# fire spec: (squeeze, expand1x1, expand3x3); pool_after: indices in the
# FIRE list after which a ceil-mode max pool runs
_VARIANTS = {
    "squeezenet1_0": dict(
        stem=(96, 7),
        fires=[(16, 64, 64), (16, 64, 64), (32, 128, 128),
               (32, 128, 128), (48, 192, 192), (48, 192, 192),
               (64, 256, 256), (64, 256, 256)],
        pool_before=[0, 3, 7],   # pool before fire i (stem pool = before 0)
        feature_idx=[3, 4, 5, 7, 8, 9, 10, 12],
    ),
    "squeezenet1_1": dict(
        stem=(64, 3),
        fires=[(16, 64, 64), (16, 64, 64), (32, 128, 128),
               (32, 128, 128), (48, 192, 192), (48, 192, 192),
               (64, 256, 256), (64, 256, 256)],
        pool_before=[0, 2, 4],
        feature_idx=[3, 4, 6, 7, 9, 10, 11, 12],
    ),
}


def _ceil_max_pool(x, k=3, s=2):
    """torch MaxPool2d(ceil_mode=True): pad right/bottom with -inf so the
    last partial window counts."""
    out = [-(-(d - k) // s) + 1 for d in x.shape[1:3]]
    need = [max(0, (o - 1) * s + k - d) for o, d in zip(out, x.shape[1:3])]
    if any(need):
        x = jnp.pad(x, ((0, 0), (0, need[0]), (0, need[1]), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


class _Fire(nn.Module):
    squeeze: int
    e1: int
    e3: int

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        a = nn.relu(nn.Conv(self.e1, (1, 1), name="expand1x1")(s))
        b = nn.relu(nn.Conv(self.e3, (3, 3), padding=[(1, 1), (1, 1)],
                            name="expand3x3")(s))
        return jnp.concatenate([a, b], axis=-1)


class SqueezeNet(nn.Module):
    """torchvision-layout SqueezeNet classifier, channels-last 2D."""

    variant: str = "squeezenet1_1"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        v = _VARIANTS[self.variant]
        c, k = v["stem"]
        h = nn.relu(nn.Conv(c, (k, k), strides=(2, 2),
                            padding="VALID", name="stem_conv")(x))
        for i, (sq, e1, e3) in enumerate(v["fires"]):
            if i in v["pool_before"]:
                h = _ceil_max_pool(h)
            h = _Fire(sq, e1, e3, name=f"fire{i}")(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.Conv(self.n_classes, (1, 1), name="head_conv")(h))
        return jnp.mean(h, axis=(1, 2))


def squeezenet_key_map(variant: str = "squeezenet1_1",
                       n_classes: int = 1000):
    v = _VARIANTS[variant]
    params = []

    def conv_b(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))

    conv_b(["stem_conv"], "features.0")
    for i, fi in enumerate(v["feature_idx"]):
        conv_b([f"fire{i}", "squeeze"], f"features.{fi}.squeeze")
        conv_b([f"fire{i}", "expand1x1"], f"features.{fi}.expand1x1")
        conv_b([f"fire{i}", "expand3x3"], f"features.{fi}.expand3x3")
    conv_b(["head_conv"], "classifier.1")
    return params, []


def load_torchvision_squeezenet(path: str, params, batch_stats=None,
                                variant: str = "squeezenet1_1",
                                verbose: bool = False):
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = squeezenet_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="head_conv")
