"""First-party Flax Inception V3 (torchvision layout) + bit-exact import.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676). First-party Flax, channels-last.
``load_torchvision_inception`` places a LOCAL ``inception_v3.pth`` state
dict bit-exactly; DEFAULT torchvision weights are the aux_logits=True,
transform_input=True configuration, so the aux head is built (its output
is unused at inference — dead code XLA removes) and the input transform is
applied by default.

All convs are BasicConv2d = bias-free conv + BatchNorm(eps=1e-3) + ReLU
(torchvision inception.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn


def _bn(name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, name=name + "_bn")


class _BC(nn.Module):
    """BasicConv2d: conv (no bias) + BN(1e-3) + ReLU."""

    features: int
    kernel: Union[int, Tuple[int, int]]
    stride: int = 1
    padding: Union[int, Tuple[int, int]] = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel,) * 2 if isinstance(self.kernel, int) else tuple(self.kernel)
        p = (self.padding,) * 2 if isinstance(self.padding, int) else tuple(self.padding)
        h = nn.Conv(self.features, k, strides=(self.stride,) * 2,
                    padding=[(p[0], p[0]), (p[1], p[1])], use_bias=False,
                    name="conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn")(h)
        return nn.relu(h)


def _avg3(x):
    # torch F.avg_pool2d default count_include_pad=True
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


def _max3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class _InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = _BC(64, 1, name="branch1x1")(x, train)
        b5 = _BC(48, 1, name="branch5x5_1")(x, train)
        b5 = _BC(64, 5, padding=2, name="branch5x5_2")(b5, train)
        b3 = _BC(64, 1, name="branch3x3dbl_1")(x, train)
        b3 = _BC(96, 3, padding=1, name="branch3x3dbl_2")(b3, train)
        b3 = _BC(96, 3, padding=1, name="branch3x3dbl_3")(b3, train)
        bp = _BC(self.pool_features, 1, name="branch_pool")(_avg3(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = _BC(384, 3, stride=2, name="branch3x3")(x, train)
        bd = _BC(64, 1, name="branch3x3dbl_1")(x, train)
        bd = _BC(96, 3, padding=1, name="branch3x3dbl_2")(bd, train)
        bd = _BC(96, 3, stride=2, name="branch3x3dbl_3")(bd, train)
        return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


class _InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.c7
        b1 = _BC(192, 1, name="branch1x1")(x, train)
        b7 = _BC(c7, 1, name="branch7x7_1")(x, train)
        b7 = _BC(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7, train)
        b7 = _BC(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7, train)
        bd = _BC(c7, 1, name="branch7x7dbl_1")(x, train)
        bd = _BC(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd, train)
        bd = _BC(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd, train)
        bd = _BC(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd, train)
        bd = _BC(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd, train)
        bp = _BC(192, 1, name="branch_pool")(_avg3(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b3 = _BC(192, 1, name="branch3x3_1")(x, train)
        b3 = _BC(320, 3, stride=2, name="branch3x3_2")(b3, train)
        b7 = _BC(192, 1, name="branch7x7x3_1")(x, train)
        b7 = _BC(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7, train)
        b7 = _BC(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7, train)
        b7 = _BC(192, 3, stride=2, name="branch7x7x3_4")(b7, train)
        return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


class _InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b1 = _BC(320, 1, name="branch1x1")(x, train)
        b3 = _BC(384, 1, name="branch3x3_1")(x, train)
        b3a = _BC(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3, train)
        b3b = _BC(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = _BC(448, 1, name="branch3x3dbl_1")(x, train)
        bd = _BC(384, 3, padding=1, name="branch3x3dbl_2")(bd, train)
        bda = _BC(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd, train)
        bdb = _BC(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _BC(192, 1, name="branch_pool")(_avg3(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision-layout Inception V3, channels-last 2D (299-input)."""

    n_classes: int = 1000
    transform_input: bool = True  # DEFAULT torchvision weights behavior

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.transform_input:
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        h = _BC(32, 3, stride=2, name="Conv2d_1a_3x3")(x, train)
        h = _BC(32, 3, name="Conv2d_2a_3x3")(h, train)
        h = _BC(64, 3, padding=1, name="Conv2d_2b_3x3")(h, train)
        h = _max3s2(h)
        h = _BC(80, 1, name="Conv2d_3b_1x1")(h, train)
        h = _BC(192, 3, name="Conv2d_4a_3x3")(h, train)
        h = _max3s2(h)
        h = _InceptionA(32, name="Mixed_5b")(h, train)
        h = _InceptionA(64, name="Mixed_5c")(h, train)
        h = _InceptionA(64, name="Mixed_5d")(h, train)
        h = _InceptionB(name="Mixed_6a")(h, train)
        h = _InceptionC(128, name="Mixed_6b")(h, train)
        h = _InceptionC(160, name="Mixed_6c")(h, train)
        h = _InceptionC(160, name="Mixed_6d")(h, train)
        h = _InceptionC(192, name="Mixed_6e")(h, train)
        # aux head (DEFAULT weights include it): built so its tensors
        # import; the output is unused at inference
        a = nn.avg_pool(h, (5, 5), strides=(3, 3))
        a = _BC(128, 1, name="AuxLogits_conv0")(a, train)
        a = _BC(768, 5, name="AuxLogits_conv1")(a, train)
        a = jnp.mean(a, axis=(1, 2))
        _ = nn.Dense(self.n_classes, name="AuxLogits_fc")(a)
        h = _InceptionD(name="Mixed_7a")(h, train)
        h = _InceptionE(name="Mixed_7b")(h, train)
        h = _InceptionE(name="Mixed_7c")(h, train)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.n_classes, name="fc")(h)


def inception_key_map(n_classes: int = 1000):
    params, stats = [], []

    def bc(fpath, tkey):
        params.append((tuple(fpath) + ("conv", "kernel"),
                       tkey + ".conv.weight", "conv"))
        params.append((tuple(fpath) + ("bn", "scale"), tkey + ".bn.weight", None))
        params.append((tuple(fpath) + ("bn", "bias"), tkey + ".bn.bias", None))
        stats.append((tuple(fpath) + ("bn", "mean"),
                      tkey + ".bn.running_mean", None))
        stats.append((tuple(fpath) + ("bn", "var"),
                      tkey + ".bn.running_var", None))

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        bc([stem], stem)
    A = ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
         "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")
    for mix in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        for br in A:
            bc([mix, br], f"{mix}.{br}")
    for br in ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
               "branch3x3dbl_3"):
        bc(["Mixed_6a", br], f"Mixed_6a.{br}")
    C = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
         "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
         "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
    for mix in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        for br in C:
            bc([mix, br], f"{mix}.{br}")
    bc(["AuxLogits_conv0"], "AuxLogits.conv0")
    bc(["AuxLogits_conv1"], "AuxLogits.conv1")
    params.append((("AuxLogits_fc", "kernel"), "AuxLogits.fc.weight", "linear"))
    params.append((("AuxLogits_fc", "bias"), "AuxLogits.fc.bias", None))
    for br in ("branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
               "branch7x7x3_3", "branch7x7x3_4"):
        bc(["Mixed_7a", br], f"Mixed_7a.{br}")
    E = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
         "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
         "branch3x3dbl_3b", "branch_pool")
    for mix in ("Mixed_7b", "Mixed_7c"):
        for br in E:
            bc([mix, br], f"{mix}.{br}")
    params.append((("fc", "kernel"), "fc.weight", "linear"))
    params.append((("fc", "bias"), "fc.bias", None))
    return params, stats


def load_torchvision_inception(path: str, params, batch_stats=None,
                               verbose: bool = False):
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = inception_key_map()
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant="inception_v3", verbose=verbose,
                             head_marker="fc")
