"""First-party Flax ShuffleNetV2 (torchvision layout).

Reference analog: build_torchvision_model accepts the whole torchvision
classification namespace (biapy/models/__init__.py:1676) including
``shufflenet_v2_x0_5 / x1_0 / x1_5 / x2_0``. First-party Flax here; a
LOCAL ``.pth`` state dict imports bit-exactly through the static key map
(same policy as models/mobilenetv3.py).

Architecture (torchvision shufflenetv2.py):
- conv1: Conv 3x3 s2 (3->24) -> BN -> ReLU; maxpool 3x3 s2 pad 1
- stage2/3/4 with repeats (4, 8, 4): the first unit strides 2 with two
  branches (branch1: dw 3x3 s2 -> BN -> pw 1x1 -> BN -> ReLU; branch2:
  pw -> BN -> ReLU -> dw 3x3 s2 -> BN -> pw -> BN -> ReLU), later units
  split channels in half and run branch2 on the second half only; every
  unit ends with a groups=2 channel shuffle
- conv5: Conv 1x1 -> BN -> ReLU; fc
Published param counts (1000 classes): x0_5 = 1,366,792,
x1_0 = 2,278,604, x1_5 = 3,503,624, x2_0 = 7,393,996.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.resnet import _bn

_SHUFFLE_CHANNELS = {
    "shufflenet_v2_x0_5": (24, 48, 96, 192, 1024),
    "shufflenet_v2_x1_0": (24, 116, 232, 464, 1024),
    "shufflenet_v2_x1_5": (24, 176, 352, 704, 1024),
    "shufflenet_v2_x2_0": (24, 244, 488, 976, 2048),
}
_REPEATS = (4, 8, 4)


def _channel_shuffle(x, groups: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(b, h, w, c)


class _ShuffleUnit(nn.Module):
    out_ch: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch = self.out_ch // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
        else:
            x2 = x
            h = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        feature_group_count=x.shape[-1], use_bias=False,
                        name="b1_dw")(x)
            h = _bn("b1_dwbn", train)(h)
            h = nn.Conv(branch, (1, 1), use_bias=False, name="b1_pw")(h)
            x1 = nn.relu(_bn("b1_pwbn", train)(h))
        h = nn.Conv(branch, (1, 1), use_bias=False, name="b2_pw1")(x2)
        h = nn.relu(_bn("b2_bn1", train)(h))
        h = nn.Conv(branch, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=branch,
                    use_bias=False, name="b2_dw")(h)
        h = _bn("b2_dwbn", train)(h)
        h = nn.Conv(branch, (1, 1), use_bias=False, name="b2_pw2")(h)
        h = nn.relu(_bn("b2_bn2", train)(h))
        return _channel_shuffle(jnp.concatenate([x1, h], axis=-1))


class ShuffleNetV2(nn.Module):
    """torchvision-layout ShuffleNetV2 classifier, channels-last 2D."""

    variant: str = "shufflenet_v2_x1_0"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = _SHUFFLE_CHANNELS[self.variant]
        h = nn.Conv(chans[0], (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv_stem")(x)
        h = nn.relu(_bn("bn_stem", train)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for s, (rep, out_ch) in enumerate(zip(_REPEATS, chans[1:4])):
            for j in range(rep):
                h = _ShuffleUnit(out_ch=out_ch, stride=2 if j == 0 else 1,
                                 name=f"stage{s + 2}_block{j}")(h, train)
        h = nn.Conv(chans[4], (1, 1), use_bias=False, name="conv_last")(h)
        h = nn.relu(_bn("bn_last", train)(h))
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)


def shufflenet_key_map(variant: str = "shufflenet_v2_x1_0",
                       n_classes: int = 1000):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``shufflenet_v2_*`` state dict (branch1 only on stride-2 units;
    branch2 Sequential indices 0/1/3/4/5/6)."""
    params, stats = [], []

    def conv(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))

    def bn(fpath, tkey):
        params.append((tuple(fpath) + ("scale",), tkey + ".weight", None))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))
        stats.append((tuple(fpath) + ("mean",), tkey + ".running_mean", None))
        stats.append((tuple(fpath) + ("var",), tkey + ".running_var", None))

    conv(["conv_stem"], "conv1.0")
    bn(["bn_stem"], "conv1.1")
    for s, rep in enumerate(_REPEATS):
        for j in range(rep):
            mod = f"stage{s + 2}_block{j}"
            base = f"stage{s + 2}.{j}"
            if j == 0:
                conv([mod, "b1_dw"], f"{base}.branch1.0")
                bn([mod, "b1_dwbn"], f"{base}.branch1.1")
                conv([mod, "b1_pw"], f"{base}.branch1.2")
                bn([mod, "b1_pwbn"], f"{base}.branch1.3")
            conv([mod, "b2_pw1"], f"{base}.branch2.0")
            bn([mod, "b2_bn1"], f"{base}.branch2.1")
            conv([mod, "b2_dw"], f"{base}.branch2.3")
            bn([mod, "b2_dwbn"], f"{base}.branch2.4")
            conv([mod, "b2_pw2"], f"{base}.branch2.5")
            bn([mod, "b2_bn2"], f"{base}.branch2.6")
    conv(["conv_last"], "conv5.0")
    bn(["bn_last"], "conv5.1")
    params.append((("fc", "kernel"), "fc.weight", "linear"))
    params.append((("fc", "bias"), "fc.bias", None))
    return params, stats


def load_torchvision_shufflenet(path: str, params, batch_stats,
                                variant: str = "shufflenet_v2_x1_0",
                                verbose: bool = False):
    """Place a LOCAL torchvision ``shufflenet_v2_*`` state dict bit-exactly;
    the class-count-dependent fc skips with the finetuning warning when
    shapes differ."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = shufflenet_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="fc")
