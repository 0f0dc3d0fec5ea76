"""First-party Flax EfficientNetV2 s/m/l (torchvision layout) + import.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676) including ``efficientnet_v2_s / _m / _l``.
First-party Flax; a LOCAL ``.pth`` state dict imports bit-exactly through
the static key map (same policy as models/mobilenetv3.py).

Architecture (torchvision efficientnet.py V2 configs): stem conv 3x3 s2
-> BN(1e-3) -> SiLU; early stages use FusedMBConv (expand kxk conv + BN +
SiLU then 1x1 project + BN; a single kxk conv when expand_ratio == 1),
later stages MBConv (1x1 expand, depthwise kxk, SE with squeeze =
block_input // 4, 1x1 project); stochastic depth ramps to 0.2; head conv
1x1 -> 1280 -> BN -> SiLU; classifier Linear. Published param counts
(1000 classes): s = 21,458,488, m = 54,139,356, l = 118,515,272.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import DropPath

# rows: (fused?, expand, kernel, stride, in_ch, out_ch, layers)
_V2_CONFIGS = {
    "efficientnet_v2_s": (
        (True, 1, 3, 1, 24, 24, 2),
        (True, 4, 3, 2, 24, 48, 4),
        (True, 4, 3, 2, 48, 64, 4),
        (False, 4, 3, 2, 64, 128, 6),
        (False, 6, 3, 1, 128, 160, 9),
        (False, 6, 3, 2, 160, 256, 15),
    ),
    "efficientnet_v2_m": (
        (True, 1, 3, 1, 24, 24, 3),
        (True, 4, 3, 2, 24, 48, 5),
        (True, 4, 3, 2, 48, 80, 5),
        (False, 4, 3, 2, 80, 160, 7),
        (False, 6, 3, 1, 160, 176, 14),
        (False, 6, 3, 2, 176, 304, 18),
        (False, 6, 3, 1, 304, 512, 5),
    ),
    "efficientnet_v2_l": (
        (True, 1, 3, 1, 32, 32, 4),
        (True, 4, 3, 2, 32, 64, 7),
        (True, 4, 3, 2, 64, 96, 7),
        (False, 4, 3, 2, 96, 192, 10),
        (False, 6, 3, 1, 192, 224, 19),
        (False, 6, 3, 2, 224, 384, 25),
        (False, 6, 3, 1, 384, 640, 7),
    ),
}


def _bn3(name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, name=name)


class _FusedMBConv(nn.Module):
    expand: int
    kernel: int
    stride: int
    out_ch: int
    sd_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        p = self.kernel // 2
        if self.expand != 1:
            h = nn.Conv(in_ch * self.expand,
                        (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=[(p, p), (p, p)], use_bias=False,
                        name="expand_conv")(x)
            h = nn.silu(_bn3("expand_bn", train)(h))
            h = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        name="project_conv")(h)
            h = _bn3("project_bn", train)(h)
        else:
            h = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=[(p, p), (p, p)], use_bias=False,
                        name="fused_conv")(x)
            h = nn.silu(_bn3("fused_bn", train)(h))
        if self.stride == 1 and in_ch == self.out_ch:
            h = x + DropPath(self.sd_prob)(h, train)
        return h


class _MBConvV2(nn.Module):
    expand: int
    kernel: int
    stride: int
    out_ch: int
    sd_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        p = self.kernel // 2
        h = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(x)
        h = nn.silu(_bn3("expand_bn", train)(h))
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=mid,
                    use_bias=False, name="dw_conv")(h)
        h = nn.silu(_bn3("dw_bn", train)(h))
        sq = max(1, in_ch // 4)
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.silu(nn.Conv(sq, (1, 1), name="se_fc1")(s))
        s = nn.Conv(mid, (1, 1), name="se_fc2")(s)
        h = h * nn.sigmoid(s)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name="project_conv")(h)
        h = _bn3("project_bn", train)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = x + DropPath(self.sd_prob)(h, train)
        return h


class EfficientNetV2(nn.Module):
    """torchvision-layout EfficientNetV2 classifier, channels-last 2D."""

    variant: str = "efficientnet_v2_s"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        conf = _V2_CONFIGS[self.variant]
        h = nn.Conv(conf[0][4], (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv_stem")(x)
        h = nn.silu(_bn3("bn_stem", train)(h))
        total = sum(c[-1] for c in conf)
        bi = 0
        for s, (fused, t, k, st, cin, cout, rep) in enumerate(conf):
            for j in range(rep):
                sd = 0.2 * bi / max(total - 1, 1)
                cls = _FusedMBConv if fused else _MBConvV2
                h = cls(expand=t, kernel=k, stride=st if j == 0 else 1,
                        out_ch=cout, sd_prob=sd,
                        name=f"stage{s}_block{j}")(h, train)
                bi += 1
        h = nn.Conv(1280, (1, 1), use_bias=False, name="conv_last")(h)
        h = nn.silu(_bn3("bn_last", train)(h))
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)


def efficientnet_v2_key_map(variant: str = "efficientnet_v2_s",
                            n_classes: int = 1000):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``efficientnet_v2_*`` state dict (features.{i}.{j}.block nesting;
    FusedMBConv collapses to one indexed conv when expand == 1)."""
    conf = _V2_CONFIGS[variant]
    params, stats = [], []

    def conv(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))

    def conv_b(fpath, tkey):
        conv(fpath, tkey)
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))

    def bn(fpath, tkey):
        params.append((tuple(fpath) + ("scale",), tkey + ".weight", None))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))
        stats.append((tuple(fpath) + ("mean",), tkey + ".running_mean", None))
        stats.append((tuple(fpath) + ("var",), tkey + ".running_var", None))

    conv(["conv_stem"], "features.0.0")
    bn(["bn_stem"], "features.0.1")
    for s, (fused, t, k, st, cin, cout, rep) in enumerate(conf):
        for j in range(rep):
            mod = f"stage{s}_block{j}"
            base = f"features.{s + 1}.{j}.block"
            if fused and t == 1:
                conv([mod, "fused_conv"], f"{base}.0.0")
                bn([mod, "fused_bn"], f"{base}.0.1")
            elif fused:
                conv([mod, "expand_conv"], f"{base}.0.0")
                bn([mod, "expand_bn"], f"{base}.0.1")
                conv([mod, "project_conv"], f"{base}.1.0")
                bn([mod, "project_bn"], f"{base}.1.1")
            else:
                conv([mod, "expand_conv"], f"{base}.0.0")
                bn([mod, "expand_bn"], f"{base}.0.1")
                conv([mod, "dw_conv"], f"{base}.1.0")
                bn([mod, "dw_bn"], f"{base}.1.1")
                conv_b([mod, "se_fc1"], f"{base}.2.fc1")
                conv_b([mod, "se_fc2"], f"{base}.2.fc2")
                conv([mod, "project_conv"], f"{base}.3.0")
                bn([mod, "project_bn"], f"{base}.3.1")
    head = len(conf) + 1
    conv(["conv_last"], f"features.{head}.0")
    bn(["bn_last"], f"features.{head}.1")
    params.append((("fc", "kernel"), "classifier.1.weight", "linear"))
    params.append((("fc", "bias"), "classifier.1.bias", None))
    return params, stats


def load_torchvision_efficientnet_v2(path: str, params, batch_stats,
                                     variant: str = "efficientnet_v2_s",
                                     verbose: bool = False):
    """Place a LOCAL torchvision ``efficientnet_v2_*`` state dict
    bit-exactly; the class-count-dependent classifier skips with the
    finetuning warning when shapes differ."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = efficientnet_v2_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="fc")
