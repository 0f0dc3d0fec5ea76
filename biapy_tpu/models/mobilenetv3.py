"""First-party Flax MobileNetV3 (torchvision layout) + LRASPP head.

Reference analog: build_torchvision_model accepts the whole torchvision
classification namespace (biapy/models/__init__.py:1676) — including
``mobilenet_v3_large`` / ``mobilenet_v3_small`` — and the segmentation
model ``lraspp_mobilenet_v3_large`` (:1745-1752). This environment has
neither torchvision nor egress, so both are first-party Flax and the
loaders place LOCAL ``.pth`` state dicts bit-exactly through the static
key maps below (same policy as models/resnet.py / models/deeplab.py).

Architecture notes (torchvision mobilenetv3.py):
- features.0: Conv 3x3 s2 -> BN -> hardswish
- features.1..N: InvertedResidual blocks, each Sequential([expand?]
  ConvBNAct, depthwise ConvBNAct, [SqueezeExcitation], project ConvBN);
  residual add when stride == 1 and in == out
- features.last: Conv 1x1 -> BN -> hardswish (6x the last block width)
- classifier: Linear -> hardswish -> Dropout -> Linear
- ``dilated=True`` (the LRASPP backbone) sets dilation=2 on the last
  stage's three blocks; InvertedResidual then forces stride 1, so the
  backbone ends at output stride 16 with a stride-8 'low' tap.
- SqueezeExcitation: avgpool -> fc1 1x1 -> ReLU -> fc2 1x1 -> hardsigmoid
  (torch hardsigmoid == relu6(x+3)/6 == jax.nn.hard_sigmoid).

LRASPP head (torchvision lraspp.py::LRASPPHead): 1x1 ConvBNReLU on the
high-level features gated by a global-pool sigmoid branch, bilinearly
upsampled to the low-level tap, then low_classifier(low) +
high_classifier(gated); final logits upsample back to the input size.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.resnet import _bn


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (input_ch, kernel, expanded_ch, out_ch, use_se, activation, stride)
# torchvision _mobilenet_v3_conf, width_mult=1.0
_MBV3_LARGE = (
    (16, 3, 16, 16, False, "RE", 1),
    (16, 3, 64, 24, False, "RE", 2),     # C1
    (24, 3, 72, 24, False, "RE", 1),
    (24, 5, 72, 40, True, "RE", 2),      # C2
    (40, 5, 120, 40, True, "RE", 1),
    (40, 5, 120, 40, True, "RE", 1),
    (40, 3, 240, 80, False, "HS", 2),    # C3
    (80, 3, 200, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 480, 112, True, "HS", 1),
    (112, 3, 672, 112, True, "HS", 1),
    (112, 5, 672, 160, True, "HS", 2),   # C4 (dilated stage starts here)
    (160, 5, 960, 160, True, "HS", 1),
    (160, 5, 960, 160, True, "HS", 1),
)
_MBV3_SMALL = (
    (16, 3, 16, 16, True, "RE", 2),      # C1
    (16, 3, 72, 24, False, "RE", 2),     # C2
    (24, 3, 88, 24, False, "RE", 1),
    (24, 5, 96, 40, True, "HS", 2),      # C3
    (40, 5, 240, 40, True, "HS", 1),
    (40, 5, 240, 40, True, "HS", 1),
    (40, 5, 120, 48, True, "HS", 1),
    (48, 5, 144, 48, True, "HS", 1),
    (48, 5, 288, 96, True, "HS", 2),     # C4 (dilated stage starts here)
    (96, 5, 576, 96, True, "HS", 1),
    (96, 5, 576, 96, True, "HS", 1),
)
_VARIANTS = {
    # conf, last_conv_ch, classifier_hidden, dilated-stage-start (block idx)
    "mobilenet_v3_large": (_MBV3_LARGE, 960, 1280, 12),
    "mobilenet_v3_small": (_MBV3_SMALL, 576, 1024, 8),
}


def _act(name: str):
    return nn.relu if name == "RE" else nn.hard_swish


class _SqueezeExcitation(nn.Module):
    squeeze: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="fc2")(s)
        return x * jax.nn.hard_sigmoid(s)


class _InvertedResidual(nn.Module):
    kernel: int
    expanded: int
    out_ch: int
    use_se: bool
    act: str
    stride: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        act = _act(self.act)
        h = x
        if self.expanded != in_ch:
            h = nn.Conv(self.expanded, (1, 1), use_bias=False,
                        name="expand_conv")(h)
            h = act(_bn("expand_bn", train)(h))
        # torchvision InvertedResidual: stride = 1 if dilation > 1
        st = 1 if self.dilation > 1 else self.stride
        k, d = self.kernel, self.dilation
        p = (k - 1) // 2 * d
        h = nn.Conv(self.expanded, (k, k), strides=(st, st),
                    padding=[(p, p), (p, p)], kernel_dilation=(d, d),
                    feature_group_count=self.expanded, use_bias=False,
                    name="dw_conv")(h)
        h = act(_bn("dw_bn", train)(h))
        if self.use_se:
            h = _SqueezeExcitation(_make_divisible(self.expanded // 4),
                                   name="se")(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name="project_conv")(h)
        h = _bn("project_bn", train)(h)
        if st == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MobileNetV3(nn.Module):
    """torchvision-layout MobileNetV3 classifier, channels-last 2D.

    ``features_only='lraspp'`` returns the (low, high) taps torchvision's
    IntermediateLayerGetter extracts for the LRASPP head: low = the C2
    stage output (stride 8), high = the final 1x1 conv features."""

    variant: str = "mobilenet_v3_large"
    n_classes: int = 1000
    dilated: bool = False
    features_only: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        conf, last_ch, hidden, dil_start = _VARIANTS[self.variant]
        h = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv_stem")(x)
        h = nn.hard_swish(_bn("bn_stem", train)(h))
        low = None
        # low tap = output of torchvision's stage_indices[-4] module: with
        # four stride-2 blocks that is the SECOND stride-2 block itself
        # (lraspp.py stage slicing; Large: features[4], 40 ch at stride 8)
        s2_seen = 0
        for i, (in_ch, k, exp, out_ch, se, act, st) in enumerate(conf):
            d = 2 if (self.dilated and i >= dil_start) else 1
            h = _InvertedResidual(kernel=k, expanded=exp, out_ch=out_ch,
                                  use_se=se, act=act, stride=st, dilation=d,
                                  name=f"block{i + 1}")(h, train)
            if st == 2:
                s2_seen += 1
                if s2_seen == 2:
                    low = h
        h = nn.Conv(last_ch, (1, 1), use_bias=False, name="conv_last")(h)
        h = nn.hard_swish(_bn("bn_last", train)(h))
        if self.features_only == "lraspp":
            return low, h
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dense(hidden, name="fc1")(h)
        h = nn.hard_swish(h)
        return nn.Dense(self.n_classes, name="fc2")(h)


class LRASPP(nn.Module):
    """torchvision-layout lraspp_mobilenet_v3_large, channels-last 2D."""

    n_classes: int = 21
    inter_channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        low, high = MobileNetV3(variant="mobilenet_v3_large", dilated=True,
                                features_only="lraspp",
                                name="backbone")(x, train)
        h = nn.Conv(self.inter_channels, (1, 1), use_bias=False,
                    name="cbr_conv")(high)
        h = nn.relu(_bn("cbr_bn", train)(h))
        s = jnp.mean(high, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.inter_channels, (1, 1), use_bias=False,
                    name="scale_conv")(s)
        s = jax.nn.sigmoid(s)
        h = h * s
        h = jax.image.resize(h, low.shape[:3] + (self.inter_channels,),
                             method="linear")
        out = (nn.Conv(self.n_classes, (1, 1), name="low_out_conv")(low)
               + nn.Conv(self.n_classes, (1, 1), name="high_out_conv")(h))
        return jax.image.resize(
            out, x.shape[:3] + (self.n_classes,), method="linear")


def mobilenetv3_key_map(variant: str = "mobilenet_v3_large",
                        n_classes: int = 1000, prefix: str = "",
                        fprefix: Tuple[str, ...] = (),
                        include_classifier: bool = True,
                        strip_features: bool = False):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``mobilenet_v3_*`` state dict. ``prefix``/``fprefix`` relocate the
    feature tree (LRASPP/DeepLabV3 wrap it under ``backbone.``), and
    ``strip_features`` drops the ``features.`` segment — torchvision's
    segmentation wrappers build an IntermediateLayerGetter over
    ``model.features``' INDEXED children, so their state-dict keys are
    ``backbone.0.0.weight``, not ``backbone.features.0.0.weight``."""
    conf, last_ch, hidden, _ = _VARIANTS[variant]
    params, stats = [], []

    def _t(tkey):
        return tkey.replace("features.", "", 1) if strip_features else tkey

    def conv(fpath, tkey):
        params.append((fprefix + tuple(fpath) + ("kernel",),
                       prefix + _t(tkey) + ".weight", "conv"))

    def conv_b(fpath, tkey):
        conv(fpath, tkey)
        params.append((fprefix + tuple(fpath) + ("bias",),
                       prefix + _t(tkey) + ".bias", None))

    def bn(fpath, tkey):
        params.append((fprefix + tuple(fpath) + ("scale",),
                       prefix + _t(tkey) + ".weight", None))
        params.append((fprefix + tuple(fpath) + ("bias",),
                       prefix + _t(tkey) + ".bias", None))
        stats.append((fprefix + tuple(fpath) + ("mean",),
                      prefix + _t(tkey) + ".running_mean", None))
        stats.append((fprefix + tuple(fpath) + ("var",),
                      prefix + _t(tkey) + ".running_var", None))

    def linear(fpath, tkey):
        params.append((fprefix + tuple(fpath) + ("kernel",),
                       prefix + _t(tkey) + ".weight", "linear"))
        params.append((fprefix + tuple(fpath) + ("bias",),
                       prefix + _t(tkey) + ".bias", None))

    conv(["conv_stem"], "features.0.0")
    bn(["bn_stem"], "features.0.1")
    for i, (in_ch, k, exp, out_ch, se, act, st) in enumerate(conf):
        mod = f"block{i + 1}"
        base = f"features.{i + 1}.block"
        li = 0
        if exp != in_ch:
            conv([mod, "expand_conv"], f"{base}.{li}.0")
            bn([mod, "expand_bn"], f"{base}.{li}.1")
            li += 1
        conv([mod, "dw_conv"], f"{base}.{li}.0")
        bn([mod, "dw_bn"], f"{base}.{li}.1")
        li += 1
        if se:
            conv_b([mod, "se", "fc1"], f"{base}.{li}.fc1")
            conv_b([mod, "se", "fc2"], f"{base}.{li}.fc2")
            li += 1
        conv([mod, "project_conv"], f"{base}.{li}.0")
        bn([mod, "project_bn"], f"{base}.{li}.1")
    conv(["conv_last"], f"features.{len(conf) + 1}.0")
    bn(["bn_last"], f"features.{len(conf) + 1}.1")
    if include_classifier:
        linear(["fc1"], "classifier.0")
        linear(["fc2"], "classifier.3")
    return params, stats


def lraspp_key_map(n_classes: int = 21):
    """Static triples for the torchvision ``lraspp_mobilenet_v3_large``
    state dict (backbone features under ``backbone.{idx}`` — the
    IntermediateLayerGetter indexes features' children directly — and
    LRASPPHead under ``classifier.``)."""
    params, stats = mobilenetv3_key_map(
        "mobilenet_v3_large", prefix="backbone.", fprefix=("backbone",),
        include_classifier=False, strip_features=True)

    def conv(fpath, tkey, bias=False):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))
        if bias:
            params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))

    conv(["cbr_conv"], "classifier.cbr.0")
    params.append((("cbr_bn", "scale"), "classifier.cbr.1.weight", None))
    params.append((("cbr_bn", "bias"), "classifier.cbr.1.bias", None))
    stats.append((("cbr_bn", "mean"), "classifier.cbr.1.running_mean", None))
    stats.append((("cbr_bn", "var"), "classifier.cbr.1.running_var", None))
    conv(["scale_conv"], "classifier.scale.1")
    conv(["low_out_conv"], "classifier.low_classifier", bias=True)
    conv(["high_out_conv"], "classifier.high_classifier", bias=True)
    return params, stats


def load_torchvision_mobilenetv3(path: str, params, batch_stats,
                                 variant: str = "mobilenet_v3_large",
                                 verbose: bool = False):
    """Place a LOCAL torchvision ``mobilenet_v3_*`` state dict bit-exactly.
    The class-count-dependent classifier.3 linear is skipped with the
    finetuning warning when shapes differ."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = mobilenetv3_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="fc2")


def load_torchvision_lraspp(path: str, params, batch_stats,
                            verbose: bool = False):
    """Place a LOCAL torchvision ``lraspp_mobilenet_v3_large`` state dict
    bit-exactly; the two class-count convs skip with the warning."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = lraspp_key_map()
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant="lraspp_mobilenet_v3_large",
                             verbose=verbose, head_marker="out_conv")
