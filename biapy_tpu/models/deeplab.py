"""First-party Flax DeepLabV3 (torchvision layout) + bit-exact weight import.

Reference analog: build_torchvision_model accepts the torchvision
SEGMENTATION family — ``deeplabv3_resnet50`` / ``deeplabv3_resnet101`` —
for semantic segmentation (biapy/models/__init__.py:1678). This environment
has neither torchvision nor egress, so the model is first-party Flax on the
dilated first-party ResNet backbone (models/resnet.py), and
``load_torchvision_deeplabv3`` places a LOCAL ``deeplabv3_*.pth`` state
dict bit-exactly (same policy as the resnet/efficientnet loaders).

Architecture (torchvision deeplabv3.py):
- backbone: ResNet with ``replace_stride_with_dilation=(False, True, True)``
  (output stride 8), features taken from layer4 ('out') and layer3 ('aux'),
- classifier (DeepLabHead): ASPP(rates 12/24/36) -> 3x3 conv 256 -> BN ->
  ReLU -> 1x1 conv to n_classes,
- aux_classifier (FCNHead on layer3): present in the DEFAULT weights; built
  so its tensors import, its output is unused at inference (XLA removes the
  dead branch),
- bilinear upsample of the logits back to the input size
  (align_corners=False == jax.image.resize 'linear' half-pixel centers).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.resnet import ResNet, _VARIANTS, _bn

_ASPP_RATES = (12, 24, 36)


class _ASPP(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        h = nn.Conv(256, (1, 1), use_bias=False, name="c0_conv")(x)
        outs.append(nn.relu(_bn("c0_bn", train)(h)))
        for i, r in enumerate(_ASPP_RATES, start=1):
            h = nn.Conv(256, (3, 3), padding=[(r, r), (r, r)],
                        kernel_dilation=(r, r), use_bias=False,
                        name=f"c{i}_conv")(x)
            outs.append(nn.relu(_bn(f"c{i}_bn", train)(h)))
        # ASPPPooling: global average pool -> 1x1 conv -> BN -> ReLU ->
        # upsample (a 1x1 source makes the upsample a broadcast)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(256, (1, 1), use_bias=False, name="c4_conv")(g)
        g = nn.relu(_bn("c4_bn", train)(g))
        outs.append(jnp.broadcast_to(g, x.shape[:3] + (256,)))
        h = jnp.concatenate(outs, axis=-1)
        h = nn.Conv(256, (1, 1), use_bias=False, name="project_conv")(h)
        h = nn.relu(_bn("project_bn", train)(h))
        return nn.Dropout(0.5, deterministic=not train)(h)


class _DeepLabHead(nn.Module):
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _ASPP(name="aspp")(x, train)
        h = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="head_conv")(h)
        h = nn.relu(_bn("head_bn", train)(h))
        return nn.Conv(self.n_classes, (1, 1), name="out_conv")(h)


class _FCNHead(nn.Module):
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(x.shape[-1] // 4, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv")(x)
        h = nn.relu(_bn("bn", train)(h))
        h = nn.Dropout(0.1, deterministic=not train)(h)
        return nn.Conv(self.n_classes, (1, 1), name="out_conv")(h)


class DeepLabV3(nn.Module):
    """torchvision-layout DeepLabV3, channels-last 2D."""

    variant: str = "deeplabv3_resnet50"
    n_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = self.variant.replace("deeplabv3_", "")
        if backbone == "mobilenet_v3_large":
            # torchvision deeplabv3_mobilenet_v3_large: dilated MobileNetV3,
            # out = the final 960-ch conv features, aux = the stride-8 40-ch
            # C2 tap (the same taps the LRASPP wrapper extracts)
            from biapy_tpu.models.mobilenetv3 import MobileNetV3

            l3, l4 = MobileNetV3(variant="mobilenet_v3_large", dilated=True,
                                 features_only="lraspp",
                                 name="backbone")(x, train)
        else:
            l3, l4 = ResNet(variant=backbone, features_only=True,
                            replace_stride_with_dilation=(False, True, True),
                            name="backbone")(x, train)
        out = _DeepLabHead(self.n_classes, name="classifier")(l4, train)
        # aux head exists so DEFAULT state dicts import whole; its output is
        # discarded (dead code at inference, zero-grad at training)
        _ = _FCNHead(self.n_classes, name="aux_classifier")(l3, train)
        return jax.image.resize(
            out, x.shape[:3] + (self.n_classes,), method="linear")


class FCN(nn.Module):
    """torchvision-layout FCN (fcn_resnet50/101), channels-last 2D.

    Reference analog: build_torchvision_model accepts ``fcn_resnet50`` /
    ``fcn_resnet101`` for semantic segmentation
    (biapy/models/__init__.py:1745-1752). Same dilated output-stride-8
    backbone as DeepLabV3; classifier is torchvision's FCNHead (3x3 conv to
    in/4 channels + BN + ReLU + dropout + 1x1 conv)."""

    variant: str = "fcn_resnet50"
    n_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = self.variant.replace("fcn_", "")
        l3, l4 = ResNet(variant=backbone, features_only=True,
                        replace_stride_with_dilation=(False, True, True),
                        name="backbone")(x, train)
        out = _FCNHead(self.n_classes, name="classifier")(l4, train)
        _ = _FCNHead(self.n_classes, name="aux_classifier")(l3, train)
        return jax.image.resize(
            out, x.shape[:3] + (self.n_classes,), method="linear")


def _map_helpers(params, stats):
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

    return conv, conv_b, bn


def _resnet_backbone_map(backbone: str, conv, bn):
    """torchvision ResNet backbone triples shared by deeplabv3_*/fcn_*."""
    block, layers, expansion = _VARIANTS[backbone]
    conv(["backbone", "conv1"], "backbone.conv1")
    bn(["backbone", "bn1"], "backbone.bn1")
    in_f = 64
    for li, reps in enumerate(layers):
        width = 64 * (2 ** li)
        for bi in range(reps):
            mod = ["backbone", f"layer{li + 1}_{bi}"]
            base = f"backbone.layer{li + 1}.{bi}"
            n_convs = 3 if block == "bottleneck" else 2
            for ci in range(1, n_convs + 1):
                conv(mod + [f"conv{ci}"], f"{base}.conv{ci}")
                bn(mod + [f"bn{ci}"], f"{base}.bn{ci}")
            out_f = width * expansion
            if bi == 0 and (li > 0 or in_f != out_f):
                conv(mod + ["downsample_conv"], f"{base}.downsample.0")
                bn(mod + ["downsample_bn"], f"{base}.downsample.1")
            in_f = out_f


def _fcn_head_map(name: str, torch_name: str, conv, conv_b, bn):
    """torchvision FCNHead = Sequential(conv3x3, BN, ReLU, Dropout, conv1x1)."""
    conv([name, "conv"], f"{torch_name}.0")
    bn([name, "bn"], f"{torch_name}.1")
    conv_b([name, "out_conv"], f"{torch_name}.4")


def deeplabv3_key_map(variant: str = "deeplabv3_resnet50",
                      n_classes: int = 21):
    """Static (flax_path, torch_key, transform) triples covering every
    tensor of the torchvision ``deeplabv3_*`` state dict. transform:
    'conv' (OIHW->HWIO), None (copy)."""
    params, stats = [], []
    conv, conv_b, bn = _map_helpers(params, stats)
    backbone = variant.replace("deeplabv3_", "")
    if backbone == "mobilenet_v3_large":
        from biapy_tpu.models.mobilenetv3 import mobilenetv3_key_map

        bp, bs = mobilenetv3_key_map(
            "mobilenet_v3_large", prefix="backbone.", fprefix=("backbone",),
            include_classifier=False, strip_features=True)
        params.extend(bp)
        stats.extend(bs)
    else:
        _resnet_backbone_map(backbone, conv, bn)
    # DeepLabHead: classifier.0 = ASPP (convs.0-4 + project), .1 conv,
    # .2 BN, .4 final conv
    conv(["classifier", "aspp", "c0_conv"], "classifier.0.convs.0.0")
    bn(["classifier", "aspp", "c0_bn"], "classifier.0.convs.0.1")
    for i in range(1, 4):
        conv(["classifier", "aspp", f"c{i}_conv"], f"classifier.0.convs.{i}.0")
        bn(["classifier", "aspp", f"c{i}_bn"], f"classifier.0.convs.{i}.1")
    conv(["classifier", "aspp", "c4_conv"], "classifier.0.convs.4.1")
    bn(["classifier", "aspp", "c4_bn"], "classifier.0.convs.4.2")
    conv(["classifier", "aspp", "project_conv"], "classifier.0.project.0")
    bn(["classifier", "aspp", "project_bn"], "classifier.0.project.1")
    conv(["classifier", "head_conv"], "classifier.1")
    bn(["classifier", "head_bn"], "classifier.2")
    conv_b(["classifier", "out_conv"], "classifier.4")
    _fcn_head_map("aux_classifier", "aux_classifier", conv, conv_b, bn)
    return params, stats


def fcn_key_map(variant: str = "fcn_resnet50", n_classes: int = 21):
    """Static triples for the torchvision ``fcn_*`` state dict."""
    params, stats = [], []
    conv, conv_b, bn = _map_helpers(params, stats)
    _resnet_backbone_map(variant.replace("fcn_", ""), conv, bn)
    _fcn_head_map("classifier", "classifier", conv, conv_b, bn)
    _fcn_head_map("aux_classifier", "aux_classifier", conv, conv_b, bn)
    return params, stats


def load_torchvision_deeplabv3(path: str, params, batch_stats,
                               variant: str = "deeplabv3_resnet50",
                               verbose: bool = False) -> Tuple[dict, dict, int]:
    """Place a LOCAL torchvision ``deeplabv3_*`` state dict onto the Flax
    tree bit-exactly. The two class-count-dependent convs (classifier.4,
    aux_classifier.4) are skipped with the reference's finetuning warning
    when shapes differ (DEFAULT weights are 21-class COCO-VOC)."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = deeplabv3_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose)


def load_torchvision_fcn(path: str, params, batch_stats,
                         variant: str = "fcn_resnet50",
                         verbose: bool = False) -> Tuple[dict, dict, int]:
    """Place a LOCAL torchvision ``fcn_*`` state dict bit-exactly."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = fcn_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose)
