"""First-party Flax ResNet (torchvision layout) + bit-exact weight import.

Reference analog: build_torchvision_model (biapy/models/__init__.py:1609)
accepts torchvision classification families including resnet18/34/50/101/152
and loads DEFAULT (downloaded) weights. This environment has neither
torchvision nor egress, so the family is first-party Flax with module names
mirroring torchvision's state-dict keys, and ``load_torchvision_resnet``
places a LOCAL ``resnet*.pth`` state dict bit-exactly (same policy as
models/efficientnet.py).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

_VARIANTS = {
    # (block, layers, expansion)
    "resnet18": ("basic", (2, 2, 2, 2), 1),
    "resnet34": ("basic", (3, 4, 6, 3), 1),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 4),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 4),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 4),
    # same skeleton, grouped/wider bottlenecks (torchvision resnet.py)
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 4),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 4),
    "resnext101_64x4d": ("bottleneck", (3, 4, 23, 3), 4),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), 4),
    "wide_resnet101_2": ("bottleneck", (3, 4, 23, 3), 4),
}

# (groups, width_per_group) — torchvision bottleneck width =
# int(planes * width_per_group / 64) * groups
_GROUPS = {
    "resnext50_32x4d": (32, 4),
    "resnext101_32x8d": (32, 8),
    "resnext101_64x4d": (64, 4),
    "wide_resnet50_2": (1, 128),
    "wide_resnet101_2": (1, 128),
}


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torchvision's BasicBlock raises for dilation > 1 ("Dilation > 1 not
        # supported in BasicBlock") — mirror that so replace_stride_with_dilation
        # on resnet18/34 fails loudly instead of silently dropping the dilation.
        if self.dilation != 1:
            raise ValueError(
                "Dilation > 1 not supported in BasicBlock (torchvision parity); "
                "use a bottleneck variant (resnet50/101/152) for dilated backbones")
        identity = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1", train)(h))
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(h)
        h = _bn("bn2", train)(h)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(h + identity)


class _Bottleneck(nn.Module):
    width: int                  # planes — out = planes * 4
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_f = self.width * 4
        # torchvision: bottleneck conv width scales with width_per_group
        # and groups (ResNeXt / Wide-ResNet families)
        wb = int(self.width * self.base_width / 64.0) * self.groups
        d = self.dilation
        h = nn.Conv(wb, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1", train)(h))
        # torchvision ResNet v1.5: the stride sits on the 3x3 conv; when a
        # stage's stride is replaced with dilation (DeepLabV3 backbones) the
        # 3x3 dilates instead (torchvision resnet.py _make_layer)
        h = nn.Conv(wb, (3, 3), strides=(self.stride,) * 2,
                    padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                    feature_group_count=self.groups,
                    use_bias=False, name="conv2")(h)
        h = nn.relu(_bn("bn2", train)(h))
        h = nn.Conv(out_f, (1, 1), use_bias=False, name="conv3")(h)
        h = _bn("bn3", train)(h)
        if self.downsample:
            identity = nn.Conv(out_f, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(h + identity)


class ResNet(nn.Module):
    """torchvision-layout ResNet classifier, channels-last.

    ``replace_stride_with_dilation`` mirrors torchvision's flag (one bool
    per stage 2-4): a True stage keeps spatial resolution and dilates its
    3x3 convs instead (the DeepLabV3 output-stride-8 backbone uses
    (False, True, True)). ``features_only`` skips pool+fc and returns the
    (layer3, layer4) feature maps (what torchvision's IntermediateLayerGetter
    extracts for segmentation heads)."""

    variant: str = "resnet50"
    n_classes: int = 2
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, False)
    features_only: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers, expansion = _VARIANTS[self.variant]
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1", train)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        in_f = 64
        dilation = 1
        feats = {}
        for li, reps in enumerate(layers):
            width = 64 * (2 ** li)
            stride = 2 if li > 0 else 1
            prev_dilation = dilation
            if li > 0 and self.replace_stride_with_dilation[li - 1]:
                dilation *= stride
                stride = 1
            for bi in range(reps):
                st = stride if bi == 0 else 1
                out_f = width * expansion
                down = bi == 0 and (st != 1 or in_f != out_f)
                # torchvision: the stage's FIRST block keeps the previous
                # dilation; later blocks use the updated one
                d = prev_dilation if bi == 0 else dilation
                if block == "basic":
                    h = _BasicBlock(width, st, down, d,
                                    name=f"layer{li + 1}_{bi}")(h, train)
                else:
                    g, wpg = _GROUPS.get(self.variant, (1, 64))
                    h = _Bottleneck(width, st, down, d, groups=g,
                                    base_width=wpg,
                                    name=f"layer{li + 1}_{bi}")(h, train)
                in_f = out_f
            feats[f"layer{li + 1}"] = h
        if self.features_only:
            return feats["layer3"], feats["layer4"]
        h = jnp.mean(h, axis=(1, 2))
        return {"class": nn.Dense(self.n_classes, name="fc")(h)}


def load_torchvision_resnet(path: str, params, batch_stats,
                            variant: str = "resnet50",
                            verbose: bool = False) -> Tuple[dict, dict, int]:
    """Place a LOCAL torchvision ``resnet*`` state dict onto the Flax tree
    bit-exactly (key translation is mechanical because module names mirror
    torchvision's). The fc head is skipped with the reference's finetuning
    warning when the class count differs."""
    import numpy as np
    import torch
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    def translate(tkey: str):
        """torch key -> (collection, flax path tuple, transform)."""
        parts = tkey.split(".")
        if parts[0].startswith("layer"):
            mod = [f"{parts[0]}_{parts[1]}"]
            rest = parts[2:]
            if rest[0] == "downsample":
                rest = [{"0": "downsample_conv", "1": "downsample_bn"}[rest[1]]] + rest[2:]
        else:
            mod = []
            rest = parts
        leaf = rest[-1]
        name = rest[:-1]
        is_bn = name and ("bn" in name[-1] or name[-1] == "downsample_bn")
        if leaf in ("running_mean", "running_var"):
            return ("batch_stats", tuple(mod + name +
                                         ["mean" if leaf == "running_mean" else "var"]), None)
        if is_bn:
            return ("params", tuple(mod + name + [{"weight": "scale", "bias": "bias"}[leaf]]), None)
        if leaf == "weight":
            tf = "dense" if name == ["fc"] else "conv"
            return ("params", tuple(mod + name + ["kernel"]), tf)
        return ("params", tuple(mod + name + ["bias"]), None)

    flat_p = {k: np.asarray(v) for k, v in flatten_dict(params).items()}
    flat_s = {k: np.asarray(v) for k, v in flatten_dict(batch_stats).items()} \
        if batch_stats else {}
    n_loaded = 0
    for tkey, a in sd.items():
        col, fpath, tf = translate(tkey)
        tgt = flat_p if col == "params" else flat_s
        if fpath not in tgt:
            raise ValueError(
                f"torchvision {variant} state dict key '{tkey}' has no home "
                f"in the Flax tree (path {fpath}) — wrong "
                "TORCHVISION_MODEL_NAME variant?")
        if tf == "conv":
            a = a.transpose(2, 3, 1, 0)
        elif tf == "dense":
            a = a.T
        if tgt[fpath].shape != a.shape:
            if fpath[0] == "fc":
                print(f"WARNING: Model's head changed from {a.shape} to "
                      f"{tgt[fpath].shape} so a finetunning is required "
                      "to have good results")
                continue
            raise ValueError(
                f"shape mismatch at {'.'.join(fpath)}: checkpoint {a.shape} "
                f"vs model {tgt[fpath].shape} — wrong variant?")
        tgt[fpath] = a.astype(np.float32)
        n_loaded += 1
    if verbose:
        print(f"Loaded {n_loaded} tensors from torchvision {variant} "
              f"state dict {path}")
    return (unflatten_dict(flat_p),
            unflatten_dict(flat_s) if flat_s else batch_stats, n_loaded)
