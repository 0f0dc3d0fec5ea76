"""EfficientNet B0-B7 classifier.

Reference analog: biapy/models/efficientnet.py, which wraps torchvision's
pretrained EfficientNets. torchvision is not part of this stack, so the
architecture (MBConv with SE, compound width/depth scaling — Tan & Le 2019)
is implemented natively in Flax; pretrained weights are not bundled (gap
noted; BMZ/pretrained import is a later milestone).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv

from biapy_tpu.models.blocks import KERNEL_INIT, DropPath

# (width_mult, depth_mult, dropout)
_VARIANTS = {
    "efficientnet_b0": (1.0, 1.0, 0.2),
    "efficientnet_b1": (1.0, 1.1, 0.2),
    "efficientnet_b2": (1.1, 1.2, 0.3),
    "efficientnet_b3": (1.2, 1.4, 0.3),
    "efficientnet_b4": (1.4, 1.8, 0.4),
    "efficientnet_b5": (1.6, 2.2, 0.4),
    "efficientnet_b6": (1.8, 2.6, 0.5),
    "efficientnet_b7": (2.0, 3.1, 0.5),
}

# base B0 stages: (expand, channels, layers, stride, kernel)
_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_channels(c: float, mult: float, divisor: int = 8) -> int:
    c *= mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


class MBConv(nn.Module):
    out_ch: int
    expand: int
    stride: int
    kernel: int
    sd_prob: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        mid = in_ch * self.expand

        def bn(t):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(t)

        if self.expand != 1:
            h = Conv(mid, kernel_size=(1, 1), use_bias=False, kernel_init=KERNEL_INIT)(h)
            h = nn.silu(bn(h))
        h = Conv(mid, kernel_size=(self.kernel, self.kernel), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    kernel_init=KERNEL_INIT)(h)
        h = nn.silu(bn(h))
        # SE with ratio 0.25 of the INPUT channels
        se_ch = max(1, in_ch // 4)
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = Conv(se_ch, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(s)
        s = nn.silu(s)
        s = Conv(mid, kernel_size=(1, 1), kernel_init=KERNEL_INIT)(s)
        h = h * nn.sigmoid(s)
        h = Conv(self.out_ch, kernel_size=(1, 1), use_bias=False, kernel_init=KERNEL_INIT)(h)
        h = bn(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = x + DropPath(self.sd_prob)(h, train)
        return h


class EfficientNet(nn.Module):
    variant: str = "efficientnet_b0"
    n_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm, dropout = _VARIANTS[self.variant]

        def bn(t):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(t)

        h = Conv(_round_channels(32, wm), kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, kernel_init=KERNEL_INIT)(x)
        h = nn.silu(bn(h))
        total_blocks = sum(int(math.ceil(l * dm)) for _, _, l, _, _ in _STAGES)
        bi = 0
        for expand, ch, layers, stride, kernel in _STAGES:
            out_ch = _round_channels(ch, wm)
            reps = int(math.ceil(layers * dm))
            for li in range(reps):
                sd = 0.2 * bi / max(total_blocks - 1, 1)
                h = MBConv(out_ch, expand, stride if li == 0 else 1, kernel, sd)(h, train)
                bi += 1
        h = Conv(_round_channels(1280, wm), kernel_size=(1, 1), use_bias=False,
                    kernel_init=KERNEL_INIT)(h)
        h = nn.silu(bn(h))
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dropout(dropout, deterministic=not train)(h)
        return {"class": nn.Dense(self.n_classes, kernel_init=KERNEL_INIT)(h)}


def torchvision_key_map(variant: str):
    """The exact correspondence between torchvision's ``efficientnet_b*``
    state-dict keys and this Flax module's parameter tree, in model order.

    Returns ``(param_assigns, stats_assigns)``: lists of
    ``(flax_path_tuple, torch_key, transform)`` with transform one of
    ``conv`` (OIHW→HWIO), ``dense`` (transpose), ``id``.

    Reference analog: build_torchvision_model loads the torchvision module
    with DEFAULT weights (models/__init__.py:1609); here the same tensors
    arrive from a LOCAL ``torch.save``d state dict.
    """
    wm, dm, _ = _VARIANTS[variant]
    pa, sa = [], []

    def conv(fpath, tkey, bias=False):
        pa.append((fpath + ("kernel",), tkey + ".weight", "conv"))
        if bias:
            pa.append((fpath + ("bias",), tkey + ".bias", "id"))

    def bnorm(fpath, tprefix):
        pa.append((fpath + ("scale",), tprefix + ".weight", "id"))
        pa.append((fpath + ("bias",), tprefix + ".bias", "id"))
        sa.append((fpath + ("mean",), tprefix + ".running_mean", "id"))
        sa.append((fpath + ("var",), tprefix + ".running_var", "id"))

    conv(("Conv_0",), "features.0.0")
    bnorm(("BatchNorm_0",), "features.0.1")
    bi = 0
    for feat, (expand, _ch, layers, _stride, _kernel) in enumerate(_STAGES, start=1):
        for li in range(int(math.ceil(layers * dm))):
            m, t = f"MBConv_{bi}", f"features.{feat}.{li}.block"
            j = ci = bni = 0
            if expand != 1:
                conv((m, f"Conv_{ci}"), f"{t}.{j}.0")
                bnorm((m, f"BatchNorm_{bni}"), f"{t}.{j}.1")
                ci, bni, j = ci + 1, bni + 1, j + 1
            conv((m, f"Conv_{ci}"), f"{t}.{j}.0")  # depthwise
            bnorm((m, f"BatchNorm_{bni}"), f"{t}.{j}.1")
            ci, bni, j = ci + 1, bni + 1, j + 1
            conv((m, f"Conv_{ci}"), f"{t}.{j}.fc1", bias=True)  # SE reduce
            conv((m, f"Conv_{ci + 1}"), f"{t}.{j}.fc2", bias=True)  # SE expand
            ci, j = ci + 2, j + 1
            conv((m, f"Conv_{ci}"), f"{t}.{j}.0")  # project
            bnorm((m, f"BatchNorm_{bni}"), f"{t}.{j}.1")
            bi += 1
    head = len(_STAGES) + 1
    conv(("Conv_1",), f"features.{head}.0")
    bnorm(("BatchNorm_1",), f"features.{head}.1")
    # classifier loads only when class counts match (reference: head replaced
    # + finetuning warning otherwise, models/__init__.py:1712-1737)
    pa.append((("Dense_0", "kernel"), "classifier.1.weight", "dense"))
    pa.append((("Dense_0", "bias"), "classifier.1.bias", "id"))
    return pa, sa


def load_torchvision_efficientnet(path: str, params, batch_stats,
                                  variant: str = "efficientnet_b0",
                                  verbose: bool = False):
    """Load a LOCAL torchvision ``efficientnet_b*`` state dict onto the Flax
    params. Returns ``(params, batch_stats, n_loaded)``. The classifier head
    is skipped (with the reference's finetuning warning) when DATA.N_CLASSES
    differs from the checkpoint's class count."""
    import numpy as np
    import torch
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    pa, sa = torchvision_key_map(variant)

    def place(tree, assigns, used):
        flat = {k: np.asarray(v) for k, v in flatten_dict(tree).items()}
        for fpath, tkey, tf in assigns:
            if tkey not in sd:
                raise ValueError(
                    f"torchvision efficientnet state dict at '{path}' is "
                    f"missing key '{tkey}' — is it a torchvision "
                    f"{variant} state dict?")
            a = sd[tkey]
            if tf == "conv":
                a = a.transpose(2, 3, 1, 0)
            elif tf == "dense":
                a = a.T
            if fpath not in flat:
                raise ValueError(f"internal: flax path {fpath} not in tree")
            if flat[fpath].shape != a.shape:
                if fpath[0] == "Dense_0":  # replaced head (class-count change)
                    print(f"WARNING: Model's head changed from {a.shape} to "
                          f"{flat[fpath].shape} so a finetunning is required "
                          "to have good results")
                    continue
                raise ValueError(
                    f"shape mismatch at {'.'.join(fpath)}: checkpoint "
                    f"{a.shape} vs model {flat[fpath].shape} — wrong "
                    f"TORCHVISION_MODEL_NAME variant?")
            flat[fpath] = a.astype(np.float32)
            used.append(tkey)
        return unflatten_dict(flat)

    used: list = []
    new_params = place(params, pa, used)
    new_stats = place(batch_stats, sa, used) if batch_stats else batch_stats
    if verbose:
        print(f"Loaded {len(used)} tensors from torchvision {variant} "
              f"state dict {path}")
    return new_params, new_stats, len(used)
