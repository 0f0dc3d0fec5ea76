"""First-party Flax RegNet X/Y (torchvision layout) + bit-exact import.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676) including the ``regnet_x_*`` /
``regnet_y_*`` families. First-party Flax; a LOCAL ``.pth`` state dict
imports bit-exactly through the static key map (same policy as
models/mobilenetv3.py).

Architecture (torchvision regnet.py): SimpleStemIN (conv 3x3 s2 -> 32 ch
-> BN -> ReLU), then 4 AnyStages of ResBottleneckBlock (1x1 -> BN -> ReLU,
3x3 group conv s -> BN -> ReLU, [SqueezeExcitation for Y], 1x1 -> BN,
projection on shape change, ReLU after the residual add), global avg pool,
fc. Stage widths/depths derive from the (depth, w_0, w_a, w_m,
group_width) quantized-linear parameterization (BlockParams
.from_init_params), reproduced exactly below.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.resnet import _bn

# depth, w_0, w_a, w_m, group_width, se (torchvision regnet.py model fns)
_REGNET_PARAMS = {
    "regnet_y_400mf": (16, 48, 27.89, 2.09, 8, True),
    "regnet_y_800mf": (14, 56, 38.84, 2.4, 16, True),
    "regnet_y_1_6gf": (27, 48, 20.71, 2.65, 24, True),
    "regnet_y_3_2gf": (21, 80, 42.63, 2.66, 24, True),
    "regnet_y_8gf": (17, 192, 76.82, 2.19, 56, True),
    "regnet_y_16gf": (18, 200, 106.23, 2.48, 112, True),
    "regnet_y_32gf": (20, 232, 115.89, 2.53, 232, True),
    "regnet_y_128gf": (27, 456, 160.83, 2.52, 264, True),
    "regnet_x_400mf": (22, 24, 24.48, 2.54, 16, False),
    "regnet_x_800mf": (16, 56, 35.73, 2.28, 16, False),
    "regnet_x_1_6gf": (18, 80, 34.01, 2.25, 24, False),
    "regnet_x_3_2gf": (25, 88, 26.31, 2.25, 48, False),
    "regnet_x_8gf": (23, 80, 49.56, 2.88, 120, False),
    "regnet_x_16gf": (22, 216, 55.59, 2.1, 128, False),
    "regnet_x_32gf": (23, 320, 69.86, 2.0, 168, False),
}


def _quantize_float(f, q):
    return int(round(f / q) * q)


def regnet_stage_params(variant: str):
    """(stage_widths, stage_depths, group_widths, se_ratio) — torchvision
    BlockParams.from_init_params reproduced exactly (QUANT=8,
    bottleneck_multiplier=1.0, se_ratio=0.25 for Y)."""
    depth, w_0, w_a, w_m, group_width, se = _REGNET_PARAMS[variant]
    widths_cont = [w_0 + w_a * j for j in range(depth)]
    block_capacity = [round(math.log(w / w_0) / math.log(w_m))
                      for w in widths_cont]
    block_widths = [int(round(w_0 * w_m ** c / 8) * 8) for c in block_capacity]
    num_stages = len(set(block_widths))
    # split into stages wherever the width changes
    stage_widths, stage_depths = [], []
    prev = None
    for w in block_widths:
        if w != prev:
            stage_widths.append(w)
            stage_depths.append(1)
            prev = w
        else:
            stage_depths[-1] += 1
    assert len(stage_widths) == num_stages
    # adjust widths/groups compatibility (bottleneck_multiplier = 1.0)
    gws = [group_width] * num_stages
    widths = [int(w * 1.0) for w in stage_widths]
    gws_min = [min(g, w) for g, w in zip(gws, widths)]
    ws_bot = [_quantize_float(w, g) for w, g in zip(widths, gws_min)]
    stage_widths = [int(w / 1.0) for w in ws_bot]
    return stage_widths, stage_depths, gws_min, (0.25 if se else None)


class _RegNetBlock(nn.Module):
    w_out: int
    stride: int
    group_width: int
    se_in_ch: int = 0  # width_in of the STAGE input for the SE squeeze
    se_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_in = x.shape[-1]
        proj = None
        if w_in != self.w_out or self.stride != 1:
            proj = nn.Conv(self.w_out, (1, 1), strides=(self.stride,) * 2,
                           use_bias=False, name="proj_conv")(x)
            proj = _bn("proj_bn", train)(proj)
        h = nn.Conv(self.w_out, (1, 1), use_bias=False, name="conv_a")(x)
        h = nn.relu(_bn("bn_a", train)(h))
        h = nn.Conv(self.w_out, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)],
                    feature_group_count=self.w_out // self.group_width,
                    use_bias=False, name="conv_b")(h)
        h = nn.relu(_bn("bn_b", train)(h))
        if self.se_ratio:
            # torchvision: squeeze_channels = round(se_ratio * width_in of
            # the block's INPUT width)
            sq = int(round(self.se_in_ch * self.se_ratio))
            s = jnp.mean(h, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(sq, (1, 1), name="se_fc1")(s))
            s = nn.Conv(h.shape[-1], (1, 1), name="se_fc2")(s)
            h = h * nn.sigmoid(s)
        h = nn.Conv(self.w_out, (1, 1), use_bias=False, name="conv_c")(h)
        h = _bn("bn_c", train)(h)
        return nn.relu(h + (proj if proj is not None else x))


class RegNet(nn.Module):
    """torchvision-layout RegNet classifier, channels-last 2D."""

    variant: str = "regnet_y_400mf"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths, depths, gws, se_ratio = regnet_stage_params(self.variant)
        h = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="stem_conv")(x)
        h = nn.relu(_bn("stem_bn", train)(h))
        for s, (w, d, g) in enumerate(zip(widths, depths, gws)):
            for j in range(d):
                h = _RegNetBlock(
                    w_out=w, stride=2 if j == 0 else 1, group_width=g,
                    se_in_ch=h.shape[-1], se_ratio=se_ratio or 0.0,
                    name=f"stage{s + 1}_block{j}")(h, train)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)


def regnet_key_map(variant: str, n_classes: int = 1000):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``regnet_*`` state dict (trunk_output.block{s}.block{s}-{j} nesting;
    f.a/f.b/f.se/f.c ConvBNActivation indices)."""
    widths, depths, gws, se_ratio = regnet_stage_params(variant)
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

    conv(["stem_conv"], "stem.0")
    bn(["stem_bn"], "stem.1")
    prev_w = 32
    for s, (w, d) in enumerate(zip(widths, depths)):
        for j in range(d):
            mod = f"stage{s + 1}_block{j}"
            base = f"trunk_output.block{s + 1}.block{s + 1}-{j}"
            if j == 0:  # every stage starts with stride 2 -> proj exists
                conv([mod, "proj_conv"], f"{base}.proj.0")
                bn([mod, "proj_bn"], f"{base}.proj.1")
            conv([mod, "conv_a"], f"{base}.f.a.0")
            bn([mod, "bn_a"], f"{base}.f.a.1")
            conv([mod, "conv_b"], f"{base}.f.b.0")
            bn([mod, "bn_b"], f"{base}.f.b.1")
            if se_ratio:
                conv_b([mod, "se_fc1"], f"{base}.f.se.fc1")
                conv_b([mod, "se_fc2"], f"{base}.f.se.fc2")
            conv([mod, "conv_c"], f"{base}.f.c.0")
            bn([mod, "bn_c"], f"{base}.f.c.1")
        prev_w = w
    params.append((("fc", "kernel"), "fc.weight", "linear"))
    params.append((("fc", "bias"), "fc.bias", None))
    return params, stats


def load_torchvision_regnet(path: str, params, batch_stats,
                            variant: str = "regnet_y_400mf",
                            verbose: bool = False):
    """Place a LOCAL torchvision ``regnet_*`` state dict bit-exactly; the
    class-count-dependent fc skips with the finetuning warning when
    shapes differ."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = regnet_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="fc")
