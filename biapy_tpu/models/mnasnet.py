"""First-party Flax MNASNet (torchvision layout) + bit-exact import.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676) including ``mnasnet0_5 / 0_75 / 1_0 /
1_3``. First-party Flax; a LOCAL ``.pth`` state dict imports bit-exactly
through the static key map (same policy as models/mobilenetv3.py).

Architecture (torchvision mnasnet.py): a flat ``layers`` Sequential —
stem conv 3x3 s2 (layers.0-2), depthwise-separable first stage
(layers.3-7), six MBConv stacks (layers.8-13: (kernel, stride, expand,
repeats) = (3,2,3,3), (5,2,3,3), (5,2,6,3), (3,1,6,2), (5,2,6,4),
(3,1,6,1)), head conv 1x1 to 1280 (layers.14-16), classifier Linear.
Depths [32, 16, 24, 40, 80, 96, 192, 320] scale by alpha and round to
multiples of 8 with torchvision's 0.9 round-up bias. Published param
counts (1000 classes): 0_5 = 2,218,512, 0_75 = 3,170,208,
1_0 = 4,383,312, 1_3 = 6,282,256.
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from biapy_tpu.models.resnet import _bn

_ALPHAS = {"mnasnet0_5": 0.5, "mnasnet0_75": 0.75,
           "mnasnet1_0": 1.0, "mnasnet1_3": 1.3}
# (kernel, first_stride, expand_factor, repeats) for layers.8..13
_STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3),
           (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))


def _round8(val: float, round_up_bias: float = 0.9) -> int:
    new_val = max(8, int(val + 4) // 8 * 8)
    return new_val if new_val >= round_up_bias * val else new_val + 8


def _depths(alpha: float):
    return [_round8(d * alpha) for d in (32, 16, 24, 40, 80, 96, 192, 320)]


class _MnasInvertedResidual(nn.Module):
    kernel: int
    stride: int
    expand: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        h = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(x)
        h = nn.relu(_bn("expand_bn", train)(h))
        p = self.kernel // 2
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], feature_group_count=mid,
                    use_bias=False, name="dw_conv")(h)
        h = nn.relu(_bn("dw_bn", train)(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name="project_conv")(h)
        h = _bn("project_bn", train)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MNASNet(nn.Module):
    """torchvision-layout MNASNet classifier, channels-last 2D."""

    variant: str = "mnasnet1_0"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = _depths(_ALPHAS[self.variant])
        h = nn.Conv(d[0], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv_stem")(x)
        h = nn.relu(_bn("bn_stem", train)(h))
        h = nn.Conv(d[0], (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=d[0], use_bias=False,
                    name="sep_dw")(h)
        h = nn.relu(_bn("sep_dwbn", train)(h))
        h = nn.Conv(d[1], (1, 1), use_bias=False, name="sep_pw")(h)
        h = _bn("sep_pwbn", train)(h)
        for s, ((k, st, t, rep), out_ch) in enumerate(zip(_STACKS, d[2:])):
            for j in range(rep):
                h = _MnasInvertedResidual(
                    kernel=k, stride=st if j == 0 else 1, expand=t,
                    out_ch=out_ch, name=f"stack{s}_block{j}")(h, train)
        h = nn.Conv(1280, (1, 1), use_bias=False, name="conv_last")(h)
        h = nn.relu(_bn("bn_last", train)(h))
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)


def mnasnet_key_map(variant: str = "mnasnet1_0", n_classes: int = 1000):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``mnasnet*`` state dict (flat layers.{i} indices; stacks at 8..13 with
    nested .layers.{k} Sequential indices 0/1/3/4/6/7)."""
    params, stats = [], []

    def conv(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))

    def bn(fpath, tkey):
        params.append((tuple(fpath) + ("scale",), tkey + ".weight", None))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))
        stats.append((tuple(fpath) + ("mean",), tkey + ".running_mean", None))
        stats.append((tuple(fpath) + ("var",), tkey + ".running_var", None))

    conv(["conv_stem"], "layers.0")
    bn(["bn_stem"], "layers.1")
    conv(["sep_dw"], "layers.3")
    bn(["sep_dwbn"], "layers.4")
    conv(["sep_pw"], "layers.6")
    bn(["sep_pwbn"], "layers.7")
    for s, (k, st, t, rep) in enumerate(_STACKS):
        for j in range(rep):
            mod = f"stack{s}_block{j}"
            base = f"layers.{8 + s}.{j}.layers"
            conv([mod, "expand_conv"], f"{base}.0")
            bn([mod, "expand_bn"], f"{base}.1")
            conv([mod, "dw_conv"], f"{base}.3")
            bn([mod, "dw_bn"], f"{base}.4")
            conv([mod, "project_conv"], f"{base}.6")
            bn([mod, "project_bn"], f"{base}.7")
    conv(["conv_last"], "layers.14")
    bn(["bn_last"], "layers.15")
    params.append((("fc", "kernel"), "classifier.1.weight", "linear"))
    params.append((("fc", "bias"), "classifier.1.bias", None))
    return params, stats


def load_torchvision_mnasnet(path: str, params, batch_stats,
                             variant: str = "mnasnet1_0",
                             verbose: bool = False):
    """Place a LOCAL torchvision ``mnasnet*`` state dict bit-exactly; the
    class-count-dependent classifier skips with the finetuning warning
    when shapes differ."""
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = mnasnet_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="fc")
