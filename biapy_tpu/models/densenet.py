"""First-party Flax DenseNet 121/161/169/201 (torchvision layout) + import.

Reference analog: build_torchvision_model accepts the whole torchvision
classification namespace (biapy/models/__init__.py:1676). First-party
Flax, channels-last; ``load_torchvision_densenet`` places LOCAL
``densenet*.pth`` state dicts bit-exactly through the static key map.

Architecture (torchvision densenet.py): stem conv7/2 + BN + ReLU + pool;
four dense blocks of bottleneck layers (BN-ReLU-1x1conv(bn_size*growth)
-> BN-ReLU-3x3conv(growth), output concatenated onto the running
features), transitions (BN-ReLU-1x1conv(half)-avgpool2) between blocks,
final BN + ReLU + global pool + Linear.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

_VARIANTS = {
    # (block config, growth, init features)
    "densenet121": ((6, 12, 24, 16), 32, 64),
    "densenet161": ((6, 12, 36, 24), 48, 96),
    "densenet169": ((6, 12, 32, 32), 32, 64),
    "densenet201": ((6, 12, 48, 32), 32, 64),
}


def _bn(name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class _DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(_bn("norm1", train)(x))
        h = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False,
                    name="conv1")(h)
        h = nn.relu(_bn("norm2", train)(h))
        h = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(h)
        return h


class DenseNet(nn.Module):
    """torchvision-layout DenseNet classifier, channels-last 2D."""

    variant: str = "densenet121"
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks, growth, init_f = _VARIANTS[self.variant]
        h = nn.Conv(init_f, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv0")(x)
        h = nn.relu(_bn("norm0", train)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        nf = init_f
        for bi, reps in enumerate(blocks):
            feats = [h]
            for li in range(reps):
                cat = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
                out = _DenseLayer(growth,
                                  name=f"block{bi + 1}_layer{li + 1}")(cat, train)
                feats.append(out)
            h = jnp.concatenate(feats, axis=-1)
            nf = nf + reps * growth
            if bi != len(blocks) - 1:
                h = nn.relu(_bn(f"trans{bi + 1}_norm", train)(h))
                h = nn.Conv(nf // 2, (1, 1), use_bias=False,
                            name=f"trans{bi + 1}_conv")(h)
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                nf = nf // 2
        h = nn.relu(_bn("norm5", train)(h))
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="classifier")(h)


def densenet_key_map(variant: str = "densenet121", n_classes: int = 1000):
    blocks, growth, init_f = _VARIANTS[variant]
    params, stats = [], []

    def conv(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "conv"))

    def bn(fpath, tkey):
        params.append((tuple(fpath) + ("scale",), tkey + ".weight", None))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))
        stats.append((tuple(fpath) + ("mean",), tkey + ".running_mean", None))
        stats.append((tuple(fpath) + ("var",), tkey + ".running_var", None))

    conv(["conv0"], "features.conv0")
    bn(["norm0"], "features.norm0")
    for bi, reps in enumerate(blocks):
        for li in range(reps):
            mod = f"block{bi + 1}_layer{li + 1}"
            base = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            bn([mod, "norm1"], f"{base}.norm1")
            conv([mod, "conv1"], f"{base}.conv1")
            bn([mod, "norm2"], f"{base}.norm2")
            conv([mod, "conv2"], f"{base}.conv2")
        if bi != len(blocks) - 1:
            bn([f"trans{bi + 1}_norm"], f"features.transition{bi + 1}.norm")
            conv([f"trans{bi + 1}_conv"], f"features.transition{bi + 1}.conv")
    bn(["norm5"], "features.norm5")
    params.append((("classifier", "kernel"), "classifier.weight", "linear"))
    params.append((("classifier", "bias"), "classifier.bias", None))
    return params, stats


def load_torchvision_densenet(path: str, params, batch_stats=None,
                              variant: str = "densenet121",
                              verbose: bool = False):
    from biapy_tpu.models.tv_import import load_with_key_map

    pa, sa = densenet_key_map(variant)
    return load_with_key_map(path, params, batch_stats, pa, sa,
                             variant=variant, verbose=verbose,
                             head_marker="classifier")
