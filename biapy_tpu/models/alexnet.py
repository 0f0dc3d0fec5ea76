"""First-party Flax AlexNet (torchvision layout) + bit-exact import.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676). Same channels-last flatten-order fixup of
``classifier.1`` as models/vgg.py (torch flattens (C,6,6))."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.vgg import _adaptive_avg_pool


class AlexNet(nn.Module):
    n_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(nn.Conv(64, (11, 11), strides=(4, 4),
                            padding=[(2, 2), (2, 2)], name="conv0")(x))
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = nn.relu(nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)],
                            name="conv1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = nn.relu(nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)],
                            name="conv2")(h))
        h = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            name="conv3")(h))
        h = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            name="conv4")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = _adaptive_avg_pool(h, 6)
        h = h.reshape(h.shape[0], -1)  # (B, 6*6*256) channels-LAST
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.Dense(4096, name="fc0")(h))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = nn.relu(nn.Dense(4096, name="fc1")(h))
        return nn.Dense(self.n_classes, name="fc2")(h)


def alexnet_key_map(n_classes: int = 1000):
    params = []
    for i, fi in enumerate([0, 3, 6, 8, 10]):
        params.append(((f"conv{i}", "kernel"), f"features.{fi}.weight", "conv"))
        params.append(((f"conv{i}", "bias"), f"features.{fi}.bias", None))
    for fl, tn in (("fc0", "classifier.1"), ("fc1", "classifier.4"),
                   ("fc2", "classifier.6")):
        params.append(((fl, "kernel"), tn + ".weight", "linear"))
        params.append(((fl, "bias"), tn + ".bias", None))
    return params, []


def load_torchvision_alexnet(path: str, params, batch_stats=None,
                             verbose: bool = False):
    import torch

    from biapy_tpu.models.tv_import import load_with_key_map

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = dict(sd)
    w0 = np.asarray(sd["classifier.1.weight"])
    if w0.shape[1] == 256 * 36:
        sd["classifier.1.weight"] = torch.from_numpy(np.ascontiguousarray(
            w0.reshape(-1, 256, 6, 6).transpose(0, 2, 3, 1)
            .reshape(-1, 36 * 256)))
    import os as _os
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        torch.save(sd, f.name)
        tmp = f.name
    try:
        pa, sa = alexnet_key_map()
        return load_with_key_map(tmp, params, batch_stats, pa, sa,
                                 variant="alexnet", verbose=verbose,
                                 head_marker="fc2")
    finally:
        _os.unlink(tmp)
