"""First-party Flax GoogLeNet (torchvision layout) + bit-exact import.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676). First-party Flax, channels-last.
``load_torchvision_googlenet`` places a LOCAL ``googlenet.pth`` state dict
bit-exactly; DEFAULT torchvision weights are the aux_logits=True,
transform_input=True configuration, so both aux heads are built (their
outputs are unused at inference — dead code XLA removes) and the input
transform is applied by default.

Architecture (torchvision googlenet.py): BasicConv2d everywhere (bias-free
conv + BN(eps=1e-3) + ReLU); Inception modules with four branches
(1x1; 1x1 -> 3x3; 1x1 -> 3x3 — torchvision keeps the historical
"branch5x5" NAME but uses a 3x3 kernel; maxpool 3x3 s1 -> 1x1); ceil-mode
stride-2 max pools between stages; aux heads after 4a and 4d
(avgpool-to-4x4 -> 1x1 conv 128 -> fc 2048->1024 -> fc -> classes).
Published param counts (1000 classes): 6,624,904 without the aux heads,
13,004,888 with them (the pretrained state dict includes both).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.inception import _BC


def _max_ceil(x, k: int, s: int):
    """torch MaxPool2d(k, s, ceil_mode=True): pad right/bottom so the last
    partial window is kept (flax pads max_pool with -inf)."""
    pads = []
    for dim in (1, 2):
        rem = (x.shape[dim] - k) % s
        pads.append((0, (s - rem) % s if rem else 0))
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=[pads[0], pads[1]])


class _Inception(nn.Module):
    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = _BC(self.ch1x1, 1, name="branch1")(x, train)
        b2 = _BC(self.ch3x3red, 1, name="branch2_0")(x, train)
        b2 = _BC(self.ch3x3, 3, padding=1, name="branch2_1")(b2, train)
        # torchvision: branch3 is named 5x5 but uses a 3x3 kernel
        b3 = _BC(self.ch5x5red, 1, name="branch3_0")(x, train)
        b3 = _BC(self.ch5x5, 3, padding=1, name="branch3_1")(b3, train)
        bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                         padding=[(1, 1), (1, 1)])
        bp = _BC(self.pool_proj, 1, name="branch4_1")(bp, train)
        return jnp.concatenate([b1, b2, b3, bp], axis=-1)


def _adaptive_avg_pool(x, out: int):
    """torch adaptive_avg_pool2d: window i spans [floor(i*H/out),
    ceil((i+1)*H/out)) — variable windows, exact for any H (the aux taps
    sit at 14x14)."""
    rows = []
    for i in range(out):
        h0, h1 = (i * x.shape[1]) // out, -(-((i + 1) * x.shape[1]) // out)
        cols = []
        for j in range(out):
            w0, w1 = (j * x.shape[2]) // out, -(-((j + 1) * x.shape[2]) // out)
            cols.append(x[:, h0:h1, w0:w1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class _Aux(nn.Module):
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _adaptive_avg_pool(x, 4)
        x = _BC(128, 1, name="conv")(x, train)
        x = x.reshape(x.shape[0], -1)  # (B, 4*4*128) channels-LAST order
        x = nn.relu(nn.Dense(1024, name="fc1")(x))
        return nn.Dense(self.n_classes, name="fc2")(x)


# (ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj)
_INCEPTIONS = {
    "inception3a": (64, 96, 128, 16, 32, 32),
    "inception3b": (128, 128, 192, 32, 96, 64),
    "inception4a": (192, 96, 208, 16, 48, 64),
    "inception4b": (160, 112, 224, 24, 64, 64),
    "inception4c": (128, 128, 256, 24, 64, 64),
    "inception4d": (112, 144, 288, 32, 64, 64),
    "inception4e": (256, 160, 320, 32, 128, 128),
    "inception5a": (256, 160, 320, 32, 128, 128),
    "inception5b": (384, 192, 384, 48, 128, 128),
}


class GoogLeNet(nn.Module):
    """torchvision-layout GoogLeNet, channels-last 2D."""

    n_classes: int = 1000
    aux_logits: bool = True
    transform_input: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.transform_input:
            # torchvision _transform_input (googlenet.py): undo the
            # ImageNet normalization into the 0.5/0.5 scheme
            ch = [x[..., i:i + 1] * (s / 0.5) + ((m - 0.5) / 0.5)
                  for i, (m, s) in enumerate(
                      zip((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)))]
            x = jnp.concatenate(ch, axis=-1)
        h = _BC(64, 7, stride=2, padding=3, name="conv1")(x, train)
        h = _max_ceil(h, 3, 2)
        h = _BC(64, 1, name="conv2")(h, train)
        h = _BC(192, 3, padding=1, name="conv3")(h, train)
        h = _max_ceil(h, 3, 2)
        h = _Inception(*_INCEPTIONS["inception3a"], name="inception3a")(h, train)
        h = _Inception(*_INCEPTIONS["inception3b"], name="inception3b")(h, train)
        h = _max_ceil(h, 3, 2)
        h = _Inception(*_INCEPTIONS["inception4a"], name="inception4a")(h, train)
        if self.aux_logits:
            _Aux(self.n_classes, name="aux1")(h, train)
        h = _Inception(*_INCEPTIONS["inception4b"], name="inception4b")(h, train)
        h = _Inception(*_INCEPTIONS["inception4c"], name="inception4c")(h, train)
        h = _Inception(*_INCEPTIONS["inception4d"], name="inception4d")(h, train)
        if self.aux_logits:
            _Aux(self.n_classes, name="aux2")(h, train)
        h = _Inception(*_INCEPTIONS["inception4e"], name="inception4e")(h, train)
        h = _max_ceil(h, 2, 2)
        h = _Inception(*_INCEPTIONS["inception5a"], name="inception5a")(h, train)
        h = _Inception(*_INCEPTIONS["inception5b"], name="inception5b")(h, train)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_classes, name="fc")(h)


def googlenet_key_map(n_classes: int = 1000, aux_logits: bool = True):
    """Static (flax_path, torch_key, transform) triples for the torchvision
    ``googlenet`` state dict."""
    params, stats = [], []

    def bc(fpath, tkey):
        params.append((tuple(fpath) + ("conv", "kernel"),
                       tkey + ".conv.weight", "conv"))
        params.append((tuple(fpath) + ("bn", "scale"),
                       tkey + ".bn.weight", None))
        params.append((tuple(fpath) + ("bn", "bias"),
                       tkey + ".bn.bias", None))
        stats.append((tuple(fpath) + ("bn", "mean"),
                      tkey + ".bn.running_mean", None))
        stats.append((tuple(fpath) + ("bn", "var"),
                      tkey + ".bn.running_var", None))

    def linear(fpath, tkey):
        params.append((tuple(fpath) + ("kernel",), tkey + ".weight", "linear"))
        params.append((tuple(fpath) + ("bias",), tkey + ".bias", None))

    for c in ("conv1", "conv2", "conv3"):
        bc([c], c)
    for mod in _INCEPTIONS:
        bc([mod, "branch1"], f"{mod}.branch1")
        bc([mod, "branch2_0"], f"{mod}.branch2.0")
        bc([mod, "branch2_1"], f"{mod}.branch2.1")
        bc([mod, "branch3_0"], f"{mod}.branch3.0")
        bc([mod, "branch3_1"], f"{mod}.branch3.1")
        bc([mod, "branch4_1"], f"{mod}.branch4.1")
    if aux_logits:
        for aux in ("aux1", "aux2"):
            bc([aux, "conv"], f"{aux}.conv")
            linear([aux, "fc1"], f"{aux}.fc1")
            linear([aux, "fc2"], f"{aux}.fc2")
    linear(["fc"], "fc")
    return params, stats


def load_torchvision_googlenet(path: str, params, batch_stats,
                               verbose: bool = False):
    """Place a LOCAL torchvision ``googlenet`` state dict bit-exactly; the
    class-count-dependent fc / aux fc2 heads skip with the finetuning
    warning when shapes differ. The aux fc1 weights are permuted from
    torch's (C,4,4) flatten order to this model's (4,4,C) (same fixup as
    models/vgg.py classifier.0)."""
    import os as _os
    import tempfile

    import numpy as np
    import torch

    from biapy_tpu.models.tv_import import load_with_key_map

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = dict(sd)
    for aux in ("aux1", "aux2"):
        k = f"{aux}.fc1.weight"
        if k in sd and np.shape(sd[k])[1] == 128 * 16:
            w = np.asarray(sd[k])
            sd[k] = torch.from_numpy(np.ascontiguousarray(
                w.reshape(-1, 128, 4, 4).transpose(0, 2, 3, 1)
                .reshape(-1, 16 * 128)))
    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        torch.save(sd, f.name)
        tmp = f.name
    try:
        pa, sa = googlenet_key_map()
        return load_with_key_map(tmp, params, batch_stats, pa, sa,
                                 variant="googlenet", verbose=verbose,
                                 head_marker="fc")
    finally:
        _os.unlink(tmp)
