"""Simple CNN classifier.

Reference analog: biapy/models/simple_cnn.py (simple_CNN:24): two conv
blocks (32 then 64 filters, 3/3/5 kernels, BN, pool /2) followed by a
dropout + dense classification head. Returns {"class": logits} — softmax is
applied by the engine at inference.
"""

from __future__ import annotations

from flax import linen as nn

from biapy_tpu.models.blocks import Conv
import jax.numpy as jnp

from biapy_tpu.models.blocks import KERNEL_INIT, get_activation, max_pool


class SimpleCNN(nn.Module):
    ndim: int = 2
    n_classes: int = 2
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = self.ndim
        act = get_activation(self.activation)

        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)

        # Block 1 (32 filters)
        h = Conv(32, kernel_size=(3,) * nd, padding="SAME", kernel_init=KERNEL_INIT)(x)
        h = act(bn(h))
        h = Conv(32, kernel_size=(3,) * nd, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = act(bn(h))
        h = Conv(32, kernel_size=(5,) * nd, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = max_pool(h, (2,) * nd)
        h = act(h)
        h = bn(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        # Block 2 (64 filters)
        h = Conv(64, kernel_size=(3,) * nd, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = act(bn(h))
        h = Conv(64, kernel_size=(3,) * nd, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = act(bn(h))
        h = Conv(64, kernel_size=(5,) * nd, padding="SAME", kernel_init=KERNEL_INIT)(h)
        h = max_pool(h, (2,) * nd)
        h = act(h)
        h = bn(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        # Head
        h = h.reshape((h.shape[0], -1))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        logits = nn.Dense(self.n_classes, kernel_init=KERNEL_INIT)(h)
        return {"class": logits}
