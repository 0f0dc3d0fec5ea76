"""STU-Net: nnU-Net-style residual U-Net.

Reference analog: biapy/models/stunet.py (STUNet:103, BasicResBlock:31,
STUNet_small/base/large helpers: dims (16|32|64)*2^i, depth 1 or 2 per
stage, strided-conv downsampling, nearest-upsample + 1-conv decoder,
InstanceNorm + LeakyReLU). Works in 2D and 3D (the reference is 3D-only and
notes the 2D port is the same pattern).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from biapy_tpu.models.blocks import Conv

from biapy_tpu.models.blocks import KERNEL_INIT, Norm, upsample_nearest

VARIANTS = {
    "small": dict(dims=(16, 32, 64, 128, 256, 256), depth=(1,) * 6),
    "base": dict(dims=(32, 64, 128, 256, 512, 512), depth=(1,) * 6),
    "large": dict(dims=(64, 128, 256, 512, 1024, 1024), depth=(2,) * 6),
    "huge": dict(dims=(96, 192, 384, 768, 1536, 1536), depth=(3,) * 6),
}


class BasicResBlock(nn.Module):
    """conv -> IN -> lrelu -> conv -> IN -> +skip -> lrelu (reference:
    stunet.py:31)."""

    features: int
    k: Sequence[int]
    stride: Sequence[int] = ()
    use_1x1conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        stride = tuple(self.stride) if self.stride else (1,) * nd
        y = Conv(self.features, kernel_size=tuple(self.k), strides=stride, padding="SAME",
                    kernel_init=KERNEL_INIT)(x)
        y = nn.GroupNorm(num_groups=self.features, epsilon=1e-5)(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = Conv(self.features, kernel_size=tuple(self.k), padding="SAME",
                    kernel_init=KERNEL_INIT)(y)
        y = nn.GroupNorm(num_groups=self.features, epsilon=1e-5)(y)
        if self.use_1x1conv:
            x = Conv(self.features, kernel_size=(1,) * nd, strides=stride,
                        kernel_init=KERNEL_INIT)(x)
        return nn.leaky_relu(y + x, negative_slope=0.01)


class STUNet(nn.Module):
    ndim: int = 3
    variant: str = "base"
    output_channels: Sequence[int] = (1,)
    output_channel_info: Sequence[str] = ("F",)
    z_down: Sequence[int] = (2, 2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = VARIANTS[self.variant]
        dims = list(spec["dims"])
        depth = list(spec["depth"])
        nd = self.ndim
        num_pool = len(dims) - 1
        zd = list(self.z_down) + [2] * (num_pool - len(self.z_down))
        pools = [
            ((zd[i], 2, 2) if nd == 3 else (2, 2)) for i in range(num_pool)
        ]
        k = (3,) * nd

        # Encoder
        h = BasicResBlock(dims[0], k, use_1x1conv=True)(x, train)
        for _ in range(depth[0] - 1):
            h = BasicResBlock(dims[0], k)(h, train)
        skips = [h]
        for d in range(1, num_pool + 1):
            h = BasicResBlock(dims[d], k, stride=pools[d - 1], use_1x1conv=True)(h, train)
            for _ in range(depth[d] - 1):
                h = BasicResBlock(dims[d], k)(h, train)
            if d < num_pool:
                skips.append(h)

        # Decoder: nearest upsample + 1-conv, concat skip, res blocks.
        # Upsampling targets the skip's exact spatial shape so inputs that are
        # not divisible by the pool product still work (the reference instead
        # requires divisibility, stunet.py input_shape_must_be_divisible_by).
        import jax

        for u in range(num_pool):
            target_dim = dims[-2 - u]
            skip = skips[num_pool - 1 - u]
            new_shape = (h.shape[0],) + skip.shape[1:-1] + (h.shape[-1],)
            h = jax.image.resize(h, new_shape, method="nearest")
            # biased 1-conv (reference Upsample_Layer_nearest, stunet.py:71 —
            # torch Conv3d default bias): param-count parity pinned by
            # tests/test_param_parity.py
            h = Conv(target_dim, kernel_size=(1,) * nd, kernel_init=KERNEL_INIT)(h)
            h = jnp.concatenate([h, skip], axis=-1)
            h = BasicResBlock(target_dim, k, use_1x1conv=True)(h, train)
            for _ in range(depth[-2 - u] - 1):
                h = BasicResBlock(target_dim, k)(h, train)

        one = (1,) * nd
        # seg conv (dims[0] -> output_channels[0]) feeding the per-head
        # 1-convs, exactly the reference's seg_outputs[-1] -> heads chain
        # (stunet.py:303,309-311)
        h = Conv(int(self.output_channels[0]), kernel_size=one,
                 kernel_init=KERNEL_INIT)(h)
        preds, class_outs = [], []
        for i, out_ch in enumerate(self.output_channels):
            head = Conv(out_ch, kernel_size=one, kernel_init=KERNEL_INIT)(h)
            (class_outs if "class" in self.output_channel_info[i] else preds).append(head)
        out: Dict = {"pred": jnp.concatenate(preds, axis=-1)}
        if class_outs:
            out["class"] = jnp.concatenate(class_outs, axis=-1)
        return out["pred"] if len(out) == 1 else out


def load_stunet_pretrained(source: str, params, variant: str = "base",
                           verbose: bool = False):
    """Map a local OrgMIM/STUNet torch checkpoint's ENCODER onto the flax
    params (reference: load_stunet_pretrained_encoder_from_ckpt,
    stunet.py:481 and the build_stunet pretrained download :571-589 — the
    reference downloads from HF; this environment has no egress, so only a
    local file is accepted, selected via MODEL.STUNET.PRETRAINED).

    OrgMIM checkpoints store tensors under ``checkpoint['model_weights']``
    with keys like ``encoder.sp_cnn.conv_blocks_context.{stage}.{i}.conv1.
    weight``; the reference keeps only ``encoder`` keys, strips up to
    ``sp_cnn.``, and loads strict=False (encoder-only — decoder/head keep
    their init). Plain BiaPy STUNet state dicts (``conv_blocks_context.*``
    directly) load the same way.

    Returns ``(new_params, n_loaded)``; raises if no encoder tensor maps.
    """
    import os

    import numpy as np

    if not os.path.exists(source):
        raise FileNotFoundError(
            f"STUNet weights '{source}' not found. No network access here: "
            "download the OrgMIM checkpoint for this variant elsewhere and "
            "set MODEL.STUNET.PRETRAINED to the local file path.")
    import torch

    if source.endswith(".safetensors"):
        from safetensors.torch import load_file  # pragma: no cover

        sd = load_file(source)
    else:
        try:
            sd = torch.load(source, map_location="cpu", weights_only=True)
        except Exception:
            sd = torch.load(source, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # OrgMIM/lightning wrappers
    for wrap in ("model_weights", "state_dict", "model"):
        if isinstance(sd, dict) and isinstance(sd.get(wrap), dict):
            sd = sd[wrap]
    sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}
    if any("encoder" in k for k in sd):
        # reference parity: keep encoder keys, strip up to 'sp_cnn.'
        sd = {k.split("sp_cnn.")[-1]: v for k, v in sd.items() if "encoder" in k}
        sd = {(k[len("encoder."):] if k.startswith("encoder.") else k): v
              for k, v in sd.items()}

    depth = list(VARIANTS[variant.lower()]["depth"])
    # torch module -> flax submodule/param-role inside BasicResBlock
    mod_map = {
        "conv1": ("Conv_0", {"weight": "kernel", "bias": "bias"}),
        "norm1": ("GroupNorm_0", {"weight": "scale", "bias": "bias"}),
        "conv2": ("Conv_1", {"weight": "kernel", "bias": "bias"}),
        "norm2": ("GroupNorm_1", {"weight": "scale", "bias": "bias"}),
        "conv3": ("Conv_2", {"weight": "kernel", "bias": "bias"}),
    }

    import jax

    new = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    n_loaded = 0
    skipped = []
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] != "conv_blocks_context" or len(parts) != 5:
            skipped.append(k)
            continue
        stage, blk, mod, p = int(parts[1]), int(parts[2]), parts[3], parts[4]
        if mod not in mod_map or p not in mod_map[mod][1]:
            skipped.append(k)
            continue
        flax_block = f"BasicResBlock_{sum(depth[:stage]) + blk}"
        sub, role = mod_map[mod][0], mod_map[mod][1][p]
        w = np.asarray(v.float() if hasattr(v, "float") else v, np.float32)
        if role == "kernel":
            # torch (O, I, *k) -> flax (*k, I, O)
            w = np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))
        try:
            node = new[flax_block][sub]
        except KeyError as e:
            raise ValueError(f"{k}: no flax param {flax_block}/{sub} — "
                             f"wrong MODEL.STUNET.VARIANT '{variant}'?") from e
        if tuple(node[role].shape) != tuple(w.shape):
            raise ValueError(f"{k}: shape {w.shape} vs flax "
                             f"{flax_block}/{sub}/{role} {node[role].shape} — "
                             f"wrong MODEL.STUNET.VARIANT '{variant}'?")
        node[role] = w
        n_loaded += 1
    if n_loaded == 0:
        raise ValueError(
            f"no STUNet encoder tensors found in {source} "
            f"(first keys: {list(sd)[:5]})")
    if verbose:
        print(f"[STUNet] Pretrained encoder loaded: {n_loaded} tensors"
              + (f"; {len(skipped)} non-encoder tensors ignored "
                 "(strict=False parity)" if skipped else ""))
    return new, n_loaded
