"""torchvision ViT (vit_b_16/32, vit_l_16/32) on the first-party ViT.

Reference analog: the torchvision classification namespace
(biapy/models/__init__.py:1676). The first-party ViT (models/vit.py)
already has torchvision's exact structure (cls token + joint pos embedding,
pre-LN blocks, GELU MLP), so this module only provides the variant
configuration and the static key map: torchvision's packed
``in_proj_weight`` (3D, D) is pre-split into q/k/v and reshaped onto
flax's (D, H, head_dim) attention kernels. torchvision ViTs are 224-input
models (the pos embedding is sized for 196+1 tokens).
"""

from __future__ import annotations

import numpy as np

from biapy_tpu.models.vit import ViT

_VARIANTS = {
    # patch, dim, depth, heads
    "vit_b_16": (16, 768, 12, 12),
    "vit_b_32": (32, 768, 12, 12),
    "vit_l_16": (16, 1024, 24, 16),
    "vit_l_32": (32, 1024, 24, 16),
    "vit_h_14": (14, 1280, 32, 16),
}


def build_tv_vit(variant: str, n_classes: int) -> ViT:
    p, d, depth, heads = _VARIANTS[variant]
    return ViT(ndim=2, img_size=224, patch_size=p, in_channels=3,
               embed_dim=d, depth=depth, num_heads=heads,
               n_classes=n_classes, drop_rate=0.0)


def vit_key_map(variant: str = "vit_b_16", n_classes: int = 1000):
    p, d, depth, heads = _VARIANTS[variant]
    params = []

    def add(fpath, tkey, tf=None):
        params.append((tuple(fpath), tkey, tf))

    add(["PatchEmbed_0", "Conv_0", "kernel"], "conv_proj.weight", "conv")
    add(["PatchEmbed_0", "Conv_0", "bias"], "conv_proj.bias")
    add(["pos_embed"], "encoder.pos_embedding")
    add(["cls_token"], "class_token")
    for i in range(depth):
        b = f"TransformerBlock_{i}"
        t = f"encoder.layers.encoder_layer_{i}"
        add([b, "LayerNorm_0", "scale"], f"{t}.ln_1.weight")
        add([b, "LayerNorm_0", "bias"], f"{t}.ln_1.bias")
        at = f"{t}.self_attention"
        mha = [b, "MultiHeadDotProductAttention_0"]
        # packed in_proj is pre-split by the loader into __{q,k,v}__ keys
        for role, syn in (("query", "q"), ("key", "k"), ("value", "v")):
            add(mha + [role, "kernel"], f"{at}.__{syn}__.weight", "linear_flat")
            add(mha + [role, "bias"], f"{at}.__{syn}__.bias", "flat")
        add(mha + ["out", "kernel"], f"{at}.out_proj.weight", "linear_flat")
        add(mha + ["out", "bias"], f"{at}.out_proj.bias")
        add([b, "LayerNorm_1", "scale"], f"{t}.ln_2.weight")
        add([b, "LayerNorm_1", "bias"], f"{t}.ln_2.bias")
        add([b, "Dense_0", "kernel"], f"{t}.mlp.linear_1.weight", "linear")
        add([b, "Dense_0", "bias"], f"{t}.mlp.linear_1.bias")
        add([b, "Dense_1", "kernel"], f"{t}.mlp.linear_2.weight", "linear")
        add([b, "Dense_1", "bias"], f"{t}.mlp.linear_2.bias")
    add(["LayerNorm_0", "scale"], "encoder.ln.weight")
    add(["LayerNorm_0", "bias"], "encoder.ln.bias")
    add(["Dense_0", "kernel"], "heads.head.weight", "linear")
    add(["Dense_0", "bias"], "heads.head.bias")
    return params, []


def load_torchvision_vit(path: str, params, batch_stats=None,
                         variant: str = "vit_b_16", verbose: bool = False):
    """Bit-exact import; the packed (3D, D) in_proj tensors are split into
    q/k/v rows first (torch row order: q, k, v). The class-count-dependent
    heads.head is skipped with the finetuning warning."""
    import torch

    from biapy_tpu.models.tv_import import load_with_key_map

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = dict(sd)
    for k in list(sd):
        if k.endswith("in_proj_weight") or k.endswith("in_proj_bias"):
            a = np.asarray(sd.pop(k))
            d3 = a.shape[0]
            d = d3 // 3
            base = k.rsplit(".", 1)[0]
            leaf = "weight" if k.endswith("weight") else "bias"
            for i, syn in enumerate(("q", "k", "v")):
                sd[f"{base}.__{syn}__.{leaf}"] = torch.from_numpy(
                    np.ascontiguousarray(a[i * d:(i + 1) * d]))
    import os as _os
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        torch.save(sd, f.name)
        tmp = f.name
    try:
        pa, sa = vit_key_map(variant)
        return load_with_key_map(tmp, params, batch_stats, pa, sa,
                                 variant=variant, verbose=verbose,
                                 head_marker="heads.head")
    finally:
        _os.unlink(tmp)
