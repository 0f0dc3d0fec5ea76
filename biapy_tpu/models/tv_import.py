"""Shared torchvision state-dict import machinery.

Every torchvision-family model in this repo (resnet, efficientnet,
deeplabv3, fcn, mobilenetv3, lraspp) ships a STATIC key map — explicit
(flax_path, torch_key, transform) triples covering every tensor of the
torchvision state dict — and imports LOCAL ``.pth`` files bit-exactly
through this one loader (reference analog: build_torchvision_model
downloading DEFAULT weights, biapy/models/__init__.py:1609; this
environment has neither torchvision nor egress).

Transforms: ``'conv'`` (OIHW -> HWIO), ``'linear'`` (torch (out,in) ->
flax (in,out)), ``None`` (copy).
"""

from __future__ import annotations

from typing import Tuple


def load_with_key_map(path: str, params, batch_stats, pa, sa,
                      variant: str = "", verbose: bool = False,
                      head_marker: str = "out_conv") -> Tuple[dict, dict, int]:
    """Place a LOCAL torchvision state dict onto the Flax tree bit-exactly.

    ``pa``/``sa`` are (flax_path, torch_key, transform) triples for params
    and batch stats. Class-count-dependent tensors — any flax path whose
    module name contains ``head_marker`` — are skipped with the reference's
    finetuning warning when shapes differ (DEFAULT torchvision weights are
    1000-class ImageNet / 21-class COCO-VOC)."""
    import numpy as np
    import torch
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
          for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    flat_p = {k: np.asarray(v) for k, v in flatten_dict(params).items()}
    flat_s = {k: np.asarray(v) for k, v in flatten_dict(batch_stats).items()} \
        if batch_stats else {}
    pa_set = set(map(tuple, (p[0] for p in pa)))
    n_loaded = 0
    for fpath, tkey, tf in list(pa) + list(sa):
        tgt = flat_p if tuple(fpath) in pa_set else flat_s
        if tkey not in sd:
            raise ValueError(
                f"torchvision {variant} state dict {path} missing key "
                f"'{tkey}' — wrong TORCHVISION_MODEL_NAME variant?")
        a = sd[tkey]
        if tf == "conv":
            a = a.transpose(2, 3, 1, 0)
        elif tf in ("linear", "linear_flat"):
            a = a.transpose(1, 0)
        fpath = tuple(fpath)
        if fpath not in tgt:
            raise ValueError(f"no Flax home for {tkey} (path {fpath})")
        if tf in ("flat", "linear_flat") and a.size == tgt[fpath].size:
            # shape-preserving reshape (torch layer_scale (C,1,1) -> (C,);
            # packed attention (D, H*hd) -> flax (D, H, hd))
            a = a.reshape(tgt[fpath].shape)
        if tgt[fpath].shape != a.shape:
            if any(head_marker in str(p) for p in fpath) or head_marker in tkey:
                print(f"WARNING: Model's head changed from {a.shape} to "
                      f"{tgt[fpath].shape} so a finetunning is required "
                      "to have good results")
                continue
            raise ValueError(
                f"shape mismatch at {'.'.join(map(str, fpath))}: checkpoint "
                f"{a.shape} vs model {tgt[fpath].shape} — wrong variant?")
        tgt[fpath] = a.astype(np.float32)
        n_loaded += 1
    if verbose:
        print(f"Loaded {n_loaded} tensors from torchvision {variant} "
              f"state dict {path}")
    return (unflatten_dict(flat_p),
            unflatten_dict(flat_s) if flat_s else batch_stats, n_loaded)
