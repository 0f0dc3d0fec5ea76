"""Denoising workflow (Noise2Void).

Reference analog: biapy/engine/denoising.py (1052 LoC): self-supervised
Noise2Void — a stratified subset of pixels is replaced by values drawn from
their neighbourhood (manipulators: uniform/normal/mean/median, with/without
the center pixel, optional struct-mask), and the loss is MSE restricted to
the manipulated pixels. The GAN (NAFNet+PatchGAN) supervised mode is a
separate path (denoising.py:191), arriving with the GAN engine.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from biapy_tpu.engine import metrics as M
from biapy_tpu.engine.base_workflow import Base_Workflow


def n2v_manipulate(
    img: np.ndarray,
    rng: np.random.Generator,
    perc_pix: float = 0.198,
    manipulator: str = "uniform_withCP",
    radius: int = 5,
    struct_mask: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stratified pixel manipulation (reference: denoising.py:499-1036).

    Returns (manipulated_img, target_values, mask) with channels-last shapes
    equal to ``img``; mask=1 where pixels were replaced.
    """
    spatial = img.shape[:-1]
    nd = len(spatial)
    out = img.copy()
    mask = np.zeros_like(img, dtype=np.float32)
    target = img.copy()

    # stratified sampling: one candidate per grid cell of size box
    box = max(2, int(round(np.sqrt(100.0 / perc_pix)))) if nd == 2 else max(
        2, int(round((1000.0 / perc_pix) ** (1 / 3)))
    )
    grids = [np.arange(0, s, box) for s in spatial]
    coords = np.meshgrid(*grids, indexing="ij")
    offsets = [rng.integers(0, box, c.shape) for c in coords]
    pix = [np.minimum(c + o, s - 1).reshape(-1) for c, o, s in zip(coords, offsets, spatial)]
    idx = tuple(pix)

    for c in range(img.shape[-1]):
        vals = _manipulated_values(img[..., c], idx, rng, manipulator, radius)
        out[..., c][idx] = vals
        mask[..., c][idx] = 1.0
    if struct_mask and nd >= 2:
        # extend the mask along x around each manipulated pixel (structN2V)
        ext = mask.copy()
        for dx in range(-2, 3):
            ext = np.maximum(ext, np.roll(mask, dx, axis=nd - 1))
        mask = ext
    return out, target, mask


def _manipulated_values(ch: np.ndarray, idx, rng, manipulator: str, radius: int):
    n = len(idx[0])
    spatial = ch.shape
    nd = len(spatial)
    if manipulator.startswith("normal_additive"):
        return ch[idx] + rng.normal(0, ch.std(), n)
    # neighbourhood-based manipulators
    neigh_idx = []
    for d in range(nd):
        off = rng.integers(-radius, radius + 1, n)
        if "withoutCP" in manipulator and d == 0:
            off = np.where(off == 0, 1, off)
        neigh_idx.append(np.clip(idx[d] + off, 0, spatial[d] - 1))
    neigh_vals = ch[tuple(neigh_idx)]
    if manipulator.startswith(("uniform", "normal_withCP", "normal_withoutCP")):
        return neigh_vals
    if manipulator.startswith(("mean", "median")):
        # sample a small neighbourhood per pixel
        samples = [neigh_vals]
        for _ in range(4):
            alt = []
            for d in range(nd):
                off = rng.integers(-radius, radius + 1, n)
                alt.append(np.clip(idx[d] + off, 0, spatial[d] - 1))
            samples.append(ch[tuple(alt)])
        stack = np.stack(samples)
        return np.mean(stack, axis=0) if manipulator.startswith("mean") else np.median(stack, axis=0)
    return neigh_vals


class Denoising_Workflow(Base_Workflow):
    def define_activations_and_channels(self):
        out_c = int(self.cfg.DATA.PATCH_SIZE[-1])
        self.out_c = out_c
        self.output_channels = [out_c]
        self.activations = ["linear"]
        self.output_channel_info = ["image"]

        self.gt_as_image = True

    def define_metrics(self):
        c = int(self.cfg.DATA.PATCH_SIZE[-1])

        def loss(out, y):
            pred = out["pred"] if isinstance(out, dict) else out
            return M.n2v_loss_mse(pred, y[..., :c], y[..., c:])

        self.loss = loss
        self.train_metrics = {}

    def prepare_targets_fn(self):
        d = self.cfg.PROBLEM.DENOISING

        def target_fn(img, gt, rng):
            manip, target, mask = n2v_manipulate(
                img, rng, perc_pix=float(d.N2V_PERC_PIX), manipulator=str(d.N2V_MANIPULATOR),
                radius=int(d.N2V_NEIGHBORHOOD_RADIUS), struct_mask=bool(d.N2V_STRUCTMASK),
            )
            return manip, np.concatenate([target, mask], axis=-1)

        return target_fn

    def metric_calculation(self, pred, gt):
        if gt is None:
            return {}
        from biapy_tpu.data.norm import normalize_image

        g, _ = normalize_image(gt.astype("float32"), self.norm_spec)
        rng_ = max(float(g.max() - g.min()), 1e-6)
        mse = float(((pred - g) ** 2).mean())
        psnr = 20 * __import__("numpy").log10(rng_) - 10 * __import__("numpy").log10(max(mse, 1e-12))
        return {"psnr": float(psnr), "mse": mse}
