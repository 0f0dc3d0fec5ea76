"""Plotting and misc utilities.

Reference analog: biapy/utils/util.py (create_plots:37, threshold sweep
plots:108, U-Net border weight maps:199, seg2aff affinities:588 — affinities
live in data/pre_processing.py here).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def create_plots(history: List[Dict], out_dir: str, job_identifier: str) -> None:
    """Loss/metric training charts (reference: util.py:37)."""
    if not history:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    epochs = [h.get("epoch", i) for i, h in enumerate(history)]
    keys = sorted({k for h in history for k in h
                   if isinstance(h.get(k), (int, float)) and k not in ("epoch", "time", "lr")})
    # pair train/val series of the same metric
    bases = sorted({k[4:] if k.startswith("val_") else k for k in keys})
    for base in bases:
        fig, ax = plt.subplots(figsize=(6, 4))
        if base in keys:
            ax.plot(epochs, [h.get(base, np.nan) for h in history], label=f"train {base}")
        if ("val_" + base) in keys:
            ax.plot(epochs, [h.get("val_" + base, np.nan) for h in history], label=f"val {base}")
        ax.set_xlabel("epoch")
        ax.set_ylabel(base)
        ax.legend()
        ax.set_title(f"{job_identifier}: {base}")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{job_identifier}_{base}.png"), dpi=100)
        plt.close(fig)


def threshold_plots(preds: np.ndarray, gt: np.ndarray, job_file: str,
                    char_dir: str, r_val: float = 0.5) -> float:
    """IoU-vs-binarization-threshold sweep chart (reference: util.py:108):
    binarize predictions at 0.1..0.9, plot the per-threshold Jaccard index,
    return the IoU at ``r_val``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    char_dir = os.path.join(char_dir, "t_" + str(job_file))
    os.makedirs(char_dir, exist_ok=True)
    gt_b = gt > 0.5
    ths = np.arange(0.1, 1.0, 0.1)
    t_jac = np.zeros(len(ths))
    r_pos = 0
    for i, t in enumerate(ths):
        if abs(float(t) - r_val) < 1e-9:
            r_pos = i
        pb = preds > t
        inter = np.logical_and(pb, gt_b).sum()
        union = np.logical_or(pb, gt_b).sum()
        t_jac[i] = inter / union if union else 0.0
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar([f"{t:.2f}" for t in ths], t_jac)
    ax.set_xlabel("threshold")
    ax.set_ylabel("IoU")
    ax.set_title(f"{job_file}: IoU vs binarization threshold")
    for i, v in enumerate(t_jac):
        ax.text(i, v, f"{v:.3f}", ha="center", va="bottom", fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(char_dir, f"{job_file}_threshold_sweep.png"), dpi=100)
    plt.close(fig)
    return float(t_jac[r_pos])


def unet_weight_map(mask: np.ndarray, w0: float = 10.0, sigma: float = 5.0) -> np.ndarray:
    """U-Net border weight map (reference: util.py:199; Ronneberger 2015):
    emphasises pixels between close instances via the two nearest instance
    distances."""
    from scipy import ndimage

    from biapy_tpu.native import connected_components

    labels, n = connected_components(mask > 0)
    if n < 2:
        return np.ones(mask.shape, np.float32)
    dists = []
    for lab in range(1, n + 1):
        from biapy_tpu.data.pre_processing import _edt
        dists.append(_edt(labels != lab))
    d = np.sort(np.stack(dists), axis=0)
    w = w0 * np.exp(-((d[0] + d[1]) ** 2) / (2 * sigma**2))
    return (1.0 + w * (mask == 0)).astype(np.float32)
