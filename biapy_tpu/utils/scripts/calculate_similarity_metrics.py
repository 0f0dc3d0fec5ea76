"""PSNR/SSIM/MAE/MSE between two image directories (e.g. SR/denoising eval).

Reference analog: biapy/utils/scripts/calculate_similatiry_metrics.py.

Usage:
    python -m biapy_tpu.utils.scripts.calculate_similarity_metrics \
        --gt_dir clean/ --pred_dir restored/ [--is_3d] [--data_range 255]
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--is_3d", action="store_true")
    p.add_argument("--data_range", type=float, default=None,
                   help="dynamic range (default: inferred from GT dtype)")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
    import jax.numpy as jnp

    from biapy_tpu.engine.metrics import psnr_metric, ssim_metric

    gts, preds = list_image_files(args.gt_dir), list_image_files(args.pred_dir)
    if len(gts) != len(preds):
        raise SystemExit(f"count mismatch: {len(gts)} vs {len(preds)}")
    rows = []
    for g, q in zip(gts, preds):
        a = read_img_as_ndarray(g, is_3d=args.is_3d).astype(np.float32)
        b = read_img_as_ndarray(q, is_3d=args.is_3d).astype(np.float32)
        dr = args.data_range or float(a.max() - a.min() or 1.0)
        m = {
            "psnr": float(psnr_metric(jnp.asarray(b), jnp.asarray(a), data_range=dr)),
            "ssim": float(ssim_metric(jnp.asarray(b)[None], jnp.asarray(a)[None], data_range=dr)),
            "mae": float(np.abs(a - b).mean()),
            "mse": float(((a - b) ** 2).mean()),
        }
        rows.append(m)
        print(f"{os.path.basename(q)}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print("MEAN: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()))


if __name__ == "__main__":
    main()
