"""Detection score vs peak-threshold sweep + precision/recall plot.

Reference analog: biapy/utils/scripts/detection_plots.py — sweep
``peak_local_max`` absolute thresholds over a probability image, score each
point set against a GT point CSV with distance tolerance, print the table and
save `score_vary_th.png` + `recall_vs_precision.png`.

Usage:
    python -m biapy_tpu.utils.scripts.detection_plots \
        --pred probs.tif --gt_csv gt.csv --tolerance 10 \
        --resolution 0.4 0.4 2 --output outdir/ [--is_3d]
"""

import argparse
import csv
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help="probability image")
    p.add_argument("--gt_csv", required=True, help="GT points CSV (header + coord columns)")
    p.add_argument("--tolerance", type=float, default=10.0)
    p.add_argument("--resolution", type=float, nargs="+", default=None)
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=list(np.linspace(0, 1, 11)))
    p.add_argument("--output", default=".")
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import read_img_as_ndarray
    from biapy_tpu.data.post_processing import peak_local_max
    from biapy_tpu.utils.matching import detection_metrics

    img = read_img_as_ndarray(args.pred, is_3d=args.is_3d)[..., 0].astype(np.float32)
    res = tuple(args.resolution) if args.resolution else (1.0,) * img.ndim

    gt = []
    with open(args.gt_csv) as fh:
        rows = list(csv.reader(fh))
    for row in rows[1:]:
        vals = [float(v) for v in row if v != ""]
        gt.append([int(v) for v in vals[-img.ndim:]])  # trailing coord columns
    gt = np.asarray(gt, np.int64).reshape(-1, img.ndim)

    prec, rec, f1 = [], [], []
    for th in args.thresholds:
        pts = peak_local_max(img, min_distance=1, threshold_abs=float(th))
        m = detection_metrics(gt, pts, tolerance=args.tolerance, resolution=res)
        prec.append(m["precision"]); rec.append(m["recall"]); f1.append(m["f1"])
        print(f"th={th:.2f}  n={len(pts):6d}  precision={m['precision']:.4f} "
              f"recall={m['recall']:.4f}  f1={m['f1']:.4f}")

    os.makedirs(args.output, exist_ok=True)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.plot(args.thresholds, prec, label="Precision")
    plt.plot(args.thresholds, rec, label="Recall")
    plt.plot(args.thresholds, f1, label="F1")
    plt.legend(); plt.xlabel("Threshold"); plt.ylabel("Score")
    plt.title("Score when varying peak threshold")
    plt.savefig(os.path.join(args.output, "score_vary_th.png")); plt.clf()

    plt.plot(rec, prec)
    plt.xlabel("Recall"); plt.ylabel("Precision")
    plt.title("Recall vs Precision")
    plt.savefig(os.path.join(args.output, "recall_vs_precision.png")); plt.clf()
    print(f"Plots saved under {args.output}")


if __name__ == "__main__":
    main()
