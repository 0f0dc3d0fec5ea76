"""Instance-segmentation PR curve across prediction-threshold directories.

Reference analog: biapy/utils/scripts/PR_plot_instances.py — for each
threshold subdirectory ``<preds_root>/*_<thr>`` holding instance label images,
IoU-match every prediction against GT (Hungarian assignment on the label
contingency matrix — our utils.matching does exactly this, memory-light),
aggregate TP/FP/FN across images, print a table and save an SVG PR curve.

Usage:
    python -m biapy_tpu.utils.scripts.pr_plot_instances \
        --gt gt_dir/ --preds preds_root/ --iou 0.5 \
        --thresholds 0.1 0.2 ... --out pr_curve.svg [--is_3d]
"""

import argparse
import os

import numpy as np


def _dir_for(preds_root: str, thr: float) -> str:
    for cand in (f"{thr}", f"{thr:.1f}", f"{thr:.2f}"):
        hits = [d for d in sorted(os.listdir(preds_root))
                if os.path.isdir(os.path.join(preds_root, d)) and d.endswith("_" + cand)]
        if hits:
            return os.path.join(preds_root, hits[0])
    raise FileNotFoundError(f"no subdir of {preds_root} ends with _{thr}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True, help="GT instance label directory")
    p.add_argument("--preds", required=True, help="root with per-threshold subdirs")
    p.add_argument("--iou", type=float, default=0.5, help="IoU threshold for a TP")
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=[round(0.1 * i, 1) for i in range(10)])
    p.add_argument("--out", default="pr_curve.svg")
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
    from biapy_tpu.utils.matching import matching

    gt_files = {os.path.splitext(os.path.basename(f))[0]: f
                for f in list_image_files(args.gt)}

    rows = []
    for thr in args.thresholds:
        pred_dir = _dir_for(args.preds, thr)
        tp = fp = fn = n_img = 0
        for f in list_image_files(pred_dir):
            stem = os.path.splitext(os.path.basename(f))[0]
            g = gt_files.get(stem) or gt_files.get(stem.replace("_instances", ""))
            if g is None:
                continue
            y_true = read_img_as_ndarray(g, is_3d=args.is_3d)[..., 0].astype(np.int64)
            y_pred = read_img_as_ndarray(f, is_3d=args.is_3d)[..., 0].astype(np.int64)
            m = matching(y_true, y_pred, thresh=(args.iou,))[0]
            tp += m["tp"]; fp += m["fp"]; fn += m["fn"]; n_img += 1
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        rows.append((thr, n_img, tp, fp, fn, prec, rec))
        print(f"[{thr}] imgs={n_img:4d}  TP={tp:6d}  FP={fp:6d}  FN={fn:6d}  "
              f"Precision={prec:.4f}  Recall={rec:.4f}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rec = [r[6] for r in rows]; prec = [r[5] for r in rows]
    plt.plot(rec, prec, marker="o")
    for r in rows:
        plt.annotate(f"{r[0]}", (r[6], r[5]), fontsize=7)
    plt.xlabel("Recall"); plt.ylabel("Precision")
    plt.title(f"Instance PR curve (IoU>={args.iou})")
    plt.savefig(args.out)
    print(f"\nSaved PR curve to: {args.out}\n")

    print(f"{'Threshold':>9}  {'Images':>6}  {'TP':>6}  {'FP':>6}  {'FN':>6}  "
          f"{'Precision':>9}  {'Recall':>7}")
    for thr, n_img, tp, fp, fn, pr, rc in rows:
        print(f"{thr:9.1f}  {n_img:6d}  {tp:6d}  {fp:6d}  {fn:6d}  {pr:9.4f}  {rc:7.4f}")


if __name__ == "__main__":
    main()
