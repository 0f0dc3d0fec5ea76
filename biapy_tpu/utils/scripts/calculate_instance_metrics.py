"""Instance matching metrics (precision/recall/F1/panoptic) between two
directories of instance label images.

Reference analog: biapy/utils/scripts/calculate_instance_metrics.py.

Usage:
    python -m biapy_tpu.utils.scripts.calculate_instance_metrics \
        --gt_dir y_true/ --pred_dir y_pred/ [--thresholds 0.3 0.5 0.75] [--is_3d]
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--thresholds", type=float, nargs="+", default=[0.3, 0.5, 0.75])
    p.add_argument("--is_3d", action="store_true")
    args = p.parse_args()

    from biapy_tpu.data.io import list_image_files, read_img_as_ndarray
    from biapy_tpu.utils.matching import aggregate_matching, matching

    gts = list_image_files(args.gt_dir)
    preds = list_image_files(args.pred_dir)
    if len(gts) != len(preds):
        raise SystemExit(f"count mismatch: {len(gts)} GT vs {len(preds)} predictions")
    all_stats = []
    for g, q in zip(gts, preds):
        gt = read_img_as_ndarray(g, is_3d=args.is_3d)[..., 0].astype("int32")
        pr = read_img_as_ndarray(q, is_3d=args.is_3d)[..., 0].astype("int32")
        stats = matching(gt, pr, thresh=list(args.thresholds))
        all_stats.append(stats)
        for s in stats:
            print(f"{os.path.basename(q)} @{s['thresh']}: f1={s['f1']:.4f} "
                  f"precision={s['precision']:.4f} recall={s['recall']:.4f}")
    for s in aggregate_matching(all_stats):
        print(f"DATASET @{s['thresh']}: f1={s['f1']:.4f} precision={s['precision']:.4f} "
              f"recall={s['recall']:.4f} panoptic_quality={s.get('panoptic_quality', 0.0):.4f}")


if __name__ == "__main__":
    main()
