"""Point-detection precision/recall/F1 between two CSV point files.

Reference analog: biapy/utils/scripts/calculate_detection_metrics.py.
CSV columns: axis-0[,axis-1,axis-2] (extra columns ignored).

Usage:
    python -m biapy_tpu.utils.scripts.calculate_detection_metrics \
        --gt_csv gt.csv --pred_csv pred.csv --tolerance 10 [--resolution 1 1 1]
"""

import argparse
import csv

import numpy as np


def _read_points(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    axes = [k for k in (rows[0].keys() if rows else []) if k.startswith("axis-")]
    axes.sort(key=lambda a: int(a.split("-")[1]))
    return np.asarray([[float(r[a]) for a in axes] for r in rows], np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_csv", required=True)
    p.add_argument("--pred_csv", required=True)
    p.add_argument("--tolerance", type=float, default=10.0)
    p.add_argument("--resolution", type=float, nargs="+", default=[1.0, 1.0, 1.0])
    args = p.parse_args()

    from biapy_tpu.utils.matching import detection_metrics

    gt, pred = _read_points(args.gt_csv), _read_points(args.pred_csv)
    m = detection_metrics(gt, pred, args.tolerance, resolution=args.resolution)
    for k, v in m.items():
        print(f"{k}: {v:.6f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
